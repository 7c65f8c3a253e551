"""Tiled, double-buffered Pallas Laplacian for grids beyond VMEM.

The whole-shot kernels in :mod:`.pallas_fd` require the field to fit in
VMEM (true for every reference config). This kernel covers the standalone
stencil benchmark (``cuda_reference_stencil_computation``) at production
grid sizes: the field streams HBM -> VMEM in 2D tiles with order/2-wide
halos on both axes, with a two-slot double buffer so the next tile's DMA
overlaps the current tile's compute — the HBM-bandwidth-roofline pattern
(in+out traffic is the floor; target >=80% of roofline per BASELINE.md).

2D tiling keeps the per-op vector shapes small and constant regardless of
the global grid, which bounds both the VMEM working set (~16*tx*tz*4 bytes
including Mosaic's stack for the unrolled taps) and Mosaic's compile time
(a 1D row-tile variant at nz=8192 lanes compiled pathologically slowly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["laplacian_pallas"]


def _lap_tile(a, cz, cx, order):
    """Laplacian interior of a halo-extended tile ``a`` of
    (tx+order, tz+order): returns the (tx, tz) center."""
    h = order // 2
    rx = a.shape[0] - order
    rz = a.shape[1] - order
    acz = cz[0] * jax.lax.slice(a, (h, 0), (h + rx, rz))
    acx = cx[0] * jax.lax.slice(a, (0, h), (rx, h + rz))
    for io in range(1, order + 1):
        acz = acz + cz[io] * jax.lax.slice(a, (h, io), (h + rx, io + rz))
        acx = acx + cx[io] * jax.lax.slice(a, (io, h), (io + rx, h + rz))
    return acz + acx


def _kernel(order, nx, nz, tx, tz, n_tz, nxp, cz, cx,
            inp_hbm, out_ref, scratch, sems):
    """``inp_hbm`` is (n_tz * nxp, tz+order): the z-chunks (with overlapping
    halos baked in) concatenated along the row axis, so every DMA is a
    single dynamic *row* slice of a 2D HBM ref — the one slicing pattern the
    Mosaic compiler accepts for DMA here (3D refs and lane-axis dynamic
    offsets both crash it). DMA offsets are kept affine in the program ids
    (no traced floordiv): the next tile within a row is (i, j+1) and the
    row boundary prefetches (i+1, 0)."""
    h = order // 2
    i = pl.program_id(0)   # x-tile index
    j = pl.program_id(1)   # z-tile index
    step = i * n_tz + j

    def copy_ij(ti, tj, slot):
        return pltpu.make_async_copy(
            inp_hbm.at[pl.ds(tj * nxp + ti * tx, tx + order), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _():
        copy_ij(0, 0, 0).start()

    # issue the next tile's DMA before blocking on the current one so the
    # copy engine streams continuously (double-buffer pattern)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(j + 1 < n_tz)
    def _():
        copy_ij(i, j + 1, next_slot).start()

    @pl.when((j + 1 == n_tz) & (i + 1 < pl.num_programs(0)))
    def _():
        copy_ij(i + 1, 0, next_slot).start()

    slot = jax.lax.rem(step, 2)
    copy_ij(i, j, slot).wait()

    interior = _lap_tile(scratch[slot], cz, cx, order)
    # zero outside the global interior [h, n-h) on both axes
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
    cols = j * tz + jax.lax.broadcasted_iota(jnp.int32, interior.shape, 1)
    keep = (rows >= h) & (rows < nx - h) & (cols >= h) & (cols < nz - h)
    out_ref[:, :] = jnp.where(keep, interior, 0.0)


def laplacian_pallas(p, coefs_x, coefs_z, order: int,
                     tile=(256, 512), interpret: bool = False):
    """Order-``order`` interior Laplacian of an (nx, nz) field, streaming 2D
    tiles (with halos) through VMEM with a double-buffered DMA pipeline.
    Drop-in equivalent of :func:`.stencil.laplacian` for grids too large for
    a whole-array kernel. Coefficients must be the premultiplied arrays from
    :func:`...numerics.scaled_coefficients`.
    """
    nx, nz = p.shape
    h = order // 2
    tx, tz = tile
    tx = max(8, min(tx, -(-nx // 8) * 8))
    tz = max(128, min(tz, -(-nz // 128) * 128))
    n_tx = -(-nx // tx)
    n_tz = -(-nz // tz)
    # pad with halos on top/left and halo+alignment on bottom/right
    p_pad = jnp.pad(p, ((h, n_tx * tx - nx + h), (h, n_tz * tz - nz + h)))
    # pre-chunk z into overlapping halo windows and concatenate them along
    # the row axis: (n_tz * nxp, tz+order), so the kernel's DMA is always a
    # dynamic row slice of a 2D ref
    nxp = p_pad.shape[0]
    p_chunks = jnp.concatenate([
        jax.lax.slice(p_pad, (0, j * tz), (nxp, j * tz + tz + order))
        for j in range(n_tz)], axis=0)

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    kern = functools.partial(_kernel, order, nx, nz, tx, tz, n_tz, nxp,
                             cz, cx)

    out = pl.pallas_call(
        kern,
        grid=(n_tx, n_tz),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tx, tz), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tx * tx, n_tz * tz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tx + order, tz + order), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(p_chunks)
    return out[:nx, :nz]
