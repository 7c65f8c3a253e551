"""Tiled, double-buffered Pallas Laplacian for grids beyond VMEM.

The whole-shot kernels in :mod:`.pallas_fd` require the field to fit in
VMEM (true for every reference config). This kernel covers the standalone
stencil benchmark (``cuda_reference_stencil_computation``) at production
grid sizes: the field streams HBM -> VMEM in x-tiles with order/2-row
halos, with a two-slot double buffer so the next tile's DMA overlaps the
current tile's compute — the HBM-bandwidth-roofline pattern (in+out traffic
is the floor; target >=80% of roofline per BASELINE.md).

Wide grids are split into z-chunks *outside* the kernel (overlapping halo
columns baked in, one `pallas_call` per chunk inside the same jit) because
this environment's Mosaic compiler only reliably accepts the simplest DMA
shape: a dynamic row slice of a 2D ref under a 1D grid. Interior chunks
share one compiled kernel; only the first/last chunks (which zero the
global z border) compile separate variants, so at most three kernels build
regardless of grid size. Chunking also bounds per-op vector widths, keeping
Mosaic compile times flat (a monolithic nz=8192 row-tile kernel compiled
pathologically slowly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["laplacian_pallas"]


def _lap_tile(a, cz, cx, order):
    """Laplacian center of a halo-extended tile ``a`` of
    (tx+order, tz+order): returns the (tx, tz) interior."""
    h = order // 2
    rx = a.shape[0] - order
    rz = a.shape[1] - order
    acz = cz[0] * jax.lax.slice(a, (h, 0), (h + rx, rz))
    acx = cx[0] * jax.lax.slice(a, (0, h), (rx, h + rz))
    for io in range(1, order + 1):
        acz = acz + cz[io] * jax.lax.slice(a, (h, io), (h + rx, io + rz))
        acx = acx + cx[io] * jax.lax.slice(a, (io, h), (io + rx, h + rz))
    return acz + acx


def _chunk_kernel(order, nx, tx, tz, col_lo, col_hi, cz, cx,
                  inp_hbm, out_ref, scratch, sems):
    """One z-chunk: 1D grid over x-tiles; ``inp_hbm`` is
    (n_tx*tx + order, chunk_w) with chunk_w a multiple of 128 — DMAs whose
    lane dimension is not 128-aligned crash this environment's Mosaic
    compile. ``col_lo``/``col_hi`` are the static local-column bounds of
    the global z interior within this chunk."""
    h = order // 2
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy_tile(t, slot):
        return pltpu.make_async_copy(
            inp_hbm.at[pl.ds(t * tx, tx + order), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        copy_tile(0, 0).start()

    # issue the next tile's DMA before blocking on the current one so the
    # copy engine streams continuously
    @pl.when(i + 1 < n)
    def _():
        copy_tile(i + 1, jax.lax.rem(i + 1, 2)).start()

    slot = jax.lax.rem(i, 2)
    copy_tile(i, slot).wait()

    # only the leading tz+order lanes of the (128-aligned) chunk are real
    a = scratch[slot][:, :tz + order]
    interior = _lap_tile(a, cz, cx, order)
    # zero rows outside the global x interior [h, nx-h); sublane iota only —
    # lane-axis (dimension=1) iota crashes this environment's Mosaic compile
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
    keep = (rows >= h) & (rows < nx - h)
    masked = jnp.where(keep, interior, 0.0)
    if col_lo > 0 or col_hi < tz:  # static: only edge chunks zero columns
        out_ref[:, :] = jnp.zeros_like(out_ref)
        out_ref[:, col_lo:col_hi] = masked[:, col_lo:col_hi]
    else:
        out_ref[:, :] = masked


def laplacian_pallas(p, coefs_x, coefs_z, order: int, tile=(256, 512),
                     interpret: bool = False,
                     vmem_budget: int = 12 * 1024 * 1024):
    """Order-``order`` interior Laplacian of an (nx, nz) field, streaming
    x-tiles of z-chunks through VMEM with a double-buffered DMA pipeline.
    Drop-in equivalent of :func:`.stencil.laplacian` for grids too large for
    a whole-array kernel. Coefficients must be the premultiplied arrays from
    :func:`...numerics.scaled_coefficients`.
    """
    nx, nz = p.shape
    h = order // 2
    tx, tz = tile
    tz = max(128, min(tz, -(-nz // 128) * 128))
    # clamp tx to the VMEM budget: 2 input slots + 2 output windows +
    # Mosaic's stack for the unrolled taps ~ 16*tx*tz floats
    max_tx = (vmem_budget // ((tz + order) * 4) - 2 * order) // 16
    tx = max(8, min(tx, (max_tx // 8) * 8))
    n_tx = -(-nx // tx)
    n_tz = -(-nz // tz)
    p_pad = jnp.pad(p, ((h, n_tx * tx - nx + h), (h, n_tz * tz - nz + h)))

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]

    # chunk lane width must be a multiple of 128 (see _chunk_kernel)
    chunk_w = -(-(tz + order) // 128) * 128
    if p_pad.shape[1] < (n_tz - 1) * tz + chunk_w:
        p_pad = jnp.pad(
            p_pad, ((0, 0), (0, (n_tz - 1) * tz + chunk_w - p_pad.shape[1])))

    def run_chunk(chunk, col_lo, col_hi):
        kern = functools.partial(_chunk_kernel, order, nx, tx, tz,
                                 col_lo, col_hi, cz, cx)
        return pl.pallas_call(
            kern,
            grid=(n_tx,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((tx, tz), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tx * tx, tz), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, tx + order, chunk_w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(chunk)

    outs = []
    for j in range(n_tz):
        chunk = jax.lax.slice(p_pad, (0, j * tz),
                              (p_pad.shape[0], j * tz + chunk_w))
        col_lo = max(0, h - j * tz)
        col_hi = min(tz, nz - h - j * tz)
        outs.append(run_chunk(chunk, col_lo, col_hi))
    out = outs[0] if n_tz == 1 else jnp.concatenate(outs, axis=1)
    return out[:nx, :nz]
