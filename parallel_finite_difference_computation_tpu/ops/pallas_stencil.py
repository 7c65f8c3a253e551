"""Tiled, double-buffered Pallas Laplacian for grids beyond VMEM.

The whole-shot kernels in :mod:`.pallas_fd` require the field to fit in
VMEM (true for every reference config). This kernel covers the standalone
stencil benchmark (``cuda_reference_stencil_computation``) at production
grid sizes: the field streams HBM -> VMEM in 2D tiles with order/2 halos,
with a two-slot double buffer so the next tile's DMA overlaps the current
tile's compute — the HBM-bandwidth-roofline pattern (in+out traffic is the
floor; target >=80% of roofline per BASELINE.md).

Hard-won constraint of this environment's Mosaic compiler: every DMA lane
offset and width must be *provably* 128-aligned (unaligned ones crash the
remote compile without diagnostics). Hence: z-tile starts are multiples of
128 with a ``pl.multiple_of`` hint, reads are ``chunk_w``-wide (tz+order
rounded up to 128), and the kernel computes on the leading tz+order lanes.
Global z-border zeroing happens outside the kernel (lane-axis iota also
crashes the compile).
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


def _kernel(order, nx, tx, tz, chunk_w, n_tz, cz, cx,
            inp_hbm, out_ref, scratch, sems):
    h = order // 2
    i = pl.program_id(0)   # x-tile index
    j = pl.program_id(1)   # z-tile index
    step = i * n_tz + j

    def copy_ij(ti, tj, slot):
        col = pl.multiple_of(tj * tz, 128)
        return pltpu.make_async_copy(
            inp_hbm.at[pl.ds(ti * tx, tx + order), pl.ds(col, chunk_w)],
            scratch.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _():
        copy_ij(0, 0, 0).start()

    # issue the next tile's DMA before blocking on the current one; offsets
    # stay affine in the program ids (row-major grid order: j fastest)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(j + 1 < n_tz)
    def _():
        copy_ij(i, j + 1, next_slot).start()

    @pl.when((j + 1 == n_tz) & (i + 1 < pl.num_programs(0)))
    def _():
        copy_ij(i + 1, 0, next_slot).start()

    copy_ij(i, j, jax.lax.rem(step, 2)).wait()

    a = scratch[jax.lax.rem(step, 2)][:, :tz + order]
    interior = _lap_tile(a, cz, cx, order)
    # zero rows outside the global x interior [h, nx-h); sublane iota only
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
    out_ref[:, :] = jnp.where((rows >= h) & (rows < nx - h), interior, 0.0)


def laplacian_pallas(p, coefs_x, coefs_z, order: int, tile=(256, 512),
                     interpret: bool = False,
                     vmem_budget: int = 12 * 1024 * 1024):
    """Order-``order`` interior Laplacian of an (nx, nz) field, streaming 2D
    tiles through VMEM with a double-buffered DMA pipeline. Drop-in
    equivalent of :func:`.stencil.laplacian` for grids too large for a
    whole-array kernel. Coefficients must be the premultiplied arrays from
    :func:`...numerics.scaled_coefficients`.
    """
    nx, nz = p.shape
    h = order // 2
    tx, tz = tile
    tz = max(128, min(-(-tz // 128) * 128, -(-nz // 128) * 128))
    chunk_w = -(-(tz + order) // 128) * 128
    # clamp tx to the VMEM budget: 2 input slots + 2 output windows +
    # Mosaic's stack for the unrolled taps ~ 16*tx floats per lane
    max_tx = (vmem_budget // (chunk_w * 4) - 2 * order) // 16
    tx = max(8, min(tx, (max_tx // 8) * 8))
    n_tx = -(-nx // tx)
    n_tz = -(-nz // tz)
    # halo padding on top/left; alignment + read-width padding bottom/right
    p_pad = jnp.pad(p, ((h, n_tx * tx - nx + h),
                        (h, (n_tz - 1) * tz + chunk_w - nz - h)))

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    kern = functools.partial(_kernel, order, nx, tx, tz, chunk_w, n_tz,
                             cz, cx)

    # scoped-VMEM permission derived from the working set: 2 input slots +
    # 2 output windows + Mosaic's ~12-tile vector stack (the default 16 MiB
    # cap crashes the compile for large tiles)
    from .pallas_fd import vmem_params
    cp = vmem_params(((2 + 12) * (tx + order) * chunk_w + 2 * tx * tz) * 4)
    out = pl.pallas_call(
        kern,
        grid=(n_tx, n_tz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tx, tz), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tx * tx, n_tz * tz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tx + order, chunk_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad)
    out = out[:nx, :nz]
    # global z borders are zeroed outside the kernel (lane-axis iota is
    # unavailable in-kernel); two thin strip writes in XLA
    return out.at[:, :h].set(0.0).at[:, nz - h:].set(0.0)
