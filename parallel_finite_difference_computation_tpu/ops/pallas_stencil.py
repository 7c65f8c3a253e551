"""Tiled, double-buffered Pallas Laplacian for grids beyond VMEM.

The whole-shot kernels in :mod:`.pallas_fd` require the field to fit in
VMEM (true for every reference config). This kernel covers the standalone
stencil benchmark (``cuda_reference_stencil_computation``) at production
grid sizes: the field streams HBM -> VMEM in x-tiles with order/2-row halos,
with a two-slot double buffer so the next tile's DMA overlaps the current
tile's compute — the HBM-bandwidth-roofline pattern (in+out traffic is the
floor; target >=80% of roofline per BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["laplacian_pallas"]


def _lap_tile(a, cz, cx, order, nz):
    """Laplacian of the tile's interior rows given a halo-extended tile
    ``a`` of (tile+order, nz): output rows r correspond to a-rows r+h.
    z-borders are zeroed; x (row) masking is the caller's job."""
    h = order // 2
    rows = a.shape[0] - order
    acz = cz[0] * jax.lax.slice(a, (h, 0), (h + rows, nz - order))
    acx = cx[0] * jax.lax.slice(a, (0, h), (rows, nz - h))
    for io in range(1, order + 1):
        acz = acz + cz[io] * jax.lax.slice(a, (h, io), (h + rows, nz - order + io))
        acx = acx + cx[io] * jax.lax.slice(a, (io, h), (io + rows, nz - h))
    return acz + acx  # (rows, nz-order): interior columns only


def _kernel(order, nx, nz, tile, cz, cx, inp_hbm, out_ref, scratch, sems):
    h = order // 2
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy_tile(t, slot):
        return pltpu.make_async_copy(
            inp_hbm.at[pl.ds(t * tile, tile + order), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        copy_tile(0, 0).start()

    slot = jax.lax.rem(i, 2)
    copy_tile(i, slot).wait()

    @pl.when(i + 1 < n)
    def _():
        copy_tile(i + 1, jax.lax.rem(i + 1, 2)).start()

    a = scratch[slot]
    interior = _lap_tile(a, cz, cx, order, nz)
    # zero rows outside the global interior [h, nx-h)
    rows = i * tile + jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
    interior = jnp.where((rows >= h) & (rows < nx - h), interior, 0.0)
    out_ref[:, :] = jnp.zeros_like(out_ref)  # z borders
    out_ref[:, h:nz - h] = interior


def laplacian_pallas(p, coefs_x, coefs_z, order: int, tile: int = 256,
                     interpret: bool = False,
                     vmem_budget: int = 12 * 1024 * 1024):
    """Order-``order`` interior Laplacian of an (nx, nz) field, streaming
    x-tiles through VMEM with halo rows and a double-buffered DMA pipeline.
    Drop-in equivalent of :func:`.stencil.laplacian` for grids too large for
    a whole-array kernel. Coefficients must be the premultiplied arrays from
    :func:`...numerics.scaled_coefficients`.

    ``tile`` is clamped so the working set (2 input slots with halos + the
    double-buffered output window) fits ``vmem_budget``: roughly
    ``(4*tile + 2*order) * nz * 4`` bytes.
    """
    nx, nz = p.shape
    h = order // 2
    # clamp tile to the VMEM budget (multiple of 8 sublanes, >= 8)
    max_tile = (vmem_budget // (nz * 4) - 2 * order) // 4
    tile = max(8, min(tile, (max_tile // 8) * 8))
    n_tiles = -(-nx // tile)
    nx_pad = n_tiles * tile
    # pad: h halo rows on top, h + alignment on the bottom
    p_pad = jnp.pad(p, ((h, nx_pad - nx + h), (0, 0)))

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    kern = functools.partial(_kernel, order, nx, nz, tile, cz, cx)

    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((tile, nz), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx_pad, nz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + order, nz), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p_pad)
    return out[:nx]
