"""HBM-streaming fused FD time step for grids beyond VMEM.

The whole-shot kernels (:mod:`.pallas_fd`) need every field resident in
VMEM — impossible at production grid sizes like the reference's
full-resolution Pluto config (1201x6960, ``dpct_gpu_rtm_domain_division/
build/pluto/input.orig``). Until now such grids fell back to the lax path
(~6 GCell/s at 8192^2 on the dev chip: XLA materializes the taper and
Laplacian passes separately). This kernel fuses one complete CPU-flavor
time step — Laplacian + leapfrog (``timestep/fd.c:24-46``) + all-edge
taper (``boundary/taper.c:47-67``) — into ONE streaming pass over 2D
row-tiles of the fixed-point padded layout of :mod:`.pallas_stencil`:

    read  p (with halo, manual double-buffered DMA), pp, v2, mask
    write p' = p * mask,  pp' = (2p - pp + v2*dt2*lap(p)) * mask

Source injection and trace recording touch O(1) cells and stay in XLA
(a tiny dynamic-slice add before the taper factors in — see
:func:`...solver.forward_modeling_tiled`).

All fields live in the same (R, W) padded layout (`padded_layout`), which
is a fixed point of the step: the scan carries padded arrays with zero
glue ops between steps.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stencil import padded_layout, to_padded, from_padded

__all__ = ["fd_step_padded", "padded_layout", "to_padded", "from_padded"]


def _kernel(order, hr, nxe, nze, tx, n_tx, R, W, dt2, cz, cx,
            p_hbm, pp_ref, v2_ref, m_ref, colmask_ref,
            pn_ref, ppn_ref, scratch, sems):
    h = order // 2
    i = pl.program_id(0)
    rows_slot = tx + 2 * hr

    def dma(ti, slot):
        # full-slot dst, 8-aligned src row offset, full width in all
        # branches (sliced-destination DMAs crash this Mosaic compiler)
        @pl.when(ti == 0)
        def _():
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(0, rows_slot), :],
                scratch.at[slot], sems.at[slot]).start()

        @pl.when((ti > 0) & (ti < n_tx - 1))
        def _():
            row = pl.multiple_of(ti * tx - hr, 8)
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(row, rows_slot), :],
                scratch.at[slot], sems.at[slot]).start()

        @pl.when(ti == n_tx - 1)
        def _():
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(R - rows_slot, rows_slot), :],
                scratch.at[slot], sems.at[slot]).start()

    @pl.when(i == 0)
    def _():
        dma(0, 0)

    @pl.when(i + 1 < n_tx)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, 2))

    cur = jax.lax.rem(i, 2)
    pltpu.make_async_copy(
        p_hbm.at[pl.ds(0, rows_slot), :],
        scratch.at[cur], sems.at[cur]).wait()

    a = scratch[cur]
    wz = W - order
    acz = cz[0] * jax.lax.slice(a, (hr, 0), (hr + tx, wz))
    for io in range(1, order + 1):
        acz = acz + cz[io] * jax.lax.slice(a, (hr, io), (hr + tx, io + wz))
    r0 = hr - h
    acx = cx[0] * jax.lax.slice(a, (r0, h), (r0 + tx, h + wz))
    for io in range(1, order + 1):
        acx = acx + cx[io] * jax.lax.slice(a, (r0 + io, h),
                                           (r0 + io + tx, h + wz))
    lap = jnp.pad(acz + acx, ((0, 0), (h, W - wz - h)))
    # zero lap outside the extended-grid interior [h, nxe-h) x [h, nze-h)
    # (laplacian borders are zero by construction in the reference; the
    # leapfrog still updates the full extended grid)
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, lap.shape, 0)
    keep = (rows >= tx + 2 * h) & (rows < tx + h + nxe - h)
    lap = jnp.where(keep, lap * colmask_ref[0:1, :], 0.0)

    p_c = jax.lax.slice(a, (hr, 0), (hr + tx, W))
    m = m_ref[:, :]
    ppn_ref[:, :] = (2.0 * p_c - pp_ref[:, :]
                     + v2_ref[:, :] * dt2 * lap) * m
    pn_ref[:, :] = p_c * m


def fd_step_padded(p_pad, pp_pad, v2_pad, mask_pad, coefs_x, coefs_z,
                   order: int, nxe: int, nze: int, dt2: float,
                   tile_rows: int = 64, interpret: bool = False):
    """One fused leapfrog+taper step on the padded layout: returns
    ``(p', pp') = (p*mask, (2p - pp + v2*dt2*lap(p))*mask)``. All operands
    share the layout of :func:`padded_layout(nxe, nze, order, tile_rows)`;
    pads provably stay zero (p = pp = mask = 0 there), so the output feeds
    the next step directly."""
    h = order // 2
    hr = -(-h // 8) * 8
    tx = tile_rows
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    assert p_pad.shape == (R, W), (p_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    colmask = np.zeros((8, W), np.float32)
    colmask[:, 2 * h:nze] = 1.0

    kern = functools.partial(_kernel, order, hr, nxe, nze, tx, n_tx, R, W,
                             float(dt2), cz, cx)
    from .pallas_fd import vmem_params
    # 2 halo slots + 3 block inputs + 2 block outputs (x2 pipelining) +
    # ~8 stack tiles; measured-style budget rounds into the granted range
    cp = vmem_params(((2 + 8) * (tx + 2 * hr) * W + 10 * tx * W) * 4)
    block = lambda: pl.BlockSpec((tx, W), lambda i: (i, 0))
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  block(), block(), block(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32),
                   jax.ShapeDtypeStruct((R, W), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad, pp_pad, v2_pad, mask_pad, jnp.asarray(colmask))
