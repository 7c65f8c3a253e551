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

from .pallas_stencil import (padded_layout, to_padded, from_padded,
                             _halo_dma_start, _halo_dma_wait, _lap_taps,
                             _lap_taps_roll, _lap_taps_mxu,
                             stream_band_inputs, _check_tile_rows)

__all__ = ["fd_step_padded", "fd_update_padded", "fd_step_gpu_padded",
           "fd_kstep_padded", "fd_kstep_gpu_fwd_padded",
           "fd_kstep_gpu_bwd_padded", "fd_kstep_rec_padded",
           "mask_ramps", "separable_mask_operands", "injection_window",
           "padded_layout", "to_padded", "from_padded"]


# Exact-lap lowering by frame width: whole-frame rolls beat per-tap
# unaligned slices on wide frames (measured at 8192 lanes: 42.5 vs 39.6
# GCell/s, scripts/exp_padded_slots.py) but lose badly on narrow ones
# (231 lanes: roll 5.39 vs slice 3.34 us/step on the whole-shot kernel)
# — the rotate cost amortizes over lanes. The streaming tiers serve
# beyond-VMEM (wide) grids, so pick by W. Wrap garbage lands only in
# cells the v2m premask / output masks zero or the K-step invalidation
# contract already discards; kept cells read the same operands in the
# same association order (the per-step kernel measures bit-identical;
# the K-step kernels can differ in low bits only, ~1e-11, where the
# compiler forms fma differently across the two graphs — far inside the
# tier's 1e-5 lax-parity contract; tests/test_pallas_stream.py::
# TestRollLowering). Single home: ops/pallas_stencil.py (the padded
# stencil kernel shares the dispatch).
from .pallas_stencil import _ROLL_LANES_MIN


def _lap_dispatch(use_mxu, rest, order, hr, tx, W, cz, cx):
    """Split the optional MXU band refs off ``rest`` and return
    (lap_fn, remaining_refs)."""
    if use_mxu:
        sf, sm, sl = rest[:3]
        return (lambda a: _lap_taps_mxu(a, order, hr, tx, W, cx,
                                        sf, sm, sl)), rest[3:]
    if W >= _ROLL_LANES_MIN:
        return (lambda a: _lap_taps_roll(a, order, hr, tx, W, cz, cx)), rest
    return (lambda a: _lap_taps(a, order, hr, tx, W, cz, cx)), rest


def _kernel(order, hr, nxe, nze, tx, n_tx, R, W, dt2, cz, cx, use_mxu,
            p_hbm, pp_ref, v2_ref, m_ref, colmask_ref, *rest):
    h = order // 2
    lap_fn, (pn_ref, ppn_ref, scratch, sems) = _lap_dispatch(
        use_mxu, rest, order, hr, tx, W, cz, cx)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _halo_dma_start(p_hbm, scratch, sems, 0, 0, tx, hr, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _halo_dma_start(p_hbm, scratch, sems, i + 1, jax.lax.rem(i + 1, 2),
                        tx, hr, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _halo_dma_wait(p_hbm, scratch, sems, cur, tx, hr)

    a = scratch[cur]
    lap = lap_fn(a)
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
                   tile_rows: int = 64, interpret: bool = False,
                   lap_impl=None):
    """One fused leapfrog+taper step on the padded layout: returns
    ``(p', pp') = (p*mask, (2p - pp + v2*dt2*lap(p))*mask)``. All operands
    share the layout of :func:`padded_layout(nxe, nze, order, tile_rows)`;
    pads provably stay zero (p = pp = mask = 0 there), so the output feeds
    the next step directly. ``lap_impl``: None uses the import-time ``PFDC_LAP_IMPL`` snapshot;
    ``"mxu"`` computes the z lane-taps as banded MXU matmuls (manual
    3-pass bf16, ~5e-6 — see PALLAS_NOTES "z-taps on the MXU");
    ``"mxu6"`` the 6-pass triple-split variant (~f32-level)."""
    h = order // 2
    hr = -(-h // 8) * 8
    _check_tile_rows(tile_rows, hr)
    tx = tile_rows
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    assert p_pad.shape == (R, W), (p_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    colmask = np.zeros((8, W), np.float32)
    colmask[:, 2 * h:nze] = 1.0
    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []

    kern = functools.partial(_kernel, order, hr, nxe, nze, tx, n_tx, R, W,
                             float(dt2), cz, cx, use_mxu)
    # 2 halo slots + 3 block inputs + 2 block outputs (x2 pipelining) +
    # ~8 stack tiles; measured-style budget rounds into the granted range
    cp = vmem_params(((2 + 8) * (tx + 2 * hr) * W + 10 * tx * W) * 4)
    block = lambda: pl.BlockSpec((tx, W), lambda i: (i, 0))
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  block(), block(), block(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
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
    )(p_pad, pp_pad, v2_pad, mask_pad, jnp.asarray(colmask), *extra)


# ---------------------------------------------------------------------------
# GPU-suite-flavor streaming steps (fd_forward / fd_back, fd-code.cu:247-341)
# ---------------------------------------------------------------------------

def _kernel_update(order, hr, nxe, nze, tx, n_tx, R, W, dt2, cz, cx,
                   use_mxu, p_hbm, pp_ref, v2_ref, colmask_ref, *rest):
    """Update-only: out = 2p - pp + v2*dt2*lap(p). The untapered source
    reconstruction of fd_back (fd-code.cu:317-318); p passes through the
    carry unchanged so it is not re-emitted."""
    h = order // 2
    lap_fn, (ppn_ref, scratch, sems) = _lap_dispatch(
        use_mxu, rest, order, hr, tx, W, cz, cx)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _halo_dma_start(p_hbm, scratch, sems, 0, 0, tx, hr, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _halo_dma_start(p_hbm, scratch, sems, i + 1, jax.lax.rem(i + 1, 2),
                        tx, hr, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _halo_dma_wait(p_hbm, scratch, sems, cur, tx, hr)

    a = scratch[cur]
    lap = lap_fn(a)
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, lap.shape, 0)
    keep = (rows >= tx + 2 * h) & (rows < tx + h + nxe - h)
    lap = jnp.where(keep, lap * colmask_ref[0:1, :], 0.0)
    p_c = jax.lax.slice(a, (hr, 0), (hr + tx, W))
    # zero the layout slack/pad rows: tile 0 reads a frame-shifted slot, so
    # unmasked outputs would leak interior values into the slack rows and
    # recirculate through the scan carry (pads must provably stay zero)
    keep_f = (rows >= tx + h) & (rows < tx + h + nxe)
    ppn_ref[:, :] = jnp.where(
        keep_f, 2.0 * p_c - pp_ref[:, :] + v2_ref[:, :] * dt2 * lap, 0.0)


def _kernel_gpu(order, hr, nxe, nze, nxb, nzb, nx, tx, n_tx, R, W, dt2,
                with_img, cz, cx, use_mxu, *refs):
    """Taper-first flavor: t = y*mask (both halo-streamed), out_p = t,
    out_pp = 2t - x*mask + v2*dt2*lap(t) [+ sism column]; optionally
    out_im = im + imsrc * out_pp on the un-extended interior (K6)."""
    if with_img:
        (y_hbm, m_hbm, x_ref, v2_ref, sism_ref, im_ref, imsrc_ref,
         masks_ref) = refs[:8]
        rest = refs[8:]
    else:
        y_hbm, m_hbm, x_ref, v2_ref, masks_ref = refs[:5]
        rest = refs[5:]
        sism_ref = im_ref = imsrc_ref = None
    lap_fn, rest = _lap_dispatch(use_mxu, rest, order, hr, tx, W, cz, cx)
    if with_img:
        pn_ref, ppn_ref, imn_ref, scr_y, scr_m, sem_y, sem_m = rest
    else:
        pn_ref, ppn_ref, scr_y, scr_m, sem_y, sem_m = rest
        imn_ref = None
    h = order // 2
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _halo_dma_start(y_hbm, scr_y, sem_y, 0, 0, tx, hr, n_tx, R)
        _halo_dma_start(m_hbm, scr_m, sem_m, 0, 0, tx, hr, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        _halo_dma_start(y_hbm, scr_y, sem_y, i + 1, nxt, tx, hr, n_tx, R)
        _halo_dma_start(m_hbm, scr_m, sem_m, i + 1, nxt, tx, hr, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _halo_dma_wait(y_hbm, scr_y, sem_y, cur, tx, hr)
    _halo_dma_wait(m_hbm, scr_m, sem_m, cur, tx, hr)

    t = scr_y[cur] * scr_m[cur]            # tapered field, halo frame
    lap = lap_fn(t)
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, lap.shape, 0)
    keep = (rows >= tx + 2 * h) & (rows < tx + h + nxe - h)
    lap = jnp.where(keep, lap * masks_ref[0:1, :], 0.0)

    t_c = jax.lax.slice(t, (hr, 0), (hr + tx, W))
    m_c = jax.lax.slice(scr_m[cur], (hr, 0), (hr + tx, W))
    # zero slack/pad rows (tile 0 is frame-shifted; see _kernel_update)
    keep_f = (rows >= tx + h) & (rows < tx + h + nxe)
    t_c = jnp.where(keep_f, t_c, 0.0)
    ppn = jnp.where(
        keep_f, 2.0 * t_c - x_ref[:, :] * m_c + v2_ref[:, :] * dt2 * lap,
        0.0)
    if with_img:
        # K5: time-reversed trace column add at lane gz (one-hot mask row)
        ppn = ppn + sism_ref[:, 0:1] * masks_ref[16:17, :]
        # K6: zero-lag correlation on the un-extended interior
        keep_im = ((rows >= tx + h + nxb) & (rows < tx + h + nxb + nx))
        contrib = jnp.where(keep_im,
                            imsrc_ref[:, :] * ppn * masks_ref[8:9, :], 0.0)
        imn_ref[:, :] = im_ref[:, :] + contrib
    ppn_ref[:, :] = ppn
    pn_ref[:, :] = t_c


def _packed_masks(order, nxe, nze, nzb, nz, gz, W):
    """(24, W) VMEM mask pack: [0:8] laplacian col keep [2h, nze);
    [8:16] imaging col keep (un-extended interior [h+nzb, h+nzb+nz));
    [16:24] one-hot receiver column h+gz (gz is already border-offset)."""
    h = order // 2
    m = np.zeros((16, W), np.float32)
    m[0:8, 2 * h:nze] = 1.0
    m[8:16, h + nzb:h + nzb + nz] = 1.0
    # gz may be traced (dynamic receiver depth): build the one-hot with jnp
    gzhot = (jnp.arange(W)[None, :] == h + gz).astype(jnp.float32)
    return jnp.concatenate([jnp.asarray(m),
                            jnp.broadcast_to(gzhot, (8, W))], axis=0)


def fd_update_padded(p_pad, pp_pad, v2_pad, coefs_x, coefs_z, order: int,
                     nxe: int, nze: int, dt2: float, tile_rows: int = 64,
                     interpret: bool = False, lap_impl=None):
    """Untapered leapfrog update on the padded layout: returns
    ``2p - pp + v2*dt2*lap(p)`` (the fd_back source-reconstruction step)."""
    h = order // 2
    hr = -(-h // 8) * 8
    _check_tile_rows(tile_rows, hr)
    tx = tile_rows
    R, W, _, _ = padded_layout(nxe, nze, order, tile_rows)
    assert p_pad.shape == (R, W)
    n_tx = R // tx
    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    colmask = np.zeros((8, W), np.float32)
    colmask[:, 2 * h:nze] = 1.0
    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []
    kern = functools.partial(_kernel_update, order, hr, nxe, nze, tx, n_tx,
                             R, W, float(dt2), cz, cx, use_mxu)
    cp = vmem_params(((2 + 8) * (tx + 2 * hr) * W + 8 * tx * W) * 4)
    block = lambda: pl.BlockSpec((tx, W), lambda i: (i, 0))
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  block(), block(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
        out_specs=pl.BlockSpec((tx, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad, pp_pad, v2_pad, jnp.asarray(colmask), *extra)


def fd_step_gpu_padded(y_pad, x_pad, v2_pad, mask_pad, coefs_x, coefs_z,
                       order: int, nxe: int, nze: int, dt2: float,
                       nxb: int = 0, nzb: int = 0, nx: int = 0, nz: int = 0,
                       gz: int = 0, sism_col=None, imloc_pad=None,
                       imsrc_pad=None, tile_rows: int = 64,
                       interpret: bool = False, lap_impl=None):
    """Taper-first fused step (GPU-suite flavor, fd-code.cu:259-267 /
    :325-329): ``t = y*mask``; returns ``(t, 2t - x*mask + v2*dt2*lap(t))``.
    With ``sism_col`` (an (R, 128) block whose lane 0 carries the
    time-reversed trace rows) the K5 column add folds in; with
    ``imloc_pad``/``imsrc_pad`` the K6 zero-lag correlation accumulates on
    the un-extended interior and the updated image is returned third."""
    h = order // 2
    hr = -(-h // 8) * 8
    _check_tile_rows(tile_rows, hr)
    tx = tile_rows
    R, W, _, _ = padded_layout(nxe, nze, order, tile_rows)
    assert y_pad.shape == (R, W)
    n_tx = R // tx
    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    with_img = imloc_pad is not None
    masks = _packed_masks(order, nxe, nze, nzb, nz if nz else nze, gz, W)
    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []
    kern = functools.partial(_kernel_gpu, order, hr, nxe, nze, nxb, nzb,
                             nx if nx else nxe, tx, n_tx, R, W, float(dt2),
                             with_img, cz, cx, use_mxu)
    cp = vmem_params(((4 + 10) * (tx + 2 * hr) * W + 12 * tx * W) * 4)
    block = lambda: pl.BlockSpec((tx, W), lambda i: (i, 0))
    scratch = [pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
               pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
               pltpu.SemaphoreType.DMA((2,)),
               pltpu.SemaphoreType.DMA((2,))]
    if with_img:
        return pl.pallas_call(
            kern,
            grid=(n_tx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      block(), block(),
                      pl.BlockSpec((tx, 128), lambda i: (i, 0)),
                      block(), block(),
                      pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
            out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32)] * 3,
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=interpret,
        )(y_pad, mask_pad, x_pad, v2_pad, sism_col, imloc_pad, imsrc_pad,
          jnp.asarray(masks), *extra)
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  block(), block(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
        out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32)] * 2,
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=interpret,
    )(y_pad, mask_pad, x_pad, v2_pad, jnp.asarray(masks), *extra)


# ---------------------------------------------------------------------------
# Temporal blocking: K fused steps per HBM pass (the beyond-VMEM tier's
# DMA-bound ceiling breaker)
# ---------------------------------------------------------------------------

def _kslab_dma_start(hbms, scratches, sems, ti, slot, tx, hk, n_tx, R):
    """Start the halo reads of row-tile ``ti`` (rows ``[ti*tx - hk,
    (ti+1)*tx + hk)``) for every (hbm, scratch) pair into ``slot``; edge
    tiles read a frame-shifted but in-bounds window exactly like
    :func:`.pallas_stencil._halo_dma_start` (their outputs land in layout
    slack whose values no valid computation ever reads — the premasked
    ``v2m`` operand zeroes every Laplacian that could touch pad rows)."""
    rows_slot = tx + 2 * hk

    @pl.when(ti == 0)
    def _():
        for j, (hbm, sc) in enumerate(zip(hbms, scratches)):
            pltpu.make_async_copy(hbm.at[pl.ds(0, rows_slot), :],
                                  sc.at[slot], sems.at[j, slot]).start()

    @pl.when((ti > 0) & (ti < n_tx - 1))
    def _():
        row = pl.multiple_of(ti * tx - hk, 8)
        for j, (hbm, sc) in enumerate(zip(hbms, scratches)):
            pltpu.make_async_copy(hbm.at[pl.ds(row, rows_slot), :],
                                  sc.at[slot], sems.at[j, slot]).start()

    @pl.when(ti == n_tx - 1)
    def _():
        for j, (hbm, sc) in enumerate(zip(hbms, scratches)):
            pltpu.make_async_copy(hbm.at[pl.ds(R - rows_slot, rows_slot), :],
                                  sc.at[slot], sems.at[j, slot]).start()


def _kslab_dma_wait(hbms, scratches, sems, slot, tx, hk):
    for j, (hbm, sc) in enumerate(zip(hbms, scratches)):
        pltpu.make_async_copy(hbm.at[pl.ds(0, tx + 2 * hk), :],
                              sc.at[slot], sems.at[j, slot]).wait()


def mask_ramps(mask_all_np, mask_top_np, kind: str, nzb: int):
    """Extract the separable 1D factors of a taper mask, bit-exactly.

    Both reference masks are built from 1D edge ramps
    (``numerics.taper_mask_all`` is their f32 outer product;
    ``taper_mask_top`` applies them on the top strip only), so the ramps
    can be read back off the mask rows/columns where the other factor is
    exactly 1.0. Returns ``(xramp, zfac, strip01)`` float32 1D arrays:
    ``xramp`` the x edge ramp (both edges), ``zfac`` the z factor
    (``kind="all"``: the z edge ramp; ``"top"``: taperz on the strip,
    1 elsewhere), ``strip01`` the lanes where ``xramp`` applies
    (all-ones for ``"all"``)."""
    nxe, nze = mask_all_np.shape
    xramp = np.ascontiguousarray(mask_all_np[:, nze // 2], np.float32)
    if kind == "all":
        zfac = np.ascontiguousarray(mask_all_np[nxe // 2, :], np.float32)
        strip01 = np.ones(nze, np.float32)
    else:
        zfac = np.ascontiguousarray(mask_top_np[nxe // 2, :], np.float32)
        strip01 = (np.arange(nze) < nzb).astype(np.float32)
    return xramp, zfac, strip01


def separable_mask_operands(xramp, zfac, strip01, order: int,
                            tile_rows: int):
    """Build the two operands that replace a full (R, W) taper-mask slab
    in the K-step kernels (measured: the mask slab was ~1.1 of the ~7.6
    field-traffics per pass, and the rebuild is bit-identical —
    ``scripts/exp_kstep_bounds.py``).

    Returns ``(mrow_pad, mzp)``: ``mrow_pad`` (R, 128) with lane 0 the x
    ramp on content rows (0 in layout slack — the slack re-zeroing the
    full mask provided) and lane 1 the content-row indicator; ``mzp``
    (16, W) with rows [0:8] the z factor and rows [8:16] the strip
    indicator. In-kernel (:func:`_mask_from_ramps`):
    ``m = mzp[0] * where(mzp[8] != 0, mrow[:, 0], mrow[:, 1])`` —
    bitwise the mask's own f32 ramp product (multiplication commutes)."""
    nxe, nze = len(xramp), len(zfac)
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    mrow = np.zeros((R, 128), np.float32)
    mrow[row0:row0 + nxe, 0] = xramp
    mrow[row0:row0 + nxe, 1] = 1.0
    mzp = np.zeros((16, W), np.float32)
    mzp[0:8, col0:col0 + nze] = zfac[None, :]
    mzp[8:16, col0:col0 + nze] = strip01[None, :]
    return jnp.asarray(mrow), jnp.asarray(mzp)


def _mask_from_ramps(mr_slab, mzp_ref):
    """Rebuild the (S, W) taper mask from its separable operands — one
    select + one multiply per tile (not per step). See
    :func:`separable_mask_operands` for the bit-identity argument."""
    sel = jnp.where(mzp_ref[8:9, :] != 0.0, mr_slab[:, 0:1],
                    mr_slab[:, 1:2])
    return mzp_ref[0:1, :] * sel


def injection_window(patch, px_row, pz_col, nxe: int, nze: int, order: int,
                     tile_rows: int, mask_pad=None):
    """Build the (48, W) window operand + 8-aligned global start row that
    replace a full (R, W) pre-placed injection field (source patch /
    point) in the K-step kernels.

    Rows [16, 32) of the window cover global padded rows
    ``[win0, win0 + 16)`` which contain the patch rows
    ``[px_row, px_row + patch.shape[0])`` (patch height <= 8); the 16-row
    margins on both sides let the in-kernel slice
    (:func:`_injection_slab`) return all-zeros for tiles the window
    misses and the correctly shifted rows for straddling tiles, with no
    branches. ``mask_pad`` (if given) pre-tapers the values exactly like
    the full-field form did. ``px_row``/``pz_col`` may be traced."""
    assert patch.shape[0] <= 8, patch.shape
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    win0 = (px_row // 8) * 8
    q0 = px_row - win0 + 16
    inj48 = jax.lax.dynamic_update_slice(
        jnp.zeros((48, W), jnp.float32),
        jnp.asarray(patch, jnp.float32), (q0, pz_col))
    if mask_pad is not None:
        # pad before slicing so a window at the layout edge can never
        # trigger dynamic_slice's start clamping (rows past the layout
        # read mask 0, which those slack rows carry anyway)
        mp = jnp.pad(mask_pad, ((16, 48), (0, 0)))
        inj48 = inj48 * jax.lax.dynamic_slice(mp, (win0, 0), (48, W))
    return inj48, jnp.reshape(jnp.asarray(win0, jnp.int32), (1,))


def _injection_slab(inj48_ref, win0_ref, injslab_ref, i, n_tx, tx, hk,
                    R, S):
    """Per-tile: the (S, W) slab-aligned injection value, built by
    placing the window's 16 content rows into a zeroed VMEM scratch at
    their slab row offset. Both the window read and the scratch write
    use dynamic-*start* ref indexing (``pl.ds`` — the one dynamic-index
    form every Mosaic version lowers; value-level ``dynamic_slice`` is
    rejected by some), all offsets multiples of 8. For tiles the window
    misses the read lands in the window's zero margins; for straddling
    tiles the start shift re-aligns the rows."""
    # all offsets are multiples of 8; compute them in units of 8 rows and
    # multiply at the indexing point so Mosaic can prove the sublane
    # alignment statically (a clipped SMEM value alone it cannot)
    s0_8 = jnp.where(i == 0, 0,
                     jnp.where(i == n_tx - 1, (R - S) // 8,
                               i * (tx // 8) - hk // 8))
    off_8 = win0_ref[0] // 8 - s0_8
    c_8 = jnp.clip(off_8, 0, (S - 16) // 8)
    sh_8 = jnp.clip(2 + c_8 - off_8, 0, 4)
    injslab_ref[:, :] = jnp.zeros(injslab_ref.shape, jnp.float32)
    injslab_ref[pl.ds(c_8 * 8, 16), :] = inj48_ref[pl.ds(sh_8 * 8, 16), :]
    return injslab_ref[:, :]


def _lap_x_slab(x, order, cx):
    """x (sublane) taps of a slab, full lane width. On wide frames
    (>= _ROLL_LANES_MIN lanes) the taps are whole-frame sublane rolls —
    edge rows then hold wrap values instead of the slice form's zero
    pad, which only relocates the invalidation front the K-step
    contract already discards (see :func:`_kstep_kernel`); interior
    rows read identical operands in the same association order. Narrow
    frames keep per-tap slices (rolls measured 1.6x worse there)."""
    S, W = x.shape
    h = order // 2
    if W >= _ROLL_LANES_MIN:
        acc = None
        for k in range(h, 0, -1):
            term = cx[h + k] * (jnp.roll(x, k, 0) + jnp.roll(x, -k, 0))
            acc = term if acc is None else acc + term
        return acc + cx[h] * x
    rx = S - order
    c = jax.lax.slice(x, (h, 0), (h + rx, W))
    acc = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(x, (h - k, 0), (h - k + rx, W))
        xp = jax.lax.slice(x, (h + k, 0), (h + k + rx, W))
        term = cx[h + k] * (xm + xp)
        acc = term if acc is None else acc + term
    acc = acc + cx[h] * c
    return jnp.pad(acc, ((h, h), (0, 0)))


def _kstep_kernel(order, hk, K, tx, n_tx, R, W, cz, cx, use_mxu,
                  p_hbm, pp_hbm, v2m_hbm, mrow_hbm,
                  wav_ref, win0_ref, mzp_ref, inj48_ref, onegz_ref,
                  onesk_ref, *rest):
    """K fused leapfrog+taper steps on a halo-extended row slab.

    The slab carries ``hk >= K*h`` halo rows; per step the Laplacian
    validity front advances ``h`` rows inward from each slab edge (edge
    rows read zero-padded taps), so after K steps the center ``tx`` rows
    are exactly the unblocked values (``v2m`` is premultiplied by
    ``dt2`` AND the global Laplacian interior mask, so laps that could
    touch layout slack are zeroed by the operand — no per-row
    bookkeeping in-kernel). The taper mask is rebuilt per tile from its
    separable ramp operands (:func:`_mask_from_ramps`, bit-identical)
    and source injection adds ``wav[k]`` times the pre-tapered patch
    window placed once per tile into a VMEM scratch
    (:func:`_injection_slab` — a 48-row VMEM operand instead of a
    full-field streamed slab; ``fd-code.cu:380-584`` order: update ->
    inject -> taper, matching :func:`...solver.forward_modeling_tiled`),
    so only 3 wide slabs + 1 narrow stream per pass instead of 5 wide.
    Step k's tapered field is recorded at receiver lane gz via an exact
    one-hot reduce (adding zeros: bit-exact) into lane k of ``rec_out``.

    ``use_mxu``: z (lane) taps as banded MXU matmuls on the full slab
    (:func:`..pallas_stencil._lap_z_mxu_full`), x taps on the VPU."""
    from .stencil import lap_in_kernel
    from .pallas_stencil import _lap_z_mxu_full
    if use_mxu:
        sf_ref, sm_ref, sl_ref = rest[:3]
        rest = rest[3:]

        def lap_fn(x):
            return (_lap_z_mxu_full(x, x.shape[0], W, sf_ref, sm_ref,
                                    sl_ref)
                    + _lap_x_slab(x, order, cx))
    else:
        impl = "roll" if W >= _ROLL_LANES_MIN else None
        lap_fn = lambda x: lap_in_kernel(x, cx, cz, order, impl)
    (pn_out, ppn_out, rec_out,
     p_s, pp_s, v2m_s, mrow_s, inj_s, sems) = rest
    hbms = (p_hbm, pp_hbm, v2m_hbm, mrow_hbm)
    scrs = (p_s, pp_s, v2m_s, mrow_s)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _kslab_dma_start(hbms, scrs, sems, 0, 0, tx, hk, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _kslab_dma_start(hbms, scrs, sems, i + 1, jax.lax.rem(i + 1, 2),
                         tx, hk, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _kslab_dma_wait(hbms, scrs, sems, cur, tx, hk)

    x = p_s[cur]
    y = pp_s[cur]
    v2m = v2m_s[cur]
    m = _mask_from_ramps(mrow_s[cur], mzp_ref)
    inj = _injection_slab(inj48_ref, win0_ref, inj_s, i, n_tx, tx, hk, R,
                          tx + 2 * hk)
    rec = jnp.zeros((tx, 128), jnp.float32)
    for k in range(K):
        lap = lap_fn(x)
        ynew = (2.0 * x - y + v2m * lap) * m + wav_ref[k, 0] * inj
        xnew = x * m
        cc = jax.lax.slice(xnew, (hk, 0), (hk + tx, W))
        col = jnp.sum(cc * onegz_ref[0:1, :], axis=1, keepdims=True)
        rec = rec + col * onesk_ref[k:k + 1, :]
        x, y = ynew, xnew
    pn_out[:, :] = jax.lax.slice(x, (hk, 0), (hk + tx, W))
    ppn_out[:, :] = jax.lax.slice(y, (hk, 0), (hk + tx, W))
    rec_out[:, :] = rec


def fd_kstep_padded(p_pad, pp_pad, v2m_pad, mrow_pad, mzp, inj48, win0,
                    wav_chunk, gz_col: int, coefs_x, coefs_z, order: int,
                    nxe: int, nze: int, block_k: int,
                    tile_rows: int = 256, interpret: bool = False,
                    lap_impl=None):
    """``block_k`` fused steps per single HBM pass — temporal blocking of
    :func:`fd_step_padded`. The per-step tier reads 4 and writes 2 full
    fields per step (DMA-bound at ~13 GCell/s pluto-scale); this kernel
    reads 3 wide halo-extended slabs + a narrow ramp slab and writes 2
    fields + a trace block per **K** steps, cutting HBM traffic and
    moving the tier toward the VPU compute ceiling.

    Operands (fields on the :func:`padded_layout(nxe, nze, order,
    tile_rows)`): ``v2m_pad`` premultiplied by ``dt2`` and the global
    Laplacian interior mask; ``(mrow_pad, mzp)`` the separable taper-mask
    operands (:func:`separable_mask_operands` — rebuilt in-kernel,
    bit-identical to the full-mask form); ``(inj48, win0)`` the
    pre-tapered source-patch window (:func:`injection_window`);
    ``wav_chunk`` the (K,) wavelet amplitudes of this pass; ``gz_col``
    the receiver lane (``col0 + gz``). Returns ``(p', pp', rec)`` with
    ``rec`` (R, 128): lane k holds the step-k tapered field's receiver
    column (valid rows = content rows; lanes >= K are zero).

    Requires ``K*h`` (rounded to 8) halo rows <= tile_rows."""
    h = order // 2
    K = int(block_k)
    hk = -(-(K * h) // 8) * 8
    tx = tile_rows
    # the shared check enforces hk <= tile_rows (the halo DMA contract)
    _check_tile_rows(tx, hk)
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    assert p_pad.shape == (R, W), (p_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    # gz may be traced (it is a plain arg of the tiled driver): build the
    # receiver-lane one-hot with jnp
    lane = jnp.arange(W, dtype=jnp.int32)
    onegz = jnp.broadcast_to((lane == gz_col).astype(jnp.float32)[None, :],
                             (8, W))
    onesk = np.zeros((8 * ((K + 7) // 8), 128), np.float32)
    for k in range(K):
        onesk[k, k] = 1.0
    wav2 = jnp.reshape(wav_chunk.astype(jnp.float32), (K, 1))

    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []
    S = tx + 2 * hk
    # 3 double-buffered wide slabs + the injection scratch + 3 output
    # blocks (x2 pipelining) + the unrolled-K vector stack (~the
    # whole-shot kernels' 24-slab margin)
    cp = vmem_params(((7 + 24) * S + 6 * tx) * W * 4)
    kern = functools.partial(_kstep_kernel, order, hk, K, tx, n_tx, R, W,
                             cz, cx, use_mxu)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    slab = lambda: pltpu.VMEM((2, S, W), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[any_spec] * 4
        + [smem, smem, vmem, vmem, vmem, vmem]
        + [vmem] * len(extra),
        out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tx, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32),
                   jax.ShapeDtypeStruct((R, W), jnp.float32),
                   jax.ShapeDtypeStruct((R, 128), jnp.float32)],
        scratch_shapes=[slab(), slab(), slab(),
                        pltpu.VMEM((2, S, 128), jnp.float32),
                        pltpu.VMEM((S, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((4, 2))],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad, pp_pad, v2m_pad, mrow_pad, wav2, win0, mzp, inj48,
      onegz, jnp.asarray(onesk), *extra)


# ---------------------------------------------------------------------------
# Temporal blocking of the GPU-suite steps (fd_forward / fd_back,
# fd-code.cu:247-341): K fused taper-first steps per HBM pass
# ---------------------------------------------------------------------------

def _kstep_gpu_fwd_kernel(order, hk, K, tx, n_tx, R, W, cz, cx, use_mxu,
                          p_hbm, pp_hbm, v2m_hbm, mrow_hbm,
                          wav_ref, win0_ref, mzp_ref, inj48_ref, *rest):
    """K fused ``fd_forward`` steps (taper-first flavor) on a halo-extended
    row slab: per step ``t = pp*m; pp' = 2t - p*m + v2m*lap(t) +
    wav[k]*point; p' = t`` (``fd-code.cu:259-267`` order: taper -> update
    -> point source; the point source is a 48-row window placed per tile,
    :func:`_injection_slab`). Same validity-front/slack contract as
    :func:`_kstep_kernel` (``v2m`` premasked by the Laplacian interior;
    slack rows re-zero through ``m``/``v2m`` every step; the mask is
    rebuilt per tile from its separable operands,
    :func:`_mask_from_ramps`)."""
    from .stencil import lap_in_kernel
    from .pallas_stencil import _lap_z_mxu_full
    if use_mxu:
        sf_ref, sm_ref, sl_ref = rest[:3]
        rest = rest[3:]

        def lap_fn(a):
            return (_lap_z_mxu_full(a, a.shape[0], W, sf_ref, sm_ref,
                                    sl_ref)
                    + _lap_x_slab(a, order, cx))
    else:
        impl = "roll" if W >= _ROLL_LANES_MIN else None
        lap_fn = lambda a: lap_in_kernel(a, cx, cz, order, impl)
    (pn_out, ppn_out, p_s, pp_s, v2m_s, mrow_s, inj_s, sems) = rest
    hbms = (p_hbm, pp_hbm, v2m_hbm, mrow_hbm)
    scrs = (p_s, pp_s, v2m_s, mrow_s)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _kslab_dma_start(hbms, scrs, sems, 0, 0, tx, hk, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _kslab_dma_start(hbms, scrs, sems, i + 1, jax.lax.rem(i + 1, 2),
                         tx, hk, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _kslab_dma_wait(hbms, scrs, sems, cur, tx, hk)

    x = p_s[cur]
    y = pp_s[cur]
    v2m = v2m_s[cur]
    m = _mask_from_ramps(mrow_s[cur], mzp_ref)
    inj = _injection_slab(inj48_ref, win0_ref, inj_s, i, n_tx, tx, hk, R,
                          tx + 2 * hk)
    for k in range(K):
        t = y * m
        ynew = 2.0 * t - x * m + v2m * lap_fn(t) + wav_ref[k, 0] * inj
        x, y = t, ynew
    pn_out[:, :] = jax.lax.slice(x, (hk, 0), (hk + tx, W))
    ppn_out[:, :] = jax.lax.slice(y, (hk, 0), (hk + tx, W))


def fd_kstep_gpu_fwd_padded(p_pad, pp_pad, v2m_pad, mrow_pad, mzp, inj48,
                            win0, wav_chunk, coefs_x, coefs_z, order: int,
                            nxe: int, nze: int, block_k: int,
                            tile_rows: int = 256, interpret: bool = False,
                            lap_impl=None):
    """``block_k`` fused ``fd_forward`` steps per single HBM pass — the
    GPU-suite (taper-first) analog of :func:`fd_kstep_padded`.

    Operands share :func:`padded_layout(nxe, nze, order, tile_rows)`:
    ``v2m_pad`` is ``v2 * dt2`` premultiplied by the Laplacian interior
    mask; ``(mrow_pad, mzp)`` the separable top-strip taper operands
    (:func:`separable_mask_operands`); ``(inj48, win0)`` the one-hot
    point-source window at ``(row0+sx, col0+sz)``
    (:func:`injection_window`; raw, NOT pre-tapered — ``fd-code.cu:295``
    injects after the taper); ``wav_chunk`` the (K,) amplitudes of this
    pass. Returns ``(p', pp')`` exactly as K iterations of
    :func:`...solver.rtm_shot_snapshot_tiled`'s forward body."""
    h = order // 2
    K = int(block_k)
    hk = -(-(K * h) // 8) * 8
    tx = tile_rows
    _check_tile_rows(tx, hk)
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    assert p_pad.shape == (R, W), (p_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    wav2 = jnp.reshape(wav_chunk.astype(jnp.float32), (K, 1))

    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []
    S = tx + 2 * hk
    cp = vmem_params(((7 + 24) * S + 4 * tx) * W * 4)
    kern = functools.partial(_kstep_gpu_fwd_kernel, order, hk, K, tx, n_tx,
                             R, W, cz, cx, use_mxu)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    slab = lambda: pltpu.VMEM((2, S, W), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[any_spec] * 4 + [smem, smem, vmem, vmem]
        + [vmem] * len(extra),
        out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32),
                   jax.ShapeDtypeStruct((R, W), jnp.float32)],
        scratch_shapes=[slab(), slab(), slab(),
                        pltpu.VMEM((2, S, 128), jnp.float32),
                        pltpu.VMEM((S, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((4, 2))],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad, pp_pad, v2m_pad, mrow_pad, wav2, win0, mzp, inj48, *extra)


def _kstep_gpu_bwd_kernel(order, hk, K, tx, n_tx, R, W, row0, nxb, nx,
                          cz, cx, use_mxu,
                          ps_hbm, pps_hbm, pr_hbm, ppr_hbm, v2m_hbm,
                          mrow_hbm, sism_hbm, im_ref, colm_ref, mzp_ref,
                          *rest):
    """K fused ``fd_back`` steps: the untapered source reconstruction and
    the tapered receiver propagation advance together so the K6 zero-lag
    correlation accumulates in VMEM and the image round-trips HBM once
    per pass instead of once per step. Per step (``fd-code.cu:305-341``):

        s   = 2*ps - pps + v2m*lap(ps)          # source reconstruction
        t   = pr*m                               # receiver taper
        pr' = 2t - ppr*m + v2m*lap(t) + sism[:, k]*onehot(gz)   # + K5
        im += s * pr'                            # K6 (interior-masked)

    ``colm_ref`` packs (16, W): rows [0:8] the imaging column keep
    ``[col0+nzb, col0+nzb+nz)``, rows [8:16] the receiver-lane one-hot."""
    from .stencil import lap_in_kernel
    from .pallas_stencil import _lap_z_mxu_full
    if use_mxu:
        sf_ref, sm_ref, sl_ref = rest[:3]
        rest = rest[3:]

        def lap_fn(a):
            return (_lap_z_mxu_full(a, a.shape[0], W, sf_ref, sm_ref,
                                    sl_ref)
                    + _lap_x_slab(a, order, cx))
    else:
        impl = "roll" if W >= _ROLL_LANES_MIN else None
        lap_fn = lambda a: lap_in_kernel(a, cx, cz, order, impl)
    (psn_out, ppsn_out, prn_out, pprn_out, imn_out,
     ps_s, pps_s, pr_s, ppr_s, v2m_s, mrow_s, sism_s, sems) = rest
    hbms = (ps_hbm, pps_hbm, pr_hbm, ppr_hbm, v2m_hbm, mrow_hbm, sism_hbm)
    scrs = (ps_s, pps_s, pr_s, ppr_s, v2m_s, mrow_s, sism_s)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _kslab_dma_start(hbms, scrs, sems, 0, 0, tx, hk, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _kslab_dma_start(hbms, scrs, sems, i + 1, jax.lax.rem(i + 1, 2),
                         tx, hk, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _kslab_dma_wait(hbms, scrs, sems, cur, tx, hk)

    ps = ps_s[cur]
    pps = pps_s[cur]
    yr = pr_s[cur]
    xr = ppr_s[cur]
    v2m = v2m_s[cur]
    m = _mask_from_ramps(mrow_s[cur], mzp_ref)
    sis = sism_s[cur]
    gzhot = colm_ref[8:9, :]
    imacc = jnp.zeros((tx, W), jnp.float32)
    for k in range(K):
        s = 2.0 * ps - pps + v2m * lap_fn(ps)
        pps, ps = ps, s
        t = yr * m
        yrnew = 2.0 * t - xr * m + v2m * lap_fn(t) + sis[:, k:k + 1] * gzhot
        xr, yr = t, yrnew
        imacc = imacc + (jax.lax.slice(s, (hk, 0), (hk + tx, W))
                         * jax.lax.slice(yrnew, (hk, 0), (hk + tx, W)))
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, (tx, W), 0)
    keep_im = (rows >= row0 + nxb) & (rows < row0 + nxb + nx)
    imn_out[:, :] = im_ref[:, :] + jnp.where(
        keep_im, imacc * colm_ref[0:1, :], 0.0)
    psn_out[:, :] = jax.lax.slice(ps, (hk, 0), (hk + tx, W))
    ppsn_out[:, :] = jax.lax.slice(pps, (hk, 0), (hk + tx, W))
    prn_out[:, :] = jax.lax.slice(yr, (hk, 0), (hk + tx, W))
    pprn_out[:, :] = jax.lax.slice(xr, (hk, 0), (hk + tx, W))


def fd_kstep_gpu_bwd_padded(ps_pad, pps_pad, pr_pad, ppr_pad, v2m_pad,
                            mrow_pad, mzp, sism_pad, im_pad, gz_col,
                            coefs_x, coefs_z, order: int, nxe: int,
                            nze: int, nzb: int, nz: int, nxb: int, nx: int,
                            block_k: int, tile_rows: int = 256,
                            interpret: bool = False, lap_impl=None):
    """``block_k`` fused ``fd_back`` steps per single HBM pass. The
    per-step tier moves ~14 field-traffics per step (two kernels:
    :func:`fd_update_padded` + :func:`fd_step_gpu_padded` with imaging);
    this kernel reads 5 wide halo-extended slabs + two narrow slabs
    (taper ramps :func:`separable_mask_operands` + trace block) + the
    image and writes 4 fields + the image per **K** steps.

    ``sism_pad`` is (R, 128): lane k carries the step-k time-reversed
    trace rows at ``[row0+nxb, row0+nxb+nx)`` (``fd-code.cu:325-329``'s
    K5 operand for each of the K steps); ``gz_col`` the receiver lane
    (``col0 + gz``, may be traced). Returns
    ``(ps', pps', pr', ppr', im')``."""
    h = order // 2
    K = int(block_k)
    hk = -(-(K * h) // 8) * 8
    tx = tile_rows
    _check_tile_rows(tx, hk)
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    assert ps_pad.shape == (R, W), (ps_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    colm = np.zeros((8, W), np.float32)
    colm[:, col0 + nzb:col0 + nzb + nz] = 1.0
    # gz may be traced: build the receiver-lane one-hot with jnp
    lane = jnp.arange(W, dtype=jnp.int32)
    gzhot = jnp.broadcast_to((lane == gz_col).astype(jnp.float32)[None, :],
                             (8, W))
    colm_packed = jnp.concatenate([jnp.asarray(colm), gzhot], axis=0)

    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []
    S = tx + 2 * hk
    # 5 wide double-buffered slabs + 6 output/input blocks (x2
    # pipelining) + the unrolled-2K vector stack
    cp = vmem_params(((10 + 24) * S + 12 * tx) * W * 4)
    kern = functools.partial(_kstep_gpu_bwd_kernel, order, hk, K, tx, n_tx,
                             R, W, row0, nxb, nx, cz, cx, use_mxu)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    slab = lambda: pltpu.VMEM((2, S, W), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[any_spec] * 7
        + [pl.BlockSpec((tx, W), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
        out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32)] * 5,
        scratch_shapes=[slab(), slab(), slab(), slab(), slab(),
                        pltpu.VMEM((2, S, 128), jnp.float32),
                        pltpu.VMEM((2, S, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((7, 2))],
        compiler_params=cp,
        interpret=interpret,
    )(ps_pad, pps_pad, pr_pad, ppr_pad, v2m_pad, mrow_pad, sism_pad,
      im_pad, colm_packed, mzp, *extra)


def _kstep_rec_kernel(order, hk, K, tx, n_tx, R, W, cz, cx, use_mxu,
                      column_inj,
                      p_hbm, pp_hbm, v2m_hbm, mrow_hbm, *args):
    """K fused CPU-flavor steps recording the tapered time-t field as K
    full frames — the wavefield-recording variant of :func:`_kstep_kernel`
    (``rtm_main``'s memory-heavy design point, ``rtm_main.cpp:177-181``).
    The taper mask streams as its separable ramp operands
    (:func:`_mask_from_ramps`).

    Injection modes (static): ``column_inj=False`` slice-adds
    ``amp[k]`` times the pre-tapered source-patch window rows
    (:func:`_injection_slab` — forward modeling); ``column_inj=True``
    adds ``inj[:, k] * amp`` (``inj`` a narrow (R, 128) slab whose lane k
    carries the step-k pre-masked receiver rows, ``amp`` the
    receiver-lane one-hot — ``rtm_main.cpp:196-220``'s time-reversed
    trace injection)."""
    from .stencil import lap_in_kernel
    from .pallas_stencil import _lap_z_mxu_full
    if column_inj:
        inj_hbm, amp_ref, mzp_ref = args[:3]
        rest = args[3:]
    else:
        amp_ref, win0_ref, mzp_ref, inj48_ref = args[:4]
        rest = args[4:]
    if use_mxu:
        sf_ref, sm_ref, sl_ref = rest[:3]
        rest = rest[3:]

        def lap_fn(a):
            return (_lap_z_mxu_full(a, a.shape[0], W, sf_ref, sm_ref,
                                    sl_ref)
                    + _lap_x_slab(a, order, cx))
    else:
        impl = "roll" if W >= _ROLL_LANES_MIN else None
        lap_fn = lambda a: lap_in_kernel(a, cx, cz, order, impl)
    if column_inj:
        (pn_out, ppn_out, frames_out,
         p_s, pp_s, v2m_s, mrow_s, inj_s, sems) = rest
        hbms = (p_hbm, pp_hbm, v2m_hbm, mrow_hbm, inj_hbm)
        scrs = (p_s, pp_s, v2m_s, mrow_s, inj_s)
    else:
        (pn_out, ppn_out, frames_out,
         p_s, pp_s, v2m_s, mrow_s, injw_s, sems) = rest
        hbms = (p_hbm, pp_hbm, v2m_hbm, mrow_hbm)
        scrs = (p_s, pp_s, v2m_s, mrow_s)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _kslab_dma_start(hbms, scrs, sems, 0, 0, tx, hk, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _kslab_dma_start(hbms, scrs, sems, i + 1, jax.lax.rem(i + 1, 2),
                         tx, hk, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _kslab_dma_wait(hbms, scrs, sems, cur, tx, hk)

    x = p_s[cur]
    y = pp_s[cur]
    v2m = v2m_s[cur]
    m = _mask_from_ramps(mrow_s[cur], mzp_ref)
    if column_inj:
        inj = inj_s[cur]
    else:
        injw = _injection_slab(inj48_ref, win0_ref, injw_s, i, n_tx, tx,
                               hk, R, tx + 2 * hk)
    for k in range(K):
        lap = lap_fn(x)
        ynew = (2.0 * x - y + v2m * lap) * m
        if column_inj:
            ynew = ynew + inj[:, k:k + 1] * amp_ref[0:1, :]
        else:
            ynew = ynew + amp_ref[k, 0] * injw
        xnew = x * m
        frames_out[k, :, :] = jax.lax.slice(xnew, (hk, 0), (hk + tx, W))
        x, y = ynew, xnew
    pn_out[:, :] = jax.lax.slice(x, (hk, 0), (hk + tx, W))
    ppn_out[:, :] = jax.lax.slice(y, (hk, 0), (hk + tx, W))


def fd_kstep_rec_padded(p_pad, pp_pad, v2m_pad, mrow_pad, mzp, inj, amp,
                        coefs_x, coefs_z, order: int, nxe: int, nze: int,
                        block_k: int, column_inj: bool = False,
                        win0=None, tile_rows: int = 256,
                        interpret: bool = False, lap_impl=None):
    """``block_k`` fused CPU-flavor steps per HBM pass, recording K full
    tapered time-t frames — temporal blocking for the wavefield-recording
    drivers (:func:`...solver.forward_modeling_tiled` with
    ``record="wavefield"`` and :func:`...solver.backward_recorded_tiled`).
    ``(mrow_pad, mzp)`` are the separable taper-mask operands
    (:func:`separable_mask_operands`).

    ``column_inj=False``: ``inj`` is the pre-tapered source-patch window
    (48, W) with ``win0`` its start row (:func:`injection_window`),
    ``amp`` the (K,) wavelet chunk.
    ``column_inj=True``: ``inj`` is (R, 128) with lane k carrying the
    step-k receiver rows premultiplied by the taper column at the
    receiver lane, ``amp`` the receiver lane index (``col0 + gz``, may
    be traced); ``win0`` unused. Returns ``(p', pp', frames)`` with
    frames (K, R, W)."""
    h = order // 2
    K = int(block_k)
    hk = -(-(K * h) // 8) * 8
    tx = tile_rows
    _check_tile_rows(tx, hk)
    R, W, row0, col0 = padded_layout(nxe, nze, order, tile_rows)
    assert p_pad.shape == (R, W), (p_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    S = tx + 2 * hk
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if column_inj:
        lane = jnp.arange(W, dtype=jnp.int32)
        amp_in = jnp.broadcast_to(
            (lane == amp).astype(jnp.float32)[None, :], (8, W))
        # inputs: 5 slabs (inj narrow) + one-hot amp + mzp
        n_any, tail_specs = 5, [vmem, vmem]
        tail_ops = (amp_in, mzp)
        inj_scratch = [pltpu.VMEM((2, S, 128), jnp.float32)]
        n_slabs = 5
    else:
        assert win0 is not None
        amp_in = jnp.reshape(amp.astype(jnp.float32), (K, 1))
        # inputs: 4 slabs + wavelet SMEM + win0 SMEM + mzp + inj48
        n_any, tail_specs = 4, [smem, smem, vmem, vmem]
        tail_ops = (amp_in, win0, mzp, inj)
        inj_scratch = [pltpu.VMEM((S, W), jnp.float32)]
        n_slabs = 4

    from .pallas_fd import vmem_params, _use_mxu_lap
    use_mxu = _use_mxu_lap(lap_impl)
    extra = list(stream_band_inputs(cz, order, W, use_mxu)) if use_mxu else []
    cp = vmem_params(((8 + 24) * S + (4 + 2 * K) * tx) * W * 4)
    kern = functools.partial(_kstep_rec_kernel, order, hk, K, tx, n_tx, R,
                             W, cz, cx, use_mxu, column_inj)
    slab = lambda: pltpu.VMEM((2, S, W), jnp.float32)
    ins = ((p_pad, pp_pad, v2m_pad, mrow_pad, inj) if column_inj
           else (p_pad, pp_pad, v2m_pad, mrow_pad))
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[any_spec] * n_any + tail_specs
        + [vmem] * len(extra),
        out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tx, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K, tx, W), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32),
                   jax.ShapeDtypeStruct((R, W), jnp.float32),
                   jax.ShapeDtypeStruct((K, R, W), jnp.float32)],
        scratch_shapes=[slab(), slab(), slab(),
                        pltpu.VMEM((2, S, 128), jnp.float32)]
        + inj_scratch
        + [pltpu.SemaphoreType.DMA((n_slabs, 2))],
        compiler_params=cp,
        interpret=interpret,
    )(*ins, *tail_ops, *extra)
