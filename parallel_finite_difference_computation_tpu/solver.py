"""Propagation drivers: lax.scan time loops for modeling and RTM.

TPU-native rebuild of the reference's propagation-driver layer:

* ``fd_forward`` (``cuda_reference_RTM/src/fd-code.cu:247-288``) — GPU-flavor
  forward propagation with point source and top-strip taper; returns the last
  two wavefield states (the algorithmic checkpoint used for backward
  reconstruction).
* ``fd_back`` (``fd-code.cu:290-341``) — dual propagation: the source field
  is regenerated *backwards in time* from the two saved snapshots (no taper;
  relies on the random-boundary quasi-reversibility) while the receiver field
  is propagated with time-reversed observed data injected at the receiver
  row, with on-device cross-correlation imaging each step.
* the CPU pipeline loops of ``mod_main`` (``dpct_gpu_rtm_domain_division/
  src/mod_main.cpp:140-174``) and ``rtm_main`` (``src/rtm_main.cpp:158-247``)
  — Gaussian/point source, all-edge or top-strip taper, seismogram recording,
  full-wavefield storage and post-hoc imaging.

Where the reference swaps device pointers each step (``fd-code.cu:260-262``)
we thread ``(p, pp)`` functionally through ``lax.scan``; where it round-trips
host<->device per shot (``write_buffers``) everything here stays in
HBM/VMEM for the whole job. Double-buffer swaps are free under XLA (aliased
buffers), and the whole step fuses into a few kernels.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import numerics
from .config import Params
from .ops.stencil import (
    laplacian, leapfrog, inject_point, inject_gaussian,
    inject_receivers, imaging_correlation,
)

__all__ = ["FDContext", "forward_modeling", "fd_forward", "fd_back",
           "rtm_shot_snapshot", "rtm_shot_full", "rtm_shot_checkpointed",
           "forward_modeling_tiled", "backward_recorded_tiled",
           "rtm_shot_full_tiled", "rtm_shot_snapshot_tiled",
           "backward_recorded"]

_F = np.float32


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash for jit static arg
class FDContext:
    """Static per-run context: derived constants for the propagation loops.

    Bundles what the reference scatters across ``fd_init``/``taper_init``
    globals (``fd-code.cu:146-224``, ``functions.c:361-379``).
    """

    nxe: int
    nze: int
    nt: int
    nxb: int
    nzb: int
    order: int
    dt2: float                 # dt*dt, float32
    coefs_x: np.ndarray        # (order+1,) premultiplied by 1/dx^2
    coefs_z: np.ndarray        # (order+1,) premultiplied by 1/dz^2
    mask_top: np.ndarray       # (nxe, nze) top-strip taper multiplier (K3)
    mask_all: np.ndarray       # (nxe, nze) all-edge taper multiplier
    source_patch: np.ndarray   # (7, 7) Gaussian injection patch

    @property
    def nx(self) -> int:
        return self.nxe - 2 * self.nxb

    @property
    def nz(self) -> int:
        return self.nze - 2 * self.nzb

    @staticmethod
    def create(nx: int, nz: int, nt: int, dx: float, dz: float, dt: float,
               order: int = 8, nxb: int = 40, nzb: int = 40,
               fac: float = 0.7, exact_taper: bool = True) -> "FDContext":
        """Build a context from base (unextended) grid dims.

        ``exact_taper`` selects the taper-profile formula: True for the GPU
        suite (``functions.c:361-379``), False for the CPU pipeline's
        ``fac``-scaled variant (``taper.c:25-45``).
        """
        nxe, nze = nx + 2 * nxb, nz + 2 * nzb
        cx, cz = numerics.scaled_coefficients(order, dx, dz)
        tx = numerics.taper_profile(nxb, fac, exact=exact_taper)
        tz = numerics.taper_profile(nzb, fac, exact=exact_taper)
        return FDContext(
            nxe=nxe, nze=nze, nt=nt, nxb=nxb, nzb=nzb, order=order,
            dt2=float(_F(dt) * _F(dt)),
            coefs_x=cx, coefs_z=cz,
            mask_top=numerics.taper_mask_top(nxe, nze, nxb, nzb, tx, tz),
            mask_all=numerics.taper_mask_all(nxe, nze, nxb, nzb, tx, tz),
            source_patch=numerics.gaussian_source_patch(),
        )

    @staticmethod
    def from_params(p: Params, exact_taper: bool = True) -> "FDContext":
        return FDContext.create(p.nx, p.nz, p.nt, p.dx, p.dz, p.dt,
                                order=p.order, nxb=p.nxb, nzb=p.nzb,
                                fac=p.fac, exact_taper=exact_taper)

    def zero_field(self):
        return jnp.zeros((self.nxe, self.nze), jnp.float32)


def _fd_update(ctx: FDContext, p, pp, v2):
    """One fused Laplacian + leapfrog update (K1+K2; CPU ``fd_step``,
    ``timestep/fd.c:24-46``)."""
    lap = laplacian(p, jnp.asarray(ctx.coefs_x), jnp.asarray(ctx.coefs_z),
                    ctx.order)
    return leapfrog(p, pp, v2, lap, jnp.float32(ctx.dt2))


# --------------------------------------------------------------------------
# CPU-pipeline-flavor loop (mod_main / rtm_main): update -> inject -> taper
# -> record -> swap
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ctx", "source", "taper", "record",
                                   "progress"))
def forward_modeling(ctx: FDContext, v2, wavelet, sx, sz, gz,
                     source: str = "gaussian", taper: str = "all",
                     record: str = "trace", progress: bool = False):
    """Forward modeling producing synthetic shot data — ``mod_main``'s time
    loop (``mod_main.cpp:146-168``) and ``rtm_main``'s forward half
    (``rtm_main.cpp:166-188``).

    Per step: leapfrog update, source injection into the *new* field, taper
    both fields, record from the *old* (time-t) field post-taper, swap.

    record="trace": (nt, nx) seismogram of row ``gz`` interior —
    ``data[is][ix][it] = P[ix+nxb][gz]`` (``mod_main.cpp:159-161``).
    record="wavefield": (nt, nx, nz) interior wavefield (``rtm_main.cpp:
    177-181``). record="none": no per-step output.

    Returns ``(p, pp, recorded)`` where (p, pp) are the final carry fields.
    """
    mask = jnp.asarray(ctx.mask_all if taper == "all" else ctx.mask_top)
    patch = jnp.asarray(ctx.source_patch)

    def step(carry, xs):
        it, amp = xs
        p, pp = carry
        if progress:
            # observability parity with the reference's per-100-step echo
            # (mod_main.cpp:163, fd-code.cu:283)
            jax.lax.cond((it + 1) % 100 == 0,
                         lambda: jax.debug.print("* it = {} / {}",
                                                 it + 1, ctx.nt),
                         lambda: None)
        pp = _fd_update(ctx, p, pp, v2)
        if source == "gaussian":
            pp = inject_gaussian(pp, sx, sz, amp, patch)
        else:
            pp = inject_point(pp, sx, sz, amp)
        pp = pp * mask
        p = p * mask
        if record == "trace":
            out = jax.lax.dynamic_slice(p, (ctx.nxb, gz), (ctx.nx, 1))[:, 0]
        elif record == "wavefield":
            out = jax.lax.slice(p, (ctx.nxb, ctx.nzb),
                                (ctx.nxe - ctx.nxb, ctx.nze - ctx.nzb))
        else:
            out = None
        return (pp, p), out

    init = (ctx.zero_field(), ctx.zero_field())
    (p, pp), rec = jax.lax.scan(step, init,
                                (jnp.arange(ctx.nt), wavelet))
    return p, pp, rec


@partial(jax.jit, static_argnames=("ctx", "source", "taper", "record",
                                   "tile_rows", "interpret", "block_k",
                                   "lap_impl"))
def forward_modeling_tiled(ctx: FDContext, v2, wavelet, sx, sz, gz,
                           source: str = "gaussian", taper: str = "all",
                           record: str = "trace", tile_rows: int = 64,
                           interpret: bool = False, block_k: int = 1,
                           lap_impl=None):
    """:func:`forward_modeling` for grids beyond VMEM: the per-step
    Laplacian+leapfrog+taper is ONE fused HBM-streaming Pallas
    pass (:func:`..ops.pallas_stream.fd_step_padded`) on the fixed-point
    padded layout, carried directly by the scan — no per-step pad/slice.
    O(1)-cell source injection and trace recording stay in XLA. Matches
    the lax path to float rounding (the injected cells see
    ``u*m + a*patch*m`` instead of ``(u + a*patch)*m``).

    ``record="wavefield"`` streams the (nx, nz) interior of the tapered
    time-t field to an HBM (nt, nx, nz) output each step (``rtm_main.cpp:
    177-181``) — the single-chip beyond-VMEM tier of the full-wavefield
    ``rtm_main`` flavor (see :func:`rtm_shot_full_tiled`).

    ``block_k > 1`` switches to the temporal-blocking kernels
    (:func:`..ops.pallas_stream.fd_kstep_padded` /
    :func:`..ops.pallas_stream.fd_kstep_rec_padded`): K fused steps per
    HBM pass — source injection, taper and recording move in-kernel —
    breaking the per-step tier's DMA-bound ceiling (wavefield recording
    writes K full tapered frames per pass).

    Returns ``(p, pp, recorded)`` shaped exactly like
    :func:`forward_modeling`.
    """
    from .ops.pallas_stream import (fd_step_padded, padded_layout,
                                    to_padded, from_padded)
    from .ops.pallas_fd import resolve_lap_impl
    lap_impl = resolve_lap_impl(ctx, lap_impl)
    if record not in ("trace", "wavefield", "none"):
        raise ValueError(f"unknown record mode {record!r}")
    if block_k > 1:
        return _forward_modeling_kblocked(ctx, v2, wavelet, sx, sz, gz,
                                          source, taper, record, tile_rows,
                                          interpret, block_k, lap_impl)
    order = ctx.order
    R, W, row0, col0 = padded_layout(ctx.nxe, ctx.nze, order, tile_rows)
    v2_pad = to_padded(v2, order, tile_rows)
    mask_pad = to_padded(
        jnp.asarray(ctx.mask_all if taper == "all" else ctx.mask_top),
        order, tile_rows)
    if source == "gaussian":
        patch = jnp.asarray(ctx.source_patch)
    else:
        patch = jnp.ones((1, 1), jnp.float32)
    r = patch.shape[0] // 2

    def step(carry, amp):
        p, pp = carry
        pn, ppn = fd_step_padded(p, pp, v2_pad, mask_pad,
                                 ctx.coefs_x, ctx.coefs_z, order,
                                 ctx.nxe, ctx.nze, ctx.dt2, tile_rows,
                                 interpret=interpret, lap_impl=lap_impl)
        # masked injection into the *new* field (reference order is
        # update -> inject -> taper; the mask factors in per cell)
        px, pz = row0 + sx - r, col0 + sz - r
        msl = jax.lax.dynamic_slice(mask_pad, (px, pz), patch.shape)
        sub = jax.lax.dynamic_slice(ppn, (px, pz), patch.shape)
        ppn = jax.lax.dynamic_update_slice(ppn, sub + amp * patch * msl,
                                           (px, pz))
        if record == "trace":
            out = jax.lax.dynamic_slice(
                pn, (row0 + ctx.nxb, col0 + gz), (ctx.nx, 1))[:, 0]
        elif record == "wavefield":
            out = jax.lax.slice(
                pn, (row0 + ctx.nxb, col0 + ctx.nzb),
                (row0 + ctx.nxb + ctx.nx, col0 + ctx.nzb + ctx.nz))
        else:
            out = None
        return (ppn, pn), out

    zero = jnp.zeros((R, W), jnp.float32)
    (p, pp), rec = jax.lax.scan(step, (zero, zero), wavelet)
    return (from_padded(p, ctx.nxe, ctx.nze, order, tile_rows),
            from_padded(pp, ctx.nxe, ctx.nze, order, tile_rows), rec)


def _forward_modeling_kblocked(ctx: FDContext, v2, wavelet, sx, sz, gz,
                               source: str, taper: str, record: str,
                               tile_rows: int, interpret: bool,
                               block_k: int, lap_impl=None):
    """Temporal-blocking body of :func:`forward_modeling_tiled`
    (``block_k > 1``): scan over nt//K K-step HBM passes
    (:func:`..ops.pallas_stream.fd_kstep_padded`), plus one tail pass for
    ``nt % K``. Injection/taper/recording semantics match the per-step
    driver exactly (update -> inject -> taper order of ``fd-code.cu``;
    the recorded trace is the tapered time-t field's receiver column,
    extracted in-kernel by an exact one-hot reduce). With
    ``record="wavefield"`` each pass writes its K tapered time-t frames
    from VMEM (:func:`..ops.pallas_stream.fd_kstep_rec_padded`,
    ``rtm_main.cpp:177-181``)."""
    from .ops.pallas_stream import (fd_kstep_padded, fd_kstep_rec_padded,
                                    mask_ramps, separable_mask_operands,
                                    injection_window,
                                    padded_layout, to_padded, from_padded)
    from .ops.stencil import lap_interior_mask
    order = ctx.order
    tr = tile_rows
    R, W, row0, col0 = padded_layout(ctx.nxe, ctx.nze, order, tr)
    v2m_pad = to_padded(
        v2 * ctx.dt2 * jnp.asarray(lap_interior_mask(ctx.nxe, ctx.nze,
                                                     order)), order, tr)
    # the mask streams as its separable ramps; the full padded mask is
    # only an XLA-level temp for pre-tapering the injection window
    mask_pad = to_padded(
        jnp.asarray(ctx.mask_all if taper == "all" else ctx.mask_top),
        order, tr)
    mrow_pad, mzp = separable_mask_operands(
        *mask_ramps(ctx.mask_all, ctx.mask_top,
                    "all" if taper == "all" else "top", ctx.nzb),
        order, tr)
    if source == "gaussian":
        patch = jnp.asarray(ctx.source_patch)
    else:
        patch = jnp.ones((1, 1), jnp.float32)
    r = patch.shape[0] // 2
    inj48, win0 = injection_window(patch, row0 + sx - r, col0 + sz - r,
                                   ctx.nxe, ctx.nze, order, tr,
                                   mask_pad=mask_pad)

    nt = wavelet.shape[0]
    K = int(block_k)
    npass, tail = nt // K, nt % K

    def one_pass(p, pp, wchunk, k):
        if record == "wavefield":
            pn, ppn, frames = fd_kstep_rec_padded(
                p, pp, v2m_pad, mrow_pad, mzp, inj48, wchunk,
                ctx.coefs_x, ctx.coefs_z, order, ctx.nxe, ctx.nze, k,
                column_inj=False, win0=win0, tile_rows=tr,
                interpret=interpret, lap_impl=lap_impl)
            out = jax.lax.slice(
                frames, (0, row0 + ctx.nxb, col0 + ctx.nzb),
                (k, row0 + ctx.nxb + ctx.nx, col0 + ctx.nzb + ctx.nz))
            return pn, ppn, out
        pn, ppn, rec = fd_kstep_padded(
            p, pp, v2m_pad, mrow_pad, mzp, inj48, win0, wchunk, col0 + gz,
            ctx.coefs_x, ctx.coefs_z, order, ctx.nxe, ctx.nze, k, tr,
            interpret=interpret, lap_impl=lap_impl)
        # rec lane k = step-k receiver column over rows; valid rows are
        # the interior content rows
        tr_chunk = jax.lax.slice(rec, (row0 + ctx.nxb, 0),
                                 (row0 + ctx.nxb + ctx.nx, k))
        return pn, ppn, tr_chunk

    def step(carry, wchunk):
        p, pp = carry
        pn, ppn, tr_chunk = one_pass(p, pp, wchunk, K)
        return (pn, ppn), tr_chunk

    zero = jnp.zeros((R, W), jnp.float32)
    (p, pp), recs = jax.lax.scan(step, (zero, zero),
                                 wavelet[:npass * K].reshape(npass, K))
    if record == "wavefield":
        # (npass, K, nx, nz) -> (npass*K, nx, nz)
        rec = recs.reshape(npass * K, ctx.nx, ctx.nz)
        if tail:
            p, pp, fr = one_pass(p, pp, wavelet[npass * K:], tail)
            rec = jnp.concatenate([rec, fr], axis=0)
        out = rec
    else:
        # (npass, nx, K) -> (npass, K, nx) -> (npass*K, nx)
        rec = jnp.transpose(recs, (0, 2, 1)).reshape(npass * K, ctx.nx)
        if tail:
            p, pp, tr_chunk = one_pass(p, pp, wavelet[npass * K:], tail)
            rec = jnp.concatenate([rec, jnp.transpose(tr_chunk)], axis=0)
        out = rec if record == "trace" else None
    return (from_padded(p, ctx.nxe, ctx.nze, order, tr),
            from_padded(pp, ctx.nxe, ctx.nze, order, tr), out)


@partial(jax.jit, static_argnames=("ctx", "tile_rows", "interpret",
                                   "block_k", "lap_impl"))
def rtm_shot_snapshot_tiled(ctx: FDContext, v2, wavelet, dobs, sx, sz, gz,
                            tile_rows: int = 64, interpret: bool = False,
                            block_k: int = 1, lap_impl=None):
    """:func:`rtm_shot_snapshot` for grids beyond VMEM: every full-grid
    pass of the GPU-suite shot body streams through the fused padded-layout
    kernels (:mod:`..ops.pallas_stream`) — forward taper-first steps, the
    untapered source reconstruction, and the receiver step with the K5
    column injection and K6 imaging folded in. O(1)-cell point injection
    and the two snapshot seeds stay in XLA. Returns the (nx, nz) image.

    ``block_k > 1`` switches to the temporal-blocking kernels
    (:func:`..ops.pallas_stream.fd_kstep_gpu_fwd_padded` /
    :func:`..ops.pallas_stream.fd_kstep_gpu_bwd_padded`): K fused steps
    per HBM pass — injection, taper, and the K6 image accumulation move
    in-kernel — breaking the per-step tier's DMA-bound ceiling."""
    from .ops.pallas_fd import resolve_lap_impl
    lap_impl = resolve_lap_impl(ctx, lap_impl)
    if block_k > 1:
        return _rtm_snapshot_kblocked(ctx, v2, wavelet, dobs, sx, sz, gz,
                                      tile_rows, interpret, block_k,
                                      lap_impl)
    from .ops.pallas_stream import (fd_update_padded, fd_step_gpu_padded,
                                    padded_layout, to_padded, from_padded)
    order = ctx.order
    tr = tile_rows
    R, W, row0, col0 = padded_layout(ctx.nxe, ctx.nze, order, tr)
    v2_pad = to_padded(v2, order, tr)
    mask_pad = to_padded(jnp.asarray(ctx.mask_top), order, tr)
    zero = jnp.zeros((R, W), jnp.float32)

    def gpu_step(y, x, **kw):
        return fd_step_gpu_padded(y, x, v2_pad, mask_pad,
                                  ctx.coefs_x, ctx.coefs_z, order,
                                  ctx.nxe, ctx.nze, ctx.dt2,
                                  nxb=ctx.nxb, nzb=ctx.nzb, nx=ctx.nx,
                                  nz=ctx.nz, gz=gz, tile_rows=tr,
                                  interpret=interpret, lap_impl=lap_impl,
                                  **kw)

    # forward: swap -> taper(top) -> update -> point source (fd_forward)
    def fwd(carry, amp):
        p, pp = carry
        pn, ppn = gpu_step(pp, p)
        ppn = ppn.at[row0 + sx, col0 + sz].add(amp)
        return (pn, ppn), None

    (p, pp), _ = jax.lax.scan(fwd, (zero, zero), wavelet)
    snap0_pad, snap1_pad = p, pp

    # backward: untapered source reconstruction seeded from the snapshots,
    # tapered receiver field with K5 injection, K6 imaging (fd_back)
    inj = dobs[:, ::-1].T  # (nt, nx)

    def bwd(carry, xs):
        it, inj_t = xs
        p, pp, pr, ppr, im = carry
        ppn = jax.lax.cond(
            it >= 2,
            lambda: fd_update_padded(p, pp, v2_pad, ctx.coefs_x,
                                     ctx.coefs_z, order, ctx.nxe, ctx.nze,
                                     ctx.dt2, tr, interpret=interpret,
                                     lap_impl=lap_impl),
            lambda: jnp.where(it == 0, snap1_pad, snap0_pad))
        p_new, pp_new = ppn, p
        scol = jnp.zeros((R, 128), jnp.float32).at[
            row0 + ctx.nxb:row0 + ctx.nxb + ctx.nx, 0].set(inj_t)
        prn, pprn, imn = gpu_step(pr, ppr, sism_col=scol, imloc_pad=im,
                                  imsrc_pad=p_new)
        return (p_new, pp_new, pprn, prn, imn), None

    init = (zero, zero, zero, zero, zero)
    xs = (jnp.arange(ctx.nt), inj)
    (_, _, _, _, im), _ = jax.lax.scan(bwd, init, xs)
    return jax.lax.slice(im, (row0 + ctx.nxb, col0 + ctx.nzb),
                         (row0 + ctx.nxb + ctx.nx,
                          col0 + ctx.nzb + ctx.nz))


def _rtm_snapshot_kblocked(ctx: FDContext, v2, wavelet, dobs, sx, sz, gz,
                           tile_rows: int, interpret: bool, block_k: int,
                           lap_impl=None):
    """Temporal-blocking body of :func:`rtm_shot_snapshot_tiled`
    (``block_k > 1``): the forward scans nt//K K-step passes
    (:func:`..ops.pallas_stream.fd_kstep_gpu_fwd_padded`) plus a tail;
    the backward seeds steps 0-1 from the snapshots through the per-step
    kernel (``fd-code.cu:311-315``'s it<2 branch), then scans K-step
    passes of the dual-field kernel
    (:func:`..ops.pallas_stream.fd_kstep_gpu_bwd_padded`) whose K5
    operand packs the K time-reversed trace rows into lanes [0, K)."""
    from .ops.pallas_stream import (fd_kstep_gpu_fwd_padded,
                                    fd_kstep_gpu_bwd_padded,
                                    fd_step_gpu_padded, mask_ramps,
                                    separable_mask_operands,
                                    injection_window,
                                    padded_layout, to_padded, from_padded)
    from .ops.stencil import lap_interior_mask
    order = ctx.order
    tr = tile_rows
    K = int(block_k)
    R, W, row0, col0 = padded_layout(ctx.nxe, ctx.nze, order, tr)
    v2_pad = to_padded(v2, order, tr)
    v2m_pad = to_padded(
        v2 * ctx.dt2 * jnp.asarray(lap_interior_mask(ctx.nxe, ctx.nze,
                                                     order)), order, tr)
    mask_pad = to_padded(jnp.asarray(ctx.mask_top), order, tr)
    mrow_pad, mzp = separable_mask_operands(
        *mask_ramps(ctx.mask_all, ctx.mask_top, "top", ctx.nzb), order, tr)
    # raw one-hot point source (not tapered, fd-code.cu:295) as a window
    point48, win0 = injection_window(
        jnp.ones((1, 1), jnp.float32), row0 + sx, col0 + sz,
        ctx.nxe, ctx.nze, order, tr)
    zero = jnp.zeros((R, W), jnp.float32)
    nt = ctx.nt

    def fwd_pass(carry, wchunk, k):
        p, pp = carry
        return fd_kstep_gpu_fwd_padded(
            p, pp, v2m_pad, mrow_pad, mzp, point48, win0, wchunk,
            ctx.coefs_x, ctx.coefs_z, order, ctx.nxe, ctx.nze, k, tr,
            interpret=interpret, lap_impl=lap_impl)

    npass, tail = nt // K, nt % K
    (p, pp), _ = jax.lax.scan(
        lambda c, w: (fwd_pass(c, w, K), None), (zero, zero),
        wavelet[:npass * K].reshape(npass, K))
    if tail:
        p, pp = fwd_pass((p, pp), wavelet[npass * K:], tail)
    snap0_pad, snap1_pad = p, pp

    inj = dobs[:, ::-1].T  # (nt, nx)

    def seed_step(carry, ppn, inj_t):
        # it<2: the source reconstruction is seeded from the snapshots;
        # the receiver step (with K5+K6) runs through the per-step kernel
        p, pp, pr, ppr, im = carry
        p_new, pp_new = ppn, p
        scol = jnp.zeros((R, 128), jnp.float32).at[
            row0 + ctx.nxb:row0 + ctx.nxb + ctx.nx, 0].set(inj_t)
        prn, pprn, imn = fd_step_gpu_padded(
            pr, ppr, v2_pad, mask_pad, ctx.coefs_x, ctx.coefs_z, order,
            ctx.nxe, ctx.nze, ctx.dt2, nxb=ctx.nxb, nzb=ctx.nzb,
            nx=ctx.nx, nz=ctx.nz, gz=gz, sism_col=scol, imloc_pad=im,
            imsrc_pad=p_new, tile_rows=tr, interpret=interpret,
            lap_impl=lap_impl)
        return (p_new, pp_new, pprn, prn, imn)

    carry = (zero, zero, zero, zero, zero)
    carry = seed_step(carry, snap1_pad, inj[0])
    carry = seed_step(carry, snap0_pad, inj[1])

    def bwd_pass(carry, inj_k, k):
        p, pp, pr, ppr, im = carry
        # (k, nx) trace rows -> lanes [0, k) of the (R, 128) K5 operand
        sism = jnp.zeros((R, 128), jnp.float32).at[
            row0 + ctx.nxb:row0 + ctx.nxb + ctx.nx, 0:k].set(inj_k.T)
        return fd_kstep_gpu_bwd_padded(
            p, pp, pr, ppr, v2m_pad, mrow_pad, mzp, sism, im, col0 + gz,
            ctx.coefs_x, ctx.coefs_z, order, ctx.nxe, ctx.nze,
            ctx.nzb, ctx.nz, ctx.nxb, ctx.nx, k, tr, interpret=interpret,
            lap_impl=lap_impl)

    nb = nt - 2
    npb, tailb = nb // K, nb % K
    carry, _ = jax.lax.scan(
        lambda c, rows: (bwd_pass(c, rows, K), None), carry,
        inj[2:2 + npb * K].reshape(npb, K, ctx.nx))
    if tailb:
        carry = bwd_pass(carry, inj[2 + npb * K:], tailb)
    im = carry[4]
    return jax.lax.slice(im, (row0 + ctx.nxb, col0 + ctx.nzb),
                         (row0 + ctx.nxb + ctx.nx,
                          col0 + ctx.nzb + ctx.nz))


def _injection_rows(ctx, dobs, next_shot_first):
    """Receiver-injection rows with ``rtm_main``'s flat-read quirk.

    The reference injects ``dobs[is][ix][nt-it]`` (``rtm_main.cpp:202``) — an
    off-by-one that at it=0 reads one float past each trace. In the
    contiguous ``alloc3float`` block that is the *next trace's first sample*;
    for the shot's last trace it crosses into the **next shot's** first
    sample (``dobs[is+1][0][0]``), passed here as ``next_shot_first`` (0 for
    the last shot, whose read lands past the whole block — glibc serves the
    large block from a fresh mmap, so the overrun reads 0 in practice).
    Returns (nt, nx) rows with ``inj[it] = flat_dobs[ix*nt + nt - it]``.
    """
    dpad = jnp.concatenate([dobs, jnp.zeros((dobs.shape[0], 1), dobs.dtype)],
                           axis=1)
    inj = dpad[:, ::-1][:, :ctx.nt].T  # (nt, nx): inj[it] = dpad[:, nt-it]
    oob_row = jnp.concatenate([
        dobs[1:, 0], jnp.full((1,), next_shot_first, dobs.dtype)])
    return inj.at[0].set(oob_row)


@partial(jax.jit, static_argnames=("ctx", "x_off_quirk"))
def backward_recorded(ctx: FDContext, v2, dobs, gz, x_off_quirk: bool = True,
                      next_shot_first=0.0):
    """``rtm_main``'s backward half (``rtm_main.cpp:196-220``): propagate the
    time-reversed observed data and record the full interior wavefield.

    ``dobs`` is (nx, nt); the it=0 injection reproduces the reference's
    flat-read quirk including the cross-shot sample (see
    :func:`_injection_rows`). The reference also offsets x by ``nzb`` where
    ``nxb`` is meant (``rtm_main.cpp:202``) — benign when nxb==nzb;
    ``x_off_quirk`` keeps the reference behavior.

    Returns ``(p, pp, rwf)`` with rwf shaped (nt, nx, nz).
    """
    mask = jnp.asarray(ctx.mask_top)
    x_off = ctx.nzb if x_off_quirk else ctx.nxb
    inj = _injection_rows(ctx, dobs, next_shot_first)

    def step(carry, inj_t):
        p, pp = carry
        pp = _fd_update(ctx, p, pp, v2)
        pp = inject_receivers(pp, inj_t, x_off, gz)
        pp = pp * mask
        p = p * mask
        out = jax.lax.slice(p, (ctx.nxb, ctx.nzb),
                            (ctx.nxe - ctx.nxb, ctx.nze - ctx.nzb))
        return (pp, p), out

    init = (ctx.zero_field(), ctx.zero_field())
    (p, pp), rwf = jax.lax.scan(step, init, inj)
    return p, pp, rwf


@partial(jax.jit, static_argnames=("ctx", "x_off_quirk"))
def rtm_shot_full(ctx: FDContext, v2, wavelet, dobs, sx, sz, gz,
                  x_off_quirk: bool = True, next_shot_first=0.0):
    """Full-wavefield-storage RTM for one shot — the ``rtm_main`` pipeline
    (``rtm_main.cpp:158-247``): forward with stored source wavefield,
    backward with stored receiver wavefield, then the zero-lag correlation
    ``imloc[ix][iz] = sum_it swf[nt-it-1]*rwf[it]`` (``rtm_main.cpp:223-229``).

    This is the memory-heavy end of the checkpoint/recompute spectrum; see
    :func:`rtm_shot_snapshot` for the 2-snapshot end.
    Returns the (nx, nz) per-shot image.
    """
    _, _, swf = forward_modeling(ctx, v2, wavelet, sx, sz, gz,
                                 source="point", taper="top",
                                 record="wavefield")
    _, _, rwf = backward_recorded(ctx, v2, dobs, gz, x_off_quirk=x_off_quirk,
                                  next_shot_first=next_shot_first)
    return jnp.sum(swf[::-1] * rwf, axis=0)


@partial(jax.jit, static_argnames=("ctx", "x_off_quirk", "tile_rows",
                                   "interpret", "block_k", "lap_impl"))
def backward_recorded_tiled(ctx: FDContext, v2, dobs, gz,
                            x_off_quirk: bool = True, next_shot_first=0.0,
                            tile_rows: int = 64, interpret: bool = False,
                            block_k: int = 1, lap_impl=None):
    """:func:`backward_recorded` for grids beyond VMEM: each step is one
    fused HBM-streaming pass (:func:`..ops.pallas_stream.fd_step_padded`,
    top-strip mask) on the padded layout; the K5 receiver-row injection
    (incl. the flat-read and nzb-offset quirks) and the interior wavefield
    recording stay in XLA. Returns ``(p, pp, rwf)`` shaped like
    :func:`backward_recorded`.

    ``block_k > 1``: K fused steps per HBM pass
    (:func:`..ops.pallas_stream.fd_kstep_rec_padded` in column-injection
    mode — the K time-reversed trace rows pre-masked and packed into
    lanes [0, K); the K tapered frames written from VMEM)."""
    from .ops.pallas_fd import resolve_lap_impl
    lap_impl = resolve_lap_impl(ctx, lap_impl)
    from .ops.pallas_stream import (fd_step_padded, padded_layout,
                                    to_padded, from_padded)
    order = ctx.order
    R, W, row0, col0 = padded_layout(ctx.nxe, ctx.nze, order, tile_rows)
    v2_pad = to_padded(v2, order, tile_rows)
    mask_pad = to_padded(jnp.asarray(ctx.mask_top), order, tile_rows)
    x_off = ctx.nzb if x_off_quirk else ctx.nxb
    inj = _injection_rows(ctx, dobs, next_shot_first)
    if block_k > 1:
        return _backward_recorded_kblocked(ctx, v2, inj, gz, x_off,
                                           tile_rows, interpret, block_k,
                                           lap_impl)

    def step(carry, inj_t):
        p, pp = carry
        pn, ppn = fd_step_padded(p, pp, v2_pad, mask_pad,
                                 ctx.coefs_x, ctx.coefs_z, order,
                                 ctx.nxe, ctx.nze, ctx.dt2, tile_rows,
                                 interpret=interpret, lap_impl=lap_impl)
        # masked receiver-row injection (reference order is update ->
        # inject -> taper; the mask factors in per cell)
        r0, c0 = row0 + x_off, col0 + gz
        msl = jax.lax.dynamic_slice(mask_pad, (r0, c0), (ctx.nx, 1))
        sub = jax.lax.dynamic_slice(ppn, (r0, c0), (ctx.nx, 1))
        ppn = jax.lax.dynamic_update_slice(
            ppn, sub + inj_t[:, None] * msl, (r0, c0))
        out = jax.lax.slice(pn, (row0 + ctx.nxb, col0 + ctx.nzb),
                            (row0 + ctx.nxb + ctx.nx,
                             col0 + ctx.nzb + ctx.nz))
        return (ppn, pn), out

    zero = jnp.zeros((R, W), jnp.float32)
    (p, pp), rwf = jax.lax.scan(step, (zero, zero), inj)
    return (from_padded(p, ctx.nxe, ctx.nze, order, tile_rows),
            from_padded(pp, ctx.nxe, ctx.nze, order, tile_rows), rwf)


def _backward_recorded_kblocked(ctx: FDContext, v2, inj, gz, x_off,
                                tile_rows: int, interpret: bool,
                                block_k: int, lap_impl=None):
    """Temporal-blocking body of :func:`backward_recorded_tiled`: the K5
    operand packs K time-reversed trace rows (quirks already applied by
    :func:`_injection_rows`) into lanes [0, K), premultiplied by the
    taper column at the receiver lane (the per-step driver's masked
    injection, ``rtm_main.cpp:196-220``)."""
    from .ops.pallas_stream import (fd_kstep_rec_padded, mask_ramps,
                                    separable_mask_operands, padded_layout,
                                    to_padded, from_padded)
    from .ops.stencil import lap_interior_mask
    order = ctx.order
    tr = tile_rows
    K = int(block_k)
    R, W, row0, col0 = padded_layout(ctx.nxe, ctx.nze, order, tr)
    v2m_pad = to_padded(
        v2 * ctx.dt2 * jnp.asarray(lap_interior_mask(ctx.nxe, ctx.nze,
                                                     order)), order, tr)
    mask_pad = to_padded(jnp.asarray(ctx.mask_top), order, tr)
    mrow_pad, mzp = separable_mask_operands(
        *mask_ramps(ctx.mask_all, ctx.mask_top, "top", ctx.nzb), order, tr)
    cgz = col0 + gz
    mask_col = jax.lax.dynamic_slice(mask_pad, (0, cgz), (R, 1))
    nt = ctx.nt
    npass, tail = nt // K, nt % K

    def one_pass(p, pp, inj_k, k):
        # (k, nx) trace rows -> lanes [0, k), pre-masked by the taper
        # column at the receiver lane
        sismm = jnp.zeros((R, 128), jnp.float32).at[
            row0 + x_off:row0 + x_off + ctx.nx, 0:k].set(
                jnp.transpose(inj_k)) * mask_col
        pn, ppn, frames = fd_kstep_rec_padded(
            p, pp, v2m_pad, mrow_pad, mzp, sismm, cgz,
            ctx.coefs_x, ctx.coefs_z, order, ctx.nxe, ctx.nze, k,
            column_inj=True, tile_rows=tr, interpret=interpret,
            lap_impl=lap_impl)
        out = jax.lax.slice(
            frames, (0, row0 + ctx.nxb, col0 + ctx.nzb),
            (k, row0 + ctx.nxb + ctx.nx, col0 + ctx.nzb + ctx.nz))
        return pn, ppn, out

    def step(carry, inj_k):
        p, pp = carry
        pn, ppn, out = one_pass(p, pp, inj_k, K)
        return (pn, ppn), out

    zero = jnp.zeros((R, W), jnp.float32)
    (p, pp), recs = jax.lax.scan(step, (zero, zero),
                                 inj[:npass * K].reshape(npass, K, ctx.nx))
    rwf = recs.reshape(npass * K, ctx.nx, ctx.nz)
    if tail:
        p, pp, fr = one_pass(p, pp, inj[npass * K:], tail)
        rwf = jnp.concatenate([rwf, fr], axis=0)
    return (from_padded(p, ctx.nxe, ctx.nze, order, tr),
            from_padded(pp, ctx.nxe, ctx.nze, order, tr), rwf)


@partial(jax.jit, static_argnames=("ctx", "x_off_quirk", "tile_rows",
                                   "interpret", "block_k", "lap_impl"))
def rtm_shot_full_tiled(ctx: FDContext, v2, wavelet, dobs, sx, sz, gz,
                        x_off_quirk: bool = True, next_shot_first=0.0,
                        tile_rows: int = 64, interpret: bool = False,
                        block_k: int = 1, lap_impl=None):
    """:func:`rtm_shot_full` (the full-wavefield ``rtm_main`` flavor,
    ``rtm_main.cpp:158-247``) for grids beyond VMEM: both propagations
    stream through the fused padded-layout kernel while the two (nt, nx,
    nz) wavefield stores live in HBM. Memory is bounded by the wavefield
    stores (2*nt*nx*nz*4 B), exactly like the reference's ``swf``/``rwf``
    design point (``rtm_main.cpp:141-142``). Returns the (nx, nz) image."""
    _, _, swf = forward_modeling_tiled(ctx, v2, wavelet, sx, sz, gz,
                                       source="point", taper="top",
                                       record="wavefield",
                                       tile_rows=tile_rows,
                                       interpret=interpret,
                                       block_k=block_k, lap_impl=lap_impl)
    _, _, rwf = backward_recorded_tiled(ctx, v2, dobs, gz,
                                        x_off_quirk=x_off_quirk,
                                        next_shot_first=next_shot_first,
                                        tile_rows=tile_rows,
                                        interpret=interpret,
                                        block_k=block_k,
                                        lap_impl=lap_impl)
    return jnp.sum(swf[::-1] * rwf, axis=0)


@partial(jax.jit, static_argnames=("ctx", "save_every", "x_off_quirk"))
def rtm_shot_checkpointed(ctx: FDContext, v2, wavelet, dobs, sx, sz, gz,
                          save_every: int = 32, x_off_quirk: bool = True,
                          next_shot_first=0.0):
    """Save-every-k checkpointed RTM for one shot — the middle of the
    checkpoint/recompute spectrum whose two ends the reference implements:
    ``rtm_main`` stores all nt wavefields (``rtm_main.cpp:141,177-181``;
    :func:`rtm_shot_full`) and ``fd_back`` stores two and relies on
    random-boundary reversibility (``fd-code.cu:502-507``;
    :func:`rtm_shot_snapshot`).

    The forward source propagation stores its state every ``save_every``
    steps (O(nt/k) grids); during imaging, each k-step source segment is
    recomputed from its checkpoint (O(k) grid buffer) and correlated against
    the receiver field propagating in reverse-data order. Identical op
    sequence to :func:`rtm_shot_full` => numerically identical image, with
    peak memory ~ (nt/k + k) grids instead of 2*nt, for one extra forward
    propagation of compute.

    ``save_every`` must divide nt.
    """
    nt, k = ctx.nt, save_every
    if nt % k:
        raise ValueError(f"save_every={k} must divide nt={nt}")
    S = nt // k
    mask = jnp.asarray(ctx.mask_top)

    def fwd_step(carry, amp):
        # rtm_main forward flavor: point source, top taper, record interior
        p, pp = carry
        pp = _fd_update(ctx, p, pp, v2)
        pp = inject_point(pp, sx, sz, amp)
        pp = pp * mask
        p = p * mask
        rec = jax.lax.slice(p, (ctx.nxb, ctx.nzb),
                            (ctx.nxe - ctx.nxb, ctx.nze - ctx.nzb))
        return (pp, p), rec

    wav_seg = wavelet.reshape(S, k)

    def fwd_segment(carry, amps):
        ckpt = carry
        new_carry, _ = jax.lax.scan(fwd_step, carry, amps)
        return new_carry, ckpt  # emit the segment-START state

    init = (ctx.zero_field(), ctx.zero_field())
    _, ckpts = jax.lax.scan(fwd_segment, init, wav_seg)  # pytree of (S, ...)

    # receiver injection rows, identical to backward_recorded (incl. the
    # it=0 flat-read OOB quirk and its cross-shot sample)
    x_off = ctx.nzb if x_off_quirk else ctx.nxb
    inj = _injection_rows(ctx, dobs, next_shot_first).reshape(S, k, -1)

    def bwd_step(carry, xs):
        inj_t, swf_frame = xs
        pr, ppr, imloc = carry
        ppr = _fd_update(ctx, pr, ppr, v2)
        ppr = inject_receivers(ppr, inj_t, x_off, gz)
        ppr = ppr * mask
        pr = pr * mask
        rec = jax.lax.slice(pr, (ctx.nxb, ctx.nzb),
                            (ctx.nxe - ctx.nxb, ctx.nze - ctx.nzb))
        imloc = imloc + swf_frame * rec
        return (ppr, pr, imloc), None

    # scan over segments in reverse source order, with explicit recompute
    def bwd_segment(carry, xs):
        ckpt, amps, inj_seg = xs
        _, buf = jax.lax.scan(fwd_step, ckpt, amps)  # (k, nx, nz)
        carry, _ = jax.lax.scan(bwd_step, carry, (inj_seg, buf[::-1]))
        return carry, None

    imloc0 = jnp.zeros((ctx.nx, ctx.nz), jnp.float32)
    binit = (ctx.zero_field(), ctx.zero_field(), imloc0)
    xs = (jax.tree.map(lambda a: a[::-1], ckpts), wav_seg[::-1], inj)
    (_, _, imloc), _ = jax.lax.scan(bwd_segment, binit, xs)
    return imloc


# --------------------------------------------------------------------------
# GPU-suite-flavor loop (fd_forward / fd_back): swap -> taper -> update -> inject
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ctx", "capture_step"))
def fd_forward(ctx: FDContext, v2, wavelet, sx, sz,
               capture_step: Optional[int] = None):
    """GPU-suite forward propagation (``fd_forward``, ``fd-code.cu:247-288``).

    Per step: swap, taper both fields (top strip), Laplacian+leapfrog, point
    source into the new field. Returns ``(p, pp[, capture])`` — the final two
    wavefield states (= ``snaps`` used to reconstruct the source field in
    :func:`fd_back`), and optionally the ``p`` field right after the update
    at step ``capture_step`` (the reference's ``file-teste`` debug dump at
    it==750, ``fd-code.cu:268-281``).
    """
    mask = jnp.asarray(ctx.mask_top)

    def step(carry, xs):
        it, amp = xs
        p, pp, cap = carry
        p, pp = pp, p
        p = p * mask
        pp = pp * mask
        pp = _fd_update(ctx, p, pp, v2)
        pp = inject_point(pp, sx, sz, amp)
        if capture_step is not None:
            cap = jnp.where(it == capture_step, p, cap)
        return (p, pp, cap), None

    xs = (jnp.arange(ctx.nt), wavelet)
    cap0 = ctx.zero_field() if capture_step is not None else jnp.float32(0.0)
    (p, pp, cap), _ = jax.lax.scan(
        step, (ctx.zero_field(), ctx.zero_field(), cap0), xs)
    if capture_step is None:
        return p, pp
    return p, pp, cap


@partial(jax.jit, static_argnames=("ctx", "return_fields"))
def fd_back(ctx: FDContext, v2, snap0, snap1, dobs, gz,
            return_fields: bool = False):
    """GPU-suite backward propagation + imaging (``fd_back``,
    ``fd-code.cu:290-341``).

    Two interleaved propagations per step: the source field is re-seeded from
    the two saved snapshots at it=0,1 and then re-propagated reverse-in-time
    *without taper* (random-boundary quasi-reversibility), while the receiver
    field is propagated with the top-strip taper and the time-reversed
    observed data ``dobs`` (nx, nt) injected along row ``gz`` (K5); the
    zero-lag correlation (K6) accumulates on-device each step.

    Returns the (nx, nz) per-shot image ``imloc``; with
    ``return_fields=True`` returns ``(imloc, p, pp, pr, ppr)`` — the final
    source-reconstruction and receiver fields, used by the upstream-norms
    diagnostic (scripts/check_upstream_norms.py) against the run-recorded
    values at ``cuda_reference_RTM/models/marmousi/input.dat:22-24``.
    """
    mask = jnp.asarray(ctx.mask_top)
    inj = dobs[:, ::-1].T  # (nt, nrec): inj[it] = dobs[:, nt-1-it]

    def step(carry, xs):
        it, inj_t = xs
        p, pp, pr, ppr, imloc = carry
        # source-field reconstruction (no taper)
        ppn = _fd_update(ctx, p, pp, v2)
        ppn = jnp.where(it == 0, snap1, jnp.where(it == 1, snap0, ppn))
        p, pp = ppn, p
        # receiver field (tapered, data-injected)
        pr = pr * mask
        ppr = ppr * mask
        pprn = _fd_update(ctx, pr, ppr, v2)
        pprn = inject_receivers(pprn, inj_t, ctx.nxb, gz)
        imloc = imaging_correlation(imloc, p, pprn, ctx.nxb, ctx.nzb)
        pr, ppr = pprn, pr
        return (p, pp, pr, ppr, imloc), None

    z = ctx.zero_field()
    imloc0 = jnp.zeros((ctx.nx, ctx.nz), jnp.float32)
    init = (z, z, z, z, imloc0)
    xs = (jnp.arange(ctx.nt), inj)
    (p, pp, pr, ppr, imloc), _ = jax.lax.scan(step, init, xs)
    if return_fields:
        return imloc, p, pp, pr, ppr
    return imloc


@partial(jax.jit, static_argnames=("ctx",))
def rtm_shot_snapshot(ctx: FDContext, v2, wavelet, dobs, sx, sz, gz):
    """Two-snapshot (checkpointed) RTM for one shot — the GPU-suite shot body
    (``fd-code.cu:480-529``): forward to get the final two states, then
    backward reconstruction + imaging. The forward source wavefield is never
    stored — the memory-light end of the checkpoint/recompute spectrum.
    Returns the (nx, nz) per-shot image."""
    p, pp = fd_forward(ctx, v2, wavelet, sx, sz)
    return fd_back(ctx, v2, p, pp, dobs, gz)
