"""x-domain-decomposed RTM with VMEM-resident multi-step Pallas kernels.

This is the fused-kernel production path for the domain division the
reference only *named* (``dpct_gpu_rtm_domain_division/``, serial code with
vestigial MPI comments at ``src/rtm_main.cpp:259-267``): the extended grid's
x axis is sharded over the mesh's ``x`` axis, and propagation runs as a
**communication-avoiding blocked scheme** — every block, each device
exchanges ``H = K*h``-wide x-halo slabs of its wavefields with neighbours
over ICI (``jax.lax.ppermute``), then advances **K time steps entirely in
VMEM** in a single Pallas kernel on the halo-extended slab. The region of
exact values shrinks by ``h = order/2`` lanes per step, so after K steps the
device's own slab is exact; the halo lanes are recomputed redundantly
instead of communicated per step (trading a little VPU work for K× fewer,
K× larger ICI messages and K× fewer kernel launches — the standard
communication-avoiding stencil trade).

Correctness relies on every *local* per-lane operation seeing the values the
owning neighbour would use, so the static operands are all halo-extended
too: the taper mask, the (lane-masked) squared velocity, the source one-hot
row, and the embedded observed-data rows. Halo lanes beyond the global grid
stay exactly zero (ppermute leaves non-targets zero; their v2 is zero), so
edge shards reproduce the unsharded kernel's zero-border Laplacian.

Per-step semantics are identical to :mod:`..ops.pallas_fd` (GPU-suite
``fd_forward``/``fd_back``, ``cuda_reference_RTM/src/fd-code.cu:247-341``),
kernels z-major ((nze, lanes), x on lanes), with the same buffer-role
alternation; K is python-unrolled with parity-aware output mapping so any
block length works (the tail block runs ``nt mod K`` steps).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.stencil import lap_in_kernel
from ..ops.pallas_fd import (_STACK_GRIDS, _VMEM_PER_CORE, vmem_params,
                             _make_lap, _mxu_band_inputs, _use_mxu_lap)
from ..solver import FDContext

__all__ = ["make_sharded_rtm_snapshot_pallas",
           "make_sharded_forward_modeling_pallas", "halo_exchange_lanes"]


def _block_vmem_params(ctx: FDContext, nxw: int, n_bufs: int,
                       interpret: bool = False):
    """Scoped-VMEM permission for a blocked domain kernel, derived the same
    way as the whole-shot kernels' `_vmem_plan`: every operand/output/
    scratch buffer is at most an (nze, nxw) f32 slab, so the working set is
    bounded by ``n_bufs`` such slabs plus the Mosaic stack-tile margin.
    A fixed 32 MiB permission OOMs the compiler's scoped-vmem stack on
    deep or wide slabs (observed: nze=2000, nxw=295, 19 buffers -> 43 MiB
    needed — slightly under the n_bufs*slab tight bound, which is the
    fail-fast threshold below).

    Raises early (before a doomed multi-minute Mosaic compile) when even
    the tight bound cannot fit the core — the remedy for a domain kernel
    is more x shards (smaller nxl), unlike the whole-shot kernels where it
    is the tiled/streaming tier."""
    slab = ctx.nze * nxw * 4
    tight = slab * n_bufs
    if tight > _VMEM_PER_CORE and not interpret:
        raise ValueError(
            f"blocked domain kernel: {n_bufs} slab buffers of "
            f"{ctx.nze}x{nxw} f32 need {tight >> 20} MiB, exceeding the "
            f"{_VMEM_PER_CORE >> 20} MiB core VMEM; use more x shards "
            f"(smaller local slab) or a smaller block_k")
    return vmem_params(slab * (n_bufs + _STACK_GRIDS))


def halo_exchange_lanes(field, H: int, axis_name: str, n_shards: int,
                        pad_to: int = 0):
    """(nze, nxl) z-major local slab -> (nze, nxl + 2H) with H lanes of halo
    from each x-neighbour; global-edge shards get zero halos (ppermute
    leaves devices that are not a target of any (src, dst) pair zeroed).
    ``pad_to``: append zero lanes up to this width (the MXU tap path wants
    128-multiple slabs; the zero tail is inert — zero mask/v2 — and only
    *adds* margin to the blocked scheme's halo-invalidation contract)."""
    nxw = field.shape[-1] + 2 * H
    parts_tail = []
    if pad_to > nxw:
        parts_tail = [jnp.zeros(field.shape[:-1] + (pad_to - nxw,),
                                field.dtype)]
    if n_shards == 1:
        z = jnp.zeros(field.shape[:-1] + (H,), field.dtype)
        return jnp.concatenate([z, field, z] + parts_tail, axis=-1)
    from_left = jax.lax.ppermute(
        field[..., -H:], axis_name, [(i, i + 1) for i in range(n_shards - 1)])
    from_right = jax.lax.ppermute(
        field[..., :H], axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    return jnp.concatenate([from_left, field, from_right] + parts_tail,
                           axis=-1)


# --------------------------------------------------------------------------
# Block kernels (z-major; lanes = nxw = nxl + 2H)
# --------------------------------------------------------------------------

def _lap_and_refs(ctx, use_mxu, rest):
    """Split the optional MXU band-matrix refs off ``rest`` and build the
    in-kernel Laplacian closure (:func:`...ops.pallas_fd._make_lap`; the
    blocked kernels are z-major too, so the band holds coefs_x)."""
    if use_mxu:
        return _make_lap(ctx, rest[:3]), rest[3:]
    return _make_lap(ctx, None), rest


def _fwd_block_kernel(ctx, sz: int, K: int, nxl: int, H: int, use_mxu: bool,
                      v2m_ref, mask_ref, src_ref, wav_ref, *rest):
    """K forward steps (fd-code.cu:259-267 semantics) on the halo-extended
    slab. Carry contract matches the sharded-lax fstep: in/out are the
    (tapered p, freshly updated pp) pair on the device's own nxl lanes."""
    lap, (p_in, pp_in, p_out, pp_out, X, Y) = _lap_and_refs(ctx, use_mxu,
                                                            rest)
    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    for k in range(K):
        dst, src = (X, Y) if k % 2 == 0 else (Y, X)
        sm = src[:, :] * mask_ref[:, :]
        dst[:, :] = (2.0 * sm - dst[:, :] * mask_ref[:, :]
                     + v2m_ref[:, :] * lap(sm))
        src[:, :] = sm
        dst[sz:sz + 1, :] += wav_ref[k, 0] * src_ref[:, :]
    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    p_out[:, :] = pX[:, H:H + nxl]
    pp_out[:, :] = pY[:, H:H + nxl]


def _bwd_block_kernel(ctx, gz: int, K: int, nxl: int, H: int, seed: bool,
                      use_mxu: bool, v2m_ref, mask_ref, dobs_ref, *refs):
    """K backward steps (fd-code.cu:302-333 semantics): source pair
    re-propagated in reverse without taper, receiver pair tapered + data
    injected, imaging delta on the device's own lanes. ``seed=True`` is the
    first block: steps 0 and 1 load the forward snapshots (passed extended)
    instead of leapfrogging."""
    lap, refs = _lap_and_refs(ctx, use_mxu, refs)
    if seed:
        (snap0_ref, snap1_ref, p_in, pp_in, pr_in, ppr_in,
         p_out, pp_out, pr_out, ppr_out, im_ref, X, Y, U, V, IM) = refs
    else:
        (p_in, pp_in, pr_in, ppr_in,
         p_out, pp_out, pr_out, ppr_out, im_ref, X, Y, U, V, IM) = refs
    ctr = slice(H, H + nxl)

    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    U[:, :] = pr_in[:, :]
    V[:, :] = ppr_in[:, :]
    # accumulate the K6 product over the FULL halo-extended width (lane-
    # aligned ops) and lane-slice ONCE per block — a per-step [H:H+nxl]
    # slice of both factors costs two unaligned lane-shift passes per step
    # (measured ~2x on the backward block); the halo lanes' products are
    # garbage but are discarded by the single final slice
    IM[:, :] = jnp.zeros_like(IM)

    for k in range(K):
        dst_s, src_s = (Y, X) if k % 2 == 0 else (X, Y)
        dst_r, src_r = (V, U) if k % 2 == 0 else (U, V)
        if seed and k == 0:
            dst_s[:, :] = snap1_ref[:, :]
        elif seed and k == 1:
            dst_s[:, :] = snap0_ref[:, :]
        else:
            s = src_s[:, :]
            dst_s[:, :] = (2.0 * s - dst_s[:, :] + v2m_ref[:, :] * lap(s))
        sm = src_r[:, :] * mask_ref[:, :]
        dst_r[:, :] = (2.0 * sm - dst_r[:, :] * mask_ref[:, :]
                       + v2m_ref[:, :] * lap(sm))
        src_r[:, :] = sm
        dst_r[gz:gz + 1, :] += dobs_ref[k:k + 1, :]
        IM[:, :] += dst_s[:, :] * dst_r[:, :]

    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    rU, rV = (U, V) if K % 2 == 0 else (V, U)
    p_out[:, :] = pX[:, ctr]
    pp_out[:, :] = pY[:, ctr]
    pr_out[:, :] = rU[:, ctr]
    ppr_out[:, :] = rV[:, ctr]
    im_ref[:, :] = IM[:, ctr]


def _mod_block_kernel(ctx, sz: int, gz: int, r: int, K: int, nxl: int,
                      H: int, use_mxu: bool,
                      v2m_ref, mask_ref, src_ref, wav_ref, *rest):
    """K forward-modeling steps (``mod_main.cpp:146-168`` semantics:
    update, inject, taper both, record row gz of the tapered old field) on
    the halo-extended slab; seismogram rows recorded on the device's own
    lanes only."""
    lap, (p_in, pp_in, seis_ref, p_out, pp_out, X, Y) = _lap_and_refs(
        ctx, use_mxu, rest)
    band = slice(sz - r, sz + r + 1)
    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    for k in range(K):
        src, dst = (X, Y) if k % 2 == 0 else (Y, X)
        p = src[:, :]
        upd = (2.0 * p - dst[:, :] + v2m_ref[:, :] * lap(p))
        dst[:, :] = upd * mask_ref[:, :]
        dst[band, :] = ((upd[band, :] + wav_ref[k, 0] * src_ref[:, :])
                        * mask_ref[band, :])
        tp = p * mask_ref[:, :]
        src[:, :] = tp
        seis_ref[k:k + 1, :] = tp[gz:gz + 1, H:H + nxl]
    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    p_out[:, :] = pX[:, H:H + nxl]
    pp_out[:, :] = pY[:, H:H + nxl]


# --------------------------------------------------------------------------
# Wrappers
# --------------------------------------------------------------------------

def make_sharded_forward_modeling_pallas(ctx: FDContext, mesh: Mesh,
                                         sz: int, gz: int,
                                         source: str = "gaussian",
                                         taper: str = "all",
                                         block_k: int = 8,
                                         interpret: bool = False,
                                         lap_impl=None):
    """Shot+x-domain-parallel forward modeling with blocked VMEM kernels —
    the fused production path for ``mod_main`` at pod scale (same
    communication-avoiding scheme as
    :func:`make_sharded_rtm_snapshot_pallas`).

    Returns ``fn(v2, sxs, wavelet) -> seis`` with ``v2`` (ns, nxe, nze),
    ``sxs`` (ns,) absolute source lanes, and ``seis`` (ns, nt, nxe)
    extended-row seismograms — the contract of
    :func:`.domain.make_sharded_forward_modeling` with positional sources.
    ``lap_impl``: see :func:`...ops.pallas_fd.rtm_snapshot_pallas` (the
    MXU tap path pads the slab to 128-multiple lanes; the zero tail is
    inert and only widens the halo-invalidation margin).
    """
    n_x = mesh.shape["x"]
    nxe_pad = -(-ctx.nxe // n_x) * n_x     # zero-pad (see RTM wrapper note)
    nxl = nxe_pad // n_x
    h = ctx.order // 2
    K = int(block_k)
    H = K * h
    if H > nxl:
        raise ValueError(
            f"halo width K*h={H} exceeds the local slab width nxl={nxl}; "
            f"lower block_k to <= {nxl // h} or use fewer x shards")
    nxw = nxl + 2 * H
    use_mxu = _use_mxu_lap(lap_impl, ctx)
    nxww = -(-nxw // 128) * 128 if use_mxu else nxw
    mxu_in = list(_mxu_band_inputs(ctx, nxww, use_mxu)) if use_mxu else []
    nb, tail = divmod(ctx.nt, K)
    gaussian = source == "gaussian"
    r = ctx.source_patch.shape[0] // 2 if gaussian else 0
    mask_glob = jnp.asarray(np.pad(
        np.asarray(ctx.mask_all if taper == "all" else ctx.mask_top),
        ((0, nxe_pad - ctx.nxe), (0, 0))))
    cp = _block_vmem_params(ctx, nxww, 10,  # 3 in + 3 out + 2 scratch + margin
                            interpret=interpret)
    slab = jax.ShapeDtypeStruct((ctx.nze, nxl), jnp.float32)

    def _call(k_steps):
        kern = functools.partial(_mod_block_kernel, ctx, sz, gz, r, k_steps,
                                 nxl, H, use_mxu)
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((k_steps, nxl), jnp.float32),
                       slab, slab),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(mxu_in)),
            scratch_shapes=[pltpu.VMEM((ctx.nze, nxww), jnp.float32)] * 2,
            compiler_params=cp,
            interpret=interpret,
        )

    def body(v2, sx, wavelet):
        row0 = jax.lax.axis_index("x") * nxl
        idx = jnp.arange(nxww)
        glob = row0 - H + idx
        valid = idx < nxw
        lane = ((glob >= h) & (glob < ctx.nxe - h)
                & valid).astype(jnp.float32)
        zrow = ((jnp.arange(ctx.nze) >= h)
                & (jnp.arange(ctx.nze) < ctx.nze - h)).astype(jnp.float32)
        mask_l = jax.lax.dynamic_slice(mask_glob, (row0, 0), (nxl, ctx.nze))
        mask_e = halo_exchange_lanes(mask_l.T, H, "x", n_x, pad_to=nxww)
        # full interior mask folded into v2 (x via lanes, z via sublanes):
        # v2m * laplacian_full == v2 * zero-bordered laplacian exactly
        v2m_e = (halo_exchange_lanes(v2.T, H, "x", n_x, pad_to=nxww)
                 * lane[None, :] * zrow[:, None] * jnp.float32(ctx.dt2))
        dx = (glob - sx).astype(jnp.float32)
        if gaussian:
            dzr = jnp.arange(-r, r + 1, dtype=jnp.float32)[:, None]
            rows = jnp.exp(-dzr * dzr - dx * dx)
            src_row = jnp.where((jnp.abs(dx) <= r) & valid[None, :], rows,
                                0.0)
        else:
            src_row = ((glob == sx) & valid).astype(jnp.float32)[None, :]
        wav2 = wavelet.reshape(ctx.nt, 1)
        zc = jnp.zeros((ctx.nze, nxl), jnp.float32)
        call_k = _call(K)

        def block(carry, xs):
            p, pp = carry
            pe = halo_exchange_lanes(p, H, "x", n_x, pad_to=nxww)
            ppe = halo_exchange_lanes(pp, H, "x", n_x, pad_to=nxww)
            seis, p2, pp2 = call_k(v2m_e, mask_e, src_row, xs, *mxu_in,
                                   pe, ppe)
            return (p2, pp2), seis

        (p, pp), seis = jax.lax.scan(block, (zc, zc),
                                     wav2[:nb * K].reshape(nb, K, 1))
        seis = seis.reshape(nb * K, nxl)
        if tail:
            call_t = _call(tail)
            pe = halo_exchange_lanes(p, H, "x", n_x, pad_to=nxww)
            ppe = halo_exchange_lanes(pp, H, "x", n_x, pad_to=nxww)
            seis_t, _, _ = call_t(v2m_e, mask_e, src_row, wav2[nb * K:],
                                  *mxu_in, pe, ppe)
            seis = jnp.concatenate([seis, seis_t], axis=0)
        return seis

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", None), P("shot"), P()),
        out_specs=P("shot", None, "x"),
        check_vma=False,
    )

    pad = nxe_pad - ctx.nxe

    @jax.jit
    def fn(v2, sxs, wavelet):
        if pad:
            v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
        out = sharded(v2, jnp.asarray(sxs, jnp.int32), wavelet)
        return out[:, :, :ctx.nxe]

    return fn


def make_sharded_rtm_snapshot_pallas(ctx: FDContext, mesh: Mesh, sz: int,
                                     gz: int, block_k: int = 8,
                                     interpret: bool = False,
                                     lap_impl=None):
    """Build a jitted shot+x-domain-parallel two-snapshot RTM whose per-
    device compute runs in VMEM-resident blocked Pallas kernels with
    ``ppermute`` halo exchange every ``block_k`` steps.

    Returns ``fn(v2, sxs, wavelet, dobs_ext) -> imloc_ext`` with ``v2``
    (ns, nxe, nze), ``sxs`` (ns,) int32 absolute source lanes, ``dobs_ext``
    (ns, nxe, nt) (from :func:`.domain.embed_dobs`), and ``imloc_ext``
    (ns, nxe, nze) extended per-shot images — the same contract as
    :func:`.domain.make_sharded_rtm_snapshot` except sources are given by
    position (``sz`` static) rather than embedded fields.

    ``nt`` must be >= 2*block_k (the first backward block seeds the two
    snapshots). Matches the per-step kernel sequence of
    ``cuda_reference_RTM/src/fd-code.cu:259-267,302-333`` decomposed over x.
    """
    n_x = mesh.shape["x"]
    nxe_pad = -(-ctx.nxe // n_x) * n_x     # zero-pad (see RTM wrapper note)
    nxl = nxe_pad // n_x
    h = ctx.order // 2
    K = int(block_k)
    H = K * h
    if H > nxl:
        raise ValueError(
            f"halo width K*h={H} exceeds the local slab width nxl={nxl}; "
            f"a single ppermute only reaches the adjacent neighbour — "
            f"lower block_k to <= {nxl // h} or use fewer x shards")
    if K < 2:
        raise ValueError("block_k must be >= 2: the first backward block "
                         "seeds BOTH snapshots (steps 0 and 1)")
    if ctx.nt < 2 * K:
        raise ValueError(f"nt={ctx.nt} < 2*block_k={2 * K}; use the lax "
                         f"path (make_sharded_rtm_snapshot) for tiny runs")
    nxw = nxl + 2 * H
    use_mxu = _use_mxu_lap(lap_impl, ctx)
    nxww = -(-nxw // 128) * 128 if use_mxu else nxw
    mxu_in = list(_mxu_band_inputs(ctx, nxww, use_mxu)) if use_mxu else []
    nb, tail = divmod(ctx.nt, K)
    mask_glob = jnp.asarray(np.pad(np.asarray(ctx.mask_top),
                                   ((0, nxe_pad - ctx.nxe), (0, 0))))
    # fwd: 5 in + 2 out + 2 scratch; bwd(seed): 9 in + 5 out + 5 scratch
    cp = _block_vmem_params(ctx, nxww, 10, interpret=interpret)
    cp_bwd = _block_vmem_params(ctx, nxww, 20, interpret=interpret)

    slab = jax.ShapeDtypeStruct((ctx.nze, nxl), jnp.float32)
    scratch_w = [pltpu.VMEM((ctx.nze, nxww), jnp.float32)]

    def _fwd_call(k_steps):
        kern = functools.partial(_fwd_block_kernel, ctx, sz, k_steps, nxl, H,
                                 use_mxu)
        return pl.pallas_call(
            kern,
            out_shape=(slab, slab),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(mxu_in)),
            scratch_shapes=scratch_w * 2,
            compiler_params=cp,
            interpret=interpret,
        )

    def _bwd_call(k_steps, seed):
        kern = functools.partial(_bwd_block_kernel, ctx, gz, k_steps, nxl, H,
                                 seed, use_mxu)
        n_in = 3 + len(mxu_in) + (2 if seed else 0) + 4
        return pl.pallas_call(
            kern,
            out_shape=(slab,) * 5,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            scratch_shapes=scratch_w * 5,  # X, Y, U, V, IM (full-width)
            compiler_params=cp_bwd,
            interpret=interpret,
        )

    def body(v2, sx, dobs_ext, wavelet):
        # ---- per-shot halo-extended static operands (z-major) ----
        row0 = jax.lax.axis_index("x") * nxl
        idx = jnp.arange(nxww)
        glob = row0 - H + idx
        valid = idx < nxw
        lane = ((glob >= h) & (glob < ctx.nxe - h)
                & valid).astype(jnp.float32)
        zrow = ((jnp.arange(ctx.nze) >= h)
                & (jnp.arange(ctx.nze) < ctx.nze - h)).astype(jnp.float32)
        mask_l = jax.lax.dynamic_slice(mask_glob, (row0, 0),
                                       (nxl, ctx.nze))
        mask_e = halo_exchange_lanes(mask_l.T, H, "x", n_x, pad_to=nxww)
        v2_e = halo_exchange_lanes(v2.T, H, "x", n_x, pad_to=nxww)
        # full interior mask folded into v2 (x via lanes, z via sublanes):
        # v2m * laplacian_full == v2 * zero-bordered laplacian exactly
        v2m_e = (v2_e * lane[None, :] * zrow[:, None]
                 * jnp.float32(ctx.dt2))
        src_row = ((glob == sx) & valid).astype(jnp.float32)[None, :]
        dobs_e = halo_exchange_lanes(dobs_ext.T, H, "x", n_x,
                                     pad_to=nxww)  # (nt, nxww)
        wav2 = wavelet.reshape(ctx.nt, 1)

        zc = jnp.zeros((ctx.nze, nxl), jnp.float32)

        # ---- forward: nb blocks of K + tail ----
        fwd_k = _fwd_call(K)

        def fwd_block(carry, xs):
            p, pp = carry
            pe = halo_exchange_lanes(p, H, "x", n_x, pad_to=nxww)
            ppe = halo_exchange_lanes(pp, H, "x", n_x, pad_to=nxww)
            p2, pp2 = fwd_k(v2m_e, mask_e, src_row, xs, *mxu_in, pe, ppe)
            return (p2, pp2), None

        wav_blocks = wav2[:nb * K].reshape(nb, K, 1)
        (p, pp), _ = jax.lax.scan(fwd_block, (zc, zc), wav_blocks)
        if tail:
            fwd_t = _fwd_call(tail)
            pe = halo_exchange_lanes(p, H, "x", n_x, pad_to=nxww)
            ppe = halo_exchange_lanes(pp, H, "x", n_x, pad_to=nxww)
            p, pp = fwd_t(v2m_e, mask_e, src_row, wav2[nb * K:], *mxu_in,
                          pe, ppe)
        # carry contract == lax fstep: (snap0, snap1) = final (p, pp)
        snap0, snap1 = p, pp

        # ---- backward: seeded first block, then generic blocks + tail ----
        # receiver rows, pre-reversed: row it = dobs[:, nt-1-it]
        inj = dobs_e[::-1]  # (nt, nxww)
        bwd0 = _bwd_call(K, seed=True)
        bwd_k = _bwd_call(K, seed=False)

        snap0_e = halo_exchange_lanes(snap0, H, "x", n_x, pad_to=nxww)
        snap1_e = halo_exchange_lanes(snap1, H, "x", n_x, pad_to=nxww)

        def exchange4(p, pp, pr, ppr):
            return (halo_exchange_lanes(p, H, "x", n_x, pad_to=nxww),
                    halo_exchange_lanes(pp, H, "x", n_x, pad_to=nxww),
                    halo_exchange_lanes(pr, H, "x", n_x, pad_to=nxww),
                    halo_exchange_lanes(ppr, H, "x", n_x, pad_to=nxww))

        p, pp, pr, ppr, im = bwd0(v2m_e, mask_e, inj[:K], *mxu_in,
                                  snap0_e, snap1_e,
                                  *exchange4(zc, zc, zc, zc))

        def bwd_block(carry, xs):
            p, pp, pr, ppr, im = carry
            p2, pp2, pr2, ppr2, d = bwd_k(v2m_e, mask_e, xs, *mxu_in,
                                          *exchange4(p, pp, pr, ppr))
            return (p2, pp2, pr2, ppr2, im + d), None

        nb_b, tail_b = divmod(ctx.nt - K, K)
        if nb_b:
            blocks = inj[K:K + nb_b * K].reshape(nb_b, K, nxww)
            (p, pp, pr, ppr, im), _ = jax.lax.scan(
                bwd_block, (p, pp, pr, ppr, im), blocks)
        if tail_b:
            bwd_t = _bwd_call(tail_b, seed=False)
            _, _, _, _, d = bwd_t(v2m_e, mask_e, inj[ctx.nt - tail_b:],
                                  *mxu_in, *exchange4(p, pp, pr, ppr))
            im = im + d

        # K6 interior restriction distributes over the step sum exactly
        im_mask = ((glob[H:H + nxl] >= ctx.nxb)
                   & (glob[H:H + nxl] < ctx.nxe - ctx.nxb))
        zin = (jnp.arange(ctx.nze) >= ctx.nzb) & (jnp.arange(ctx.nze)
                                                  < ctx.nze - ctx.nzb)
        im = im * (zin[:, None] & im_mask[None, :]).astype(jnp.float32)
        return im.T  # back to x-major (nxl, nze)

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, 0, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", None), P("shot"), P("shot", "x", None),
                  P()),
        out_specs=P("shot", "x", None),
        check_vma=False,
    )

    pad = nxe_pad - ctx.nxe

    @jax.jit
    def fn(v2, sxs, wavelet, dobs_ext):
        if pad:
            v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
            dobs_ext = jnp.pad(dobs_ext, ((0, 0), (0, pad), (0, 0)))
        out = sharded(v2, jnp.asarray(sxs, jnp.int32), dobs_ext, wavelet)
        return out[:, :ctx.nxe, :]

    return fn
