"""2D (x, z)-domain-decomposed RTM with VMEM-resident blocked Pallas kernels.

The production fast path for the pod-scale tier of the domain division the
reference only *named* (``dpct_gpu_rtm_domain_division/``, vestigial MPI
comments at ``src/rtm_main.cpp:259-267``): BOTH grid axes shard over the
mesh's ``(x, z)`` axes, and propagation runs as the same
**communication-avoiding blocked scheme** as the 1D tier
(:mod:`.domain_pallas`) — every block, each device exchanges ``H = K*h``-wide
halo slabs of its wavefields with its four axis neighbours over ICI
(``ppermute`` per axis; corners fill transitively: the x exchange ships the
already-z-extended edge columns, so diagonal-neighbour data arrives in one
round), then advances **K time steps entirely in VMEM** in a single Pallas
kernel on the double-halo-extended slab. The region of exact values shrinks
by ``h = order/2`` cells per step from every slab edge (the iterated
plus-stencil's dependency cone — an L1 ball — is contained in the square
halo), so after K steps the device's own (nzl, nxl) tile is exact.

What changes vs the 1D tier: z is sharded too, so the acquisition rows
(source depth ``sz``, receiver depth ``gz``) land at *per-device* local rows.
Kernels receive the clamped local row index as an SMEM scalar and inject /
record with a dynamic **sublane** slice (Mosaic supports dynamic sublane
offsets; the z-major layout was chosen for exactly this property). Ownership
is halo-inclusive for injections (any device whose extended slab contains
the row must apply it so its halo evolves exactly like the neighbour's own
rows — the operand rows are zeroed elsewhere) and exclusive for the
seismogram read (exactly one z shard contributes; the rows are summed with
a ``psum`` over ``z``).

Per-step numerics are identical to the 1D blocked kernels and the whole-shot
kernels (``cuda_reference_RTM/src/fd-code.cu:247-341`` semantics): same tap
association order, taper/injection operand order, and ``lap_impl``
("vpu" exact / "mxu" / "mxu6") lowerings via the shared
:func:`..ops.pallas_fd._make_lap`.
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

from ..ops.pallas_fd import (_STACK_GRIDS, _VMEM_PER_CORE, vmem_params,
                             _mxu_band_inputs, _use_mxu_lap)
from .domain_pallas import halo_exchange_lanes, _lap_and_refs
from .domain2d import halo_exchange_axis
from ..solver import FDContext

__all__ = ["make_sharded_rtm_snapshot_2d_pallas",
           "make_sharded_forward_modeling_2d_pallas", "halo_exchange_2d"]


def halo_exchange_2d(field, Hz: int, Hx: int, n_z: int, n_x: int,
                     pad_to: int = 0):
    """(nzl, nxl) z-major local tile -> (nzl + 2Hz, nxl + 2Hx [+lane pad])
    with per-axis halo rows/lanes from every axis neighbour. Two-stage
    exchange: z (sublanes) first, then x (lanes) of the already-z-extended
    tile — the x messages carry the z-halo rows, so corner
    (diagonal-neighbour) cells arrive without a dedicated diagonal
    ``ppermute``. Global-edge halos are zero (``ppermute`` non-target
    fill), matching the unsharded kernels' zero border. An axis with a
    zero halo width is skipped entirely (single-shard axes: the tile edge
    IS the global edge, where the zero border is already correct)."""
    ez = (halo_exchange_axis(field, Hz, 0, "z", n_z) if Hz else field)
    if Hx == 0:
        if pad_to > ez.shape[-1]:
            ez = jnp.pad(ez, ((0, 0), (0, pad_to - ez.shape[-1])))
        return ez
    return halo_exchange_lanes(ez, Hx, "x", n_x, pad_to=pad_to)


def _block2_vmem_params(nzw: int, nxw: int, n_bufs: int,
                        interpret: bool = False):
    """Scoped-VMEM permission for a 2D blocked kernel (same model as
    :func:`.domain_pallas._block_vmem_params`): every buffer is at most a
    (nzw, nxw) f32 slab. Fails fast when even the tight bound cannot fit
    the core — the remedy is more shards on either axis (smaller tile) or
    a smaller ``block_k`` (narrower halo)."""
    slab = nzw * nxw * 4
    tight = slab * n_bufs
    if tight > _VMEM_PER_CORE and not interpret:
        raise ValueError(
            f"2D blocked domain kernel: {n_bufs} slab buffers of "
            f"{nzw}x{nxw} f32 need {tight >> 20} MiB, exceeding the "
            f"{_VMEM_PER_CORE >> 20} MiB core VMEM; use more x/z shards "
            f"(smaller local tile) or a smaller block_k")
    return vmem_params(slab * (n_bufs + _STACK_GRIDS))


# --------------------------------------------------------------------------
# Block kernels (z-major; sublanes = nzw = nzl + 2H, lanes = nxw = nxl + 2H)
# --------------------------------------------------------------------------

def _fwd2_block_kernel(ctx, K: int, nzl: int, nxl: int, Hz: int, Hx: int,
                       use_mxu: bool,
                       zi_ref, v2m_ref, mask_ref, src_ref, wav_ref, *rest):
    """K forward steps (fd-code.cu:259-267 semantics) on the double-halo-
    extended slab. ``zi_ref`` (SMEM) holds the clamped local source row;
    ``src_ref`` is a (1, nxw) one-hot row zeroed on devices whose extended
    slab does not contain depth ``sz``, so the dynamic-row add is inert
    there."""
    lap, (p_in, pp_in, p_out, pp_out, X, Y) = _lap_and_refs(ctx, use_mxu,
                                                            rest)
    szl = zi_ref[0]
    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    for k in range(K):
        dst, src = (X, Y) if k % 2 == 0 else (Y, X)
        sm = src[:, :] * mask_ref[:, :]
        dst[:, :] = (2.0 * sm - dst[:, :] * mask_ref[:, :]
                     + v2m_ref[:, :] * lap(sm))
        src[:, :] = sm
        dst[pl.ds(szl, 1), :] += wav_ref[k, 0] * src_ref[:, :]
    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    p_out[:, :] = pX[Hz:Hz + nzl, Hx:Hx + nxl]
    pp_out[:, :] = pY[Hz:Hz + nzl, Hx:Hx + nxl]


def _bwd2_block_kernel(ctx, K: int, nzl: int, nxl: int, Hz: int, Hx: int,
                       seed: bool,
                       use_mxu: bool,
                       zi_ref, v2m_ref, mask_ref, dobs_ref, *refs):
    """K backward steps (fd-code.cu:302-333 semantics): source pair
    re-propagated in reverse without taper, receiver pair tapered +
    data-injected at the dynamic local row ``gzl`` (``zi_ref``; the
    observed-data rows are zeroed on non-containing z shards), imaging
    accumulated over the full extended slab and sliced once. ``seed=True``
    is the first block: steps 0 and 1 load the forward snapshots."""
    lap, refs = _lap_and_refs(ctx, use_mxu, refs)
    if seed:
        (snap0_ref, snap1_ref, p_in, pp_in, pr_in, ppr_in,
         p_out, pp_out, pr_out, ppr_out, im_ref, X, Y, U, V, IM) = refs
    else:
        (p_in, pp_in, pr_in, ppr_in,
         p_out, pp_out, pr_out, ppr_out, im_ref, X, Y, U, V, IM) = refs
    gzl = zi_ref[0]

    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    U[:, :] = pr_in[:, :]
    V[:, :] = ppr_in[:, :]
    # K6 product accumulated over the FULL extended slab (aligned ops) and
    # sliced ONCE per block — same rationale as the 1D tier: per-step
    # unaligned slices of both factors cost two extra shift passes per step
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
        dst_r[pl.ds(gzl, 1), :] += dobs_ref[k:k + 1, :]
        IM[:, :] += dst_s[:, :] * dst_r[:, :]

    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    rU, rV = (U, V) if K % 2 == 0 else (V, U)
    p_out[:, :] = pX[Hz:Hz + nzl, Hx:Hx + nxl]
    pp_out[:, :] = pY[Hz:Hz + nzl, Hx:Hx + nxl]
    pr_out[:, :] = rU[Hz:Hz + nzl, Hx:Hx + nxl]
    ppr_out[:, :] = rV[Hz:Hz + nzl, Hx:Hx + nxl]
    im_ref[:, :] = IM[Hz:Hz + nzl, Hx:Hx + nxl]


def _mod2_block_kernel(ctx, K: int, nzl: int, nxl: int, Hz: int, Hx: int,
                       use_mxu: bool,
                       zi_ref, v2m_ref, mask_ref, srcf_ref, wav_ref, *rest):
    """K forward-modeling steps (``mod_main.cpp:146-168`` semantics:
    update, inject, taper both, record row gz of the tapered old field).
    The injection operand is a full extended-slab field (Gaussian patch or
    one-hot embedded; zero elsewhere) — a z-sharded patch can straddle the
    tile cut, so the 1D tier's static band rewrite does not apply; the
    full-slab FMA adds one vector pass per step and matches the lax path's
    association exactly where the field is nonzero. The seismogram row is
    read at the dynamic local row ``gzl`` (``zi_ref``); the wrapper keeps
    exactly one z shard's rows (``psum`` over z)."""
    lap, (p_in, pp_in, seis_ref, p_out, pp_out, X, Y) = _lap_and_refs(
        ctx, use_mxu, rest)
    gzl = zi_ref[0]
    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    for k in range(K):
        src, dst = (X, Y) if k % 2 == 0 else (Y, X)
        p = src[:, :]
        upd = (2.0 * p - dst[:, :] + v2m_ref[:, :] * lap(p))
        dst[:, :] = (upd + wav_ref[k, 0] * srcf_ref[:, :]) * mask_ref[:, :]
        src[:, :] = p * mask_ref[:, :]
        seis_ref[k:k + 1, :] = src[pl.ds(gzl, 1), Hx:Hx + nxl]
    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    p_out[:, :] = pX[Hz:Hz + nzl, Hx:Hx + nxl]
    pp_out[:, :] = pY[Hz:Hz + nzl, Hx:Hx + nxl]


# --------------------------------------------------------------------------
# Shared wrapper pieces
# --------------------------------------------------------------------------

def _tile2(ctx: FDContext, mesh: Mesh, block_k: int, lap_impl,
           force_halo: bool = False):
    """Resolve the 2D blocked tiling: local tile (nzl, nxl), per-axis halo
    widths Hz/Hx (= K*h on axes with neighbours, 0 on single-shard axes —
    their tile edge is the global edge, so no redundant recomputation is
    paid; ``force_halo`` keeps both halos regardless, the benchmark's
    halo-cost proxy), extended slab (nzw, nxww) with the MXU lane pad, and
    zero-padded global sizes. Raises when a halo cannot fit a one-hop
    exchange on its axis."""
    n_x, n_z = mesh.shape["x"], mesh.shape["z"]
    nxe_pad = -(-ctx.nxe // n_x) * n_x
    nze_pad = -(-ctx.nze // n_z) * n_z
    nxl = nxe_pad // n_x
    nzl = nze_pad // n_z
    h = ctx.order // 2
    K = int(block_k)
    Hx = K * h if (n_x > 1 or force_halo) else 0
    Hz = K * h if (n_z > 1 or force_halo) else 0
    if Hx > nxl or Hz > nzl:
        raise ValueError(
            f"halo width K*h={K * h} exceeds the local tile ({nzl}x{nxl});"
            f" a single ppermute only reaches the adjacent neighbour — "
            f"lower block_k to <= {min(nxl, nzl) // h} or use fewer shards")
    use_mxu = _use_mxu_lap(lap_impl, ctx)
    nzw = nzl + 2 * Hz
    nxw = nxl + 2 * Hx
    nxww = -(-nxw // 128) * 128 if use_mxu else nxw
    return n_x, n_z, nxe_pad, nze_pad, nxl, nzl, h, K, Hz, Hx, nzw, nxw, \
        nxww, use_mxu


def _static_operands_2d(ctx, mask_glob, v2, n_x, n_z, nxl, nzl, h, Hz, Hx,
                        nzw, nxw, nxww):
    """Per-device halo-extended static operands (z-major): the taper mask,
    the interior-masked dt2-folded v2, and the global-coordinate index
    vectors used to build injection/ownership operands."""
    xi = jax.lax.axis_index("x")
    zi = jax.lax.axis_index("z")
    x0 = xi * nxl
    z0 = zi * nzl
    idx = jnp.arange(nxww)
    glob_x = x0 - Hx + idx
    valid_x = idx < nxw
    lane = ((glob_x >= h) & (glob_x < ctx.nxe - h)
            & valid_x).astype(jnp.float32)
    glob_z = z0 - Hz + jnp.arange(nzw)
    zrow = ((glob_z >= h) & (glob_z < ctx.nze - h)).astype(jnp.float32)
    mask_l = jax.lax.dynamic_slice(mask_glob, (x0, z0), (nxl, nzl))
    mask_e = halo_exchange_2d(mask_l.T, Hz, Hx, n_z, n_x, pad_to=nxww)
    v2_e = halo_exchange_2d(v2.T, Hz, Hx, n_z, n_x, pad_to=nxww)
    # full interior mask folded into v2 (x via lanes, z via sublanes):
    # v2m * laplacian_full == v2 * zero-bordered laplacian exactly
    v2m_e = v2_e * lane[None, :] * zrow[:, None] * jnp.float32(ctx.dt2)
    return x0, z0, glob_x, valid_x, glob_z, mask_e, v2m_e


def _local_row(z_target: int, z0, H: int, nzw: int):
    """Clamped local (extended-slab) row index of global depth ``z_target``
    plus the halo-inclusive containment flag: ``on`` is True exactly when
    the extended slab contains the row (then ``row``'s global position is
    ``z_target``)."""
    j = z_target - z0 + H
    row = jnp.clip(j, 0, nzw - 1)
    on = (j >= 0) & (j < nzw)
    return row.astype(jnp.int32).reshape(1), on


def _ext_lanes(a, Hx: int, n_x: int, pad_to: int):
    """Lane-axis halo extension of a (rows, nxl) operand (zero-width safe:
    pads only)."""
    if Hx == 0:
        if pad_to > a.shape[-1]:
            a = jnp.pad(a, ((0, 0), (0, pad_to - a.shape[-1])))
        return a
    return halo_exchange_lanes(a, Hx, "x", n_x, pad_to=pad_to)


def _pad_mask_glob(ctx, px, pz, mask_np):
    return jnp.asarray(np.pad(np.asarray(mask_np), ((0, px), (0, pz))))


# --------------------------------------------------------------------------
# Wrappers
# --------------------------------------------------------------------------

def make_sharded_rtm_snapshot_2d_pallas(ctx: FDContext, mesh: Mesh, sz: int,
                                        gz: int, block_k: int = 8,
                                        interpret: bool = False,
                                        lap_impl=None,
                                        force_halo: bool = False):
    """Shot + 2D (x, z)-domain-parallel two-snapshot RTM with blocked VMEM
    Pallas kernels and per-axis ``ppermute`` halo exchange every
    ``block_k`` steps.

    Same contract as :func:`.domain_pallas.make_sharded_rtm_snapshot_pallas`
    (and :func:`.domain2d.make_sharded_rtm_snapshot_2d` with positional
    sources): ``fn(v2, sxs, wavelet, dobs_ext) -> imloc_ext`` with ``v2``
    (ns, nxe, nze), ``sxs`` (ns,) int32 absolute source lanes, ``dobs_ext``
    (ns, nxe, nt) (:func:`.domain.embed_dobs`), and ``imloc_ext``
    (ns, nxe, nze) extended per-shot images. ``nt`` must be >= 2*block_k.

    Single-shard axes carry no halo (their tile edge is the global edge);
    ``force_halo=True`` keeps both K*h halos regardless — the benchmark's
    halo-redundancy proxy on small meshes.
    """
    (n_x, n_z, nxe_pad, nze_pad, nxl, nzl, h, K, Hz, Hx, nzw, nxw, nxww,
     use_mxu) = _tile2(ctx, mesh, block_k, lap_impl, force_halo)
    if K < 2:
        raise ValueError("block_k must be >= 2: the first backward block "
                         "seeds BOTH snapshots (steps 0 and 1)")
    if ctx.nt < 2 * K:
        raise ValueError(f"nt={ctx.nt} < 2*block_k={2 * K}; use the lax "
                         f"path (make_sharded_rtm_snapshot_2d)")
    px, pz = nxe_pad - ctx.nxe, nze_pad - ctx.nze
    mxu_in = list(_mxu_band_inputs(ctx, nxww, use_mxu)) if use_mxu else []
    nb, tail = divmod(ctx.nt, K)
    mask_glob = _pad_mask_glob(ctx, px, pz, ctx.mask_top)
    cp = _block2_vmem_params(nzw, nxww, 10, interpret=interpret)
    cp_bwd = _block2_vmem_params(nzw, nxww, 20, interpret=interpret)

    tile = jax.ShapeDtypeStruct((nzl, nxl), jnp.float32)
    scratch_w = [pltpu.VMEM((nzw, nxww), jnp.float32)]
    smem_i32 = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _fwd_call(k_steps):
        kern = functools.partial(_fwd2_block_kernel, ctx, k_steps, nzl, nxl,
                                 Hz, Hx, use_mxu)
        return pl.pallas_call(
            kern,
            out_shape=(tile, tile),
            in_specs=[smem_i32] + [vspec] * 3 + [smem_i32]
            + [vspec] * (2 + len(mxu_in)),
            scratch_shapes=scratch_w * 2,
            compiler_params=cp,
            interpret=interpret,
        )

    def _bwd_call(k_steps, seed):
        kern = functools.partial(_bwd2_block_kernel, ctx, k_steps, nzl, nxl,
                                 Hz, Hx, seed, use_mxu)
        n_in = 3 + len(mxu_in) + (2 if seed else 0) + 4
        return pl.pallas_call(
            kern,
            out_shape=(tile,) * 5,
            in_specs=[smem_i32] + [vspec] * n_in,
            scratch_shapes=scratch_w * 5,  # X, Y, U, V, IM (full slab)
            compiler_params=cp_bwd,
            interpret=interpret,
        )

    def body(v2, sx, dobs_ext, wavelet):
        (x0, z0, glob_x, valid_x, glob_z, mask_e, v2m_e
         ) = _static_operands_2d(ctx, mask_glob, v2, n_x, n_z, nxl, nzl, h,
                                 Hz, Hx, nzw, nxw, nxww)
        szl, s_on = _local_row(sz, z0, Hz, nzw)
        gzl, g_on = _local_row(gz, z0, Hz, nzw)
        src_row = ((glob_x == sx) & valid_x
                   & s_on).astype(jnp.float32)[None, :]
        dobs_e = (_ext_lanes(dobs_ext.T, Hx, n_x, nxww)
                  * g_on.astype(jnp.float32))        # (nt, nxww)
        wav2 = wavelet.reshape(ctx.nt, 1)
        zc = jnp.zeros((nzl, nxl), jnp.float32)

        def ext(f):
            return halo_exchange_2d(f, Hz, Hx, n_z, n_x, pad_to=nxww)

        # ---- forward: nb blocks of K + tail ----
        fwd_k = _fwd_call(K)

        def fwd_block(carry, xs):
            p, pp = carry
            p2, pp2 = fwd_k(szl, v2m_e, mask_e, src_row, xs, *mxu_in,
                            ext(p), ext(pp))
            return (p2, pp2), None

        (p, pp), _ = jax.lax.scan(fwd_block, (zc, zc),
                                  wav2[:nb * K].reshape(nb, K, 1))
        if tail:
            fwd_t = _fwd_call(tail)
            p, pp = fwd_t(szl, v2m_e, mask_e, src_row, wav2[nb * K:],
                          *mxu_in, ext(p), ext(pp))
        snap0, snap1 = p, pp

        # ---- backward: seeded first block, then generic blocks + tail ----
        inj = dobs_e[::-1]  # (nt, nxww): row it = dobs[:, nt-1-it]
        bwd0 = _bwd_call(K, seed=True)
        bwd_k = _bwd_call(K, seed=False)

        def ext4(p, pp, pr, ppr):
            return ext(p), ext(pp), ext(pr), ext(ppr)

        p, pp, pr, ppr, im = bwd0(gzl, v2m_e, mask_e, inj[:K], *mxu_in,
                                  ext(snap0), ext(snap1),
                                  *ext4(zc, zc, zc, zc))

        def bwd_block(carry, xs):
            p, pp, pr, ppr, im = carry
            p2, pp2, pr2, ppr2, d = bwd_k(gzl, v2m_e, mask_e, xs, *mxu_in,
                                          *ext4(p, pp, pr, ppr))
            return (p2, pp2, pr2, ppr2, im + d), None

        nb_b, tail_b = divmod(ctx.nt - K, K)
        if nb_b:
            blocks = inj[K:K + nb_b * K].reshape(nb_b, K, nxww)
            (p, pp, pr, ppr, im), _ = jax.lax.scan(
                bwd_block, (p, pp, pr, ppr, im), blocks)
        if tail_b:
            bwd_t = _bwd_call(tail_b, seed=False)
            _, _, _, _, d = bwd_t(gzl, v2m_e, mask_e,
                                  inj[ctx.nt - tail_b:], *mxu_in,
                                  *ext4(p, pp, pr, ppr))
            im = im + d

        # K6 interior restriction distributes over the step sum exactly
        im_x = ((glob_x[Hx:Hx + nxl] >= ctx.nxb)
                & (glob_x[Hx:Hx + nxl] < ctx.nxe - ctx.nxb))
        im_z = ((glob_z[Hz:Hz + nzl] >= ctx.nzb)
                & (glob_z[Hz:Hz + nzl] < ctx.nze - ctx.nzb))
        im = im * (im_z[:, None] & im_x[None, :]).astype(jnp.float32)
        return im.T  # back to x-major (nxl, nzl)

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, 0, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", "z"), P("shot"), P("shot", "x", None),
                  P()),
        out_specs=P("shot", "x", "z"),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, sxs, wavelet, dobs_ext):
        if px or pz:
            v2 = jnp.pad(v2, ((0, 0), (0, px), (0, pz)))
            dobs_ext = jnp.pad(dobs_ext, ((0, 0), (0, px), (0, 0)))
        out = sharded(v2, jnp.asarray(sxs, jnp.int32), dobs_ext, wavelet)
        return out[:, :ctx.nxe, :ctx.nze]

    return fn


def make_sharded_forward_modeling_2d_pallas(ctx: FDContext, mesh: Mesh,
                                            sz: int, gz: int,
                                            source: str = "gaussian",
                                            taper: str = "all",
                                            block_k: int = 8,
                                            interpret: bool = False,
                                            lap_impl=None,
                                            force_halo: bool = False):
    """Shot + 2D (x, z)-domain-parallel forward modeling with blocked VMEM
    kernels — ``mod_main`` at pod scale. Same contract as
    :func:`.domain_pallas.make_sharded_forward_modeling_pallas`:
    ``fn(v2, sxs, wavelet) -> seis`` with ``v2`` (ns, nxe, nze), ``sxs``
    (ns,) absolute source lanes, ``seis`` (ns, nt, nxe) extended-row
    seismograms. Single-shard axes carry no halo; ``force_halo=True``
    keeps both (see the RTM wrapper)."""
    (n_x, n_z, nxe_pad, nze_pad, nxl, nzl, h, K, Hz, Hx, nzw, nxw, nxww,
     use_mxu) = _tile2(ctx, mesh, block_k, lap_impl, force_halo)
    px, pz = nxe_pad - ctx.nxe, nze_pad - ctx.nze
    mxu_in = list(_mxu_band_inputs(ctx, nxww, use_mxu)) if use_mxu else []
    nb, tail = divmod(ctx.nt, K)
    gaussian = source == "gaussian"
    r = ctx.source_patch.shape[0] // 2 if gaussian else 0
    mask_glob = _pad_mask_glob(
        ctx, px, pz, ctx.mask_all if taper == "all" else ctx.mask_top)
    cp = _block2_vmem_params(nzw, nxww, 10, interpret=interpret)
    tile = jax.ShapeDtypeStruct((nzl, nxl), jnp.float32)
    smem_i32 = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _call(k_steps):
        kern = functools.partial(_mod2_block_kernel, ctx, k_steps, nzl, nxl,
                                 Hz, Hx, use_mxu)
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((k_steps, nxl), jnp.float32),
                       tile, tile),
            in_specs=[smem_i32] + [vspec] * 3 + [smem_i32]
            + [vspec] * (2 + len(mxu_in)),
            scratch_shapes=[pltpu.VMEM((nzw, nxww), jnp.float32)] * 2,
            compiler_params=cp,
            interpret=interpret,
        )

    def body(v2, sx, wavelet):
        (x0, z0, glob_x, valid_x, glob_z, mask_e, v2m_e
         ) = _static_operands_2d(ctx, mask_glob, v2, n_x, n_z, nxl, nzl, h,
                                 Hz, Hx, nzw, nxw, nxww)
        gzl, _ = _local_row(gz, z0, Hz, nzw)
        dxc = (glob_x - sx).astype(jnp.float32)
        dzc = (glob_z - sz).astype(jnp.float32)
        if gaussian:
            # joint exp(-(dz^2 + dx^2)) — the reference ptsrc patch values
            # (ptsrc.c:51-57), NOT the separable product (float exp does
            # not factor bitwise)
            field = jnp.exp(-(dzc[:, None] ** 2 + dxc[None, :] ** 2))
            srcf = jnp.where((jnp.abs(dzc) <= r)[:, None]
                             & ((jnp.abs(dxc) <= r) & valid_x)[None, :],
                             field, 0.0)
        else:
            srcf = ((dzc == 0)[:, None]
                    & ((dxc == 0) & valid_x)[None, :]).astype(jnp.float32)
        wav2 = wavelet.reshape(ctx.nt, 1)
        zc = jnp.zeros((nzl, nxl), jnp.float32)
        call_k = _call(K)

        def ext(f):
            return halo_exchange_2d(f, Hz, Hx, n_z, n_x, pad_to=nxww)

        def block(carry, xs):
            p, pp = carry
            seis, p2, pp2 = call_k(gzl, v2m_e, mask_e, srcf, xs, *mxu_in,
                                   ext(p), ext(pp))
            return (p2, pp2), seis

        (p, pp), seis = jax.lax.scan(block, (zc, zc),
                                     wav2[:nb * K].reshape(nb, K, 1))
        seis = seis.reshape(nb * K, nxl)
        if tail:
            call_t = _call(tail)
            seis_t, _, _ = call_t(gzl, v2m_e, mask_e, srcf, wav2[nb * K:],
                                  *mxu_in, ext(p), ext(pp))
            seis = jnp.concatenate([seis, seis_t], axis=0)
        # exactly one z shard owns row gz in its own tile; sum the rest out
        own_rec = ((gz >= z0) & (gz < z0 + nzl)).astype(jnp.float32)
        return jax.lax.psum(seis * own_rec, "z")

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", "z"), P("shot"), P()),
        out_specs=P("shot", None, "x"),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, sxs, wavelet):
        if px or pz:
            v2 = jnp.pad(v2, ((0, 0), (0, px), (0, pz)))
        out = sharded(v2, jnp.asarray(sxs, jnp.int32), wavelet)
        return out[:, :, :ctx.nxe]

    return fn
