"""2D (x, z) spatial domain decomposition over a (shot, x, z) mesh.

:mod:`.domain` shards the extended grid's x axis only — the right choice up
to a pod slice where ``nxe / n_x`` stays comfortably above the halo width
and the 128-lane vreg granularity. Beyond that (e.g. pluto's 7040-wide grid
on 64+ chips, or deep grids where z dominates), x-only shards get too thin:
the ``2h/nxl`` halo-overhead fraction and the per-shard vreg rounding both
blow up. This module decomposes BOTH grid axes so a ``n_x * n_z`` device
block holds chunky 2D slabs, with per-step ``ppermute`` halo exchanges on
each axis riding ICI, while shots still ride the orthogonal ``shot`` axis.

The memory-heavy ``rtm_main`` design point (``dpct_gpu_rtm_domain_division/
src/rtm_main.cpp:158-247``: 2*nt stored wavefields) benefits most — the
stored (nt, nxe, nze) volumes split across all ``n_x * n_z`` devices.

Numerics are shared with :mod:`.domain`: split-axis symmetric-pair taps in
the same association order as the unsharded kernels (per-axis accumulators,
pairs descending k, center last), zero halos at global edges supplied by
``ppermute``'s non-target zero fill, and precomputed one-hot/embedded
injection operands so every step is a fixed fused elementwise program.
Halo-region cells compute garbage taps that the global interior masks
discard — sharded results match the unsharded path to float-identity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..solver import FDContext

__all__ = ["halo_exchange_axis", "sharded_laplacian_2d",
           "make_sharded_forward_modeling_2d",
           "make_sharded_rtm_snapshot_2d", "make_sharded_rtm_full_2d"]


def halo_exchange_axis(field, h: int, axis: int, axis_name: str,
                       n_shards: int):
    """Return ``field`` extended by ``h`` halo slabs on each side of
    ``axis`` (0 or 1) from the mesh neighbours over ICI; global-edge shards
    get zero halos (``ppermute`` leaves non-target devices with zeros,
    which supplies the Laplacian's zero border for free)."""
    idx_lo = (slice(None),) * axis + (slice(None, h),)
    idx_hi = (slice(None),) * axis + (slice(-h, None),)
    if n_shards == 1:
        shp = list(field.shape)
        shp[axis] = h
        z = jnp.zeros(shp, field.dtype)
        return jnp.concatenate([z, field, z], axis=axis)
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    from_left = jax.lax.ppermute(field[idx_hi], axis_name, fwd)
    from_right = jax.lax.ppermute(field[idx_lo], axis_name, bwd)
    return jnp.concatenate([from_left, field, from_right], axis=axis)


def _interior_mask_axis(n_global: int, n_local: int, h: int,
                        axis_name: str):
    """(n_local,) float mask: 1 where the *global* index along the sharded
    axis is in the Laplacian interior [h, n_global - h)."""
    i0 = jax.lax.axis_index(axis_name) * n_local
    idx = i0 + jnp.arange(n_local)
    return ((idx >= h) & (idx < n_global - h)).astype(jnp.float32)


def sharded_laplacian_2d(p_local, coefs_x, coefs_z, order: int, nxe: int,
                         nze: int, n_x: int, n_z: int,
                         ax_x: str = "x", ax_z: str = "z"):
    """(x, z)-sharded Laplacian: both axes' taps read ``order/2``-wide
    halos exchanged with the mesh neighbours; zero outside the *global*
    interior — numerically identical to :func:`..ops.stencil.laplacian`
    on the gathered array (same split-axis symmetric-pair association
    order; halo cells compute garbage that the interior masks zero)."""
    nxl, nzl = p_local.shape
    h = order // 2
    ext_x = halo_exchange_axis(p_local, h, 0, ax_x, n_x)
    ext_z = halo_exchange_axis(p_local, h, 1, ax_z, n_z)
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(ext_z, (0, h - k), (nxl, h - k + nzl))
        zp = jax.lax.slice(ext_z, (0, h + k), (nxl, h + k + nzl))
        term = coefs_z[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + coefs_z[h] * p_local
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(ext_x, (h - k, 0), (h - k + nxl, nzl))
        xp = jax.lax.slice(ext_x, (h + k, 0), (h + k + nxl, nzl))
        term = coefs_x[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + coefs_x[h] * p_local
    lap = accz + accx
    mx = _interior_mask_axis(nxe, nxl, h, ax_x)[:, None]
    mz = _interior_mask_axis(nze, nzl, h, ax_z)[None, :]
    return lap * (mx * mz)


def _update_2d(ctx: FDContext, p, pp, v2, n_x: int, n_z: int):
    lap = sharded_laplacian_2d(p, jnp.asarray(ctx.coefs_x),
                               jnp.asarray(ctx.coefs_z), ctx.order,
                               ctx.nxe, ctx.nze, n_x, n_z)
    return 2.0 * p - pp + v2 * jnp.float32(ctx.dt2) * lap


def _pad2(ctx: FDContext, mesh: Mesh):
    """Zero-padded extended-grid sizes so each mesh axis divides evenly
    (padded cells have v2 = 0 and taper-mask 0, so their fields stay
    exactly 0; interior masks are built from the ORIGINAL nxe/nze)."""
    n_x, n_z = mesh.shape["x"], mesh.shape["z"]
    nxe_pad = -(-ctx.nxe // n_x) * n_x
    nze_pad = -(-ctx.nze // n_z) * n_z
    return n_x, n_z, nxe_pad - ctx.nxe, nze_pad - ctx.nze


def _padded_mask(ctx: FDContext, px: int, pz: int, taper: str):
    m = np.asarray(ctx.mask_all if taper == "all" else ctx.mask_top)
    return jnp.asarray(np.pad(m, ((0, px), (0, pz))))


def _padded_gzcol(ctx: FDContext, gz: int, pz: int):
    z = np.zeros(ctx.nze + pz, np.float32)
    z[gz] = 1.0
    return jnp.asarray(z)


def _padded_im_mask(ctx: FDContext, px: int, pz: int):
    im = np.zeros((ctx.nxe + px, ctx.nze + pz), np.float32)
    im[ctx.nxb:ctx.nxe - ctx.nxb, ctx.nzb:ctx.nze - ctx.nzb] = 1.0
    return jnp.asarray(im)


def make_sharded_forward_modeling_2d(ctx: FDContext, mesh: Mesh, gz: int,
                                     source: str = "gaussian",
                                     taper: str = "all"):
    """Shot + 2D-domain-parallel forward modeling over a (shot, x, z) mesh.

    Returns ``fn(v2, src_fields, wavelet) -> seis`` with ``v2`` /
    ``src_fields`` (ns, nxe, nze) (build the latter with
    :func:`..parallel.domain.embed_source_fields`) and ``seis``
    (ns, nt, nxe) extended-row seismograms. The per-step receiver trace is
    a z-one-hot contraction ``psum``-reduced over the z mesh axis (one
    nonzero term, so bit-identical to the unsharded row read)."""
    n_x, n_z, px, pz = _pad2(ctx, mesh)
    mask = _padded_mask(ctx, px, pz, taper)
    gzcol = _padded_gzcol(ctx, gz, pz)

    def body(v2, srcf, mask_l, gz_l, wavelet):
        def step(carry, amp):
            p, pp = carry
            pp = _update_2d(ctx, p, pp, v2, n_x, n_z)
            pp = pp + amp * srcf
            pp = pp * mask_l
            p = p * mask_l
            trace = jax.lax.psum((p * gz_l[None, :]).sum(axis=1), "z")
            return (pp, p), trace

        z = jnp.zeros_like(v2)
        (_, _), seis = jax.lax.scan(step, (z, z), wavelet)
        return seis

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, None, None, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", "z"), P("shot", "x", "z"),
                  P("x", "z"), P("z"), P()),
        out_specs=P("shot", None, "x"),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, src_fields, wavelet):
        if px or pz:
            v2 = jnp.pad(v2, ((0, 0), (0, px), (0, pz)))
            src_fields = jnp.pad(src_fields, ((0, 0), (0, px), (0, pz)))
        return sharded(v2, src_fields, mask, gzcol, wavelet)[:, :, :ctx.nxe]

    return fn


def make_sharded_rtm_snapshot_2d(ctx: FDContext, mesh: Mesh, gz: int):
    """Shot + 2D-domain-parallel two-snapshot RTM (the GPU-suite pipeline,
    ``cuda_reference_RTM/src/fd-code.cu:480-529``) over a (shot, x, z)
    mesh. Same contract as :func:`..parallel.domain.make_sharded_rtm_
    snapshot`: ``fn(v2, src_fields, wavelet, dobs_ext) -> imloc_ext`` with
    ``dobs_ext`` (ns, nxe, nt) and ``imloc_ext`` (ns, nxe, nze)."""
    n_x, n_z, px, pz = _pad2(ctx, mesh)
    mask = _padded_mask(ctx, px, pz, "top")
    gzcol = _padded_gzcol(ctx, gz, pz)
    im_mask = _padded_im_mask(ctx, px, pz)

    def body(v2, srcf, dobs_ext, mask_l, gz_l, im_l, wavelet):
        nt = wavelet.shape[0]

        def fstep(carry, amp):
            p, pp = carry
            p, pp = pp, p
            p = p * mask_l
            pp = pp * mask_l
            pp = _update_2d(ctx, p, pp, v2, n_x, n_z)
            pp = pp + amp * srcf
            return (p, pp), None

        z = jnp.zeros_like(v2)
        (snap0, snap1), _ = jax.lax.scan(fstep, (z, z), wavelet)

        inj = dobs_ext[:, ::-1].T  # (nt, nxl): inj[it] = dobs[:, nt-1-it]

        def bstep(carry, xs):
            it, inj_t = xs
            p, pp, pr, ppr, imloc = carry
            ppn = _update_2d(ctx, p, pp, v2, n_x, n_z)
            ppn = jnp.where(it == 0, snap1, jnp.where(it == 1, snap0, ppn))
            p, pp = ppn, p
            pr = pr * mask_l
            ppr = ppr * mask_l
            pprn = _update_2d(ctx, pr, ppr, v2, n_x, n_z)
            pprn = pprn + inj_t[:, None] * gz_l[None, :]
            imloc = imloc + p * pprn * im_l
            pr, ppr = pprn, pr
            return (p, pp, pr, ppr, imloc), None

        init = (z, z, z, z, z)
        (_, _, _, _, imloc), _ = jax.lax.scan(
            bstep, init, (jnp.arange(nt), inj))
        return imloc

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, 0, None, None, None, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", "z"), P("shot", "x", "z"),
                  P("shot", "x", None), P("x", "z"), P("z"),
                  P("x", "z"), P()),
        out_specs=P("shot", "x", "z"),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, src_fields, wavelet, dobs_ext):
        if px or pz:
            v2 = jnp.pad(v2, ((0, 0), (0, px), (0, pz)))
            src_fields = jnp.pad(src_fields, ((0, 0), (0, px), (0, pz)))
            dobs_ext = jnp.pad(dobs_ext, ((0, 0), (0, px), (0, 0)))
        out = sharded(v2, src_fields, dobs_ext, mask, gzcol, im_mask,
                      wavelet)
        return out[:, :ctx.nxe, :ctx.nze]

    return fn


def make_sharded_rtm_full_2d(ctx: FDContext, mesh: Mesh, gz: int):
    """Shot + 2D-domain-parallel full-wavefield RTM — the ``rtm_main``
    pipeline (``dpct_gpu_rtm_domain_division/src/rtm_main.cpp:158-247``)
    with the 2*nt stored wavefields split across ALL ``n_x * n_z`` grid
    devices (each holds (nt, nxe/n_x, nze/n_z) slabs) — the 2D scaling of
    the memory-heavy design point. Same contract as
    :func:`..parallel.domain.make_sharded_rtm_full` (``inj_ext`` from
    :func:`..parallel.domain.embed_injection_rows`)."""
    n_x, n_z, px, pz = _pad2(ctx, mesh)
    mask = _padded_mask(ctx, px, pz, "top")
    gzcol = _padded_gzcol(ctx, gz, pz)
    im_mask = _padded_im_mask(ctx, px, pz)

    def body(v2, srcf, inj, mask_l, gz_l, im_l, wavelet):
        def fstep(carry, amp):
            p, pp = carry
            ppn = _update_2d(ctx, p, pp, v2, n_x, n_z)
            ppn = (ppn + amp * srcf) * mask_l
            p = p * mask_l
            return (ppn, p), p

        z = jnp.zeros_like(v2)
        _, swf = jax.lax.scan(fstep, (z, z), wavelet)

        def bstep(carry, inj_t):
            p, pp = carry
            ppn = _update_2d(ctx, p, pp, v2, n_x, n_z)
            ppn = (ppn + inj_t[:, None] * gz_l[None, :]) * mask_l
            p = p * mask_l
            return (ppn, p), p

        _, rwf = jax.lax.scan(bstep, (z, z), inj)
        return jnp.einsum("txz,txz->xz", swf[::-1], rwf) * im_l

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, 0, None, None, None, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", "z"), P("shot", "x", "z"),
                  P("shot", None, "x"), P("x", "z"), P("z"),
                  P("x", "z"), P()),
        out_specs=P("shot", "x", "z"),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, src_fields, wavelet, inj_ext):
        if px or pz:
            v2 = jnp.pad(v2, ((0, 0), (0, px), (0, pz)))
            src_fields = jnp.pad(src_fields, ((0, 0), (0, px), (0, pz)))
            inj_ext = jnp.pad(inj_ext, ((0, 0), (0, 0), (0, px)))
        out = sharded(v2, src_fields, inj_ext, mask, gzcol, im_mask,
                      wavelet)
        return out[:, :ctx.nxe, :ctx.nze]

    return fn
