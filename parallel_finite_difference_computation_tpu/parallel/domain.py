"""Spatial domain decomposition over the x axis with ICI halo exchange.

This implements what the reference only *named*: its
``dpct_gpu_rtm_domain_division/`` directory ships serial CPU code with
vestigial MPI-era comments (``src/rtm_main.cpp:259-267``) and no actual
decomposition. Here the extended grid's leading (x) axis is sharded over the
mesh's ``x`` axis inside ``shard_map``; each time step exchanges
``order/2``-wide slabs with neighbours via ``jax.lax.ppermute`` (which XLA
lowers to ICI collective-permutes that overlap with local compute), and the
rest of the step is purely local. Shots ride the orthogonal ``shot`` axis
with zero communication until the final image stack.

Injection under sharding uses precomputed one-hot/embedded operands instead
of dynamic scatter, so every step is a fixed fused elementwise program on
each device:

* source: ``pp += amp_t * src_onehot`` with ``src_onehot`` an (nxe, nze)
  one-hot (or Gaussian-patch) field, sharded like the wavefield;
* receivers: ``pp += inj_t ⊗ gz_onehot`` with ``inj_t`` the (nxe,)-embedded
  time-reversed trace row, sharded along x.

Wavefields and the accumulated image stay extended-grid shaped per shard;
interior extraction happens once at the end, outside ``shard_map``.
"""

from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..solver import FDContext

__all__ = ["halo_exchange", "sharded_laplacian",
           "make_sharded_forward_modeling", "make_sharded_rtm_snapshot"]


def halo_exchange(field, h: int, axis_name: str, n_shards: int):
    """Return ``field`` (nxl, nz) extended to (nxl+2h, nz) with h rows of
    halo from each x-neighbour over ICI; global-edge shards get zero halos
    (matching the Laplacian's zero border).

    ``ppermute`` leaves devices that are not a target of any (src, dst) pair
    with zeros, which supplies the boundary condition for free.
    """
    if n_shards == 1:
        z = jnp.zeros((h,) + field.shape[1:], field.dtype)
        return jnp.concatenate([z, field, z], axis=0)
    from_left = jax.lax.ppermute(
        field[-h:], axis_name, [(i, i + 1) for i in range(n_shards - 1)])
    from_right = jax.lax.ppermute(
        field[:h], axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    return jnp.concatenate([from_left, field, from_right], axis=0)


def _row_interior_mask(nxe: int, nxl: int, h: int, axis_name: str):
    """(nxl, 1) float mask: 1 where the *global* row index is in the
    Laplacian interior [h, nxe-h)."""
    row0 = jax.lax.axis_index(axis_name) * nxl
    rows = row0 + jnp.arange(nxl)
    return ((rows >= h) & (rows < nxe - h)).astype(jnp.float32)[:, None]


def sharded_laplacian(p_local, coefs_x, coefs_z, order: int, nxe: int,
                      axis_name: str, n_shards: int):
    """x-sharded Laplacian: local z-derivative + halo-exchanged x-derivative,
    zero outside the *global* interior — numerically identical to
    :func:`..ops.stencil.laplacian` on the gathered array."""
    nxl, nz = p_local.shape
    h = order // 2
    ext = halo_exchange(p_local, h, axis_name, n_shards)
    # split-axis symmetric-pair taps (c[h-k] == c[h+k] exactly); association
    # order matches ops.stencil.laplacian_interior (per-axis accumulators
    # like the reference's acmz/acmx, pairs descending, center last) so
    # sharded == unsharded bitwise. The centers come from the local rows
    # (ext[h:h+nxl] == p_local); z pairs are fully local, x pairs read the
    # halo-extended rows.
    c = jax.lax.slice(p_local, (0, h), (nxl, nz - h))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(p_local, (0, h - k), (nxl, nz - h - k))
        zp = jax.lax.slice(p_local, (0, h + k), (nxl, nz - h + k))
        term = coefs_z[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + coefs_z[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(ext, (h - k, h), (nxl + h - k, nz - h))
        xp = jax.lax.slice(ext, (h + k, h), (nxl + h + k, nz - h))
        term = coefs_x[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + coefs_x[h] * c
    interior = accz + accx
    lap = jnp.pad(interior, ((0, 0), (h, h)))
    return lap * _row_interior_mask(nxe, nxl, h, axis_name)


def _sharded_update(ctx: FDContext, p, pp, v2, axis_name, n_shards):
    lap = sharded_laplacian(p, jnp.asarray(ctx.coefs_x),
                            jnp.asarray(ctx.coefs_z), ctx.order, ctx.nxe,
                            axis_name, n_shards)
    return 2.0 * p - pp + v2 * jnp.float32(ctx.dt2) * lap


def _embed_sources(ctx: FDContext, sx, sz, gaussian: bool):
    """(nxe, nze) injection field for a source at (sx, sz): one-hot (K4) or
    the ptsrc Gaussian patch."""
    f = np.zeros((ctx.nxe, ctx.nze), np.float32)
    if gaussian:
        r = ctx.source_patch.shape[0] // 2
        f[sx - r:sx + r + 1, sz - r:sz + r + 1] = ctx.source_patch
    else:
        f[sx, sz] = 1.0
    return f


def _zcol_onehot(ctx: FDContext, gz: int):
    z = np.zeros(ctx.nze, np.float32)
    z[gz] = 1.0
    return z


def make_sharded_forward_modeling(ctx: FDContext, mesh: Mesh, gz: int,
                                  source: str = "gaussian",
                                  taper: str = "all"):
    """Build a jitted shot+domain-parallel forward-modeling function.

    Returns ``fn(v2, src_fields, wavelet) -> seis`` where ``v2`` is
    (ns, nxe, nze), ``src_fields`` is (ns, nxe, nze) injection fields (from
    :func:`_embed_sources`), and ``seis`` is (ns, nt, nxe) extended-row
    seismograms (slice ``[:, :, nxb:nxb+nx]`` for the reference layout).
    ``ctx.nxe`` must divide evenly by the mesh's x size (pad upstream).
    """
    n_x = mesh.shape["x"]
    # non-dividing grids zero-pad the x axis: padded columns have v2 = 0 so
    # their fields stay exactly 0, and the global interior mask (built from
    # the ORIGINAL nxe) preserves the right-edge Laplacian semantics
    nxe_pad = -(-ctx.nxe // n_x) * n_x
    pad = nxe_pad - ctx.nxe
    mask = jnp.asarray(np.pad(
        np.asarray(ctx.mask_all if taper == "all" else ctx.mask_top),
        ((0, pad), (0, 0))))
    gzcol = jnp.asarray(_zcol_onehot(ctx, gz))

    def body(v2, srcf, mask_l, wavelet):
        # local shapes: (nxl, nze); vmapped over the shot axis by caller
        def step(carry, amp):
            p, pp = carry
            pp = _sharded_update(ctx, p, pp, v2, "x", n_x)
            pp = pp + amp * srcf
            pp = pp * mask_l
            p = p * mask_l
            trace = (p * gzcol[None, :]).sum(axis=1)  # p[:, gz], fused
            return (pp, p), trace

        z = jnp.zeros_like(v2)
        (_, _), seis = jax.lax.scan(step, (z, z), wavelet)
        return seis

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, None, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", None), P("shot", "x", None),
                  P("x", None), P()),
        out_specs=P("shot", None, "x"),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, src_fields, wavelet):
        if pad:
            v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
            src_fields = jnp.pad(src_fields, ((0, 0), (0, pad), (0, 0)))
        return sharded(v2, src_fields, mask, wavelet)[:, :, :ctx.nxe]

    return fn


def make_sharded_rtm_snapshot(ctx: FDContext, mesh: Mesh, gz: int):
    """Build a jitted shot+domain-parallel two-snapshot RTM (the GPU-suite
    pipeline, ``fd-code.cu:480-529``: fd_forward then fd_back with
    reconstruction, receiver injection, and on-device imaging).

    Returns ``fn(v2, src_fields, wavelet, dobs_ext) -> imloc_ext`` with
    ``dobs_ext`` (ns, nxe, nt) — observed data embedded at rows
    ``[nxb:nxb+nx]`` — and ``imloc_ext`` (ns, nxe, nze) extended per-shot
    images (interior ``[nxb:-nxb, nzb:-nzb]`` equals the unsharded imloc;
    stack with ``.sum(0)``).
    """
    n_x = mesh.shape["x"]
    nxe_pad = -(-ctx.nxe // n_x) * n_x   # zero-pad (see modeling note)
    pad = nxe_pad - ctx.nxe
    mask = jnp.asarray(np.pad(np.asarray(ctx.mask_top), ((0, pad), (0, 0))))
    gzcol = jnp.asarray(_zcol_onehot(ctx, gz))
    # interior indicator for the imaging condition (K6 region), padded 0
    im = np.zeros((nxe_pad, ctx.nze), np.float32)
    im[ctx.nxb:ctx.nxe - ctx.nxb, ctx.nzb:ctx.nze - ctx.nzb] = 1.0
    im_mask = jnp.asarray(im)

    def body(v2, srcf, dobs_ext, mask_l, im_l, wavelet):
        nt = wavelet.shape[0]

        def fstep(carry, amp):
            p, pp = carry
            p, pp = pp, p
            p = p * mask_l
            pp = pp * mask_l
            pp = _sharded_update(ctx, p, pp, v2, "x", n_x)
            pp = pp + amp * srcf
            return (p, pp), None

        z = jnp.zeros_like(v2)
        (snap0, snap1), _ = jax.lax.scan(fstep, (z, z), wavelet)

        inj = dobs_ext[:, ::-1].T  # (nt, nxl): inj[it] = dobs[:, nt-1-it]

        def bstep(carry, xs):
            it, inj_t = xs
            p, pp, pr, ppr, imloc = carry
            ppn = _sharded_update(ctx, p, pp, v2, "x", n_x)
            ppn = jnp.where(it == 0, snap1, jnp.where(it == 1, snap0, ppn))
            p, pp = ppn, p
            pr = pr * mask_l
            ppr = ppr * mask_l
            pprn = _sharded_update(ctx, pr, ppr, v2, "x", n_x)
            pprn = pprn + inj_t[:, None] * gzcol[None, :]
            imloc = imloc + p * pprn * im_l
            pr, ppr = pprn, pr
            return (p, pp, pr, ppr, imloc), None

        init = (z, z, z, z, z)
        xs = (jnp.arange(nt), inj)
        (_, _, _, _, imloc), _ = jax.lax.scan(bstep, init, xs)
        return imloc

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, 0, None, None, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", None), P("shot", "x", None),
                  P("shot", "x", None), P("x", None),
                  P("x", None), P()),
        out_specs=P("shot", "x", None),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, src_fields, wavelet, dobs_ext):
        if pad:
            v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
            src_fields = jnp.pad(src_fields, ((0, 0), (0, pad), (0, 0)))
            dobs_ext = jnp.pad(dobs_ext, ((0, 0), (0, pad), (0, 0)))
        out = sharded(v2, src_fields, dobs_ext, mask, im_mask, wavelet)
        return out[:, :ctx.nxe, :]

    return fn


def make_sharded_rtm_full(ctx: FDContext, mesh: Mesh, gz: int):
    """Shot+x-domain-parallel full-wavefield RTM — the ``rtm_main`` pipeline
    (``dpct_gpu_rtm_domain_division/src/rtm_main.cpp:158-247``) decomposed
    over the grid's x axis. Beyond compute parallelism this scales the
    *memory-heavy* design point: the 2*nt stored wavefields split across
    devices (each holds (nt, nxe/n_x, nze) slabs).

    Returns ``fn(v2, src_fields, wavelet, inj_ext) -> imloc_ext`` with
    ``inj_ext`` (ns, nt, nxe) receiver-injection rows already embedded at
    the reference's x offset and carrying its it=0 flat-read quirk (build
    with :func:`embed_injection_rows`); ``imloc_ext`` is (ns, nxe, nze)
    (interior ``[nxb:-nxb, nzb:-nzb]`` equals the unsharded
    ``rtm_shot_full``).
    """
    n_x = mesh.shape["x"]
    nxe_pad = -(-ctx.nxe // n_x) * n_x   # zero-pad (see modeling note)
    pad = nxe_pad - ctx.nxe
    mask = jnp.asarray(np.pad(np.asarray(ctx.mask_top), ((0, pad), (0, 0))))
    gzcol = jnp.asarray(_zcol_onehot(ctx, gz))
    im = np.zeros((nxe_pad, ctx.nze), np.float32)
    im[ctx.nxb:ctx.nxe - ctx.nxb, ctx.nzb:ctx.nze - ctx.nzb] = 1.0
    im_mask = jnp.asarray(im)

    def body(v2, srcf, inj, mask_l, im_l, wavelet):
        # rtm_main step order: update, inject, taper both, record the
        # tapered old field (full local slab; K6 interior applied at the
        # end — exact, the indicator is 0/1)
        def fstep(carry, amp):
            p, pp = carry
            ppn = _sharded_update(ctx, p, pp, v2, "x", n_x)
            ppn = (ppn + amp * srcf) * mask_l
            p = p * mask_l
            return (ppn, p), p

        z = jnp.zeros_like(v2)
        _, swf = jax.lax.scan(fstep, (z, z), wavelet)

        def bstep(carry, inj_t):
            p, pp = carry
            ppn = _sharded_update(ctx, p, pp, v2, "x", n_x)
            ppn = (ppn + inj_t[:, None] * gzcol[None, :]) * mask_l
            p = p * mask_l
            return (ppn, p), p

        _, rwf = jax.lax.scan(bstep, (z, z), inj)
        return jnp.einsum("txz,txz->xz", swf[::-1], rwf) * im_l

    sharded = shard_map(
        jax.vmap(body, in_axes=(0, 0, 0, None, None, None)),
        mesh=mesh,
        in_specs=(P("shot", "x", None), P("shot", "x", None),
                  P("shot", None, "x"), P("x", None), P("x", None), P()),
        out_specs=P("shot", "x", None),
        check_vma=False,
    )

    @jax.jit
    def fn(v2, src_fields, wavelet, inj_ext):
        if pad:
            v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
            src_fields = jnp.pad(src_fields, ((0, 0), (0, pad), (0, 0)))
            inj_ext = jnp.pad(inj_ext, ((0, 0), (0, 0), (0, pad)))
        out = sharded(v2, src_fields, inj_ext, mask, im_mask, wavelet)
        return out[:, :ctx.nxe, :]

    return fn


def embed_injection_rows(ctx: FDContext, dobs: np.ndarray,
                         x_off_quirk: bool = True,
                         next_first=None) -> np.ndarray:
    """(ns, nx, nt) observed data -> (ns, nt, nxe) receiver-injection rows
    for :func:`make_sharded_rtm_full`: time-reversed with ``rtm_main``'s
    it=0 flat-read (cross-shot) and nzb-offset quirks
    (see ``solver._injection_rows``).

    ``next_first`` overrides the per-shot cross-shot it=0 sample (the next
    shot's first value in the reference's contiguous block) — needed when
    ``dobs`` is a chunk of a larger survey, so the chunk's last shot still
    reads the true successor's sample instead of 0."""
    import jax.numpy as _jnp
    from ..solver import _injection_rows
    ns = dobs.shape[0]
    x_off = ctx.nzb if x_off_quirk else ctx.nxb
    out = np.zeros((ns, ctx.nt, ctx.nxe), np.float32)
    for i in range(ns):
        if next_first is not None:
            nxt = np.float32(next_first[i])
        else:
            nxt = dobs[i + 1, 0, 0] if i + 1 < ns else np.float32(0.0)
        rows = np.asarray(_injection_rows(ctx, _jnp.asarray(dobs[i]), nxt))
        out[i, :, x_off:x_off + dobs.shape[1]] = rows
    return out


def embed_source_fields(ctx: FDContext, sxs, sz: int,
                        gaussian: bool = False) -> np.ndarray:
    """(ns, nxe, nze) per-shot injection fields for sources at (sxs[i], sz)."""
    return np.stack([_embed_sources(ctx, sx, sz, gaussian) for sx in sxs])


def embed_dobs(ctx: FDContext, dobs: np.ndarray) -> np.ndarray:
    """(ns, nx, nt) observed data -> (ns, nxe, nt) embedded at interior rows."""
    ns, nx, nt = dobs.shape
    out = np.zeros((ns, ctx.nxe, nt), np.float32)
    out[:, ctx.nxb:ctx.nxb + nx, :] = dobs
    return out
