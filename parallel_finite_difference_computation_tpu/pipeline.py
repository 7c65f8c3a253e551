"""Application pipelines: the reference's four programs as library calls.

* :func:`run_stencil` — the one-shot Laplacian micro-benchmark
  (``cuda_reference_stencil_computation/fd-source-code.cu:277-352``).
* :func:`run_modeling` — synthetic shot-gather generation, ``mod_main``
  (``dpct_gpu_rtm_domain_division/src/mod_main.cpp:42-208``).
* :func:`run_rtm_cpu` — full-wavefield-storage RTM, ``rtm_main``
  (``src/rtm_main.cpp:45-282``).
* :func:`run_rtm_gpu` — two-snapshot GPU-suite RTM with random/loaded
  boundary velocity, ``rtm_code`` (``cuda_reference_RTM/src/fd-code.cu:380-584``).

Unlike the reference's serial shot loops (``fd-code.cu:480``), shots here are
batched with ``vmap`` (single device) or sharded over a mesh axis (see
:mod:`.parallel.shots`) — shots are independent given their per-shot
boundary velocities, so they map onto the device grid with zero
communication until the final image stack.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import io, numerics
from .config import Params, Geometry
from .ops.stencil import laplacian
from .solver import FDContext, forward_modeling, rtm_shot_full, rtm_shot_snapshot


def _use_pallas(backend: str) -> bool:
    """Resolve backend choice: 'pallas' | 'lax' | 'auto' (pallas on TPU,
    lax elsewhere — Mosaic kernels only compile for TPU)."""
    if backend == "auto":
        return jax.devices()[0].platform == "tpu"
    return backend == "pallas"


def _run_with_fallback(run_pallas, run_lax, args, backend: str,
                       run_pallas_split=None):
    """Execute the pallas path with fallbacks on compile failure.

    Very large configs can exceed the Mosaic compiler's limits; with
    backend='auto' the framework tries the whole-shot kernel, then the
    split forward/backward kernels (half the IR per compile), then the XLA
    scan path (still orders of magnitude faster than the reference). An
    explicit backend='pallas' propagates the first error."""
    if run_pallas is None:
        return np.asarray(run_lax(*args))
    try:
        return np.asarray(run_pallas(*args))
    except Exception as e:
        if backend == "pallas":
            raise
        import warnings
        first_err = f"{type(e).__name__}: {str(e)[:200]}"
        tiers = (run_pallas_split
                 if isinstance(run_pallas_split, (list, tuple))
                 else ([run_pallas_split] if run_pallas_split else []))
        for k, tier in enumerate(tiers):
            warnings.warn(f"previous kernel tier failed ({first_err}); "
                          f"trying fallback tier {k}")
            try:
                return np.asarray(tier(*args))
            except Exception as e2:
                first_err += (f"; tier {k + 1}: {type(e2).__name__}: "
                              f"{str(e2)[:200]}")
        warnings.warn("pallas compilation failed for this config "
                      f"({first_err}); falling back to the lax path")
        return np.asarray(run_lax(*args))

__all__ = ["run_stencil", "run_modeling", "run_rtm_cpu", "run_rtm_gpu",
           "prepare_velocity_cpu", "prepare_velocities_gpu"]


# --------------------------------------------------------------------------
# Velocity preparation
# --------------------------------------------------------------------------

def prepare_velocity_cpu(p: Params, vp: np.ndarray) -> np.ndarray:
    """CPU-pipeline velocity prep (``mod_main.cpp:118-126``): square the
    interior into the extended grid, then clamp-extend the *squared* field."""
    vel2 = np.zeros((p.nxe, p.nze), np.float32)
    vel2[p.nxb:p.nxb + p.nx, p.nzb:p.nzb + p.nz] = vp * vp
    return numerics.extendvel_clamp(vel2, p.nx, p.nz, p.nxb, p.nzb)


def prepare_velocities_gpu(p: Params, vp: np.ndarray, seed: int = 0,
                           shot_indices=None) -> np.ndarray:
    """GPU-suite per-shot velocity prep (``fd-code.cu:442-494``): embed vp in
    the extended grid, then per shot either load the pre-extended model from
    ``vel_ext_file`` or generate the random linear-ramp boundary — on device,
    vmapped over shots (:func:`..numerics.extendvel_random_jax`), so
    boundary generation scales with shot count/sharding instead of looping
    on the host; square last. Returns (ns, nxe, nze) squared velocities.

    ``shot_indices`` selects a subset of the survey's shots by *global*
    index (fold_in keys / vel_ext rows stay those of the full survey), so a
    chunked/resumed run reproduces the uninterrupted run exactly."""
    idx = (np.arange(p.ns) if shot_indices is None
           else np.asarray(shot_indices, np.int64))
    if p.vel_ext_flag:
        vpe = io.read_vel_ext(p.vel_ext_file, p.ns, p.nxe, p.nze)[idx]
        return (vpe * vpe).astype(np.float32)
    base = np.zeros((p.nxe, p.nze), np.float32)
    base[p.nxb:p.nxb + p.nx, p.nzb:p.nzb + p.nz] = vp

    @jax.jit
    def gen(b, keys):
        ext = jax.vmap(lambda k: numerics.extendvel_random_jax(
            b, p.nx, p.nz, p.nxb, p.nzb, k))(keys)
        return ext * ext

    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.key(seed), i))(jnp.asarray(idx))
    return gen(jnp.asarray(base), keys)


# --------------------------------------------------------------------------
# Pipelines
# --------------------------------------------------------------------------

def run_stencil(p: Params, input_path: Optional[str] = None,
                output_path: Optional[str] = None,
                backend: str = "auto") -> np.ndarray:
    """Single-launch Laplacian on an (nxe, nze) field read from
    ``input_path`` (the stencil program abuses the ``tmpdir`` key as the data
    path, ``fd-source-code.cu:43-50``). Returns the Laplacian; optionally
    writes it raw float32 like ``output_cuda.bin``.

    backend="pallas" uses the tiled streaming kernel (worthwhile for grids
    beyond VMEM); "auto"/"lax" use the XLA op."""
    path = input_path or p.tmpdir
    field = io.read_velocity(path, p.nxe, p.nze)
    cx, cz = numerics.scaled_coefficients(p.order, p.dx, p.dz)
    if backend == "pallas":
        from .ops.pallas_stencil import laplacian_pallas
        fn = jax.jit(lambda x: laplacian_pallas(x, cx, cz, p.order))
    else:
        fn = jax.jit(lambda x: laplacian(x, jnp.asarray(cx),
                                         jnp.asarray(cz), p.order))
    lap = np.asarray(fn(jnp.asarray(field)))
    if output_path:
        io.write_f32(output_path, lap)
    return lap


# Device budget for a modeling run's (ns, nt, nx) seismogram volume:
# beyond it, run_modeling chunks shots on the host (HBM is ~16 GB and the
# propagation workspace needs its share).
_MOD_CHUNK_BYTES = 2 << 30


def run_modeling(p: Params, vp: Optional[np.ndarray] = None,
                 out_datfile: Optional[str] = None,
                 backend: str = "auto", mesh=None,
                 lap_impl=None) -> np.ndarray:
    """``mod_main``: model all shots, return (ns, nx, nt) gathers and
    optionally write the raw ``datfile`` blob the RTM programs read.

    With a (shot, x) ``mesh``, shots shard over ``shot`` and the grid
    decomposes over ``x`` using the blocked halo-exchange Pallas kernels
    (lax formulation as fallback); a (shot, x, z) mesh decomposes both
    grid axes (:mod:`.parallel.domain2d`).

    ``lap_impl`` selects the Pallas tiers' Laplacian lowering
    (exact VPU default; ``"mxu"``/``"mxu6"`` multi-pass bf16 MXU;
    ``"auto"`` routes by the measured accuracy envelope —
    :func:`.ops.pallas_fd.resolve_lap_impl`). The lax fallback is always
    exact."""
    if vp is None:
        vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    vel2 = jnp.asarray(prepare_velocity_cpu(p, vp))
    ctx = FDContext.from_params(p, exact_taper=False)
    g = Geometry.from_params(p)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    sxs = jnp.asarray(g.sx)

    if mesh is not None and _mesh_decomposes_grid(mesh):
        return _run_modeling_domain(p, ctx, g, wav, vel2, mesh, backend,
                                    out_datfile, lap_impl=lap_impl)

    run_pallas = run_tiled = None
    if _use_pallas(backend):
        from .ops.pallas_fd import forward_modeling_pallas
        run_pallas = jax.jit(lambda sxs: jax.lax.map(
            lambda sx: forward_modeling_pallas(
                ctx, vel2, wav, sx, g.sz, g.gz,
                source="gaussian", taper="all",
                lap_impl=lap_impl)[2], sxs))
        # middle tier for grids beyond VMEM (e.g. pluto-resolution): the
        # temporal-blocked HBM-streaming kernel (K=4 fused steps per HBM
        # pass, 23.3 vs 19.1 GCell/s per-step at 6960x1201; ~4.3x the lax
        # path). K=4 needs hk=16 <= tile_rows and nt >= 1 only (the
        # kblocked driver tail-passes nt % K).
        from .solver import forward_modeling_tiled
        tr_tile = 256 if ctx.nxe >= 2048 else 64
        run_tiled = jax.jit(lambda sxs: jax.lax.map(
            lambda sx: forward_modeling_tiled(
                ctx, vel2, wav, sx, g.sz, g.gz,
                source="gaussian", tile_rows=tr_tile,
                block_k=min(4, ctx.nt), lap_impl=lap_impl)[2], sxs))
    run_lax = jax.vmap(
        lambda sx: forward_modeling(ctx, vel2, wav, sx, g.sz, g.gz,
                                    source="gaussian", taper="all",
                                    record="trace")[2])
    ns = p.ns
    if mesh is not None:
        # shot-only mesh: shard the per-shot inputs over the shot axis and
        # run each device's local shots through shard_map'd kernel tiers
        # (a bare sequential pallas lax.map cannot split across devices);
        # the vmap lax path stays the partitionable final fallback
        from .parallel.shots import distribute_shots, pad_shots
        n_dev = mesh.shape.get("shot", 1)
        sx_pad, _ = pad_shots(np.asarray(g.sx, np.int32), n_dev)
        sx_pad[ns:] = sx_pad[0]
        (sxs,) = distribute_shots(mesh, sx_pad)
        run_pallas = run_tiled = None
        if _use_pallas(backend):
            from .parallel.shots import (make_sharded_modeling_pallas,
                                         make_sharded_modeling_tiled)
            _sh_ws = make_sharded_modeling_pallas(ctx, mesh, g.sz, g.gz,
                                                  lap_impl=lap_impl)
            _sh_t = make_sharded_modeling_tiled(
                ctx, mesh, g.sz, g.gz,
                tile_rows=256 if ctx.nxe >= 2048 else 64,
                block_k=min(4, ctx.nt), lap_impl=lap_impl)
            run_pallas = lambda sxs: _sh_ws(vel2, sxs, wav)
            run_tiled = lambda sxs: _sh_t(vel2, sxs, wav)
    out_bytes = ns * p.nt * p.nx * 4
    if mesh is None and ns > 1 and out_bytes > _MOD_CHUNK_BYTES:
        # survey-scale gathers cannot live on-device whole (pluto ns=30 x
        # nt=12860 x nx=6960 = 10.7 GB vs 16 GB HBM incl. workspace):
        # chunk shots on the host, one fixed chunk shape so a single
        # compile serves every chunk (the tail is padded with a repeated
        # source and dropped)
        per = max(1, int(_MOD_CHUNK_BYTES // (p.nt * p.nx * 4)))
        sx_np = np.asarray(g.sx, np.int32)
        parts = []
        for s0 in range(0, ns, per):
            idx = np.arange(s0, min(s0 + per, ns))
            sx_c = np.full(per, sx_np[0], np.int32)
            sx_c[:len(idx)] = sx_np[idx]
            out = _run_with_fallback(run_pallas, run_lax,
                                     (jnp.asarray(sx_c),), backend,
                                     run_pallas_split=run_tiled)
            parts.append(np.asarray(out[:len(idx)]))
        seis = np.concatenate(parts, axis=0)
    else:
        seis = _run_with_fallback(run_pallas, run_lax, (sxs,), backend,
                                  run_pallas_split=run_tiled)[:ns]
    data = np.transpose(seis, (0, 2, 1))      # (ns, nx, nt)
    if out_datfile:
        io.write_f32(out_datfile, data)
    return data


def _mesh_decomposes_grid(mesh) -> bool:
    """True when the mesh has a grid axis (x and/or z) of size > 1 — the
    domain-decomposed pipelines apply."""
    return (mesh.shape.get("x", 1) > 1 or mesh.shape.get("z", 1) > 1)


def _run_modeling_domain(p: Params, ctx, g, wav, vel2, mesh, backend,
                         out_datfile, lap_impl=None):
    """Domain-decomposed forward modeling over a (shot, x[, z]) mesh."""
    from .parallel.domain import make_sharded_forward_modeling
    from .parallel.domain2d import make_sharded_forward_modeling_2d
    from .parallel.domain_pallas import make_sharded_forward_modeling_pallas
    from .parallel.domain import _embed_sources
    from .parallel.shots import pad_shots
    n_shot = mesh.shape.get("shot", 1)
    n_x = mesh.shape.get("x", 1)
    n_z = mesh.shape.get("z", 1)
    sx_pad, ns = pad_shots(np.asarray(g.sx, np.int32), n_shot)
    # padded dummy shots reuse a real source position (their output is
    # discarded; sx=0 would put the Gaussian patch out of bounds)
    sx_pad[ns:] = sx_pad[0]
    v_pad = np.broadcast_to(np.asarray(vel2),
                            (len(sx_pad),) + np.asarray(vel2).shape).copy()

    run_pallas = None
    h = ctx.order // 2
    if _use_pallas(backend) and n_z == 1:
        block_k = max(1, min(8, (ctx.nxe // n_x) // h, ctx.nt))
        fn_pl = make_sharded_forward_modeling_pallas(
            ctx, mesh, g.sz, g.gz, source="gaussian", taper="all",
            block_k=block_k, lap_impl=lap_impl)
        run_pallas = lambda: fn_pl(v_pad, sx_pad, wav)
    elif _use_pallas(backend):
        # z-sharded meshes: 2D blocked kernels (both-axis K*h halos)
        from .parallel.domain2d_pallas import (
            make_sharded_forward_modeling_2d_pallas)
        block_k = max(1, min(8, (ctx.nxe // n_x) // h,
                             (ctx.nze // n_z) // h, ctx.nt))
        fn_pl = make_sharded_forward_modeling_2d_pallas(
            ctx, mesh, g.sz, g.gz, source="gaussian", taper="all",
            block_k=block_k, lap_impl=lap_impl)
        run_pallas = lambda: fn_pl(v_pad, sx_pad, wav)
    if n_z > 1:
        fn_lax = make_sharded_forward_modeling_2d(
            ctx, mesh, g.gz, source="gaussian", taper="all")
    else:
        fn_lax = make_sharded_forward_modeling(ctx, mesh, g.gz,
                                               source="gaussian",
                                               taper="all")
    srcf = np.stack([_embed_sources(ctx, int(s), g.sz, gaussian=True)
                     for s in sx_pad])
    run_lax = lambda: fn_lax(v_pad, srcf, wav)
    seis_ext = _run_with_fallback(
        run_pallas and (lambda *a: run_pallas()),
        lambda *a: run_lax(), (), backend)
    seis = seis_ext[:ns, :, ctx.nxb:ctx.nxb + ctx.nx]
    data = np.transpose(seis, (0, 2, 1))
    if out_datfile:
        io.write_f32(out_datfile, data)
    return data


def _tiled_rtm_wins(p: Params) -> bool:
    """auto-tier choice for ``run_rtm_cpu``: the lax whole-grid fusion wins
    on small grids; beyond ~1.5 MCell the fused HBM-streaming kernels win
    (per-step measured 3.7x the lax path at pluto scale; the K=4
    temporally-blocked kernels that route now add ~2x over per-step) and
    auto routes there on TPU."""
    return (jax.devices()[0].platform == "tpu"
            and p.nxe * p.nze > 1_500_000)


def run_rtm_cpu(p: Params, vp: Optional[np.ndarray] = None,
                dobs: Optional[np.ndarray] = None,
                outdir: Optional[str] = None, mesh=None,
                backend: str = "auto", shot_indices=None):
    """``rtm_main``: migrate all shots with full-wavefield storage.

    Returns ``(img, imlocs)`` — the stacked (nx, nz) image and the (ns, nx,
    nz) per-shot images. With ``outdir``, writes ``dir.image`` (stack) and
    ``dir.img`` (concatenated per-shot images), byte-compatible with
    ``rtm_main.cpp:232,247``.

    A mesh with an x axis > 1 decomposes the grid (and the 2*nt stored
    wavefields' memory) across devices. On large grids (beyond the
    whole-grid-fusion sweet spot) ``backend="auto"`` routes each shot
    through the HBM-streaming padded-layout kernels
    (:func:`..solver.rtm_shot_full_tiled`); "tiled"/"lax" force a tier.

    ``shot_indices`` migrates only the given *global* shot indices (``dobs``
    stays the full survey's gathers) — each selected shot's cross-shot it=0
    flat-read sample (``rtm_main.cpp:202``) is taken from its true successor
    in the full survey, so chunked/resumed runs (:mod:`.survey`) reproduce
    the uninterrupted run exactly. Returned arrays cover only the subset."""
    if vp is None:
        vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    if dobs is None:
        dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
    vel2 = jnp.asarray(prepare_velocity_cpu(p, vp))
    ctx = FDContext.from_params(p, exact_taper=False)
    g = Geometry.from_params(p)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))

    # the it=0 flat-read of each shot's last trace crosses into the next
    # shot's first sample in the reference's contiguous dobs block
    # (rtm_main.cpp:202); 0 for the last shot (see solver._injection_rows).
    # Computed over the FULL survey, then subset, so a chunk's last shot
    # still reads its true successor's sample.
    idx = (np.arange(p.ns) if shot_indices is None
           else np.asarray(shot_indices, np.int64))
    dobs_full = np.asarray(dobs, np.float32)
    nxt_full = np.concatenate([dobs_full[1:, 0, 0], np.zeros(1, np.float32)])
    sx_sel = np.asarray(g.sx, np.int32)[idx]
    dobs_sel = dobs_full[idx]
    nxt = nxt_full[idx]
    ns = len(idx)

    if mesh is not None and _mesh_decomposes_grid(mesh):
        img, imlocs = _run_rtm_cpu_domain(p, ctx, g, wav, vel2, dobs_sel,
                                          mesh, sx_sel, nxt)
        if outdir:
            io.write_image(os.path.join(outdir, "dir.image"), img)
            io.write_f32(os.path.join(outdir, "dir.img"), imlocs)
        return img, imlocs

    use_tiled = backend == "tiled" or (backend == "auto"
                                       and _tiled_rtm_wins(p))

    def shot_lax(sx, d, nx1):
        return rtm_shot_full(ctx, vel2, wav, d, sx, g.sz, g.gz,
                             next_shot_first=nx1)

    if use_tiled and mesh is not None:
        # shot-sharded streaming tier: each device migrates its local
        # shots through the K-blocked full-wavefield kernels (no lax
        # downgrade — the round-4 gap)
        from .parallel.shots import (make_sharded_rtm_full_tiled,
                                     distribute_shots, pad_shots)
        n_dev = mesh.shape.get("shot", 1)
        tr_tile = 256 if ctx.nxe >= 2048 else 64
        fn_sh = make_sharded_rtm_full_tiled(
            ctx, mesh, g.sz, g.gz, tile_rows=tr_tile,
            block_k=min(4, ctx.nt))
        sx_pad, _ = pad_shots(sx_sel, n_dev)
        d_pad, _ = pad_shots(dobs_sel, n_dev)
        nxt_pad, _ = pad_shots(nxt, n_dev)
        sx_in, d_in, nxt_in = distribute_shots(mesh, sx_pad, d_pad, nxt_pad)
        try:
            imlocs = np.asarray(
                fn_sh(vel2, d_in, sx_in, nxt_in, wav))[:ns]
            img = imlocs.sum(axis=0)
            if outdir:
                io.write_image(os.path.join(outdir, "dir.image"), img)
                io.write_f32(os.path.join(outdir, "dir.img"), imlocs)
            return img, imlocs
        except Exception as e:
            if backend != "auto":
                raise
            import warnings
            warnings.warn(f"sharded tiled RTM tier failed "
                          f"({type(e).__name__}: {str(e)[:200]}); falling "
                          f"back to the partitionable lax path")
            use_tiled = False

    if use_tiled:
        # temporally blocked (K=4 fused steps per HBM pass; the frames
        # the correlation needs are written from VMEM each pass)
        from .solver import rtm_shot_full_tiled
        tr_tile = 256 if ctx.nxe >= 2048 else 64
        shot = lambda sx, d, nx1: rtm_shot_full_tiled(
            ctx, vel2, wav, d, sx, g.sz, g.gz, next_shot_first=nx1,
            tile_rows=tr_tile, block_k=min(4, ctx.nt))
    else:
        shot = shot_lax
    if mesh is not None:
        # vmap (not lax.map): a batched program partitions across the
        # shot-sharded mesh axis; lax.map's per-step dynamic-slice would
        # serialize it (see run_modeling's identical constraint)
        run = jax.jit(jax.vmap(shot_lax))
    else:
        run = jax.jit(lambda sxs, ds, nx1s: jax.lax.map(
            lambda args: shot(*args), (sxs, ds, nx1s)))
    sx_in, d_in, nxt_in = (jnp.asarray(sx_sel), jnp.asarray(dobs_sel),
                           jnp.asarray(nxt))
    if mesh is not None:
        from .parallel.shots import distribute_shots, pad_shots
        n_dev = mesh.shape.get("shot", 1)
        sx_pad, _ = pad_shots(sx_sel, n_dev)
        d_pad, _ = pad_shots(dobs_sel, n_dev)
        nxt_pad, _ = pad_shots(nxt, n_dev)
        sx_in, d_in, nxt_in = distribute_shots(mesh, sx_pad, d_pad, nxt_pad)
    try:
        imlocs = np.asarray(run(sx_in, d_in, nxt_in))[:ns]
    except Exception as e:
        if backend != "auto" or not use_tiled:
            raise
        # auto must degrade, not crash: the tiled Mosaic kernels can fail
        # to compile on unusual grid/tile combinations — fall back to the
        # always-working lax whole-grid fusion (same policy as
        # _run_with_fallback in the other pipelines)
        import warnings
        warnings.warn(f"tiled RTM tier failed ({type(e).__name__}: "
                      f"{str(e)[:200]}); falling back to the lax path")
        run = jax.jit(lambda sxs, ds, nx1s: jax.lax.map(
            lambda args: shot_lax(*args), (sxs, ds, nx1s)))
        imlocs = np.asarray(run(sx_in, d_in, nxt_in))[:ns]
    img = imlocs.sum(axis=0)
    if outdir:
        io.write_image(os.path.join(outdir, "dir.image"), img)
        io.write_f32(os.path.join(outdir, "dir.img"), imlocs)
    return img, imlocs


def _run_rtm_cpu_domain(p: Params, ctx, g, wav, vel2, dobs, mesh, sx, nxt):
    """Domain-decomposed full-wavefield RTM over a (shot, x[, z]) mesh
    (:func:`..parallel.domain.make_sharded_rtm_full`, or the 2D
    :func:`..parallel.domain2d.make_sharded_rtm_full_2d` when the mesh
    also shards z — the 2*nt stored wavefields then split across all
    grid devices). ``sx``/``nxt`` are the (possibly subset) source
    positions and per-shot cross-shot it=0 samples from the caller."""
    from .parallel.domain import (make_sharded_rtm_full, embed_source_fields,
                                  embed_injection_rows)
    from .parallel.domain2d import make_sharded_rtm_full_2d
    from .parallel.shots import pad_shots
    n_shot = mesh.shape.get("shot", 1)
    sx_pad, ns = pad_shots(np.asarray(sx, np.int32), n_shot)
    sx_pad[ns:] = sx_pad[0]
    d_pad, _ = pad_shots(np.asarray(dobs, np.float32), n_shot)
    # zero the padded dummies' data; the genuine cross-shot it=0 samples
    # are threaded per shot (nxt covers chunked subsets correctly)
    d_pad[ns:] = 0.0
    nxt_pad, _ = pad_shots(np.asarray(nxt, np.float32), n_shot)
    inj_ext = embed_injection_rows(ctx, d_pad, next_first=nxt_pad)
    srcf = embed_source_fields(ctx, [int(s) for s in sx_pad], g.sz,
                               gaussian=False)
    v_rep = np.broadcast_to(np.asarray(vel2),
                            (len(sx_pad),) + np.asarray(vel2).shape).copy()
    if mesh.shape.get("z", 1) > 1:
        fn = make_sharded_rtm_full_2d(ctx, mesh, g.gz)
    else:
        fn = make_sharded_rtm_full(ctx, mesh, g.gz)
    im_ext = np.asarray(fn(v_rep, srcf, wav, inj_ext))
    imlocs = im_ext[:ns, ctx.nxb:ctx.nxe - ctx.nxb,
                    ctx.nzb:ctx.nze - ctx.nzb]
    return imlocs.sum(axis=0), imlocs


def run_rtm_gpu(p: Params, vp: Optional[np.ndarray] = None,
                dobs: Optional[np.ndarray] = None,
                seed: int = 0, outdir: Optional[str] = None,
                write_image_num: bool = False, backend: str = "auto",
                mesh=None, shot_indices=None, lap_impl=None):
    """``rtm_code``: two-snapshot RTM over all shots with random (or
    file-loaded) boundary velocities.

    Returns ``(img, imlocs)``. With ``outdir``, writes ``dir.image`` and
    ``dir.image_lap`` (zeros, faithfully: the reference never fills it,
    ``fd-code.cu:542``), and optionally the ``image.num`` cumulative text
    dump (``fd-code.cu:522-528``).

    ``shot_indices`` migrates only the given *global* shot indices (``dobs``
    stays the full survey's gathers); per-shot boundary-velocity PRNG keys /
    ``vel_ext_file`` rows stay those of the full survey, so chunked/resumed
    runs (:mod:`.survey`) reproduce the uninterrupted run exactly. Returned
    arrays cover only the subset."""
    if vp is None:
        vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    if dobs is None:
        dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
    idx = (np.arange(p.ns) if shot_indices is None
           else np.asarray(shot_indices, np.int64))
    vel2 = jnp.asarray(prepare_velocities_gpu(p, vp, seed=seed,
                                              shot_indices=idx))
    ctx = FDContext.from_params(p, exact_taper=True)
    g = Geometry.from_params(p)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak))
    sx_sel = np.asarray(g.sx, np.int32)[idx]
    dobs_sel = np.asarray(dobs, np.float32)[idx]
    ns = len(idx)

    if mesh is not None and _mesh_decomposes_grid(mesh):
        # grid decomposed over the mesh's x (and optionally z) axis (plus
        # shot sharding): the domain division the reference only named
        img, imlocs = _run_rtm_gpu_domain(p, ctx, g, wav, vel2, dobs_sel,
                                          mesh, backend, sx_sel,
                                          lap_impl=lap_impl)
        _write_rtm_gpu_outputs(outdir, img, imlocs, write_image_num)
        return img, imlocs

    run_pallas = None
    run_split = None
    if _use_pallas(backend) and mesh is not None:
        # shot-sharded whole-shot kernels: each device runs its local shots
        # (parallel/shots.py:make_sharded_rtm_pallas); beyond-VMEM grids
        # fall through to the sharded temporally-blocked streaming tier
        from .parallel.shots import (make_sharded_rtm_pallas,
                                     make_sharded_rtm_tiled)
        _sharded = make_sharded_rtm_pallas(ctx, mesh, g.sz, g.gz,
                                           lap_impl=lap_impl)
        run_pallas = lambda v2, sxs, d: _sharded(v2, d, sxs, wav)
        _sharded_t = make_sharded_rtm_tiled(
            ctx, mesh, g.sz, g.gz,
            tile_rows=256 if ctx.nxe >= 2048 else 64,
            block_k=min(4, ctx.nt), lap_impl=lap_impl)
        run_split = [lambda v2, sxs, d: _sharded_t(v2, d, sxs, wav)]
    if _use_pallas(backend) and mesh is None:
        # lax.map batching: one Mosaic kernel compile for any shot count.
        # With a mesh, the partitionable vmap path is used instead (a
        # sequential lax.map cannot split across devices).
        from .ops.pallas_fd import (rtm_snapshot_pallas, fd_forward_pallas,
                                    fd_back_pallas)
        run_pallas = jax.jit(lambda v2, sxs, d: jax.lax.map(
            lambda args: rtm_snapshot_pallas(ctx, args[0], wav, args[1],
                                             args[2], g.sz, g.gz,
                                             lap_impl=lap_impl),
            (v2, d, sxs)))
        run_split = jax.jit(lambda v2, sxs, d: jax.lax.map(
            lambda args: fd_back_pallas(
                ctx, args[0],
                *fd_forward_pallas(ctx, args[0], wav, args[2], g.sz),
                args[1], g.gz),
            (v2, d, sxs)))
        # beyond-VMEM tier: fused HBM-streaming padded-layout kernels,
        # temporally blocked (K=4 fused steps per HBM pass — the same
        # DMA-floor breaker as run_modeling's tiled tier)
        from .solver import rtm_shot_snapshot_tiled
        tr_tile = 256 if ctx.nxe >= 2048 else 64
        run_tiled = jax.jit(lambda v2, sxs, d: jax.lax.map(
            lambda args: rtm_shot_snapshot_tiled(ctx, args[0], wav, args[1],
                                                 args[2], g.sz, g.gz,
                                                 tile_rows=tr_tile,
                                                 block_k=min(4, ctx.nt),
                                                 lap_impl=lap_impl),
            (v2, d, sxs)))
        run_split = [run_split, run_tiled]
    run_lax = jax.vmap(
        lambda v2, sx, d: rtm_shot_snapshot(ctx, v2, wav, d, sx,
                                            g.sz, g.gz))
    v_in, sx_in, d_in = vel2, jnp.asarray(sx_sel), jnp.asarray(dobs_sel)
    if mesh is not None:
        from .parallel.shots import distribute_shots, pad_shots
        n_dev = mesh.shape.get("shot", 1)
        v_pad, _ = pad_shots(np.asarray(vel2), n_dev)
        sx_pad, _ = pad_shots(sx_sel, n_dev)
        d_pad, _ = pad_shots(dobs_sel, n_dev)
        v_in, sx_in, d_in = distribute_shots(mesh, v_pad, sx_pad, d_pad)
    imlocs = _run_with_fallback(run_pallas, run_lax,
                                (v_in, sx_in, d_in), backend,
                                run_pallas_split=run_split)[:ns]
    img = imlocs.sum(axis=0)
    _write_rtm_gpu_outputs(outdir, img, imlocs, write_image_num)
    return img, imlocs


def _write_rtm_gpu_outputs(outdir, img, imlocs, write_image_num):
    if not outdir:
        return
    io.write_image(os.path.join(outdir, "dir.image"), img)
    io.write_image(os.path.join(outdir, "dir.image_lap"),
                   np.zeros_like(img))
    # the reference opens these snapshot files but never writes them
    # (fd-code.cu:466-470; committed output/ has them empty)
    for fname in ("dir.snaps", "dir.snaps_rec", "dir.snapr"):
        open(os.path.join(outdir, fname), "w").close()
    if write_image_num:
        io.write_image_num(os.path.join(outdir, "image.num"),
                           list(np.cumsum(imlocs, axis=0)))


def _run_rtm_gpu_domain(p: Params, ctx, g, wav, vel2, dobs, mesh, backend,
                        sx, lap_impl=None):
    """x-domain-decomposed two-snapshot RTM over a (shot, x) mesh: every
    device computes an x-slab of the grid, exchanging order/2-wide halos
    over ICI — blocked VMEM-resident Pallas kernels
    (:func:`..parallel.domain_pallas.make_sharded_rtm_snapshot_pallas`)
    with the per-step lax formulation as fallback. ``sx`` holds the
    (possibly subset) source positions from the caller."""
    from .parallel.domain import (make_sharded_rtm_snapshot,
                                  embed_source_fields, embed_dobs)
    from .parallel.domain2d import make_sharded_rtm_snapshot_2d
    from .parallel.domain_pallas import make_sharded_rtm_snapshot_pallas
    from .parallel.shots import pad_shots
    n_shot = mesh.shape.get("shot", 1)
    n_x = mesh.shape.get("x", 1)
    n_z = mesh.shape.get("z", 1)
    v_pad, ns = pad_shots(np.asarray(vel2), n_shot)
    d_pad, _ = pad_shots(np.asarray(dobs, np.float32), n_shot)
    sx_pad, _ = pad_shots(np.asarray(sx, np.int32), n_shot)
    d_ext = embed_dobs(ctx, d_pad)

    run_pallas = None
    h = ctx.order // 2
    if _use_pallas(backend) and n_z == 1:
        block_k = min(8, (ctx.nxe // n_x) // h, ctx.nt // 2)
        if block_k >= 2:  # K<2 cannot seed both snapshots; lax handles it
            fn_pl = make_sharded_rtm_snapshot_pallas(ctx, mesh, g.sz, g.gz,
                                                     block_k=block_k,
                                                     lap_impl=lap_impl)
            run_pallas = lambda: fn_pl(v_pad, sx_pad, wav, d_ext)
    elif _use_pallas(backend):
        # z-sharded meshes: 2D blocked kernels (both-axis K*h halos)
        from .parallel.domain2d_pallas import (
            make_sharded_rtm_snapshot_2d_pallas)
        block_k = min(8, (ctx.nxe // n_x) // h, (ctx.nze // n_z) // h,
                      ctx.nt // 2)
        if block_k >= 2:
            fn_pl = make_sharded_rtm_snapshot_2d_pallas(
                ctx, mesh, g.sz, g.gz, block_k=block_k, lap_impl=lap_impl)
            run_pallas = lambda: fn_pl(v_pad, sx_pad, wav, d_ext)
    if n_z > 1:
        fn_lax = make_sharded_rtm_snapshot_2d(ctx, mesh, g.gz)
    else:
        fn_lax = make_sharded_rtm_snapshot(ctx, mesh, g.gz)
    srcf = embed_source_fields(ctx, [int(s) for s in sx_pad], g.sz,
                               gaussian=False)
    run_lax = lambda: fn_lax(v_pad, srcf, wav, d_ext)

    im_ext = _run_with_fallback(
        run_pallas and (lambda *a: run_pallas()),
        lambda *a: run_lax(), (), backend)
    imlocs = np.asarray(im_ext)[:ns, ctx.nxb:ctx.nxe - ctx.nxb,
                                ctx.nzb:ctx.nze - ctx.nzb]
    return imlocs.sum(axis=0), imlocs
