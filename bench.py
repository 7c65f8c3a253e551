#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline: full RTM (forward modeling + migration, rtm_main-equivalent) on the
reference's 3lay golden config, seconds per shot on the attached accelerator,
vs the self-established local baseline of the reference's own CPU
implementation (BASELINE_LOCAL.json; the reference publishes no numbers —
BASELINE.md). Secondary metrics (stencil GCell/s, modeling throughput) go to
BENCH_DETAILS.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# PFDC_BENCH_PLATFORM=cpu pins the platform for offline smoke runs (the
# JAX_PLATFORMS env var alone is read too late here — sitecustomize
# pre-imports jax — and ambient-device init hangs when the TPU tunnel is
# down, so the config update is the only reliable pin).
_plat = os.environ.get("PFDC_BENCH_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

# persistent compilation cache: Mosaic whole-shot kernels take minutes to
# compile through the remote-compile tunnel; cache survives across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import io, numerics, pipeline
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, rtm_shot_full)
from parallel_finite_difference_computation_tpu.ops.stencil import laplacian
from parallel_finite_difference_computation_tpu.utils.profiling import (
    timeit as _prof_timeit)

REFERENCE = os.environ.get("PFDC_REFERENCE_ROOT", "/root/reference")
GOLDEN = os.path.join(REFERENCE, "dpct_gpu_rtm_domain_division/build/3lay_mod")

BASELINE_RTM_S_PER_SHOT = 9.05   # BASELINE_LOCAL.json: rtm_main 3lay, 1 shot
BASELINE_MOD_S_PER_SHOT = 4.58   # mod_main 3lay, 1 shot


def _timeit(make_args, fn, warmup=1, iters=3):
    """utils.profiling.timeit with bench's historical (time, None) shape."""
    return _prof_timeit(make_args, fn, warmup=warmup, iters=iters), None


def _load_3lay():
    cfg = os.path.join(GOLDEN, "input.dat")
    if os.path.exists(cfg):
        p = pfdc.parse_input_dat(cfg)
        vp = io.read_velocity(p.vpfile, p.nx, p.nz)
        dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
    else:  # reference absent: synthesize the same-shaped workload
        p = pfdc.Params(nz=151, nx=151, nt=1001, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=30.0, ns=1, nxb=40, nzb=40, fac=0.01, order=8)
        from parallel_finite_difference_computation_tpu.models import layered_model
        vp = layered_model(p.nx, p.nz)
        dobs = None
    return p, vp, dobs


def bench_rtm():
    p, vp, dobs = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    if dobs is None:
        dobs = pipeline.run_modeling(p, vp=vp)
    d0 = jnp.asarray(dobs[0])

    make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    fn = lambda v: rtm_shot_full(ctx, v, wav, d0, g.sx[0], g.sz, g.gz)
    t, _ = _timeit(make, fn)
    # correctness gate alongside the timing (unperturbed velocity)
    rel = None
    gold_path = os.path.join(GOLDEN, "dir.image")
    if os.path.exists(gold_path):
        golden = io.read_f32(gold_path).reshape(p.nx, p.nz)
        img = np.asarray(fn(jnp.asarray(base)))
        rel = float(np.sqrt(np.mean((img - golden) ** 2))
                    / np.sqrt(np.mean(golden ** 2)))
    return t, rel


def bench_rtm_pallas_batched(n_shots: int = 8, lap_impl=None):
    """Headline: whole-shot Pallas RTM (two-snapshot GPU-suite flavor; one
    fused VMEM-resident kernel per shot) batched over ``n_shots`` with
    lax.map — the production path. Per-shot time amortizes the one-call
    dispatch overhead exactly as a real multi-shot survey would.
    ``lap_impl="mxu"`` selects the MXU lane-tap kernel (banded block
    matmuls, manual 3-pass bf16; ~2x the exact VPU kernel, ~2e-5 rel RMS
    per shot — gated below)."""
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        rtm_snapshot_pallas)
    p, vp, dobs = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    if dobs is None:
        dobs = pipeline.run_modeling(p, vp=vp, backend="lax")
    d = jnp.broadcast_to(jnp.asarray(dobs[0]), (n_shots,) + dobs[0].shape)
    sxs = jnp.full((n_shots,), g.sx[0], jnp.int32)

    fn = jax.jit(lambda v2s, d, sxs: jax.lax.map(
        lambda args: rtm_snapshot_pallas(ctx, args[0], wav, args[1], args[2],
                                         g.sz, g.gz, lap_impl=lap_impl),
        (v2s, d, sxs)))
    make = lambda i: (
        jnp.asarray(np.stack([base * (1 + 1e-7 * (i * n_shots + k))
                              for k in range(n_shots)])), d, sxs)
    t, _ = _timeit(make, fn)
    return t / n_shots


def bench_rtm_mxu_accuracy():
    """Rel RMS of the MXU whole-shot kernel's 3lay image vs the lax
    snapshot path (which is itself externally gated vs the C oracle and
    goldens) — the accuracy bar the MXU fast path must clear to serve as
    the headline."""
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        rtm_snapshot_pallas)
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_snapshot)
    p, vp, dobs = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    if dobs is None:
        dobs = pipeline.run_modeling(p, vp=vp, backend="lax")
    d0 = jnp.asarray(dobs[0])
    v = jnp.asarray(base)
    im_lax = np.asarray(rtm_shot_snapshot(ctx, v, wav, d0, g.sx[0], g.sz,
                                          g.gz))
    im_mxu = np.asarray(rtm_snapshot_pallas(ctx, v, wav, d0, g.sx[0], g.sz,
                                            g.gz, lap_impl="mxu"))
    return float(np.sqrt(np.mean((im_mxu - im_lax) ** 2))
                 / (np.sqrt(np.mean(im_lax ** 2)) or 1.0))


def bench_rtm_pallas_single():
    """Unbatched single-shot whole-shot-kernel latency (one pallas call).
    On this tunneled setup each synced call carries a fixed ~26 ms
    round-trip, so this bounds *latency*; the batched number is the
    *throughput* figure a survey sees."""
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        rtm_snapshot_pallas)
    p, vp, dobs = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    if dobs is None:
        dobs = pipeline.run_modeling(p, vp=vp, backend="lax")
    d0 = jnp.asarray(dobs[0])
    fn = jax.jit(lambda v2: rtm_snapshot_pallas(ctx, v2, wav, d0,
                                                g.sx[0], g.sz, g.gz))
    make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    return _prof_timeit(make, fn, warmup=2, iters=5)



import contextlib


@contextlib.contextmanager
def _quiet_mxu_envelope():
    """Suppress the lap_impl='mxu' out-of-envelope UserWarning for bench's
    own *diagnostic* entries: the bench deliberately measures the 3-pass
    tier beyond its validated-accuracy range (long-nt slope legs, pluto
    scale) to record its SPEED; accuracy there is explicitly out of
    contract and the headline never routes to it (resolve_lap_impl).
    Keeping the captured artifact free of expected warnings is a
    record-hygiene requirement (VERDICT r4 #8)."""
    import warnings
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message=".*outside its validated accuracy envelope.*",
            category=UserWarning)
        yield


def bench_rtm_domain_pallas(n_x: int = 1, block_k: int = 8):
    """The multi-chip production path compiled and run on the real chip:
    x-domain-decomposed blocked Pallas RTM (halo exchange every block_k
    steps) over an (1, n_x) mesh — n_x=1 on the single available chip, same
    kernel/collective program as a pod slice."""
    from parallel_finite_difference_computation_tpu.parallel import (
        make_mesh, embed_dobs)
    from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
        import make_sharded_rtm_snapshot_pallas
    p, vp, dobs = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    if dobs is None:
        dobs = pipeline.run_modeling(p, vp=vp, backend="lax")
    mesh = make_mesh(n_shot=1, n_x=n_x)
    fn = make_sharded_rtm_snapshot_pallas(ctx, mesh, g.sz, g.gz,
                                          block_k=block_k)
    d_ext = embed_dobs(ctx, np.asarray(dobs[:1], np.float32))
    sxs = np.asarray([g.sx[0]], np.int32)
    make = lambda i: (np.stack([base * (1 + 1e-7 * i)]), sxs, wav, d_ext)
    return _prof_timeit(make, fn, warmup=2, iters=3)


def bench_rtm_domain_pallas_slope(n_x: int = 1, block_k: int = 8,
                                  nts=(501, 4501), lap_impl=None):
    """Sustained per-step cost of the domain-decomposed blocked kernel vs the
    whole-shot kernel, with the fixed dispatch/tunnel cost cancelled by the
    slope between two nt values (3lay-shaped 151x151 grid, synthetic
    operands; correctness is gated in validate.py / tests).

    Returns (domain_us_per_step, wholeshot_us_per_step). The residual ratio
    is structural: the domain block computes on the halo-extended width
    nxw = nxl + 2*K*order/2 (231+64=295 -> 3 vregs of 128 lanes at n_x=1)
    while the whole-shot kernel uses 231 -> 2 vregs, a 3/2 VPU-work floor.
    """
    import dataclasses
    from parallel_finite_difference_computation_tpu.parallel import (
        make_mesh, embed_dobs)
    from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
        import make_sharded_rtm_snapshot_pallas
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        rtm_snapshot_pallas)
    mesh = make_mesh(n_shot=1, n_x=n_x)
    p0, vp, _ = _load_3lay()
    base = pipeline.prepare_velocity_cpu(p0, vp)
    rng = np.random.default_rng(0)

    def measure(make_fn_and_args):
        ts = {}
        for nt in nts:
            p = dataclasses.replace(p0, nt=nt)
            ctx = FDContext.from_params(p, exact_taper=False)
            g = p.geometry()
            wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                                      truncated=True))
            dobs = rng.standard_normal((p.nx, p.nt)).astype(np.float32)
            fn, mk = make_fn_and_args(ctx, g, wav, dobs)
            ts[nt] = _prof_timeit(mk, fn, warmup=2, iters=5)
        return (ts[nts[1]] - ts[nts[0]]) / (nts[1] - nts[0]) * 1e6

    def domain(ctx, g, wav, dobs):
        fn = make_sharded_rtm_snapshot_pallas(ctx, mesh, g.sz, g.gz,
                                              block_k=block_k,
                                              lap_impl=lap_impl)
        d_ext = jax.device_put(embed_dobs(ctx, dobs[None]))
        sxs = jax.device_put(np.asarray([g.sx[0]], np.int32))
        v2s = [jax.device_put(np.stack([base * (1 + 1e-7 * i)]))
               for i in range(-4, 6)]
        return fn, lambda i: (v2s[i + 4], sxs, wav, d_ext)

    def wholeshot(ctx, g, wav, dobs):
        d0 = jnp.asarray(dobs)
        fn = jax.jit(lambda v, c=ctx, w=wav: rtm_snapshot_pallas(
            c, v, w, d0, g.sx[0], g.sz, g.gz, lap_impl=lap_impl))
        v2s = [jax.device_put(base * (1 + 1e-7 * i)) for i in range(-4, 6)]
        return fn, lambda i: (v2s[i + 4],)

    return measure(domain), measure(wholeshot)


def bench_rtm_domain2d_slope(nts=(501, 4501)):
    """Sustained per-step cost of the 2D (x, z) decomposition's lax
    formulation (:mod:`..parallel.domain2d`) on a 1x1x1 mesh — the
    single-chip proxy for its per-chip efficiency, comparable to the 1D
    tier's and the whole-shot kernel's recorded slopes (the tunnel's
    fixed dispatch RTT cancels in the nt slope). On one chip the halo
    exchanges are the n_shards==1 zero-pad concats, so this isolates the
    *formulation* cost; the per-axis ppermute adds ICI latency on a real
    block (modelled in PALLAS_NOTES, not measurable here).

    Returns domain2d_us_per_step."""
    import dataclasses
    from jax.sharding import Mesh
    from parallel_finite_difference_computation_tpu.parallel import (
        embed_dobs)
    from parallel_finite_difference_computation_tpu.parallel.domain import (
        embed_source_fields)
    from parallel_finite_difference_computation_tpu.parallel.domain2d \
        import make_sharded_rtm_snapshot_2d
    # make_mesh collapses n_z == 1 to a (shot, x) mesh; the 2D tier needs
    # the z axis present, so build the 1x1x1 (shot, x, z) mesh directly
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("shot", "x", "z"))
    p0, vp, _ = _load_3lay()
    base = pipeline.prepare_velocity_cpu(p0, vp)
    rng = np.random.default_rng(0)
    ts = {}
    for nt in nts:
        p = dataclasses.replace(p0, nt=nt)
        ctx = FDContext.from_params(p, exact_taper=False)
        g = p.geometry()
        wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                                  truncated=True))
        dobs = rng.standard_normal((p.nx, p.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_2d(ctx, mesh, g.gz)
        d_ext = jax.device_put(embed_dobs(ctx, dobs[None]))
        srcf = jax.device_put(embed_source_fields(
            ctx, [int(g.sx[0])], g.sz, gaussian=False))
        v2s = [jax.device_put(np.stack([base * (1 + 1e-7 * i)]))
               for i in range(-4, 6)]
        mk = lambda i: (v2s[i + 4], srcf, wav, d_ext)
        ts[nt] = _prof_timeit(mk, fn, warmup=2, iters=5)
    return (ts[nts[1]] - ts[nts[0]]) / (nts[1] - nts[0]) * 1e6


def bench_rtm_domain2d_pallas_slope(nts=(501, 4501), block_k: int = 8,
                                    lap_impl=None, force_halo=False):
    """Sustained per-step cost of the 2D (x, z) decomposition's blocked
    Pallas tier (:mod:`..parallel.domain2d_pallas`) on a 1x1x1 mesh — the
    single-chip proxy comparable to the 1D blocked tier's recorded slope.

    With the default routing, single-shard axes carry no halo, so the
    1x1x1 run measures what production would actually execute on this
    mesh (the kernel degenerates toward the whole-shot cost). With
    ``force_halo=True`` both K*h halos stay — the redundant-compute proxy
    for what an interior device of a large (x, z) block pays per step
    (its per-axis ppermute latency is modelled in PALLAS_NOTES; not
    measurable on one chip).

    Returns domain2d_pallas_us_per_step."""
    import dataclasses
    from jax.sharding import Mesh
    from parallel_finite_difference_computation_tpu.parallel import (
        embed_dobs)
    from parallel_finite_difference_computation_tpu.parallel.domain2d_pallas \
        import make_sharded_rtm_snapshot_2d_pallas
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("shot", "x", "z"))
    p0, vp, _ = _load_3lay()
    base = pipeline.prepare_velocity_cpu(p0, vp)
    rng = np.random.default_rng(0)
    ts = {}
    for nt in nts:
        p = dataclasses.replace(p0, nt=nt)
        ctx = FDContext.from_params(p, exact_taper=False)
        g = p.geometry()
        wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                                  truncated=True))
        dobs = rng.standard_normal((p.nx, p.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_2d_pallas(ctx, mesh, g.sz, g.gz,
                                                 block_k=block_k,
                                                 lap_impl=lap_impl,
                                                 force_halo=force_halo)
        d_ext = jax.device_put(embed_dobs(ctx, dobs[None]))
        sxs = jax.device_put(np.asarray([g.sx[0]], np.int32))
        v2s = [jax.device_put(np.stack([base * (1 + 1e-7 * i)]))
               for i in range(-4, 6)]
        mk = lambda i: (v2s[i + 4], sxs, wav, d_ext)
        ts[nt] = _prof_timeit(mk, fn, warmup=2, iters=5)
    return (ts[nts[1]] - ts[nts[0]]) / (nts[1] - nts[0]) * 1e6


def bench_rtm_shotshard_stream_slope(nts=(201, 1001), block_k: int = 4):
    """Sustained per-step cost of the shot-sharded beyond-VMEM streaming
    RTM tier (:func:`..parallel.shots.make_sharded_rtm_tiled`) on a
    1-device shot mesh vs the same kernels unsharded — the single-chip
    proxy showing the shard_map wrapper adds no per-step cost (shots are
    independent; zero collectives until image stacking).

    Returns (sharded_us_per_step, unsharded_us_per_step)."""
    import dataclasses
    from parallel_finite_difference_computation_tpu.parallel import make_mesh
    from parallel_finite_difference_computation_tpu.parallel.shots import (
        make_sharded_rtm_tiled)
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_snapshot_tiled)
    mesh = make_mesh(n_shot=1)
    p0, vp, _ = _load_3lay()
    base = pipeline.prepare_velocity_cpu(p0, vp)
    rng = np.random.default_rng(0)

    def measure(make_fn_and_args):
        ts = {}
        for nt in nts:
            p = dataclasses.replace(p0, nt=nt)
            ctx = FDContext.from_params(p, exact_taper=False)
            g = p.geometry()
            wav = jnp.asarray(numerics.ricker_wavelet(
                p.nt, p.dt, p.fpeak, truncated=True))
            dobs = rng.standard_normal((p.nx, p.nt)).astype(np.float32)
            fn, mk = make_fn_and_args(ctx, g, wav, dobs)
            ts[nt] = _prof_timeit(mk, fn, warmup=2, iters=5)
        return (ts[nts[1]] - ts[nts[0]]) / (nts[1] - nts[0]) * 1e6

    def sharded(ctx, g, wav, dobs):
        fn = make_sharded_rtm_tiled(ctx, mesh, g.sz, g.gz, tile_rows=64,
                                    block_k=block_k)
        d = jax.device_put(dobs[None])
        sxs = jax.device_put(np.asarray([g.sx[0]], np.int32))
        v2s = [jax.device_put(np.stack([base * (1 + 1e-7 * i)]))
               for i in range(-4, 6)]
        return fn, lambda i: (v2s[i + 4], d, sxs, wav)

    def unsharded(ctx, g, wav, dobs):
        d0 = jnp.asarray(dobs)
        fn = jax.jit(lambda v, c=ctx, w=wav: rtm_shot_snapshot_tiled(
            c, v, w, d0, g.sx[0], g.sz, g.gz, tile_rows=64,
            block_k=block_k))
        v2s = [jax.device_put(base * (1 + 1e-7 * i)) for i in range(-4, 6)]
        return fn, lambda i: (v2s[i + 4],)

    return measure(sharded), measure(unsharded)


def bench_marmousi_pallas(lap_impl=None):
    """Flagship-scale whole-shot Pallas RTM (marmousi GPU-suite config,
    409x455 extended, nt=3004). Compile takes many minutes through the
    remote Mosaic helper, so this runs only with PFDC_BENCH_FULL=1; the
    recorded number lives in BENCH_DETAILS.json/docs. ``lap_impl="mxu6"``
    measures the 6-pass MXU accuracy tier (the fast path that clears
    1e-4 at this nt — validate 6d)."""
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        rtm_snapshot_pallas)
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_snapshot)
    cfg = os.path.join(REFERENCE, "cuda_reference_RTM/models/marmousi/input.dat")
    if not os.path.exists(cfg):
        return None
    p = pfdc.parse_input_dat(cfg)
    vp = io.read_velocity(
        os.path.join(REFERENCE, "cuda_reference_RTM/models/marmousi/model-375.cwp"),
        p.nx, p.nz)
    base = pipeline.prepare_velocity_cpu(p, vp)  # perf-representative v2
    ctx = FDContext.from_params(p, exact_taper=True)
    g = p.geometry()
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak))
    dobs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (p.nx, p.nt)).astype(np.float32))
    fn = jax.jit(lambda v2: rtm_snapshot_pallas(ctx, v2, wav, dobs,
                                                g.sx[0], g.sz, g.gz,
                                                lap_impl=lap_impl))
    make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    t = _prof_timeit(make, fn, warmup=2, iters=3)
    ref = np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(base), wav, dobs,
                                       g.sx[0], g.sz, g.gz))
    got = np.asarray(fn(jnp.asarray(base)))
    rel = float(np.abs(got - ref).max() / (np.abs(ref).max() or 1.0))
    return t, rel


def bench_modeling():
    p, vp, _ = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    fn = lambda v: forward_modeling(ctx, v, wav, g.sx[0], g.sz, g.gz,
                                    source="gaussian", taper="all",
                                    record="trace")[2]
    t, _ = _timeit(make, fn)
    return t


def bench_modeling_pallas(n_shots: int = 8, lap_impl=None):
    """Whole-shot VMEM Pallas forward modeling (mod_main flavor: gaussian
    source, 4-edge taper, trace recording) batched over shots — the same
    production pattern as the batched RTM entry. Per-shot time amortizes
    the fixed per-dispatch tunnel RTT. ``lap_impl="mxu"`` selects the MXU
    lane-tap kernel (returned rel is then vs the same lax reference)."""
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        forward_modeling_pallas)
    p, vp, _ = _load_3lay()
    g = p.geometry()
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    sxs = jnp.full((n_shots,), g.sx[0], jnp.int32)
    fn = jax.jit(lambda v2s, sxs: jax.lax.map(
        lambda args: forward_modeling_pallas(
            ctx, args[0], wav, args[1], g.sz, g.gz,
            source="gaussian", taper="all", lap_impl=lap_impl)[2],
        (v2s, sxs)))
    make = lambda i: (
        jnp.asarray(np.stack([base * (1 + 1e-7 * (i * n_shots + k))
                              for k in range(n_shots)])), sxs)
    t = _prof_timeit(make, fn, warmup=2, iters=3)
    # parity vs the lax path on the unperturbed velocity
    ref = np.asarray(forward_modeling(ctx, jnp.asarray(base), wav, g.sx[0],
                                      g.sz, g.gz, source="gaussian",
                                      taper="all", record="trace")[2])
    got = np.asarray(fn(jnp.asarray(np.stack([base] * n_shots)), sxs))[0]
    rel = float(np.sqrt(np.mean((got - ref) ** 2))
                / (np.sqrt(np.mean(ref ** 2)) or 1.0))
    return t / n_shots, rel


def bench_marmousi():
    """Flagship-scale RTM (marmousi, 449x455, nt=3004) on the lax path,
    gated against outputs regenerated from the reference's own binaries
    (scripts/make_reference_baselines.sh). Returns (s_per_shot, rel_rms)
    or None when the regenerated artifacts are absent."""
    d = os.path.join(os.environ.get("PFDC_BASELINE_BUILD",
                                    "/tmp/pfdc_oracle/baseline_build"),
                     "runmarm")
    if not os.path.exists(os.path.join(d, "dado_teste.bin")):
        return None
    from parallel_finite_difference_computation_tpu.solver import rtm_shot_full as _rtm
    p = pfdc.parse_input_dat(os.path.join(d, "input.dat"))
    g = p.geometry()
    vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    dobs = jnp.asarray(io.read_shot_gathers(
        os.path.join(d, "dado_teste.bin"), p.ns, p.nx, p.nt)[0])
    fn = lambda v: _rtm(ctx, v, wav, dobs, g.sx[0], g.sz, g.gz)
    make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    t, _ = _timeit(make, fn)
    ref_img = io.read_f32(os.path.join(d, "dir.image")).reshape(p.nx, p.nz)
    img = np.asarray(fn(jnp.asarray(base)))
    rel = float(np.sqrt(np.mean((img - ref_img) ** 2))
                / np.sqrt(np.mean(ref_img ** 2)))
    return t, rel


def bench_stencil(repeats: int = 50):
    """Laplacian on the stencil benchmark's own 415x295 grid
    (cuda_reference_stencil_computation), reported as GCell-updates/s.
    ``repeats`` chained applications inside one jit amortize dispatch."""
    nxe, nze, order = 415, 295, 8
    path = os.path.join(REFERENCE,
                        "cuda_reference_stencil_computation/input.bin")
    if os.path.exists(path):
        field = io.read_velocity(path, nxe, nze)
    else:
        field = np.random.default_rng(0).standard_normal(
            (nxe, nze)).astype(np.float32)
    cx = jnp.asarray(numerics.scaled_coefficients(order, 10.0, 10.0)[0])
    cz = jnp.asarray(numerics.scaled_coefficients(order, 10.0, 10.0)[1])

    @jax.jit
    def f(x):
        def body(i, a):
            return laplacian(a, cx, cz, order) + 1e-12 * i
        return jax.lax.fori_loop(0, repeats, body, x)

    make = lambda i: (jnp.asarray(field * (1 + 1e-7 * i)),)
    t, _ = _timeit(make, f, warmup=2, iters=5)
    cells = (nxe - order) * (nze - order) * repeats
    return cells / t / 1e9, t / repeats


def bench_stencil_large(n: int = 8192, repeats: int = 16,
                        tiles=(((128, 2048), 24 << 20),
                               ((256, 512), 12 << 20),
                               ((512, 512), 24 << 20))):
    """Production-size stencil via the tiled Pallas kernel (2D DMA tiles,
    double-buffered): GCell/s at n x n, autotuned over tile shapes and taken
    as best-of-5 per tile (pins the session-to-session variance round 1
    observed). This is compute-bound on v5e — order-8 f32 arithmetic
    intensity (~4.4 flop/byte at the 2-pass traffic floor) exceeds the
    VPU/HBM balance point, so the measured VPU issue-rate ceiling
    (:func:`profiling.vpu_ceiling_cell_rate`, ~74.9 GCell/s for the 27-op
    split-axis symmetric-pair stencil), not the HBM roofline, is the
    speed-of-light.
    Returns (gcell, s_per_apply, tile)."""
    from parallel_finite_difference_computation_tpu.ops.pallas_stencil import (
        laplacian_pallas)
    cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
    base = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)

    best = (0.0, float("inf"), None)
    for tile, budget in tiles:
        @jax.jit
        def chain(x, _tile=tile, _b=budget):
            y = x
            for k in range(repeats):
                y = laplacian_pallas(y * (1.0 + 1e-9 * k), cx, cz, 8,
                                     tile=_tile, vmem_budget=_b)
            return y

        make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
        try:
            t = _prof_timeit(make, chain, warmup=2, iters=5)
        except Exception:
            continue
        per = t / repeats
        g = n * n / per / 1e9
        if g > best[0]:
            best = (g, per, tile)
    if best[2] is None:
        raise RuntimeError("no stencil tile compiled")
    return best


def bench_stencil_padded(n: int = 8192, repeats: int = 16, tile_rows: int = 64,
                         impl: str = "vpu"):
    """Sustained stencil throughput on the fixed-point padded layout
    (:func:`...pallas_stencil.laplacian_pallas_padded`): applies chain with
    no per-apply pad/slice — profiling showed the per-call jnp.pad inside
    ``laplacian_pallas`` costs ~45% of each apply at 8192^2, so this is the
    honest repeated-apply rate of the kernel itself (the one-shot embed and
    extract are amortized over ``repeats``). Returns a 4-tuple
    (gcell, s_per_apply, max_abs_err_vs_lax, gcell_slope) where gcell_slope
    is the dispatch-RTT-cancelled rate from the slope between the
    ``repeats`` and ``3*repeats`` chain lengths — the sustained kernel rate
    a long run sees.

    ``impl="mxu"`` benchmarks the MXU z-tap variant (banded block matmuls,
    manual 3-pass bf16 — DMA-bound, ~1.76x the VPU path at 8192^2); its
    error entry is *relative* to max|lap| (documented ~5e-6; the VPU path
    keeps the absolute, bit-exact convention)."""
    from parallel_finite_difference_computation_tpu.ops.pallas_stencil import (
        laplacian_pallas_padded, to_padded, from_padded)
    from parallel_finite_difference_computation_tpu.ops.stencil import (
        laplacian)
    cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
    base = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)

    def chain(k):
        @jax.jit
        def f(x):
            p = to_padded(x, 8, tile_rows)
            for _ in range(k):
                p = laplacian_pallas_padded(p, cx, cz, 8, n, n, tile_rows,
                                            impl=impl)
            return from_padded(p, n, n, 8, tile_rows)
        return f

    @jax.jit
    def single(x):
        p = to_padded(x, 8, tile_rows)
        return from_padded(laplacian_pallas_padded(p, cx, cz, 8, n, n,
                                                   tile_rows, impl=impl),
                           n, n, 8, tile_rows)

    xs = jnp.asarray(base)
    got = np.asarray(single(xs))
    ref = np.asarray(jax.jit(lambda x: laplacian(
        x, jnp.asarray(cx), jnp.asarray(cz), 8))(xs))
    err = float(np.abs(got - ref).max())
    if impl == "mxu":
        err = err / (float(np.abs(ref).max()) or 1.0)
    make = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    t = _prof_timeit(make, chain(repeats), warmup=2, iters=5) / repeats
    # slope between chain lengths cancels the constant dispatch/readback
    # RTT (~26-30 ms through the tunnel) that inflates t by RTT/repeats
    t3 = _prof_timeit(make, chain(3 * repeats), warmup=1, iters=3)
    t_slope = max((t3 - t * repeats) / (2 * repeats), 1e-9)
    return n * n / t / 1e9, t, err, n * n / t_slope / 1e9


def bench_pluto_modeling(nt: int = 400, block_k: int = 1,
                         tile_rows: int = 64, lap_impl=None):
    """Forward modeling at the reference's full-resolution Pluto dims
    (1201x6960, ``build/pluto/input.orig``; its velocity blob is gitignored
    upstream, so the model is synthetic): the fused HBM-streaming step
    (:func:`...solver.forward_modeling_tiled`) — the beyond-VMEM tier of
    the modeling backend chain. ``block_k > 1`` measures the
    temporal-blocking kernel (K fused steps per HBM pass).
    Returns (ms_per_step, gcell_per_s)."""
    from parallel_finite_difference_computation_tpu.solver import (
        FDContext, forward_modeling_tiled)
    from parallel_finite_difference_computation_tpu.models.zoo import (
        layered_model)
    ctx = FDContext.create(6960, 1201, nt, dx=7.62, dz=7.62, dt=0.0007,
                           order=8, nxb=40, nzb=40, fac=0.75)
    vp = layered_model(6960, 1201,
                       velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    v2 = np.zeros((ctx.nxe, ctx.nze), np.float32)
    v2[40:-40, 40:-40] = vp * vp
    v2 = np.asarray(numerics.extendvel_clamp(v2, 6960, 1201, 40, 40))
    wav = np.asarray(numerics.ricker_wavelet(nt, 0.0007, 6.0))

    fn = lambda w, v: forward_modeling_tiled(ctx, v, w, 2740, 40, 40,
                                             tile_rows=tile_rows,
                                             block_k=block_k,
                                             lap_impl=lap_impl)[2]
    make = lambda i: (jnp.asarray(wav * (1 + 1e-6 * i)),
                      jnp.asarray(v2 * (1 + 1e-7 * abs(i))))
    t = _prof_timeit(make, fn, warmup=2, iters=3) / nt
    return t * 1e3, ctx.nxe * ctx.nze / t / 1e9


def bench_pluto_rtm(nt: int = 400, block_k: int = 1, tile_rows: int = 256,
                    lap_impl=None):
    """Two-snapshot RTM at the Pluto dims — the reference's flagship
    domain-division use case (``dpct_gpu_rtm_domain_division/build/
    spluto``) on one chip via the beyond-VMEM streaming tier
    (:func:`...solver.rtm_shot_snapshot_tiled`). ``block_k > 1`` measures
    the temporal-blocking kernels (K fused fd_forward/fd_back steps per
    HBM pass). Returns (ms_per_timestep, gcell_updates_per_s) — three
    field updates per timestep (1 forward + 2 backward)."""
    from parallel_finite_difference_computation_tpu.solver import (
        FDContext, rtm_shot_snapshot_tiled)
    from parallel_finite_difference_computation_tpu.models.zoo import (
        layered_model)
    ctx = FDContext.create(6960, 1201, nt, dx=7.62, dz=7.62, dt=0.0007,
                           order=8, nxb=40, nzb=40, fac=0.75)
    vp = layered_model(6960, 1201,
                       velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    v2 = np.zeros((ctx.nxe, ctx.nze), np.float32)
    v2[40:-40, 40:-40] = vp * vp
    v2 = np.asarray(numerics.extendvel_clamp(v2, 6960, 1201, 40, 40))
    wav = np.asarray(numerics.ricker_wavelet(nt, 0.0007, 6.0))
    rng = np.random.default_rng(0)
    dobs = rng.standard_normal((6960, nt)).astype(np.float32)

    fn = lambda w, v, d: rtm_shot_snapshot_tiled(
        ctx, v, w, d, 2740, 40, 40, tile_rows=tile_rows, block_k=block_k,
        lap_impl=lap_impl)
    make = lambda i: (jnp.asarray(wav * (1 + 1e-6 * i)),
                      jnp.asarray(v2 * (1 + 1e-7 * abs(i))),
                      jnp.asarray(dobs * (1 + 1e-6 * i)))
    t = _prof_timeit(make, fn, warmup=1, iters=2) / nt
    return t * 1e3, 3 * ctx.nxe * ctx.nze / t / 1e9


# Perf floors: regression gates over the round-1/round-2 measured numbers
# (batched pallas 3lay measured ~6.8 ms; tiled stencil measured 15.9-24.8
# GCell/s across sessions — the floor catches real regressions, not
# session variance). A violation still prints the JSON line, then exits 1.
FLOOR_RTM_PALLAS_S = 0.012
FLOOR_RTM_MXU_S = 0.012
FLOOR_STENCIL_GCELL = 12.0
GATE_REL_RMS = 1e-4


def _previous_record():
    """The committed BENCH_DETAILS.json, or {}. Used to hold the run to
    its own history: if the tier recorded as the committed headline
    errors or regresses past its floor in this run, that is a floor
    violation (exit 1), not a silent fallback — the round-3 lesson,
    where the committed MXU headline died of a toolchain change and the
    one-line headline quietly regressed 30% to the VPU tier."""
    try:
        with open("BENCH_DETAILS.json") as f:
            return json.load(f)
    except Exception:
        return {}


def main():
    # PFDC_TRACE=<dir>: capture a jax.profiler trace of the benchmarks
    # for TensorBoard/XProf inspection
    import contextlib
    trace_dir = os.environ.get("PFDC_TRACE")
    if trace_dir:
        from parallel_finite_difference_computation_tpu.utils.profiling \
            import trace as _trace
        ctxmgr = _trace(trace_dir)
    else:
        ctxmgr = contextlib.nullcontext()
    with ctxmgr:
        return _main_body()


def _main_body():
    from parallel_finite_difference_computation_tpu.utils.profiling import (
        vpu_ceiling_cell_rate, stencil_ops_per_cell,
        fused_update_ops_per_cell, device_hbm_gbps)
    dev = jax.devices()[0]
    details = {"device": str(dev), "platform": dev.platform}
    floors = []
    prev_record = _previous_record()
    prev_headline = prev_record.get("rtm_headline_impl")

    t_rtm, rel = bench_rtm()
    details["rtm_3lay_lax_s_per_shot"] = t_rtm
    details["rtm_3lay_rel_rms_vs_golden"] = rel
    details["rtm_lax_speedup_vs_cpu_reference"] = BASELINE_RTM_S_PER_SHOT / t_rtm
    if rel is not None and rel > GATE_REL_RMS:
        floors.append(f"rtm rel_rms {rel:.2e} > {GATE_REL_RMS}")

    if dev.platform == "tpu":
        t_pallas = bench_rtm_pallas_batched()
        details["rtm_3lay_pallas_s_per_shot_batched8"] = t_pallas
        details["rtm_pallas_speedup_vs_cpu_reference"] = (
            BASELINE_RTM_S_PER_SHOT / t_pallas)
        # effective field-update rate: 3 grid updates per step (1 fwd,
        # 2 bwd); per cell-update the fused op count (split-axis stencil 27
        # + leapfrog/taper; imaging amortized)
        p3, _, _ = _load_3lay()
        cells = p3.nxe * p3.nze * p3.nt * 3
        details["rtm_pallas_gcell_updates_per_s"] = cells / t_pallas / 1e9
        details["rtm_pallas_vpu_ceiling_fraction"] = (
            cells / t_pallas) / vpu_ceiling_cell_rate(
                fused_update_ops_per_cell(8))
        t_single = bench_rtm_pallas_single()
        details["rtm_3lay_pallas_s_per_shot_unbatched"] = t_single
        try:
            t_b32 = bench_rtm_pallas_batched(n_shots=32)
            details["rtm_3lay_pallas_s_per_shot_batched32"] = t_b32
            # sustained per-shot cost with the fixed per-dispatch RTT
            # cancelled: slope between the two batch sizes
            slope = (t_b32 * 32 - t_pallas * 8) / 24
            if slope > 0:
                details["rtm_3lay_pallas_s_per_shot_slope"] = slope
                # ceiling fraction quoted against the sustained (RTT-
                # cancelled) rate — the batched8 fraction understates the
                # kernel by the amortized dispatch share
                details["rtm_pallas_gcell_updates_per_s_slope"] = (
                    cells / slope / 1e9)
                details["rtm_pallas_slope_vpu_ceiling_fraction"] = (
                    cells / slope) / vpu_ceiling_cell_rate(
                        fused_update_ops_per_cell(8))
        except Exception as e:
            details["rtm_3lay_pallas_batched32_error"] = str(e)[:200]
        try:
            t_dom = bench_rtm_domain_pallas()
            details["rtm_3lay_domain_pallas_nx1_s_per_shot"] = t_dom
        except Exception as e:
            details["rtm_3lay_domain_pallas_error"] = str(e)[:200]
        try:
            # sustained (RTT-cancelled) per-step comparison: the single-
            # dispatch number above carries the fixed ~26-35 ms tunnel RTT,
            # which at nt=1001 inflates the domain/whole-shot ratio ~7x;
            # the nt-slope is the honest per-chip efficiency figure
            us_dom, us_ws = bench_rtm_domain_pallas_slope()
            details["rtm_3lay_domain_pallas_nx1_us_per_step_slope"] = us_dom
            details["rtm_3lay_wholeshot_pallas_us_per_step_slope"] = us_ws
            details["rtm_3lay_domain_vs_wholeshot_step_ratio"] = us_dom / us_ws
        except Exception as e:
            details["rtm_3lay_domain_slope_error"] = str(e)[:200]
        try:
            # the domain tier's MXU fast path (same per-chip comparison)
            with _quiet_mxu_envelope():
                us_dom_m, us_ws_m = bench_rtm_domain_pallas_slope(
                    lap_impl="mxu")
            details["rtm_3lay_domain_mxu_nx1_us_per_step_slope"] = us_dom_m
            details["rtm_3lay_wholeshot_mxu_us_per_step_slope"] = us_ws_m
            details["rtm_3lay_domain_mxu_vs_wholeshot_step_ratio"] = (
                us_dom_m / us_ws_m)
        except Exception as e:
            details["rtm_3lay_domain_mxu_slope_error"] = str(e)[:200]
        try:
            # 2D (x, z) decomposition tier: single-chip per-step slope
            # (1x1x1 mesh; the n_x=1/n_z=1 proxy, like the 1D tier's)
            us_2d = bench_rtm_domain2d_slope()
            details["rtm_3lay_domain2d_nx1nz1_us_per_step_slope"] = us_2d
            us_ws0 = details.get("rtm_3lay_wholeshot_pallas_us_per_step_slope")
            if us_ws0:
                details["rtm_3lay_domain2d_vs_wholeshot_step_ratio"] = (
                    us_2d / us_ws0)
        except Exception as e:
            details["rtm_3lay_domain2d_slope_error"] = str(e)[:200]
        try:
            # 2D (x, z) blocked Pallas tier (domain2d_pallas): the pod-scale
            # production kernels, exact + MXU taps, same 1x1x1 proxy.
            # Routed = per-axis halos (none on single-shard axes: what this
            # mesh actually runs); halo = force_halo interior-device proxy.
            us_2dp = bench_rtm_domain2d_pallas_slope()
            details["rtm_3lay_domain2d_pallas_nx1nz1_us_per_step_slope"] = (
                us_2dp)
            us_2dph = bench_rtm_domain2d_pallas_slope(force_halo=True)
            details["rtm_3lay_domain2d_pallas_halo_us_per_step_slope"] = (
                us_2dph)
            with _quiet_mxu_envelope():
                us_2dpm = bench_rtm_domain2d_pallas_slope(lap_impl="mxu")
            details["rtm_3lay_domain2d_pallas_mxu_nx1nz1_us_per_step_slope"] \
                = us_2dpm
        except Exception as e:
            details["rtm_3lay_domain2d_pallas_slope_error"] = str(e)[:200]
        try:
            # shot-sharded streaming tier: 1-device shot mesh vs the same
            # kernels unsharded (the wrapper-cost proxy)
            us_sh, us_un = bench_rtm_shotshard_stream_slope()
            details["rtm_3lay_shotshard_stream_us_per_step_slope"] = us_sh
            details["rtm_3lay_unsharded_stream_us_per_step_slope"] = us_un
            details["rtm_3lay_shotshard_vs_unsharded_stream_ratio"] = (
                us_sh / us_un)
        except Exception as e:
            details["rtm_3lay_shotshard_stream_slope_error"] = str(e)[:200]
        t_headline = t_pallas
        if t_pallas > FLOOR_RTM_PALLAS_S:
            floors.append(f"rtm pallas {t_pallas:.4f}s > {FLOOR_RTM_PALLAS_S}")
        details["rtm_headline_impl"] = "vpu"
        try:
            # MXU lane-tap fast path: headline-eligible iff its full-shot
            # image clears the same 1e-4 bar the lax path is externally
            # gated at (chain: golden/oracle <- lax <- mxu)
            rel_mxu = bench_rtm_mxu_accuracy()
            details["rtm_3lay_mxu_rel_rms_vs_lax_path"] = rel_mxu
            t_mxu8 = bench_rtm_pallas_batched(lap_impl="mxu")
            details["rtm_3lay_mxu_s_per_shot_batched8"] = t_mxu8
            details["rtm_mxu_speedup_vs_cpu_reference"] = (
                BASELINE_RTM_S_PER_SHOT / t_mxu8)
            t_mxu32 = bench_rtm_pallas_batched(n_shots=32, lap_impl="mxu")
            details["rtm_3lay_mxu_s_per_shot_batched32"] = t_mxu32
            slope_mxu = (t_mxu32 * 32 - t_mxu8 * 8) / 24
            if slope_mxu > 0:
                details["rtm_3lay_mxu_s_per_shot_slope"] = slope_mxu
                details["rtm_mxu_gcell_updates_per_s_slope"] = (
                    cells / slope_mxu / 1e9)
            if t_mxu8 > FLOOR_RTM_MXU_S:
                floors.append(f"rtm mxu {t_mxu8:.4f}s > {FLOOR_RTM_MXU_S}")
            if rel_mxu > GATE_REL_RMS and prev_headline == "mxu":
                floors.append(
                    f"committed headline tier mxu off its accuracy gate: "
                    f"rel_rms {rel_mxu:.2e} > {GATE_REL_RMS}")
            if rel_mxu <= GATE_REL_RMS and t_mxu8 < t_headline:
                t_headline = t_mxu8
                details["rtm_headline_impl"] = "mxu"
        except Exception as e:
            details["rtm_3lay_mxu_error"] = str(e)[:200]
            if prev_headline == "mxu":
                # the committed headline tier must not die silently
                floors.append("committed headline tier mxu errored: "
                              + str(e)[:120])
        try:
            # 6-pass triple-split accuracy tier (lap_impl="mxu6"):
            # ~f32-level per apply — the fast path for long-nt configs
            # (clears 1e-4 on marmousi where 3-pass doesn't; validate 6d)
            t_m68 = bench_rtm_pallas_batched(lap_impl="mxu6")
            details["rtm_3lay_mxu6_s_per_shot_batched8"] = t_m68
            t_m632 = bench_rtm_pallas_batched(n_shots=32, lap_impl="mxu6")
            slope_m6 = (t_m632 * 32 - t_m68 * 8) / 24
            if slope_m6 > 0:
                details["rtm_3lay_mxu6_s_per_shot_slope"] = slope_m6
        except Exception as e:
            details["rtm_3lay_mxu6_error"] = str(e)[:200]
    else:
        t_headline = t_rtm

    t_mod = bench_modeling()
    details["modeling_3lay_s_per_shot"] = t_mod
    details["modeling_speedup_vs_cpu_reference"] = BASELINE_MOD_S_PER_SHOT / t_mod
    if dev.platform == "tpu":
        try:
            t_modp, rel_modp = bench_modeling_pallas()
            details["modeling_3lay_pallas_s_per_shot_batched8"] = t_modp
            details["modeling_3lay_pallas_rel_rms_vs_lax"] = rel_modp
            details["modeling_pallas_speedup_vs_cpu_reference"] = (
                BASELINE_MOD_S_PER_SHOT / t_modp)
            if rel_modp > GATE_REL_RMS:
                floors.append(f"modeling pallas rel_rms {rel_modp:.2e} > "
                              f"{GATE_REL_RMS}")
        except Exception as e:
            details["modeling_3lay_pallas_error"] = str(e)[:200]
        try:
            t_modm, rel_modm = bench_modeling_pallas(lap_impl="mxu")
            details["modeling_3lay_mxu_s_per_shot_batched8"] = t_modm
            details["modeling_3lay_mxu_rel_rms_vs_lax"] = rel_modm
            details["modeling_mxu_speedup_vs_cpu_reference"] = (
                BASELINE_MOD_S_PER_SHOT / t_modm)
            if rel_modm > GATE_REL_RMS:
                floors.append(f"modeling mxu rel_rms {rel_modm:.2e} > "
                              f"{GATE_REL_RMS}")
        except Exception as e:
            details["modeling_3lay_mxu_error"] = str(e)[:200]

    gcell, t_st = bench_stencil()
    details["stencil_gcell_per_s"] = gcell
    details["stencil_single_launch_s"] = t_st

    if dev.platform == "tpu":
        try:
            g8, t8, tile8 = bench_stencil_large()
            details["stencil_8192_pallas_gcell_per_s"] = g8
            details["stencil_8192_pallas_s_per_apply"] = t8
            details["stencil_8192_pallas_best_tile"] = list(tile8)
            ceil = vpu_ceiling_cell_rate(stencil_ops_per_cell(8))
            details["stencil_vpu_ceiling_gcell_per_s"] = ceil / 1e9
            details["stencil_8192_vpu_ceiling_fraction"] = g8 * 1e9 / ceil
            # HBM roofline at the in+out traffic floor (8 B/cell)
            details["stencil_8192_hbm_roofline_fraction"] = (
                g8 * 1e9 * 8) / (device_hbm_gbps(dev) * 1e9)
            if g8 < FLOOR_STENCIL_GCELL:
                floors.append(f"stencil {g8:.1f} GCell/s < "
                              f"{FLOOR_STENCIL_GCELL}")
        except Exception as e:
            details["stencil_8192_pallas_error"] = str(e)[:200]
        try:
            gp, tp, errp, gp_slope = bench_stencil_padded()
            details["stencil_8192_padded_gcell_per_s"] = gp
            details["stencil_8192_padded_s_per_apply"] = tp
            details["stencil_8192_padded_max_abs_err_vs_lax"] = errp
            # dispatch-RTT-free kernel rate (slope between chain lengths)
            details["stencil_8192_padded_gcell_per_s_slope"] = gp_slope
            ceil = vpu_ceiling_cell_rate(stencil_ops_per_cell(8))
            details["stencil_8192_padded_vpu_ceiling_fraction"] = (
                gp * 1e9 / ceil)
            details["stencil_8192_padded_slope_vpu_ceiling_fraction"] = (
                gp_slope * 1e9 / ceil)
            if gp < FLOOR_STENCIL_GCELL:
                floors.append(f"padded stencil {gp:.1f} GCell/s < "
                              f"{FLOOR_STENCIL_GCELL}")
            if errp > 1e-6:
                floors.append(f"padded stencil err vs lax {errp:.2e} "
                              "(measured bit-exact on this chip)")
        except Exception as e:
            details["stencil_8192_padded_error"] = str(e)[:200]
        try:
            gm, tm, errm, gm_slope = bench_stencil_padded(impl="mxu",
                                                          tile_rows=128)
            details["stencil_8192_mxu_gcell_per_s"] = gm
            details["stencil_8192_mxu_s_per_apply"] = tm
            details["stencil_8192_mxu_rel_err_vs_lax"] = errm
            details["stencil_8192_mxu_gcell_per_s_slope"] = gm_slope
            # the MXU variant is DMA-bound: quote against the HBM traffic
            # floor (8 B/cell) rather than the VPU issue-rate ceiling
            details["stencil_8192_mxu_hbm_roofline_fraction"] = (
                gm_slope * 1e9 * 8) / (device_hbm_gbps(dev) * 1e9)
            if gm_slope < 30.0:
                floors.append(f"mxu stencil {gm_slope:.1f} GCell/s < 30")
            if errm > 2e-5:
                floors.append(f"mxu stencil rel err {errm:.2e} > 2e-5")
        except Exception as e:
            details["stencil_8192_mxu_error"] = str(e)[:200]
        try:
            from parallel_finite_difference_computation_tpu.utils.profiling \
                import measure_stream_gbps
            details["measured_stream_gbps"] = measure_stream_gbps()
            # The operative DMA-bound target (BASELINE.md): fraction of the
            # MEASURED achievable stream rate, alongside the spec-sheet
            # fraction above (819 GB/s is not reached by any kernel on
            # this part, including a pure copy — see docs/PALLAS_NOTES.md)
            gm_s = details.get("stencil_8192_mxu_gcell_per_s_slope")
            if gm_s:
                details["stencil_8192_mxu_measured_stream_fraction"] = (
                    gm_s * 8) / details["measured_stream_gbps"]
        except Exception as e:
            details["measured_stream_error"] = str(e)[:200]
        try:
            ms, gc = bench_pluto_modeling()
            details["modeling_pluto_scale_ms_per_step"] = ms
            details["modeling_pluto_scale_gcell_per_s"] = gc
        except Exception as e:
            details["modeling_pluto_scale_error"] = str(e)[:200]
        try:
            # the beyond-VMEM streaming tier's MXU fast path (explicit
            # lap_impl kwarg — never a trace-time env read)
            with _quiet_mxu_envelope():
                ms, gc = bench_pluto_modeling(lap_impl="mxu")
            details["modeling_pluto_scale_mxu_ms_per_step"] = ms
            details["modeling_pluto_scale_mxu_gcell_per_s"] = gc
        except Exception as e:
            details["modeling_pluto_scale_mxu_error"] = str(e)[:200]
        try:
            # temporal blocking: K fused steps per HBM pass breaks the
            # per-step tier's DMA floor (ops/pallas_stream.fd_kstep_padded);
            # K=4 measures best (halo-redundancy compute grows with K)
            ms, gc = bench_pluto_modeling(block_k=4, tile_rows=256)
            details["modeling_pluto_scale_kstep4_ms_per_step"] = ms
            details["modeling_pluto_scale_kstep4_gcell_per_s"] = gc
        except Exception as e:
            details["modeling_pluto_scale_kstep4_error"] = str(e)[:200]
        try:
            # ... and its MXU z-tap variant (the streaming tier's fastest
            # path: temporal blocking removes the DMA bound that made the
            # per-step MXU variant a 1.06x wash)
            with _quiet_mxu_envelope():
                ms, gc = bench_pluto_modeling(block_k=4, tile_rows=256,
                                              lap_impl="mxu")
            details["modeling_pluto_scale_kstep4_mxu_ms_per_step"] = ms
            details["modeling_pluto_scale_kstep4_mxu_gcell_per_s"] = gc
        except Exception as e:
            details["modeling_pluto_scale_kstep4_mxu_error"] = str(e)[:200]
        try:
            # pluto-scale two-snapshot RTM (the reference's flagship
            # domain-division config on one chip): per-step streaming tier
            ms, gc = bench_pluto_rtm()
            details["rtm_pluto_scale_ms_per_step"] = ms
            details["rtm_pluto_scale_gcell_upd_per_s"] = gc
        except Exception as e:
            details["rtm_pluto_scale_error"] = str(e)[:200]
        try:
            # ... and its temporally-blocked kernels (K=4 fused
            # fd_forward/fd_back steps per HBM pass; 2.0x the per-step
            # tier)
            ms, gc = bench_pluto_rtm(block_k=4)
            details["rtm_pluto_scale_kstep4_ms_per_step"] = ms
            details["rtm_pluto_scale_kstep4_gcell_upd_per_s"] = gc
        except Exception as e:
            details["rtm_pluto_scale_kstep4_error"] = str(e)[:200]
        try:
            # ... and the MXU z-tap variant (the dual-field backward is
            # compute-heavy enough that the MXU buys another 1.47x on top
            # of blocking: measured 35.7 vs 24.3 vs 12.1 per-step; K=8
            # and tile_rows=512 both measure worse). Values gated at
            # pluto scale in validate config 9.
            with _quiet_mxu_envelope():
                ms, gc = bench_pluto_rtm(block_k=4, lap_impl="mxu")
            details["rtm_pluto_scale_kstep4_mxu_ms_per_step"] = ms
            details["rtm_pluto_scale_kstep4_mxu_gcell_upd_per_s"] = gc
        except Exception as e:
            details["rtm_pluto_scale_kstep4_mxu_error"] = str(e)[:200]

    marm = bench_marmousi()
    if marm:
        details["rtm_marmousi_s_per_shot"] = marm[0]
        details["rtm_marmousi_rel_rms_vs_reference_run"] = marm[1]
        details["rtm_marmousi_speedup_vs_cpu_reference"] = 153.6 / marm[0]

    if dev.platform == "tpu" and os.environ.get("PFDC_BENCH_FULL"):
        mp = bench_marmousi_pallas()
        if mp:
            details["rtm_marmousi_pallas_s_per_shot"] = mp[0]
            details["rtm_marmousi_pallas_max_rel_vs_lax"] = mp[1]
            details["rtm_marmousi_pallas_speedup_vs_cpu_reference"] = (
                153.6 / mp[0])
        try:
            mp6 = bench_marmousi_pallas(lap_impl="mxu6")
        except Exception as e:
            details["rtm_marmousi_mxu6_error"] = str(e)[:200]
            mp6 = None
        if mp6:
            details["rtm_marmousi_mxu6_s_per_shot"] = mp6[0]
            details["rtm_marmousi_mxu6_max_rel_vs_lax"] = mp6[1]
            details["rtm_marmousi_mxu6_speedup_vs_cpu_reference"] = (
                153.6 / mp6[0])
    else:
        # preserve the full-bench-only entries from the previous record
        # (the marmousi whole-shot kernel compile takes many minutes and
        # only reruns with PFDC_BENCH_FULL=1) — and SAY SO: a carried
        # number must never read as a fresh measurement (the round-3
        # marmousi-mxu6 anomaly, where a carried entry looked like the
        # one MXU success in a run whose MXU tier was dead)
        carried = []
        for k, v in prev_record.items():
            if k.startswith(("rtm_marmousi_pallas", "rtm_marmousi_mxu6")):
                details[k] = v
                carried.append(k)
        if carried:
            details["entries_carried_from_previous_record"] = carried

    # Committed-record guard for the headline-ADJACENT tiers (VERDICT r4
    # #4): a tier the committed record holds must not die silently in the
    # current run — an errored guarded tier, or one beyond its absolute
    # bound, fails the run exactly like the headline guard. Carried
    # entries (explicitly marked above) are not fresh claims and are
    # exempt.
    _GUARDED = [
        # (entry, error key, direction, bound)
        ("rtm_pluto_scale_kstep4_gcell_upd_per_s",
         "rtm_pluto_scale_kstep4_error", "min", 20.0),
        ("rtm_pluto_scale_kstep4_mxu_gcell_upd_per_s",
         "rtm_pluto_scale_kstep4_mxu_error", "min", 28.0),
        ("rtm_marmousi_pallas_s_per_shot",
         "rtm_marmousi_pallas_error", "max", 0.15),
        ("rtm_marmousi_mxu6_s_per_shot",
         "rtm_marmousi_mxu6_error", "max", 0.15),
    ]
    if dev.platform == "tpu":
        carried_now = details.get("entries_carried_from_previous_record",
                                  [])
        for key, err_key, kind, bound in _GUARDED:
            if key not in prev_record or key in carried_now:
                continue
            if key not in details:
                why = details.get(err_key, "entry missing from the run")
                floors.append(
                    f"committed guarded tier {key} died: {str(why)[:120]}")
            elif ((kind == "min" and details[key] < bound)
                  or (kind == "max" and details[key] > bound)):
                floors.append(f"guarded tier {key} = {details[key]:.4g} "
                              f"beyond its {bound} bound")

    # Fold the recorded full-resolution Pluto survey (the end-to-end
    # CLI run with checkpoint/resume, scripts/run_pluto_survey.py) into
    # the committed record so the survey-scale numbers live next to the
    # kernel slopes. These are a recorded artifact of that run, not
    # re-measured here (the full survey takes ~20 min of chip time).
    try:
        _psr = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "experiments",
                            "pluto_survey_results.json")
        if os.path.exists(_psr):
            with open(_psr) as f:
                ps = json.load(f)
            if ps.get("nt", 0) >= 12860 and ps.get("ns", 0) >= 30:
                for k in ("modeling_wall_s", "modeling_s_per_shot",
                          "rtm_total_wall_s", "rtm_s_per_shot",
                          "rtm_gcell_upd_per_s_incl_compile_and_restart",
                          "chunk_vs_standalone_shot_rel_err",
                          "tiled_vs_lax_truncated_nt_rel_err", "date"):
                    if k in ps:
                        details[f"pluto_survey_{k}"] = ps[k]
    except Exception as e:
        details["pluto_survey_record_error"] = str(e)[:200]

    details["floor_violations"] = floors
    # a PFDC_BENCH_PLATFORM=cpu smoke run must not clobber the recorded
    # TPU details; write them to a side file instead
    out_name = ("BENCH_DETAILS.json" if dev.platform == "tpu"
                else f"BENCH_DETAILS_{dev.platform}.json")
    with open(out_name, "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "rtm_3lay_s_per_shot",
        "value": round(t_headline, 4),
        "unit": "s/shot",
        "vs_baseline": round(BASELINE_RTM_S_PER_SHOT / t_headline, 2),
    }))
    if floors:
        print("PERF FLOOR VIOLATIONS: " + "; ".join(floors), file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
