"""Measure the MXU lane-tap variant of the whole-shot RTM kernel on the
3lay golden config: batched-8/batched-32 per-shot times (slope cancels the
dispatch RTT) and rel-RMS accuracy vs the lax snapshot path, for the exact
VPU kernel vs lap_impl='mxu'.

Run:  python scripts/exp_mxu_wholeshot.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import io, numerics, pipeline
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, rtm_shot_snapshot)
from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
    rtm_snapshot_pallas)
from parallel_finite_difference_computation_tpu.utils.profiling import (
    timeit as _prof_timeit)

GOLDEN = "/root/reference/dpct_gpu_rtm_domain_division/build/3lay_mod"


def main():
    p = pfdc.parse_input_dat(os.path.join(GOLDEN, "input.dat"))
    g = p.geometry()
    vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    d0 = jnp.asarray(dobs[0])
    print("device:", jax.devices()[0], "grid:",
          (ctx.nze, ctx.nxe), "nt:", ctx.nt, flush=True)

    im_lax = np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(base), wav, d0,
                                          g.sx[0], g.sz, g.gz))
    rms = np.sqrt(np.mean(im_lax ** 2))

    def run(lap_impl, n_shots):
        d = jnp.broadcast_to(d0, (n_shots,) + d0.shape)
        sxs = jnp.full((n_shots,), g.sx[0], jnp.int32)
        fn = jax.jit(lambda v2s, d, sxs: jax.lax.map(
            lambda args: rtm_snapshot_pallas(ctx, args[0], wav, args[1],
                                             args[2], g.sz, g.gz,
                                             lap_impl=lap_impl),
            (v2s, d, sxs)))
        make = lambda i: (
            jnp.asarray(np.stack([base * (1 + 1e-7 * (i * n_shots + k))
                                  for k in range(n_shots)])), d, sxs)
        t = _prof_timeit(make, fn, warmup=2, iters=3)
        img = np.asarray(fn(jnp.asarray(np.stack([base] * n_shots)),
                            d, sxs))[0]
        rel = float(np.sqrt(np.mean((img - im_lax) ** 2)) / rms)
        return t / n_shots, rel

    for impl in ("vpu", "mxu"):
        try:
            t8, rel = run(impl, 8)
            t32, _ = run(impl, 32)
            slope = (t32 * 32 - t8 * 8) / 24
            print(f"{impl}: batched8 {t8*1e3:.2f} ms/shot, "
                  f"batched32 {t32*1e3:.2f}, slope {slope*1e3:.2f} ms/shot "
                  f"({slope/ctx.nt*1e6:.2f} us/step), rel RMS vs lax "
                  f"{rel:.2e}", flush=True)
        except Exception as e:
            print(f"{impl}: FAILED {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
