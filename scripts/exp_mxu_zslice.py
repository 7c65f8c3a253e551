"""Measure the z (sublane) tap lowering inside the MXU whole-shot RTM
kernel: static rolls (shipping) vs interior slices + sublane pad
(z_taps="slice"). The padded slice lowering measured 1.28x the roll
lowering on the all-VPU kernel (lane rolls cost rotate+select); this asks
whether the same holds for the *sublane* rolls left on the VPU by the MXU
lane-tap path — which is VPU-bound on its residual ops (measured ~103
GCell-upd/s vs the 171 GCell/s 3-pass-MXU floor).

Run:  python scripts/exp_mxu_zslice.py [--wide]
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
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    d0 = jnp.asarray(dobs[0])
    ctx0 = FDContext.from_params(p, exact_taper=False)
    print("device:", jax.devices()[0], "grid:",
          (ctx0.nze, ctx0.nxe), "nt:", ctx0.nt, flush=True)

    im_lax = np.asarray(rtm_shot_snapshot(ctx0, jnp.asarray(base), wav, d0,
                                          g.sx[0], g.sz, g.gz))
    rms = np.sqrt(np.mean(im_lax ** 2))

    def run(ztaps, n_shots):
        ctx = FDContext.from_params(p, exact_taper=False)
        d = jnp.broadcast_to(d0, (n_shots,) + d0.shape)
        sxs = jnp.full((n_shots,), g.sx[0], jnp.int32)
        fn = jax.jit(lambda v2s, d, sxs: jax.lax.map(
            lambda args: rtm_snapshot_pallas(ctx, args[0], wav, args[1],
                                             args[2], g.sz, g.gz,
                                             lap_impl="mxu",
                                             z_taps=ztaps),
            (v2s, d, sxs)))
        make = lambda i: (
            jnp.asarray(np.stack([base * (1 + 1e-7 * (i * n_shots + k))
                                  for k in range(n_shots)])), d, sxs)
        t = _prof_timeit(make, fn, warmup=2, iters=3)
        img = np.asarray(fn(jnp.asarray(np.stack([base] * n_shots)),
                            d, sxs))[0]
        rel = float(np.sqrt(np.mean((img - im_lax) ** 2)) / rms)
        return t / n_shots, rel, img

    imgs = {}
    for ztaps in ("roll", "slice"):
        try:
            t8, rel, img = run(ztaps, 8)
            imgs[ztaps] = img
            t32, _, _ = run(ztaps, 32)
            slope = (t32 * 32 - t8 * 8) / 24
            print(f"mxu z={ztaps}: batched8 {t8*1e3:.2f} ms/shot, "
                  f"batched32 {t32*1e3:.2f}, slope {slope*1e3:.2f} ms/shot "
                  f"({slope/ctx0.nt*1e6:.2f} us/step), rel RMS vs lax "
                  f"{rel:.2e}", flush=True)
        except Exception as e:
            print(f"mxu z={ztaps}: FAILED {str(e)[:400]}", flush=True)
    if len(imgs) == 2:
        d = np.max(np.abs(imgs["roll"] - imgs["slice"]))
        print(f"roll-vs-slice max abs diff: {d:.3e} "
              f"({'BITWISE IDENTICAL' if d == 0 else 'DIFFERS'})",
              flush=True)


if __name__ == "__main__":
    main()
