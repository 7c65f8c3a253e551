"""Experiment: the 6-pass (triple bf16 split) MXU lane-tap variant.

Question: the 3-pass MXU fast path (lap_impl="mxu") has a ~2^-16 split
residual per apply that marmousi's nt=3004 at the CFL edge amplifies to
2.4e-3 — outside the 1e-4 parity bar (validate 6d, the documented
limitation). The 6-pass variant (lap_impl="mxu6") captures ~24 mantissa
bits at twice the matmul passes. Does it (a) clear 1e-4 on marmousi at
full configuration and (b) keep a useful speed edge over the exact VPU
kernel (3.9 us/step; 3-pass: 1.8)?

Run on the real chip: python scripts/exp_mxu6.py [--quick]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_3lay(lap_impl):
    import bench
    t8 = bench.bench_rtm_pallas_batched(8, lap_impl=lap_impl)
    t32 = bench.bench_rtm_pallas_batched(32, lap_impl=lap_impl)
    slope = (t32 * 32 - t8 * 8) / 24
    return t8, slope


def marmousi_gate(lap_impl):
    """run_rtm_gpu(marmousi, pallas) under lap_impl vs the C-oracle
    golden — the validate-6d comparison."""
    import os
    import tempfile
    import jax.numpy as jnp  # noqa: F401
    import parallel_finite_difference_computation_tpu as pfdc
    from parallel_finite_difference_computation_tpu import pipeline
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        gpu_goldens)
    paths = gpu_goldens("marmousi")
    p = pfdc.parse_input_dat(str(paths["input_parity"]))
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        img, imlocs = pipeline.run_rtm_gpu(p, backend="pallas",
                                           outdir=td, lap_impl=lap_impl)
        wall = time.perf_counter() - t0
    golden = np.fromfile(paths["dir_image"], np.float32).reshape(p.nx, p.nz)
    gims = np.fromfile(paths["imlocs"], np.float32).reshape(p.ns, p.nx,
                                                            p.nz)

    def rel_rms(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / (np.sqrt(np.mean(b ** 2)) or 1.0))

    r = rel_rms(np.asarray(img), golden)
    rs = max(rel_rms(np.asarray(imlocs[i]), gims[i]) for i in range(p.ns))
    return r, rs, wall, p.ns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="3lay slope only, skip marmousi")
    args = ap.parse_args()

    for impl in ("mxu", "mxu6"):
        t8, slope = bench_3lay(impl)
        print(f"3lay {impl}: batched8 {t8 * 1e3:.2f} ms/shot, "
              f"slope {slope * 1e3:.2f} ms/shot")

    if args.quick:
        return
    for impl in ("mxu", "mxu6"):
        r, rs, wall, ns = marmousi_gate(impl)
        verdict = "PASS 1e-4" if max(r, rs) < 1e-4 else "outside 1e-4"
        print(f"marmousi {impl}: image rel RMS {r:.2e}, worst shot "
              f"{rs:.2e} ({verdict}); {wall:.1f}s for {ns} shots")


if __name__ == "__main__":
    main()
