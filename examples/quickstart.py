#!/usr/bin/env python
"""Quickstart: model synthetic data and migrate it, on any JAX backend.

Mirrors the reference workflow (mod_main -> rtm_main on the 3-layer model,
``dpct_gpu_rtm_domain_division/build/3lay_mod/run.sh``) using a synthetic
3-layer velocity model, so it runs without the reference checkout:

    python examples/quickstart.py [--backend auto|lax|pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import pipeline
from parallel_finite_difference_computation_tpu.models import layered_model
from parallel_finite_difference_computation_tpu.utils.compare import laplace_filter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "lax", "pallas"])
    ap.add_argument("--outdir", default="quickstart_out")
    args = ap.parse_args()

    # acquisition: 4 shots across a 151x151 grid, reference-style params
    p = pfdc.Params(nz=151, nx=151, nt=1001, dz=10.0, dx=10.0, dt=0.001,
                    fpeak=30.0, ns=4, sz=0, fsx=0, ds=50, gz=0,
                    nxb=40, nzb=40, fac=0.01, order=8)
    vp = layered_model(p.nx, p.nz, (2400.0, 3200.0, 4000.0))

    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.time()
    data = pipeline.run_modeling(
        p, vp=vp, out_datfile=os.path.join(args.outdir, "dobs.bin"),
        backend=args.backend)
    print(f"modeled {data.shape[0]} shots in {time.time() - t0:.2f}s "
          f"-> {args.outdir}/dobs.bin")

    t0 = time.time()
    img, per_shot = pipeline.run_rtm_cpu(p, vp=vp, dobs=data,
                                         outdir=args.outdir)
    print(f"migrated in {time.time() - t0:.2f}s -> {args.outdir}/dir.image")

    sharp = laplace_filter(img, dx=p.dx, dz=p.dz)
    sharp.astype(np.float32).tofile(os.path.join(args.outdir, "dir.imalap"))
    print(f"post-filtered image -> {args.outdir}/dir.imalap")
    print(f"image stats: rms={np.sqrt((img**2).mean()):.4g} "
          f"max|.|={np.abs(img).max():.4g}")


if __name__ == "__main__":
    main()
