#!/usr/bin/env python
"""Pluto-scale demo: production-size grids beyond VMEM.

The reference ships a full-resolution Pluto config
(``dpct_gpu_rtm_domain_division/build/pluto/input.orig``: 1201x6960,
nt=12860, 30 shots) whose velocity blob is absent upstream. This demo runs
the same spatial dimensions with a synthetic layered model:

    python examples/pluto_scale.py [--nt 400]

On TPU, ``backend=auto`` resolves to the fused HBM-streaming kernels
(``ops/pallas_stream``), temporally blocked — K=4 fused steps per HBM
pass over row-tiles of the fixed-point padded layout (injection, taper
and recording in-kernel), ~4.3x the XLA scan path at this size for
modeling and 2x the per-step streaming tier for the two-snapshot RTM
(the whole-shot VMEM kernels that serve the shipped reference configs
cannot hold a 7040x1281 grid). On CPU it falls back to the lax path.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=400,
                    help="time steps (the full config runs 12860)")
    args = ap.parse_args()

    import jax
    from parallel_finite_difference_computation_tpu.config import Params
    from parallel_finite_difference_computation_tpu.models.zoo import (
        layered_model)
    from parallel_finite_difference_computation_tpu import pipeline

    p = Params(nz=1201, nx=6960, nt=args.nt, dz=7.62, dx=7.62, dt=0.0007,
               fpeak=6.0, ns=1, sz=0, fsx=2700, ds=20, gz=0,
               nxb=40, nzb=40, fac=0.75, order=8, rnd=1)
    vp = layered_model(p.nx, p.nz,
                       velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    dev = jax.devices()[0]
    print(f"device: {dev} | grid {p.nxe}x{p.nze} extended, nt={p.nt}")

    t0 = time.time()
    data = pipeline.run_modeling(p, vp=vp, backend="auto")
    dt = time.time() - t0
    cells = p.nxe * p.nze * p.nt
    print(f"forward modeling: {dt:.1f}s incl compile "
          f"({cells / dt / 1e9:.1f} GCell/s), gather {data.shape}, "
          f"peak {np.abs(data).max():.3e}")


if __name__ == "__main__":
    main()
