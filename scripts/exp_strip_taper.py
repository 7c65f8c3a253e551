"""Experiment: strip taper vs fused full-grid taper in the whole-shot
RTM kernel.

The GPU-suite taper (K3, ``kernel_tapper``, ``fd-code.cu:94-117``) only
modifies z rows < nzb (top strip + corners); everywhere else the mask is
exactly 1.0.  The fused step multiplies BOTH fields by the full-grid mask
every step and stores the tapered source field back full-grid; the strip
form (``taper_impl="strip"``) restricts the two multiplies to the
nzb-row sublane strip and drops the full-grid store — ~2.7 full-grid
op-slots of the ~35-slot step, bitwise identical output (verified in
interpret mode and asserted here on-chip).

Protocol: nt-slope (two nt values, dispatch RTT cancels), min of iters,
fresh wavelet per timing run to defeat result caching.

Run:  python scripts/exp_strip_taper.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu.solver import FDContext
from parallel_finite_difference_computation_tpu.ops import pallas_fd as pf
from parallel_finite_difference_computation_tpu.utils.profiling import timeit


def build(nt):
    rng = np.random.default_rng(7)
    nz, nx, nzb, nxb = 151, 151, 40, 40
    ctx = FDContext.create(nx=nx, nz=nz, nt=nt, dx=10.0, dz=10.0, dt=0.001,
                           order=8, nxb=nxb, nzb=nzb, fac=0.7)
    v2 = (1500.0 + 100 * rng.random((ctx.nxe, ctx.nze), np.float32)) ** 2
    wav = rng.standard_normal(nt).astype(np.float32) * 1e-3
    dobs = (rng.standard_normal((nx, nt)).astype(np.float32) * 1e-3)
    return ctx, jnp.asarray(v2), wav, jnp.asarray(dobs)


def measure(mode, nts=(401, 1601), iters=5):
    times = {}
    out = {}
    for nt in nts:
        ctx, v2, wav, dobs = build(nt)
        sx, sz, gz = ctx.nxb + 75, ctx.nzb + 3, ctx.nzb + 1

        import jax

        @jax.jit
        def run(w):
            return pf.rtm_snapshot_pallas(ctx, v2, w, dobs, sx, sz, gz,
                                          taper_impl=mode)

        times[nt] = timeit(
            lambda i: (jnp.asarray(wav + np.float32(i) * 1e-9),), run,
            warmup=2, iters=iters)
        out[nt] = np.asarray(run(jnp.asarray(wav)))
    us_per_step = (times[nts[1]] - times[nts[0]]) / (nts[1] - nts[0]) * 1e6
    return us_per_step, times, out


def main():
    rf, tf, of = measure("fused")
    rs, ts, os_ = measure("strip")
    for nt in tf:
        same = np.array_equal(of[nt], os_[nt])
        print(f"nt={nt}: fused {tf[nt]*1e3:.3f} ms  strip {ts[nt]*1e3:.3f} ms"
              f"  bitwise_equal={same}")
        assert same, "strip output differs from fused"
    print(f"slope us/step: fused {rf:.3f}  strip {rs:.3f}  "
          f"ratio {rf/rs:.3f}x")


if __name__ == "__main__":
    main()
