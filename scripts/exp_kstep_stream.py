"""Experiment: temporal blocking of the beyond-VMEM streaming tier.

The per-step streaming kernel is DMA-bound at pluto scale (~13 GCell/s:
4 fields read + 2 written per step). fd_kstep_padded fuses K steps per
HBM pass (5 halo-extended slabs in, 2 fields + a trace block out), so
traffic drops ~6/(7.3/K) and the tier should move toward the VPU
compute ceiling. Measures ms/step and GCell/s for block_k in {1, 4, 8}
at the reference's full-resolution Pluto dims, plus a value check vs
the per-step path at reduced nt.

Run on the real chip: python scripts/exp_kstep_stream.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling_tiled)
from parallel_finite_difference_computation_tpu.models.zoo import (
    layered_model)
from parallel_finite_difference_computation_tpu import numerics


def setup(nt):
    ctx = FDContext.create(6960, 1201, nt, dx=7.62, dz=7.62, dt=0.0007,
                           order=8, nxb=40, nzb=40, fac=0.75)
    vp = layered_model(6960, 1201,
                       velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    v2 = np.zeros((ctx.nxe, ctx.nze), np.float32)
    v2[40:-40, 40:-40] = vp * vp
    v2 = np.asarray(numerics.extendvel_clamp(v2, 6960, 1201, 40, 40))
    wav = np.asarray(numerics.ricker_wavelet(nt, 0.0007, 6.0))
    return ctx, jnp.asarray(v2), jnp.asarray(wav)


def timeit(fn, make, warmup=2, iters=3):
    for i in range(warmup):
        jax.block_until_ready(fn(*make(i)))
    ts = []
    for i in range(iters):
        a = make(100 + i)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    # value check at small nt
    nt = 48
    ctx, v2, wav = setup(nt)
    _, _, s1 = forward_modeling_tiled(ctx, v2, wav, 2740, 40, 40)
    ref = np.asarray(s1)
    for K, tr in [(4, 256), (8, 256)]:
        _, _, sK = forward_modeling_tiled(ctx, v2, wav, 2740, 40, 40,
                                          tile_rows=tr, block_k=K)
        err = np.abs(np.asarray(sK) - ref).max() / (np.abs(ref).max() or 1)
        print(f"value K={K} tr={tr}: seis max rel err vs per-step "
              f"{err:.2e}")

    nt = 400
    cells = None
    import os
    import itertools
    cases = [(1, 64, "padded"), (4, 256, "padded"), (8, 256, "padded"),
             (4, 256, "mxu"), (8, 256, "mxu"), (8, 256, "mxu6"),
             (16, 256, "mxu")]
    for K, tr, impl in cases:
        ctx, v2, wav = setup(nt)
        cells = ctx.nxe * ctx.nze
        try:
            if K == 1:
                fn = jax.jit(lambda w, v, _c=ctx, _i=impl:
                             forward_modeling_tiled(
                                 _c, v, w, 2740, 40, 40, lap_impl=_i)[2])
            else:
                fn = jax.jit(lambda w, v, _c=ctx, _K=K, _tr=tr, _i=impl:
                             forward_modeling_tiled(
                                 _c, v, w, 2740, 40, 40, tile_rows=_tr,
                                 block_k=_K, lap_impl=_i)[2])
            make = lambda i: (jnp.asarray(wav * (1 + 1e-6 * i)),
                              v2 * (1 + 1e-7 * (i + 1)))
            t = timeit(fn, make) / nt
            print(f"perf K={K} tr={tr} {impl}: {t * 1e3:.3f} ms/step, "
                  f"{cells / t / 1e9:.1f} GCell/s")
        except Exception as e:
            print(f"perf K={K} tr={tr} {impl}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
