#!/usr/bin/env python
"""Profile the x-domain blocked-Pallas RTM path (VERDICT r2 weak #3).

Decomposes the per-chip gap between the domain path at n_x=1 and the
whole-shot VMEM kernel on the 3lay GPU config:

* sweeps ``block_k`` — between K=8 and K=16 the Mosaic lane padding keeps
  the in-kernel compute identical (nxw 296 -> 360 both pad to 384 lanes),
  so the time delta divided by the call-count delta isolates the fixed
  per-pallas_call cost (dispatch + operand staging + XLA glue);
* times the forward phase alone vs forward+backward;
* prints the whole-shot kernel reference time on the same inputs.

Run on the real chip: ``python scripts/profile_domain.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import io, numerics, pipeline
from parallel_finite_difference_computation_tpu.solver import FDContext
from parallel_finite_difference_computation_tpu.parallel import (
    make_mesh, embed_dobs)
from parallel_finite_difference_computation_tpu.parallel.domain_pallas import (
    make_sharded_rtm_snapshot_pallas, make_sharded_forward_modeling_pallas)
from parallel_finite_difference_computation_tpu.utils.profiling import (
    timeit)

REFERENCE = os.environ.get("PFDC_REFERENCE_ROOT", "/root/reference")
GOLDEN = os.path.join(REFERENCE, "dpct_gpu_rtm_domain_division/build/3lay_mod")


def load():
    p = pfdc.parse_input_dat(os.path.join(GOLDEN, "input.dat"))
    vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    base = pipeline.prepare_velocity_cpu(p, vp)
    ctx = FDContext.from_params(p, exact_taper=False)
    g = p.geometry()
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
    return p, ctx, g, base, wav, dobs


def main():
    p, ctx, g, base, wav, dobs = load()
    mesh = make_mesh(n_shot=1, n_x=1)
    d_ext = embed_dobs(ctx, np.asarray(dobs[:1], np.float32))
    sxs = np.asarray([g.sx[0]], np.int32)
    print(f"3lay: nxe={ctx.nxe} nze={ctx.nze} nt={ctx.nt} "
          f"device={jax.devices()[0]}")

    results = {}
    for K in (4, 8, 16, 24, 29):
        try:
            fn = make_sharded_rtm_snapshot_pallas(ctx, mesh, g.sz, g.gz,
                                                  block_k=K)
            make = lambda i: (np.stack([base * (1 + 1e-7 * i)]), sxs, wav,
                              d_ext)
            t = timeit(make, fn, warmup=2, iters=3)
            calls = (ctx.nt + K - 1) // K + 1 + (ctx.nt - K + K - 1) // K
            n_x = mesh.shape["x"]
            nxl = -(-ctx.nxe // n_x)   # padded local slab width
            nxw = nxl + 2 * K * (ctx.order // 2)
            results[K] = (t, calls, nxw)
            print(f"block_k={K:3d}: {t * 1e3:7.2f} ms  "
                  f"(~{calls} pallas calls, nxw={nxw} -> "
                  f"{-(-nxw // 128) * 128} padded lanes)")
        except Exception as e:
            print(f"block_k={K:3d}: failed: {str(e)[:120]}")

    if 8 in results and 16 in results:
        t8, c8, _ = results[8]
        t16, c16, _ = results[16]
        per_call = (t8 - t16) / (c8 - c16)
        print(f"\nfixed per-call cost (K=8 vs K=16, same padded lanes): "
              f"{per_call * 1e6:.1f} us/call")

    # forward-only phase on the same machinery
    fwd = make_sharded_forward_modeling_pallas(ctx, mesh, g.sz, g.gz,
                                               source="point", taper="top",
                                               block_k=8)
    make_f = lambda i: (np.stack([base * (1 + 1e-7 * i)]), sxs, wav)
    t_f = timeit(make_f, fwd, warmup=2, iters=3)
    print(f"forward-modeling domain path (K=8): {t_f * 1e3:.2f} ms")

    # whole-shot kernel reference
    from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
        rtm_snapshot_pallas)
    fn_ws = jax.jit(lambda v2: rtm_snapshot_pallas(
        ctx, v2, wav, jnp.asarray(dobs[0]), g.sx[0], g.sz, g.gz))
    make_ws = lambda i: (jnp.asarray(base * (1 + 1e-7 * i)),)
    t_ws = timeit(make_ws, fn_ws, warmup=2, iters=3)
    print(f"whole-shot kernel (single, incl dispatch RTT): "
          f"{t_ws * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
