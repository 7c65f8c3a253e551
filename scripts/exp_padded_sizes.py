"""Localize the padded-stencil rate gap: 55.2 GCell/s was measured at
4096^2 (scripts/exp_symmetric_taps.py) while the bench record at 8192^2
shows 40.4 — same per-cell DMA traffic and compute, so either the record
was a slow-tunnel window or there is a real size-dependent falloff
(DMA queue behavior, grid-loop overhead).

Measures the PRODUCTION laplacian_pallas_padded slope rate (RTT-cancelled,
scalar-readback fenced) at both sizes and several tile_rows.

Run:  python scripts/exp_padded_sizes.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops.pallas_stencil import (
    laplacian_pallas_padded, to_padded, padded_layout)
from parallel_finite_difference_computation_tpu.utils.profiling import sync


def _time(f, x, iters=5):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_rate(n, tile_rows, k1=8, k2=32):
    cz, cx = numerics.scaled_coefficients(8, 10.0, 10.0)

    def chain(k):
        @jax.jit
        def f(p):
            for _ in range(k):
                p = laplacian_pallas_padded(p, cx, cz, 8, n, n, tile_rows)
            return p
        return f

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    p = to_padded(x, 8, tile_rows)
    f1, f2 = chain(k1), chain(k2)
    sync(f1(p)); sync(f2(p))  # compile
    t1 = min(_time(f1, p), _time(f1, p))
    t2 = min(_time(f2, p), _time(f2, p))
    per = (t2 - t1) / (k2 - k1)
    return n * n / per / 1e9, per


def main():
    print("device:", jax.devices()[0])
    for n in (4096, 8192):
        for tr in (64, 128):
            try:
                g, per = slope_rate(n, tr)
                print(f"n={n} tile_rows={tr}: {g:.2f} GCell/s "
                      f"({per*1e3:.3f} ms/apply)", flush=True)
            except Exception as e:
                print(f"n={n} tile_rows={tr}: FAILED {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
