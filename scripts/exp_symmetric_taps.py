"""Experiment: symmetric-pair stencil taps vs naive accumulation.

Central-difference coefficients satisfy c[io] == c[order-io], so the
Laplacian can be computed as

    (cz[h]+cx[h])*p  +  sum_k cz[h-k]*(p[z-k]+p[z+k])
                     +  sum_k cx[h-k]*(p[x-k]+p[x+k])

which is 25 vector ops/cell for order 8 vs the naive 35 (shifted loads
unchanged).  On a VPU-issue-bound kernel at ~81-83% of the measured
issue ceiling this is up to ~1.3x.  This script measures the padded
stencil kernel both ways on the real chip with the slope protocol
(docs/PALLAS_NOTES.md "dispatch-RTT artifact") before any framework
change is made.

Run:  python scripts/exp_symmetric_taps.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops import pallas_stencil as ps
from parallel_finite_difference_computation_tpu.ops.pallas_fd import vmem_params
from parallel_finite_difference_computation_tpu.utils.profiling import sync


def _lap_taps_naive(a, order, hr, tx, W, cz, cx):
    """The pre-optimization per-tap accumulation (35 ops), kept locally so
    this A/B stays valid now that ps._lap_taps itself is symmetric."""
    import jax.numpy as jnp
    h = order // 2
    wz = W - order
    acz = cz[0] * jax.lax.slice(a, (hr, 0), (hr + tx, wz))
    for io in range(1, order + 1):
        acz = acz + cz[io] * jax.lax.slice(a, (hr, io), (hr + tx, io + wz))
    r0 = hr - h
    acx = cx[0] * jax.lax.slice(a, (r0, h), (r0 + tx, h + wz))
    for io in range(1, order + 1):
        acx = acx + cx[io] * jax.lax.slice(a, (r0 + io, h),
                                           (r0 + io + tx, h + wz))
    return jnp.pad(acz + acx, ((0, 0), (h, W - wz - h)))


def _lap_taps_sym(a, order, hr, tx, W, cz, cx):
    """Symmetric-pair variant of ps._lap_taps (same frame contract)."""
    h = order // 2
    wz = W - order
    r0 = hr - h
    # merged center term: (cz[h]+cx[h]) * p_center
    acc = (cz[h] + cx[h]) * jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    for k in range(1, h + 1):
        zm = jax.lax.slice(a, (hr, h - k), (hr + tx, h - k + wz))
        zp = jax.lax.slice(a, (hr, h + k), (hr + tx, h + k + wz))
        acc = acc + cz[h - k] * (zm + zp)
        xm = jax.lax.slice(a, (r0 + h - k, h), (r0 + h - k + tx, h + wz))
        xp = jax.lax.slice(a, (r0 + h + k, h), (r0 + h + k + tx, h + wz))
        acc = acc + cx[h - k] * (xm + xp)
    return jnp.pad(acc, ((0, 0), (h, W - wz - h)))


def build(nx, nz, order, tile_rows, taps):
    """laplacian_pallas_padded with a pluggable taps function."""
    h = order // 2
    hr = -(-h // 8) * 8
    tx = tile_rows
    R, W, row0, col0 = ps.padded_layout(nx, nz, order, tile_rows)
    n_tx = R // tx
    cz_, cx_ = numerics.scaled_coefficients(order, 10.0, 10.0)
    cz = [float(v) for v in cz_]
    cx = [float(v) for v in cx_]

    def kern(inp_hbm, mask_ref, out_ref, scratch, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ps._halo_dma_start(inp_hbm, scratch, sems, 0, 0, tx, hr, n_tx, R)

        @pl.when(i + 1 < n_tx)
        def _():
            ps._halo_dma_start(inp_hbm, scratch, sems, i + 1,
                               jax.lax.rem(i + 1, 2), tx, hr, n_tx, R)

        cur = jax.lax.rem(i, 2)
        ps._halo_dma_wait(inp_hbm, scratch, sems, cur, tx, hr)
        full = taps(scratch[cur], order, hr, tx, W, cz, cx)
        rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
        keep = (rows >= tx + 2 * h) & (rows < tx + h + nx - h)
        out_ref[:, :] = jnp.where(keep, full * mask_ref[0:1, :], 0.0)

    mask = np.zeros((8, W), np.float32)
    mask[:, 2 * h:nz] = 1.0
    cp = vmem_params(((2 + 24) * (tx + 2 * hr) * W + 2 * tx * W) * 4)
    call = pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tx, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=cp,
    )
    return call, (R, W), jnp.asarray(mask)


def chain(call, mask, k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = call(x, mask)
        return x
    return f


def slope_rate(call, shape, mask, nx, nz, k1=8, k2=32, iters=5):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f1, f2 = chain(call, mask, k1), chain(call, mask, k2)
    sync(f1(x)); sync(f2(x))  # compile
    t1 = min(_time(f1, x, iters), _time(f1, x, iters))
    t2 = min(_time(f2, x, iters), _time(f2, x, iters))
    per = (t2 - t1) / (k2 - k1)
    return nx * nz / per / 1e9, per


def _time(f, x, iters):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    nx = nz = 4096
    order = 8
    print("device:", jax.devices()[0])
    for tr in (64, 128):
        naive, shape, mask = build(nx, nz, order, tr, _lap_taps_naive)
        symm, _, _ = build(nx, nz, order, tr, _lap_taps_sym)
        # correctness first
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        a = np.asarray(jax.jit(naive)(x, mask))
        b = np.asarray(jax.jit(symm)(x, mask))
        scale = np.abs(a).max() or 1.0
        err = np.abs(a - b).max() / scale
        gn, pn = slope_rate(naive, shape, mask, nx, nz)
        gs, psym = slope_rate(symm, shape, mask, nx, nz)
        print(f"tile_rows={tr}: naive {gn:.2f} GCell/s ({pn*1e3:.3f} ms) | "
              f"symmetric {gs:.2f} GCell/s ({psym*1e3:.3f} ms) | "
              f"speedup {gs/gn:.3f}x | max rel diff {err:.2e}")


if __name__ == "__main__":
    main()
