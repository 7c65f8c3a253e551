"""Attack the exact padded-stencil kernel's issue-slot gap (VERDICT r3 #4).

Round-3 isolation (scripts/exp_padded_dma.py) pinned the kernel
compute-bound at ~41 GCell/s = 54% of the 27-arith-op issue ceiling,
with the hypothesis that the 17 shifted loads (9 lane-offset + 8
sublane-offset slices per cell-tile) consume real issue slots (~44
loads-included slots -> ~87%). This experiment separates *which part*
of the load cost binds and tries the candidate fixes:

  prod     — shipping kernel (_lap_taps: slice loads both axes)
  xroll    — x (sublane) taps via whole-frame sublane rolls + one
             8-aligned static slice (sublane rotates measured near-free
             in the whole-shot kernel's z_taps experiment)
  bothroll — both axes via rolls (mirrors the whole-shot kernel's
             lap_in_kernel structure; lane rolls measured 1.28x WORSE
             than slices round-2 — re-check in this kernel)
  aligned  — DIAGNOSTIC (wrong values): identical op graph but every
             load at a register-aligned offset (x: +-8 rows, z: +-128
             lanes). If aligned >> prod, sub-register shifts bind (fix:
             alignment tricks); if aligned ~= prod, the slot *count*
             binds and the loads-included ceiling is the true floor.

Run:  python scripts/exp_padded_slots.py [n]
"""
import functools
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

ORDER = 8
H = ORDER // 2
HR = 8


def _taps_xroll(a, order, hr, tx, W, cz, cx):
    """x (sublane) taps as whole-frame rolls + ONE static 8-aligned row
    slice; z (lane) taps unchanged (slices). Bit-identical to _lap_taps:
    roll(a, -(k'), 0)[hr:hr+tx] reads rows hr+k'-... wait, see body —
    rows [hr-k, hr-k+tx) stay inside [0, tx+2hr) for k <= hr so no wrap
    reaches the kept rows."""
    h = order // 2
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(a, (hr, h - k), (hr + tx, h - k + wz))
        zp = jax.lax.slice(a, (hr, h + k), (hr + tx, h + k + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        # frame rows hr-k / hr+k via rolls; one shared aligned slice
        xm = jax.lax.slice(jnp.roll(a, k, 0), (hr, h), (hr + tx, h + wz))
        xp = jax.lax.slice(jnp.roll(a, -k, 0), (hr, h), (hr + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


def _taps_bothroll(a, order, hr, tx, W, cz, cx):
    """Both axes as whole-frame rolls on the full (tx+2hr, W) frame, one
    final slice. Lane-roll wrap garbage lands in columns the caller's
    mask zeroes (cols [0, 2h) via the wrap of the left pad)... NOT
    value-identical at columns near the W seam — diagnostic for rate
    only (output still masked the same way)."""
    h = order // 2
    acc = None
    for k in range(h, 0, -1):
        term = (cz[h + k] * (jnp.roll(a, k, 1) + jnp.roll(a, -k, 1))
                + cx[h + k] * (jnp.roll(a, k, 0) + jnp.roll(a, -k, 0)))
        acc = term if acc is None else acc + term
    acc = acc + (cz[h] + cx[h]) * a
    return jax.lax.slice(acc, (hr, 0), (hr + tx, W))


def _taps_aligned(a, order, hr, tx, W, cz, cx):
    """DIAGNOSTIC (wrong values): the same 17-load/27-arith op graph with
    every offset register-aligned (x: +-8 rows, z: +-128 lanes)."""
    h = order // 2
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    za = a  # lane offsets at 0 / 128-aligned positions
    for k in range(h, 0, -1):
        off = 128 if W - 128 >= h + wz + 128 else 0
        zm = jax.lax.slice(za, (hr, 0), (hr + tx, wz))
        zp = jax.lax.slice(za, (hr, off), (hr + tx, off + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (hr - 8, h), (hr - 8 + tx, h + wz))
        xp = jax.lax.slice(a, (hr + 8, h), (hr + 8 + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


def _taps_zroll_split(a, order, hr, tx, W, cz, cx):
    """z (lane) taps via whole-frame lane rolls, x taps via slices —
    split-axis association preserved. Candidate bit-identical: for every
    column the caller's mask keeps (global z interior [2h, nz)), the
    rolled operands equal the sliced ones (wrap garbage lands only in
    masked-out columns)."""
    h = order // 2
    accz = None
    for k in range(h, 0, -1):
        term = cz[h + k] * (jnp.roll(a, k, 1) + jnp.roll(a, -k, 1))
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * a
    accz = jax.lax.slice(accz, (hr, 0), (hr + tx, W))
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (hr - k, h), (hr - k + tx, h + wz))
        xp = jax.lax.slice(a, (hr + k, h), (hr + k + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return accz + jnp.pad(accx, ((0, 0), (h, W - wz - h)))


def _taps_allroll_split(a, order, hr, tx, W, cz, cx):
    """Both axes via whole-frame rolls with the split-axis association
    order preserved (unlike _taps_bothroll's merged-center interleave):
    candidate bit-identical on all kept cells."""
    h = order // 2
    accz = None
    for k in range(h, 0, -1):
        term = cz[h + k] * (jnp.roll(a, k, 1) + jnp.roll(a, -k, 1))
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * a
    accx = None
    for k in range(h, 0, -1):
        term = cx[h + k] * (jnp.roll(a, k, 0) + jnp.roll(a, -k, 0))
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * a
    return jax.lax.slice(accz + accx, (hr, 0), (hr + tx, W))


def _taps_zalign_only(a, order, hr, tx, W, cz, cx):
    """DIAGNOSTIC (wrong values): z (lane) loads at aligned offsets,
    x (sublane) loads real — isolates the lane-shift cost."""
    h = order // 2
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    for k in range(h, 0, -1):
        off = 128 if W >= h + wz + 128 else 0
        zm = jax.lax.slice(a, (hr, 0), (hr + tx, wz))
        zp = jax.lax.slice(a, (hr, off), (hr + tx, off + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (hr - k, h), (hr - k + tx, h + wz))
        xp = jax.lax.slice(a, (hr + k, h), (hr + k + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


def _taps_xalign_only(a, order, hr, tx, W, cz, cx):
    """DIAGNOSTIC (wrong values): x (sublane) loads at aligned offsets
    (+-8 rows), z (lane) loads real — isolates the sublane-shift cost."""
    h = order // 2
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(a, (hr, h - k), (hr + tx, h - k + wz))
        zp = jax.lax.slice(a, (hr, h + k), (hr + tx, h + k + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (hr - 8, h), (hr - 8 + tx, h + wz))
        xp = jax.lax.slice(a, (hr + 8, h), (hr + 8 + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


def _taps_zroll2(a, order, hr, tx, W, cz, cx):
    """z (lane) taps via per-tap roll+slice (the construct that compiled
    for the x axis in _taps_xroll), x taps via slices. Candidate
    bit-identical."""
    h = order // 2
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(jnp.roll(a, k, 1), (hr, h), (hr + tx, h + wz))
        zp = jax.lax.slice(jnp.roll(a, -k, 1), (hr, h), (hr + tx, h + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (hr - k, h), (hr - k + tx, h + wz))
        xp = jax.lax.slice(a, (hr + k, h), (hr + k + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


def _taps_bothroll2(a, order, hr, tx, W, cz, cx):
    """Both axes via per-tap roll+slice — split-axis association
    preserved. Candidate bit-identical."""
    h = order // 2
    wz = W - order
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(jnp.roll(a, k, 1), (hr, h), (hr + tx, h + wz))
        zp = jax.lax.slice(jnp.roll(a, -k, 1), (hr, h), (hr + tx, h + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(jnp.roll(a, k, 0), (hr, h), (hr + tx, h + wz))
        xp = jax.lax.slice(jnp.roll(a, -k, 0), (hr, h), (hr + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


TAPS = {
    "prod": ps._lap_taps,
    "xroll": _taps_xroll,
    "bothroll": _taps_bothroll,
    "aligned": _taps_aligned,
    "zroll_split": _taps_zroll_split,
    "allroll_split": _taps_allroll_split,
    "zalign": _taps_zalign_only,
    "xalign": _taps_xalign_only,
    "zroll2": _taps_zroll2,
    "bothroll2": _taps_bothroll2,
}


def _kernel(taps, order, hr, nx, nz, tx, n_tx, R, W, cz, cx,
            inp_hbm, mask_ref, out_ref, scratch, sems):
    h = order // 2
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


def build(n, variant, tile_rows=64):
    nx = nz = n
    tx = tile_rows
    R, W, row0, col0 = ps.padded_layout(nx, nz, ORDER, tx)
    n_tx = R // tx
    cz_, cx_ = numerics.scaled_coefficients(ORDER, 10.0, 10.0)
    cz = [float(v) for v in cz_]
    cx = [float(v) for v in cx_]
    mask = np.zeros((8, W), np.float32)
    mask[:, 2 * H:nz] = 1.0
    kern = functools.partial(_kernel, TAPS[variant], ORDER, HR, nx, nz,
                             tx, n_tx, R, W, cz, cx)
    cp = vmem_params(((2 + 24) * (tx + 2 * HR) * W + 2 * tx * W) * 4)
    call = pl.pallas_call(
        kern, grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tx, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tx + 2 * HR, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=cp)
    return call, (R, W), jnp.asarray(mask)


def _time(f, x, iters=5):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_rate(call, shape, mask, n, k1=8, k2=32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def chain(k):
        @jax.jit
        def f(p):
            for _ in range(k):
                p = call(p, mask)
            return p
        return f

    f1, f2 = chain(k1), chain(k2)
    sync(f1(x)); sync(f2(x))
    t1 = min(_time(f1, x), _time(f1, x))
    t2 = min(_time(f2, x), _time(f2, x))
    per = (t2 - t1) / (k2 - k1)
    return n * n / per / 1e9, per


def check_vs_prod(variant, n=512):
    """Value check vs the shipping taps (interpret-free, tiny TPU run)."""
    callp, shape, mask = build(n, "prod")
    callv, _, _ = build(n, variant)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    a = np.asarray(jax.jit(lambda p: callp(p, mask))(x))
    b = np.asarray(jax.jit(lambda p: callv(p, mask))(x))
    return float(np.max(np.abs(a - b)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("device:", jax.devices()[0], "n:", n, flush=True)
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else list(TAPS)
    for variant in variants:
        for tr in (64, 128):
            try:
                call, shape, mask = build(n, variant, tr)
                g, per = slope_rate(call, shape, mask, n)
                extra = ""
                if variant in ("xroll", "zroll_split", "allroll_split",
                               "zroll2", "bothroll2") and tr == 64:
                    extra = (f"  (max abs diff vs prod: "
                             f"{check_vs_prod(variant):.2e})")
                print(f"{variant:13s} tr={tr:3d}: {g:6.2f} GCell/s "
                      f"({per*1e3:.3f} ms/apply){extra}", flush=True)
            except Exception as e:
                print(f"{variant:13s} tr={tr:3d}: FAILED {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
