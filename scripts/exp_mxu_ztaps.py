"""MXU z-taps experiment for the padded stencil kernel.

The isolation experiments (scripts/exp_padded_dma.py, PALLAS_NOTES
"padded-stencil isolation") show the kernel is VPU-compute-bound at
~40 GCell/s with a 70 GCell/s DMA floor — and the MXU sits idle. The
lane-axis (z) taps are the expensive half: 9 lane-offset slice loads +
13 arith slots per cell. This experiment computes them as banded block
matmuls on the MXU instead:

  for each 128-lane block b: out_z[:, b] = a[:, 128(b-1):128(b-1)+384] @ S
  (S is (384, 128) banded: S[m, j] = czp[|j + 128 - m|] for |.| <= h)

which is 768 f32-FLOPs/cell. On v5e at 3-pass f32 (precision HIGH,
bf16_3x) the MXU ceiling for that is ~85 GCell/s, overlapping with the
x-taps left on the VPU (~17 slots -> ~119 GCell/s), so the combined
ceiling is min(DMA 70, MXU 85, VPU 119) ~= 70 GCell/s vs 40 today.

Variants:
  prod   — shipping kernel (VPU taps)
  zmm    — z-taps on MXU, precision HIGH (bf16_3x)
  zmm6   — z-taps on MXU, precision HIGHEST (bf16_6x)

Prints slope rate + max rel err vs prod (single apply, random input).

Run:  python scripts/exp_mxu_ztaps.py [n] [tile_rows]
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


def band_matrices(czp):
    """(S_first, S_mid, S_last) banded f32 matrices for the block matmuls.

    S_mid[m, j] = czp[h + (j + 128 - m)] over a 384-wide source window
    starting one block left of the output block; S_first/S_last are the
    256-wide edge windows (first window starts at col 0, last ends at W).
    """
    h = H
    s_mid = np.zeros((384, 128), np.float32)
    for j in range(128):
        for d in range(-h, h + 1):
            s_mid[j + 128 + d, j] = czp[h + d]
    s_first = np.zeros((256, 128), np.float32)
    for j in range(128):
        for d in range(-h, h + 1):
            m = j + d
            if 0 <= m < 256:
                s_first[m, j] = czp[h + d]
    s_last = np.zeros((256, 128), np.float32)
    for j in range(128):
        for d in range(-h, h + 1):
            m = j + 128 + d  # global col = (W-256) + m ; out col = W-128+j
            if 0 <= m < 256:
                s_last[m, j] = czp[h + d]
    return s_first, s_mid, s_last


def _kern_zmm(n_tx, R, W, nx, tx, hr, cx, precision, mode,
              inp_hbm, mask_ref, sf_ref, sm_ref, sl_ref, out_ref,
              scratch, sems):
    h = H
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
    a = scratch[cur]                      # (tx + 2hr, W)
    az = a[hr:hr + tx, :]                 # rows needing z-taps

    # x-taps on the VPU, full width (center folded into the z matmul band)
    r0 = hr - h
    accx = None
    if mode != "zonly":
        for k in range(h, 0, -1):
            xm = jax.lax.slice(a, (r0 + h - k, 0), (r0 + h - k + tx, W))
            xp = jax.lax.slice(a, (r0 + h + k, 0), (r0 + h + k + tx, W))
            term = cx[h + k] * (xm + xp)
            accx = term if accx is None else accx + term
        accx = accx + cx[h] * az

    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, (tx, 128), 0)
    keep = (rows >= tx + 2 * h) & (rows < tx + h + nx - h)

    if mode == "xonly":
        out_ref[:, :] = jnp.where(
            (rows[:, 0:1] >= tx + 2 * h) & (rows[:, 0:1] < tx + h + nx - h),
            accx * mask_ref[0:1, :], 0.0)
        return

    nb = W // 128
    split3 = mode in ("split3", "split3z")
    if split3:
        # manual bf16_3x: az = ah + al (hi/lo bf16 split); the S refs hold
        # (Sh, Sl) stacked on axis 0; yz = ah@Sh + ah@Sl + al@Sh — three
        # 1-pass MXU matmuls instead of HIGHEST's six
        ah = az.astype(jnp.bfloat16)
        al = (az - ah.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(lhs, s):
        return jax.lax.dot_general(lhs, s, (((1,), (0,)), ((), ())),
                                   precision=precision,
                                   preferred_element_type=jnp.float32)

    for b in range(nb):
        if b == 0:
            sl_ = (0, 0)
            kw = 256
            s = sf_ref
        elif b == nb - 1:
            sl_ = (0, W - 256)
            kw = 256
            s = sl_ref
        else:
            sl_ = (0, 128 * (b - 1))
            kw = 384
            s = sm_ref
        if split3:
            lh = jax.lax.slice(ah, sl_, (tx, sl_[1] + kw))
            ll = jax.lax.slice(al, sl_, (tx, sl_[1] + kw))
            yz = (mm(lh, s[0]) + mm(lh, s[1])) + mm(ll, s[0])
        else:
            lhs = jax.lax.slice(az, sl_, (tx, sl_[1] + kw))
            yz = mm(lhs, s[:, :])
        if mode not in ("zonly", "split3z"):
            yz = yz + accx[:, 128 * b:128 * (b + 1)]
        y = yz * mask_ref[0:1, 128 * b:128 * (b + 1)]
        out_ref[:, 128 * b:128 * (b + 1)] = jnp.where(keep, y, 0.0)


def build_zmm(n, tile_rows, precision, mode="full"):
    nx = nz = n
    R, W, row0, col0 = ps.padded_layout(nx, nz, ORDER, tile_rows)
    tx = tile_rows
    hr = 8
    n_tx = R // tx
    cz_, cx_ = numerics.scaled_coefficients(ORDER, 10.0, 10.0)
    cx = [float(v) for v in cx_]
    czp = [float(v) for v in cz_]
    sf, sm, sl = band_matrices(czp)
    if mode in ("split3", "split3z"):
        def stack_hi_lo(s):
            import ml_dtypes
            sh = s.astype(ml_dtypes.bfloat16)
            slo = (s - sh.astype(np.float32)).astype(ml_dtypes.bfloat16)
            return np.stack([sh, slo])
        sf, sm, sl = stack_hi_lo(sf), stack_hi_lo(sm), stack_hi_lo(sl)
    mask = np.zeros((8, W), np.float32)
    mask[:, 2 * H:nz] = 1.0

    kern = functools.partial(_kern_zmm, n_tx, R, W, nx, tx, hr, cx,
                             precision, mode)
    cp = vmem_params(((2 + 24) * (tx + 2 * hr) * W + 2 * tx * W) * 4)
    call = pl.pallas_call(
        kern, grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((tx, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=cp)
    extras = (jnp.asarray(mask), jnp.asarray(sf), jnp.asarray(sm),
              jnp.asarray(sl))
    return call, (R, W), extras


def build_prod(n, tile_rows):
    nx = nz = n
    R, W, _, _ = ps.padded_layout(nx, nz, ORDER, tile_rows)
    cz_, cx_ = numerics.scaled_coefficients(ORDER, 10.0, 10.0)

    def call(p):
        return ps.laplacian_pallas_padded(p, cx_, cz_, ORDER, nx, nz,
                                          tile_rows)
    return call, (R, W), ()


def _time(f, x, iters=5):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_rate(call, shape, extras, n, k1=8, k2=32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def chain(k):
        @jax.jit
        def f(p):
            for _ in range(k):
                p = call(p, *extras)
            return p
        return f

    f1, f2 = chain(k1), chain(k2)
    sync(f1(x)); sync(f2(x))
    t1 = min(_time(f1, x), _time(f1, x))
    t2 = min(_time(f2, x), _time(f2, x))
    per = (t2 - t1) / (k2 - k1)
    return n * n / per / 1e9, per


def max_rel_err(call, extras, ref_call, shape, n):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    a = np.asarray(jax.jit(lambda p: call(p, *extras))(x))
    b = np.asarray(jax.jit(ref_call)(x))
    scale = np.abs(b).max() or 1.0
    return float(np.abs(a - b).max() / scale)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    tr = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print("device:", jax.devices()[0], "n:", n, "tile_rows:", tr)
    prod_call, shape, _ = build_prod(n, tr)
    g, per = slope_rate(lambda p: prod_call(p), shape, (), n)
    print(f"prod  : {g:6.2f} GCell/s ({per*1e3:.3f} ms/apply)", flush=True)
    for name, prec, mode in (
            ("zmm6", jax.lax.Precision.HIGHEST, "full"),
            ("zonly", jax.lax.Precision.HIGHEST, "zonly"),
            ("xonly", jax.lax.Precision.HIGHEST, "xonly"),
            ("split3", jax.lax.Precision.DEFAULT, "split3"),
            ("split3z", jax.lax.Precision.DEFAULT, "split3z")):
        try:
            call, shape, extras = build_zmm(n, tr, prec, mode)
            if mode in ("full", "split3"):
                err = max_rel_err(call, extras, prod_call, shape, n)
                tag = f" max rel err vs prod {err:.2e}"
            else:
                tag = ""
            g, per = slope_rate(call, shape, extras, n)
            print(f"{name:7s}: {g:6.2f} GCell/s ({per*1e3:.3f} ms/apply)"
                  f"{tag}", flush=True)
        except Exception as e:
            print(f"{name:7s}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
