"""Experiment: where does fd_kstep_padded sit vs its three bounds?

The temporal-blocked streaming kernel (K=4, tile_rows=256, pluto dims)
measures ~0.39 ms/step exact / ~0.31 MXU, but back-of-envelope puts its
DMA floor at ~0.11 ms/step (7.6 field-traffics/pass at the measured
stream rate), its VPU bound at ~0.11 (22 op-slots after moving z-taps to
the MXU) and its MXU bound at ~0.12-0.17 — i.e. perfectly overlapped it
should run ~2x faster. This script isolates the bounds on-chip:

  1. baseline        fd_kstep_padded exact + mxu (as routed)
  2. dma_only        same 5-slab double-buffered DMA + 2 outs, no compute
  3. compute_only    same K-loop compute, operands pinned in VMEM
                     (constant-index blocks -> Pallas elides re-fetch)
  4. lean            3 input slabs (p, pp, v2m): mask rebuilt in-kernel
                     from its separable 1D ramps, source patch dropped
                     (timing probe for the real "lean" optimization)

Run on the real chip: python scripts/exp_kstep_bounds.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_finite_difference_computation_tpu.ops.pallas_stencil import (
    padded_layout, to_padded, stream_band_inputs, _lap_z_mxu_full)
from parallel_finite_difference_computation_tpu.ops.pallas_stream import (
    _kslab_dma_start, _kslab_dma_wait, _lap_x_slab, fd_kstep_padded,
    mask_ramps, separable_mask_operands, injection_window)
from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
    vmem_params)
from parallel_finite_difference_computation_tpu.ops.stencil import (
    lap_in_kernel)
from parallel_finite_difference_computation_tpu.solver import FDContext
from parallel_finite_difference_computation_tpu.models.zoo import (
    layered_model)
from parallel_finite_difference_computation_tpu import numerics

ORDER = 8
INTERPRET = False
NXE, NZE = 7040, 1281   # pluto extended dims
K, TX = 4, 256


def setup():
    ctx = FDContext.create(NXE - 80, NZE - 80, 8, dx=7.62, dz=7.62,
                           dt=0.0007, order=ORDER, nxb=40, nzb=40, fac=0.75)
    vp = layered_model(NXE - 80, NZE - 80,
                       velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    v2 = np.zeros((NXE, NZE), np.float32)
    v2[40:-40, 40:-40] = vp * vp
    v2 = np.asarray(numerics.extendvel_clamp(v2, NXE - 80, NZE - 80, 40, 40))
    return ctx, v2


def timed_scan(step1, ops, n_passes=100, warm=2, iters=3):
    """Time a scan of n_passes applications of step1 over (p, pp)."""
    def body(c, _):
        p, pp = c
        pn, ppn = step1(p, pp)
        return (pn, ppn), ()

    @jax.jit
    def run(p, pp):
        (p, pp), _ = jax.lax.scan(body, (p, pp), None, length=n_passes)
        return p, pp

    for _ in range(warm):
        jax.block_until_ready(run(*ops))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*ops))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_passes


# ---------------------------------------------------------------------
# variant kernels
# ---------------------------------------------------------------------

def _dma_only_kernel(hk, tx, n_tx, R, W,
                     p_hbm, pp_hbm, v2m_hbm, mask_hbm, patchm_hbm,
                     pn_out, ppn_out,
                     p_s, pp_s, v2m_s, mask_s, patchm_s, sems):
    hbms = (p_hbm, pp_hbm, v2m_hbm, mask_hbm, patchm_hbm)
    scrs = (p_s, pp_s, v2m_s, mask_s, patchm_s)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _kslab_dma_start(hbms, scrs, sems, 0, 0, tx, hk, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _kslab_dma_start(hbms, scrs, sems, i + 1, jax.lax.rem(i + 1, 2),
                         tx, hk, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _kslab_dma_wait(hbms, scrs, sems, cur, tx, hk)
    # touch every slab so the reads can't be elided, but do ~no compute
    x = p_s[cur]
    y = pp_s[cur]
    s = (v2m_s[cur] + mask_s[cur] + patchm_s[cur])
    pn_out[:, :] = jax.lax.slice(x, (hk, 0), (hk + tx, W))
    ppn_out[:, :] = (jax.lax.slice(y, (hk, 0), (hk + tx, W))
                     + jax.lax.slice(s, (hk, 0), (hk + tx, W)))


def make_dma_only(R, W, hk, tx):
    n_tx = R // tx
    S = tx + 2 * hk
    cp = vmem_params((10 * S + 4 * tx) * W * 4)
    slab = lambda: pltpu.VMEM((2, S, W), jnp.float32)
    kern = functools.partial(_dma_only_kernel, hk, tx, n_tx, R, W)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def call(p, pp, v2m, mask, patchm):
        return pl.pallas_call(
            kern, grid=(n_tx,),
            in_specs=[any_spec] * 5,
            out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32)] * 2,
            scratch_shapes=[slab() for _ in range(5)]
            + [pltpu.SemaphoreType.DMA((5, 2))],
            compiler_params=cp,
            interpret=INTERPRET,
        )(p, pp, v2m, mask, patchm)
    return call


def _compute_only_kernel(order, hk, K, tx, W, cz, cx, use_mxu,
                         p_ref, pp_ref, v2m_ref, mask_ref, *rest):
    if use_mxu:
        sf, sm, sl = rest[:3]
        rest = rest[3:]
        lap_fn = lambda a: (_lap_z_mxu_full(a, a.shape[0], W, sf, sm, sl)
                            + _lap_x_slab(a, order, cx))
    else:
        lap_fn = lambda a: lap_in_kernel(a, cx, cz, order)
    pn_out, ppn_out = rest
    x = p_ref[:, :]
    y = pp_ref[:, :]
    v2m = v2m_ref[:, :]
    m = mask_ref[:, :]
    for _ in range(K):
        lap = lap_fn(x)
        ynew = (2.0 * x - y + v2m * lap) * m
        xnew = x * m
        x, y = ynew, xnew
    pn_out[:, :] = jax.lax.slice(x, (hk, 0), (hk + tx, W))
    ppn_out[:, :] = jax.lax.slice(y, (hk, 0), (hk + tx, W))


def make_compute_only(R, W, hk, tx, cz, cx, use_mxu, extra):
    n_tx = R // tx
    S = tx + 2 * hk
    cp = vmem_params(((8 + 24) * S + 4 * tx) * W * 4)
    kern = functools.partial(_compute_only_kernel, ORDER, hk, K, tx, W,
                             cz, cx, use_mxu)
    # constant-index blocks: Pallas fetches once, then elides the copy
    const_slab = pl.BlockSpec((S, W), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    def call(p_slab, pp_slab, v2m_slab, mask_slab, *bands):
        return pl.pallas_call(
            kern, grid=(n_tx,),
            in_specs=[const_slab] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(bands),
            out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32)] * 2,
            compiler_params=cp,
            interpret=INTERPRET,
        )(p_slab, pp_slab, v2m_slab, mask_slab, *bands)
    return call


def _lean_kernel(order, hk, K, tx, n_tx, R, W, cz, cx, use_mxu,
                 p_hbm, pp_hbm, v2m_hbm, mrow_hbm, mzrow_ref, *rest):
    if use_mxu:
        sf, sm, sl = rest[:3]
        rest = rest[3:]
        lap_fn = lambda a: (_lap_z_mxu_full(a, a.shape[0], W, sf, sm, sl)
                            + _lap_x_slab(a, order, cx))
    else:
        lap_fn = lambda a: lap_in_kernel(a, cx, cz, order)
    pn_out, ppn_out, p_s, pp_s, v2m_s, mrow_s, sems = rest
    hbms = (p_hbm, pp_hbm, v2m_hbm, mrow_hbm)
    scrs = (p_s, pp_s, v2m_s, mrow_s)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _kslab_dma_start(hbms, scrs, sems, 0, 0, tx, hk, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _kslab_dma_start(hbms, scrs, sems, i + 1, jax.lax.rem(i + 1, 2),
                         tx, hk, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _kslab_dma_wait(hbms, scrs, sems, cur, tx, hk)
    x = p_s[cur]
    y = pp_s[cur]
    v2m = v2m_s[cur]
    # mask rebuilt from its separable ramps: one multiply per tile
    m = mrow_s[cur][:, 0:1] * mzrow_ref[0:1, :]
    for _ in range(K):
        lap = lap_fn(x)
        ynew = (2.0 * x - y + v2m * lap) * m
        xnew = x * m
        x, y = ynew, xnew
    pn_out[:, :] = jax.lax.slice(x, (hk, 0), (hk + tx, W))
    ppn_out[:, :] = jax.lax.slice(y, (hk, 0), (hk + tx, W))


def make_lean(R, W, hk, tx, cz, cx, use_mxu):
    n_tx = R // tx
    S = tx + 2 * hk
    cp = vmem_params(((8 + 24) * S + 4 * tx) * W * 4)
    slab = lambda: pltpu.VMEM((2, S, W), jnp.float32)
    rowslab = lambda: pltpu.VMEM((2, S, 128), jnp.float32)
    kern = functools.partial(_lean_kernel, ORDER, hk, K, tx, n_tx, R, W,
                             cz, cx, use_mxu)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def call(p, pp, v2m, mrow, mzrow, *bands):
        return pl.pallas_call(
            kern, grid=(n_tx,),
            in_specs=[any_spec] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(bands)),
            out_specs=[pl.BlockSpec((tx, W), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((R, W), jnp.float32)] * 2,
            scratch_shapes=[slab(), slab(), slab(), rowslab(),
                            pltpu.SemaphoreType.DMA((4, 2))],
            compiler_params=cp,
            interpret=INTERPRET,
        )(p, pp, v2m, mrow, mzrow, *bands)
    return call


def main():
    ctx, v2 = setup()
    h = ORDER // 2
    hk = -(-(K * h) // 8) * 8
    R, W, row0, col0 = padded_layout(NXE, NZE, ORDER, TX)
    S = TX + 2 * hk
    cells = NXE * NZE
    print(f"pluto padded layout: R={R} W={W} S={S} n_tx={R // TX} "
          f"cells={cells / 1e6:.1f}M")

    rng = np.random.default_rng(0)
    pad = lambda a: to_padded(jnp.asarray(a), ORDER, TX)
    p0 = pad(rng.standard_normal((NXE, NZE)).astype(np.float32) * 1e-3)
    pp0 = pad(rng.standard_normal((NXE, NZE)).astype(np.float32) * 1e-3)
    v2m_np = v2 * np.float32(ctx.dt2)
    v2m = pad(v2m_np)
    mask_np = np.asarray(ctx.mask_all if hasattr(ctx, "mask_all")
                         else numerics.taper_mask_all(
                             NXE, NZE, 40, 40,
                             numerics.taper_profile(40, 0.75),
                             numerics.taper_profile(40, 0.75)))
    mask = pad(mask_np)
    patchm = pad(np.zeros((NXE, NZE), np.float32))  # 5-slab probe operand
    mask_top_np = np.asarray(ctx.mask_top)
    mrow_pad, mzp = separable_mask_operands(
        *mask_ramps(mask_np, mask_top_np, "all", 40), ORDER, TX)
    inj48, win0 = injection_window(np.zeros((1, 1), np.float32),
                                   row0 + 40, col0 + 40, NXE, NZE,
                                   ORDER, TX)
    cx_arr, cz_arr = [np.asarray(c) for c in
                      numerics.scaled_coefficients(ORDER, 7.62, 7.62)]
    cz = [float(c) for c in cz_arr]
    cx = [float(c) for c in cx_arr]
    wav = jnp.ones((K,), jnp.float32) * 1e-6

    # 1. baseline (the routed kernel)
    for impl in ("exact", "mxu"):
        def step1(p, pp, _impl=impl):
            pn, ppn, _rec = fd_kstep_padded(
                p, pp, v2m, mrow_pad, mzp, inj48, win0, wav, col0 + 40,
                cx_arr, cz_arr, ORDER, NXE, NZE, K, TX,
                interpret=INTERPRET,
                lap_impl=(None if _impl == "exact" else _impl))
            return pn, ppn
        t = timed_scan(step1, (p0, pp0)) / K
        print(f"baseline {impl:5s}: {t * 1e6:8.1f} us/step "
              f"{cells / t / 1e9:6.1f} GCell/s")

    # 2. DMA-only floor (5 slabs in + 2 out, no compute)
    dma = make_dma_only(R, W, hk, TX)
    step_dma = lambda p, pp: dma(p, pp, v2m, mask, patchm)
    t = timed_scan(step_dma, (p0, pp0)) / K
    bytes_pass = (5 * (R + 2 * hk * (R // TX)) + 2 * R) * W * 4
    print(f"dma_only      : {t * 1e6:8.1f} us/step "
          f"{cells / t / 1e9:6.1f} GCell/s-equiv   "
          f"({bytes_pass / (t * K) / 1e9:.0f} GB/s effective)")

    # 3. compute-only (operands pinned, no input DMA after first tile)
    for impl in ("exact", "mxu"):
        use_mxu = impl == "mxu"
        bands = (list(stream_band_inputs(cz, ORDER, W, 2))
                 if use_mxu else [])
        comp = make_compute_only(R, W, hk, TX, cz, cx, use_mxu, bands)
        slab0 = jnp.asarray(
            rng.standard_normal((S, W)).astype(np.float32) * 1e-3)
        v2s = jax.lax.slice(v2m, (0, 0), (S, W))
        ms = jax.lax.slice(mask, (0, 0), (S, W))

        def step_c(p, pp, _c=comp, _b=bands, _s=slab0, _v=v2s, _m=ms):
            return _c(p[:S, :], pp[:S, :], _v, _m, *_b)

        # feed (R, W) carries so scan shapes match; kernel reads [0:S]
        t = timed_scan(step_c, (p0, pp0)) / K
        print(f"compute_only {impl:5s}: {t * 1e6:6.1f} us/step "
              f"{cells / t / 1e9:6.1f} GCell/s-equiv")

    # 4. lean (3 slabs + separable mask, no patch/rec)
    tx_ramp = numerics._edge_ramp(NXE, 40, numerics.taper_profile(40, 0.75),
                                  True)
    tz_ramp = numerics._edge_ramp(NZE, 40, numerics.taper_profile(40, 0.75),
                                  True)
    mrow_np = np.zeros((R, 128), np.float32)
    mrow_np[row0:row0 + NXE, :] = tx_ramp[:, None]
    mzrow_np = np.zeros((8, W), np.float32)
    mzrow_np[:, col0:col0 + NZE] = tz_ramp[None, :]
    mrow = jnp.asarray(mrow_np)
    mzrow = jnp.asarray(mzrow_np)
    for impl in ("exact", "mxu"):
        use_mxu = impl == "mxu"
        bands = (list(stream_band_inputs(cz, ORDER, W, 2))
                 if use_mxu else [])
        lean = make_lean(R, W, hk, TX, cz, cx, use_mxu)

        def step_l(p, pp, _l=lean, _b=bands):
            return _l(p, pp, v2m, mrow, mzrow, *_b)

        t = timed_scan(step_l, (p0, pp0)) / K
        print(f"lean {impl:5s}    : {t * 1e6:8.1f} us/step "
              f"{cells / t / 1e9:6.1f} GCell/s")

        # value sanity vs baseline exact at one pass
        if impl == "exact":
            pn_b, ppn_b, _ = fd_kstep_padded(
                p0, pp0, v2m, mrow_pad, mzp, inj48, win0,
                jnp.zeros((K,), jnp.float32),
                col0 + 40, cx_arr, cz_arr, ORDER, NXE, NZE, K, TX,
                interpret=INTERPRET)
            pn_l, ppn_l = step_l(p0, pp0)
            err = float(jnp.abs(pn_l - pn_b).max())
            scale = float(jnp.abs(pn_b).max()) or 1.0
            print(f"  lean vs baseline (zero wavelet): max abs diff "
                  f"{err:.2e} (scale {scale:.2e})")


if __name__ == "__main__":
    main()
