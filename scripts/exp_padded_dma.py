"""Isolate what binds the padded stencil kernel at 8192^2 (~40 GCell/s):

  prod      — the production kernel (baseline, same session)
  copyonly  — same DMA pattern, output written from the scratch rows with
              no taps: the DMA floor
  compute   — DMA only the first tile, compute taps on the resident slot
              every tile: the VPU bound for this tap formulation
  dualq     — input DMA split into two lane-half copies with separate
              semaphores (two DMA queues), each half computed
              independently with a 128-lane seam halo

If copyonly ~= prod, the kernel is DMA-bound and dualq tests whether the
per-queue saturation (docs/PALLAS_NOTES.md round 2: prefetch depth does
not help) can be bought back with a second queue.

Run:  python scripts/exp_padded_dma.py [n]
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
TX = 64


def _kern_copyonly(n_tx, R, W, inp_hbm, mask_ref, out_ref, scratch, sems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ps._halo_dma_start(inp_hbm, scratch, sems, 0, 0, TX, HR, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        ps._halo_dma_start(inp_hbm, scratch, sems, i + 1,
                           jax.lax.rem(i + 1, 2), TX, HR, n_tx, R)

    cur = jax.lax.rem(i, 2)
    ps._halo_dma_wait(inp_hbm, scratch, sems, cur, TX, HR)
    out_ref[:, :] = scratch[cur][HR:HR + TX, :] * mask_ref[0:1, :]


def _kern_compute(n_tx, R, W, cz, cx, inp_hbm, mask_ref, out_ref,
                  scratch, sems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ps._halo_dma_start(inp_hbm, scratch, sems, 0, 0, TX, HR, n_tx, R)
        ps._halo_dma_wait(inp_hbm, scratch, sems, 0, TX, HR)

    full = ps._lap_taps(scratch[0], ORDER, HR, TX, W, cz, cx)
    rows = i * TX + jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
    keep = (rows >= 0)
    out_ref[:, :] = jnp.where(keep, full * mask_ref[0:1, :], 0.0)


def _dual_dma_start(hbm, scrL, scrR, semL, semR, ti, slot, n_tx, R, WL, W):
    """Two lane-half input copies per tile on separate semaphores. The left
    buffer covers lanes [0, WL+128), the right [WL-128, W): a 128-lane
    aligned seam halo each, so each half's taps are self-contained."""
    rows_slot = TX + 2 * HR
    WLh = WL + 128
    WRh = W - WL + 128

    def issue(row):
        pltpu.make_async_copy(hbm.at[pl.ds(row, rows_slot), pl.ds(0, WLh)],
                              scrL.at[slot], semL.at[slot]).start()
        col = pl.multiple_of(WL - 128, 128)
        pltpu.make_async_copy(hbm.at[pl.ds(row, rows_slot), pl.ds(col, WRh)],
                              scrR.at[slot], semR.at[slot]).start()

    @pl.when(ti == 0)
    def _():
        issue(0)

    @pl.when((ti > 0) & (ti < n_tx - 1))
    def _():
        issue(pl.multiple_of(ti * TX - HR, 8))

    @pl.when(ti == n_tx - 1)
    def _():
        issue(R - rows_slot)


def _kern_dualq(n_tx, R, W, WL, nx, cz, cx, inp_hbm, maskL_ref, maskR_ref,
                out_ref, scrL, scrR, semL, semR):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _dual_dma_start(inp_hbm, scrL, scrR, semL, semR, 0, 0, n_tx, R,
                        WL, W)

    @pl.when(i + 1 < n_tx)
    def _():
        _dual_dma_start(inp_hbm, scrL, scrR, semL, semR, i + 1,
                        jax.lax.rem(i + 1, 2), n_tx, R, WL, W)

    cur = jax.lax.rem(i, 2)
    WLh = WL + 128
    WRh = W - WL + 128
    pltpu.make_async_copy(inp_hbm.at[pl.ds(0, TX + 2 * HR), pl.ds(0, WLh)],
                          scrL.at[cur], semL.at[cur]).wait()
    col = pl.multiple_of(WL - 128, 128)
    pltpu.make_async_copy(inp_hbm.at[pl.ds(0, TX + 2 * HR), pl.ds(col, WRh)],
                          scrR.at[cur], semR.at[cur]).wait()

    rows = i * TX + jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0)
    keep = (rows >= TX + 2 * H) & (rows < TX + H + nx - H)
    fullL = ps._lap_taps(scrL[cur], ORDER, HR, TX, WLh, cz, cx)
    fullR = ps._lap_taps(scrR[cur], ORDER, HR, TX, WRh, cz, cx)
    out_ref[:, :WL] = jnp.where(keep, fullL[:, :WL] * maskL_ref[0:1, :], 0.0)
    out_ref[:, WL:] = jnp.where(keep, fullR[:, 128:] * maskR_ref[0:1, :], 0.0)


def build(n, variant):
    nx = nz = n
    R, W, row0, col0 = ps.padded_layout(nx, nz, ORDER, TX)
    n_tx = R // TX
    cz_, cx_ = numerics.scaled_coefficients(ORDER, 10.0, 10.0)
    cz = [float(v) for v in cz_]
    cx = [float(v) for v in cx_]
    mask = np.zeros((8, W), np.float32)
    mask[:, 2 * H:nz] = 1.0

    if variant == "prod":
        def call(p, m):
            return ps.laplacian_pallas_padded(p, cx_, cz_, ORDER, nx, nz, TX)
        return call, (R, W), (jnp.asarray(mask),)

    if variant in ("copyonly", "compute"):
        if variant == "copyonly":
            kern = functools.partial(_kern_copyonly, n_tx, R, W)
        else:
            kern = functools.partial(_kern_compute, n_tx, R, W, cz, cx)
        cp = vmem_params(((2 + 24) * (TX + 2 * HR) * W + 2 * TX * W) * 4)
        call = pl.pallas_call(
            kern, grid=(n_tx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TX, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, TX + 2 * HR, W), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=cp)
        return call, (R, W), (jnp.asarray(mask),)

    if variant == "dualq":
        WL = (W // 2 // 128) * 128
        WLh, WRh = WL + 128, W - WL + 128
        maskL = mask[:, :WL].copy()
        maskR = mask[:, WL:].copy()
        kern = functools.partial(_kern_dualq, n_tx, R, W, WL, nx, cz, cx)
        cp = vmem_params(((2 + 24) * (TX + 2 * HR) * (WLh + WRh)
                          + 2 * TX * W) * 4)
        call = pl.pallas_call(
            kern, grid=(n_tx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TX, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, TX + 2 * HR, WLh), jnp.float32),
                            pltpu.VMEM((2, TX + 2 * HR, WRh), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=cp)
        return call, (R, W), (jnp.asarray(maskL), jnp.asarray(maskR))

    raise ValueError(variant)


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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("device:", jax.devices()[0], "n:", n)
    for variant in ("prod", "copyonly", "compute", "dualq"):
        try:
            call, shape, extras = build(n, variant)
            g, per = slope_rate(call, shape, extras, n)
            print(f"{variant:9s}: {g:6.2f} GCell/s ({per*1e3:.3f} ms/apply)",
                  flush=True)
        except Exception as e:
            print(f"{variant:9s}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
