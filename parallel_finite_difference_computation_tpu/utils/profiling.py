"""Profiling and benchmarking utilities: readback-fenced timing, HBM
roofline accounting, and jax.profiler trace capture.

The reference self-measures with ``gettimeofday`` wall-clock prints
(``cuda_reference_RTM/src/fd-code.cu:393,535-538``) and a copy-time
accumulator in the DPC++ variants (``fd-code.dp.cpp:251,268-269``); here
profiling is a first-class library feature with TPU-specific care: on
tunneled TPU platforms ``block_until_ready`` can return before remote
execution completes and identical-input calls may be served from a result
cache, so :func:`timeit` perturbs nothing itself but requires caller-made
distinct inputs and fences with a scalar readback.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["sync", "timeit", "roofline_fraction", "device_hbm_gbps",
           "vpu_ceiling_cell_rate", "stencil_ops_per_cell",
           "fused_update_ops_per_cell",
           "measure_stream_gbps", "trace"]

# Peak HBM bandwidth by device kind (GB/s); conservative public numbers.
_HBM_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5": 1228.0,       # v5p
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def device_hbm_gbps(device=None) -> float:
    d = device or jax.devices()[0]
    for k, v in _HBM_GBPS.items():
        if str(d.device_kind).startswith(k) or str(d).startswith(k):
            return v
    return 819.0


def sync(x) -> float:
    """Force completion of ``x`` with a scalar readback fence; returns the
    sum (useful as a checksum)."""
    return float(jnp.sum(x))


def timeit(make_args: Callable[[int], tuple], fn: Callable,
           warmup: int = 1, iters: int = 3) -> float:
    """Minimum wall time of ``fn(*make_args(i))`` over ``iters`` runs with a
    fresh input per iteration (defeats result caching) and readback fencing.
    ``make_args(i)`` must return device-ready args that differ per ``i``
    (negative ``i`` is used for warmup)."""
    for i in range(warmup):
        sync(fn(*make_args(-1 - i)))
    best = float("inf")
    for i in range(iters):
        args = make_args(i)
        for a in args:
            if hasattr(a, "shape"):
                sync(a)
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def roofline_fraction(nbytes: int, seconds: float, device=None) -> float:
    """Fraction of the device's HBM-bandwidth roofline achieved by moving
    ``nbytes`` in ``seconds`` (1.0 = at roofline)."""
    return (nbytes / seconds) / (device_hbm_gbps(device) * 1e9)


# VPU ceiling model. Order-8 f32 stencils are *compute*-bound on v5e —
# arithmetic intensity (~4.4 flop/byte at the 2-pass HBM traffic floor)
# exceeds the VPU/HBM balance point — so the speed-of-light is the VPU
# issue rate, not HBM. The issue rate is MICRO-MEASURED, not the naive
# 1-op/cycle model: an in-VMEM update micro-kernel sustains ~52
# GCell-updates/s across the 41-op fused FD update at (232,256)
# (docs/PALLAS_NOTES.md "Round 2 (cont.)"), i.e. ~2.1 (8,128)-vector
# op-slots retired per cycle at 0.94 GHz — the VPU dual-issues. All
# recorded *_ceiling_fraction entries are quoted against this measured
# model; the superseded single-issue model underestimated the hardware
# by ~2x (it produced recorded "fractions" above 1.0).
_VPU_REG_LANES = 8 * 128
# Issue slots per cycle are MEASURED, per device kind; only v5e has been
# micro-measured here. Other generations fall back to the conservative
# single-issue model (fractions may then exceed 1.0, which is itself the
# signal to micro-measure that chip rather than trust the model).
_VPU_ISSUE_SLOTS = {
    "TPU v5 lite": 2.1,     # v5e, micro-measured (PALLAS_NOTES.md)
}
_VPU_ISSUE_SLOTS_DEFAULT = 1.0
_CLOCK_GHZ = {
    "TPU v5 lite": 0.94,    # v5e
    "TPU v5": 1.75,         # v5p
    "TPU v4": 1.05,
    "TPU v6 lite": 0.94,
}


def _by_device_kind(table, default, device=None):
    d = device or jax.devices()[0]
    for k, v in table.items():
        if str(d.device_kind).startswith(k) or str(d).startswith(k):
            return v
    return default


def _device_clock_ghz(device=None) -> float:
    return _by_device_kind(_CLOCK_GHZ, 0.94, device)


def stencil_ops_per_cell(order: int) -> int:
    """Vector-op count per output cell of the order-``order`` Laplacian as
    implemented (split-axis symmetric-pair taps,
    ``ops.stencil.laplacian_interior``): per axis one center multiply plus
    ``order/2`` pairs each costing pair-add + multiply + accumulate, and a
    final cross-axis add — ``3*order + 3`` (27 for order 8; the naive
    per-tap accumulation costs ``4*order + 3`` = 35). The axis accumulators
    are kept separate to match the reference's ``acmz``/``acmx`` rounding
    (see ``laplacian_interior``'s docstring for the anisotropic-spacing
    drift that a merged accumulator causes)."""
    return 3 * order + 3


def fused_update_ops_per_cell(order: int) -> int:
    """Vector-op count of the fused leapfrog FD update as implemented in
    the Pallas kernels: the Laplacian plus ``2p - pp + v2m*lap`` (4 ops;
    dt2 and the interior mask are folded into the v2 operand) and the
    taper multiply — ``stencil_ops_per_cell(order) + 5`` (32 for order 8;
    the naive unfused accounting was 41)."""
    return stencil_ops_per_cell(order) + 5


def vpu_ceiling_cell_rate(ops_per_cell: int, device=None) -> float:
    """Speed-of-light cell-update rate (cells/s) under the measured VPU
    issue model: 8x128 vector lanes retiring the device kind's measured
    op-slots per cycle (~2.1 on v5e, micro-measured in VMEM,
    docs/PALLAS_NOTES.md; unmeasured kinds use the single-issue floor).
    ~74.9 GCell/s for the 27-op split-axis symmetric-pair order-8 Laplacian
    on v5e, ~63.2 GCell/s for the 32-op fused RTM update (dt2 folded into
    the v2 operand)."""
    slots = _by_device_kind(_VPU_ISSUE_SLOTS, _VPU_ISSUE_SLOTS_DEFAULT,
                            device)
    return (_VPU_REG_LANES * slots
            * _device_clock_ghz(device) * 1e9 / ops_per_cell)


def measure_stream_gbps(n: int = 8192, iters: int = 5) -> float:
    """Measured achievable HBM streaming bandwidth (GB/s, read+write) via
    chained elementwise maps over an (n, n) f32 array — the empirical
    counterpart of :func:`device_hbm_gbps`. On the tunneled dev chip this
    measures ~650-680 GB/s (~80% of the 819 GB/s v5e spec), so perf
    fractions quoted against this number reflect what is actually
    attainable by XLA's own pipeline on the same hardware path.

    Two defenses make this honest on the tunneled dev setup:
    * ``lax.optimization_barrier`` between steps — without it XLA
      loop-fuses the whole chain into ONE pass (measured: a 4-chain and a
      16-chain take identical wall time) and the naive estimate divides
      dispatch RTT by the chain length, reporting a fantasy rate (the
      round-1/2 "285 GB/s" was exactly this artifact).
    * the *slope* between a 16-chain and a 64-chain (48 extra passes),
      which cancels the constant ~26-30 ms dispatch/readback RTT that
      otherwise inflates every per-pass number by RTT/chain_len."""
    import numpy as np
    x = jnp.asarray(np.linspace(0, 1, n * n, dtype=np.float32).reshape(n, n))

    def chain(k):
        @jax.jit
        def f(x):
            for i in range(k):
                x = jax.lax.optimization_barrier(x * (1.0 + 1e-9 * i) + 1.0)
            return x
        return f

    t16 = timeit(lambda i: (x + np.float32(i) * 1e-9,), chain(16),
                 warmup=2, iters=iters)
    t64 = timeit(lambda i: (x + np.float32(i) * 1e-9,), chain(64),
                 warmup=2, iters=iters)
    per_pass = (t64 - t16) / 48
    if per_pass <= 0:
        raise RuntimeError(
            f"stream passes not materializing (t16={t16:.4f}s "
            f"t64={t64:.4f}s -> non-positive slope); measurement invalid")
    bw = 2 * n * n * 4 / per_pass / 1e9
    if bw > 4000.0:
        raise RuntimeError(
            f"stream passes not materializing (t16={t16:.4f}s "
            f"t64={t64:.4f}s -> implied {bw:.0f} GB/s); measurement invalid")
    return bw


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
