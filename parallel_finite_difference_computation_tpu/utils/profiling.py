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

__all__ = ["sync", "timeit", "roofline_fraction", "device_hbm_gbps", "trace"]

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


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
