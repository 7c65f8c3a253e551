#!/usr/bin/env python
"""Isolate the slow op inside the domain block kernel.

Chains N standalone forward-block calls (pallas_call chains cannot fuse)
and times variants of the per-step body: full, no-source-injection,
z-taps-only, x-taps-only (lane shifts), no-laplacian. Prints per-step
times; the variant whose removal collapses the time is the culprit.
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
    _compiler_params)
from parallel_finite_difference_computation_tpu.utils.profiling import timeit

NZE, NXW, NXL, H = 232, 296, 232, 32   # 3lay-domain shapes (K=8)
K = 8
ORDER = 8
CZ = [0.1 * (i + 1) for i in range(ORDER + 1)]
CX = [0.07 * (i + 1) for i in range(ORDER + 1)]


def lap_variant(sm, mode):
    h = ORDER // 2
    nz, nx = sm.shape
    if mode == "none":
        return sm * 0.0
    acm = None
    if mode in ("full", "z_only"):
        acm = CZ[0] * jax.lax.slice(sm, (0, h), (nz - ORDER, nx - h))
        for io in range(1, ORDER + 1):
            acm = acm + CZ[io] * jax.lax.slice(
                sm, (io, h), (nz - ORDER + io, nx - h))
    if mode in ("full", "x_only"):
        a = CX[0] * jax.lax.slice(sm, (h, 0), (nz - h, nx - ORDER))
        for io in range(1, ORDER + 1):
            a = a + CX[io] * jax.lax.slice(
                sm, (h, io), (nz - h, nx - ORDER + io))
        acm = a if acm is None else acm + a
    return jnp.pad(acm, ((h, h), (h, h)))


def block_kernel(mode, inject, v2_ref, mask_ref, src_ref, wav_ref,
                 p_in, pp_in, p_out, pp_out, X, Y):
    dt2 = jnp.float32(1e-7)
    X[:, :] = p_in[:, :]
    Y[:, :] = pp_in[:, :]
    for k in range(K):
        dst, src = (X, Y) if k % 2 == 0 else (Y, X)
        sm = src[:, :] * mask_ref[:, :]
        dst[:, :] = (2.0 * sm - dst[:, :] * mask_ref[:, :]
                     + v2_ref[:, :] * dt2 * lap_variant(sm, mode))
        src[:, :] = sm
        if inject:
            dst[40:41, :] += wav_ref[k, 0] * src_ref[:, :]
    pX, pY = (X, Y) if K % 2 == 0 else (Y, X)
    p_out[:, :] = pX[:, H:H + NXL]
    pp_out[:, :] = pY[:, H:H + NXL]


def build(mode, inject, nreps):
    slab = jax.ShapeDtypeStruct((NZE, NXL), jnp.float32)
    kern = functools.partial(block_kernel, mode, inject)
    call = pl.pallas_call(
        kern,
        out_shape=(slab, slab),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((NZE, NXW), jnp.float32)] * 2,
        compiler_params=_compiler_params(),
    )

    @jax.jit
    def f(v2, mask, srow, wav, p, pp):
        zpad = jnp.zeros((NZE, H), jnp.float32)
        for _ in range(nreps):
            pe = jnp.concatenate([zpad, p, zpad], axis=1)
            ppe = jnp.concatenate([zpad, pp, zpad], axis=1)
            p, pp = call(v2, mask, srow, wav, pe, ppe)
        return p, pp

    return f


def main():
    rng = np.random.default_rng(0)
    v2 = jnp.asarray(rng.random((NZE, NXW), np.float32))
    mask = jnp.ones((NZE, NXW), jnp.float32)
    srow = jnp.zeros((1, NXW), jnp.float32).at[0, 150].set(1.0)
    wav = jnp.asarray(rng.random((K, 1), np.float32))
    p0 = rng.standard_normal((NZE, NXL)).astype(np.float32)
    pp0 = rng.standard_normal((NZE, NXL)).astype(np.float32)

    N1, N2 = 8, 24
    print(f"slab ({NZE},{NXW}) K={K}; times are per STEP (slope over "
          f"{N2 - N1} extra blocks)", flush=True)
    for mode, inject in [("full", True), ("full", False),
                         ("z_only", False), ("x_only", False),
                         ("none", False)]:
        f1, f2 = build(mode, inject, N1), build(mode, inject, N2)
        mk = lambda i: (v2, mask, srow, wav,
                        jnp.asarray(p0 * (1 + 1e-6 * i)), jnp.asarray(pp0))
        t1 = timeit(mk, f1, warmup=2, iters=3)
        t2 = timeit(mk, f2, warmup=2, iters=3)
        per_block = (t2 - t1) / (N2 - N1)
        print(f"  mode={mode:7s} inject={int(inject)}: "
              f"{per_block / K * 1e6:8.2f} us/step  "
              f"({per_block * 1e6:8.1f} us/block)", flush=True)


if __name__ == "__main__":
    main()
