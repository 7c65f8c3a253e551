"""A/B the Laplacian association order against the C oracle at full config.

The symmetric-pair taps (round 3) merged both axes into ONE accumulator,
interleaving x-terms whose coefficients are ~10x smaller than the z-terms
when dx != dz (marmousi dz=8, dx=25). The reference kernel
(cuda_reference_RTM/src/fd-code.cu:53-78) keeps SEPARATE per-axis
accumulators (acmz/acmx, ascending taps) and adds them once — so the merged
order loses low bits of the x contribution every add, and the drift vs the
oracle compounds over nt=3004 steps.

Measured (marmousi full config, TPU): merged 1.75e-4, splitzx-ascending
4.9e-6, naive 3.3e-6, canonical (splitzx descending-k, center last,
unpatched package) 4.1e-6 — split-axis accumulation was adopted in
``ops.stencil.laplacian_interior``, with descending-k inside each axis
because that order's first term is a pair slice whose layout Mosaic can
pad (and small-coefficients-first is the more accurate summation).

Usage: python scripts/exp_lap_assoc.py {canonical|merged|splitzx|naive} [config]
Prints one JSON line with the image/per-shot rel RMS vs the oracle goldens.
Run each variant in its own process (fresh jit caches).
"""
import json
import os
import sys
import tempfile

import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "canonical"
CONFIG = sys.argv[2] if len(sys.argv) > 2 else "marmousi"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu.ops import stencil


def lap_interior_merged(p, coefs_x, coefs_z, order):
    """The round-3 first cut: ONE accumulator, merged center — 25 ops/cell
    but interleaves the small x-terms into a mixed-magnitude sum."""
    nx, nz = p.shape
    h = order // 2
    acc = (coefs_z[h] + coefs_x[h]) * jax.lax.slice(
        p, (h, h), (nx - h, nz - h))
    for k in range(1, h + 1):
        zm = jax.lax.slice(p, (h, h - k), (nx - h, nz - h - k))
        zp = jax.lax.slice(p, (h, h + k), (nx - h, nz - h + k))
        acc = acc + coefs_z[h + k] * (zm + zp)
        xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
        xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
        acc = acc + coefs_x[h + k] * (xm + xp)
    return acc


def lap_interior_splitzx(p, coefs_x, coefs_z, order):
    """Per-axis accumulators (like the reference), symmetric pairs within
    each axis, per-axis center, final accz+accx add. 27 ops/cell."""
    nx, nz = p.shape
    h = order // 2
    c = jax.lax.slice(p, (h, h), (nx - h, nz - h))
    accz = coefs_z[h] * c
    for k in range(1, h + 1):
        zm = jax.lax.slice(p, (h, h - k), (nx - h, nz - h - k))
        zp = jax.lax.slice(p, (h, h + k), (nx - h, nz - h + k))
        accz = accz + coefs_z[h + k] * (zm + zp)
    accx = coefs_x[h] * c
    for k in range(1, h + 1):
        xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
        xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
        accx = accx + coefs_x[h + k] * (xm + xp)
    return accz + accx


def lap_interior_naive(p, coefs_x, coefs_z, order):
    """The reference's exact association: ascending io per axis, separate
    accumulators, final add (fd-code.cu:66-73). 4*order+3 ops/cell."""
    nx, nz = p.shape
    h = order // 2
    accz = None
    accx = None
    for io in range(order + 1):
        aux = io - h
        zt = coefs_z[io] * jax.lax.slice(
            p, (h, h + aux), (nx - h, nz - h + aux))
        xt = coefs_x[io] * jax.lax.slice(
            p, (h + aux, h), (nx - h + aux, nz - h))
        accz = zt if accz is None else accz + zt
        accx = xt if accx is None else accx + xt
    return accz + accx


if VARIANT == "splitzx":
    stencil.laplacian_interior = lap_interior_splitzx
elif VARIANT == "merged":
    stencil.laplacian_interior = lap_interior_merged
elif VARIANT == "naive":
    stencil.laplacian_interior = lap_interior_naive
elif VARIANT != "canonical":
    raise SystemExit(f"unknown variant {VARIANT}")

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import pipeline
from parallel_finite_difference_computation_tpu.utils.oracle import gpu_goldens


def rel_rms(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float(np.sqrt(np.mean(d * d)) /
                 max(np.sqrt(np.mean(np.asarray(b, np.float64) ** 2)), 1e-30))


paths = gpu_goldens(CONFIG)
p = pfdc.parse_input_dat(str(paths["input_parity"]))
with tempfile.TemporaryDirectory() as td:
    img, imlocs = pipeline.run_rtm_gpu(p, backend="lax", outdir=td)
golden = np.fromfile(paths["dir_image"], np.float32).reshape(p.nx, p.nz)
gims = np.fromfile(paths["imlocs"], np.float32).reshape(p.ns, p.nx, p.nz)
r = rel_rms(img, golden)
rs = max(rel_rms(np.asarray(imlocs[i]), gims[i]) for i in range(p.ns))
print(json.dumps({"variant": VARIANT, "config": CONFIG,
                  "image_rel_rms": r, "worst_shot": rs,
                  "platform": jax.devices()[0].platform}))
