"""Which symmetric-pair accumulation orders can Mosaic pad?

The center-first symmetric accumulation gives the interior value a
vpad offset {4,4}, and ``jnp.pad`` then hits an unimplemented
``tpu.concatenate`` case ("result/input offset mismatch on non-concat
dimension").  This script compiles a minimal whole-grid
laplacian+pad pallas kernel for several accumulation orders / pad
lowerings on the real chip and reports which compile and agree with
the lax reference.

Run:  python scripts/exp_pad_layouts.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_finite_difference_computation_tpu import numerics

NX = NZ = 231
ORDER = 8
H = ORDER // 2


def taps_center_first(p, cz, cx):
    nx, nz = p.shape
    h = H
    acc = (cz[h] + cx[h]) * jax.lax.slice(p, (h, h), (nx - h, nz - h))
    for k in range(1, h + 1):
        zm = jax.lax.slice(p, (h, h - k), (nx - h, nz - h - k))
        zp = jax.lax.slice(p, (h, h + k), (nx - h, nz - h + k))
        acc = acc + cz[h + k] * (zm + zp)
        xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
        xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
        acc = acc + cx[h + k] * (xm + xp)
    return acc


def taps_zedge_first(p, cz, cx):
    """First term is the widest z-pair (zm slice starts at column 0)."""
    nx, nz = p.shape
    h = H
    zm = jax.lax.slice(p, (h, 0), (nx - h, nz - 2 * h))
    zp = jax.lax.slice(p, (h, 2 * h), (nx - h, nz))
    acc = cz[2 * h] * (zm + zp)
    for k in range(h - 1, 0, -1):
        zm = jax.lax.slice(p, (h, h - k), (nx - h, nz - h - k))
        zp = jax.lax.slice(p, (h, h + k), (nx - h, nz - h + k))
        acc = acc + cz[h + k] * (zm + zp)
    acc = acc + (cz[h] + cx[h]) * jax.lax.slice(p, (h, h), (nx - h, nz - h))
    for k in range(1, h + 1):
        xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
        xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
        acc = acc + cx[h + k] * (xm + xp)
    return acc


def taps_split_zx(p, cz, cx):
    """z and x accumulated separately, merged center inside the z part;
    the final accz+accx add mixes two differently-offset values the way
    the naive formulation did (acmz {4,0} + acmx {0,4})."""
    nx, nz = p.shape
    h = H
    accz = (cz[h] + cx[h]) * jax.lax.slice(p, (h, h), (nx - h, nz - h))
    for k in range(1, h + 1):
        zm = jax.lax.slice(p, (h, h - k), (nx - h, nz - h - k))
        zp = jax.lax.slice(p, (h, h + k), (nx - h, nz - h + k))
        accz = accz + cz[h + k] * (zm + zp)
    k = 1
    xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
    xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
    accx = cx[h + k] * (xm + xp)
    for k in range(2, h + 1):
        xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
        xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
        accx = accx + cx[h + k] * (xm + xp)
    return accz + accx


def taps_roll_full(p, cz, cx):
    """Concat-free: full-grid taps via jnp.roll (interior cells read the
    same neighbors as the slice formulation; border garbage is masked by
    the caller's interior mask instead of a pad).  Same 25-op count plus
    one mask multiply; returns the FULL-shape laplacian (caller masks)."""
    h = H
    acc = (cz[h] + cx[h]) * p
    for k in range(1, h + 1):
        acc = acc + cz[h + k] * (jnp.roll(p, k, 1) + jnp.roll(p, -k, 1))
        acc = acc + cx[h + k] * (jnp.roll(p, k, 0) + jnp.roll(p, -k, 0))
    return acc


def taps_naive(p, cz, cx):
    """Pre-change control: per-tap accumulation (35 ops)."""
    nx, nz = p.shape
    h = H
    order = ORDER
    acmz = cz[0] * jax.lax.slice(p, (h, 0), (nx - h, nz - order))
    acmx = cx[0] * jax.lax.slice(p, (0, h), (nx - order, nz - h))
    for io in range(1, order + 1):
        acmz = acmz + cz[io] * jax.lax.slice(p, (h, io), (nx - h, nz - order + io))
        acmx = acmx + cx[io] * jax.lax.slice(p, (io, h), (nx - order + io, nz - h))
    return acmz + acmx


def pad_concat(interior):
    return jnp.pad(interior, ((H, H), (H, H)))


def pad_dus(interior):
    z = jnp.zeros((NX, NZ), jnp.float32)
    return jax.lax.dynamic_update_slice(z, interior, (H, H))


def build(taps, pad):
    cz_, cx_ = numerics.scaled_coefficients(ORDER, 10.0, 10.0)
    cz = [float(v) for v in cz_]
    cx = [float(v) for v in cx_]

    def kern(p_ref, out_ref):
        out_ref[:, :] = pad(taps(p_ref[:, :], cz, cx))

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NX, NZ), jnp.float32),
    )


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NX, NZ)).astype(np.float32))
    from parallel_finite_difference_computation_tpu.ops.stencil import laplacian
    cz_, cx_ = numerics.scaled_coefficients(ORDER, 10.0, 10.0)
    ref = np.asarray(jax.jit(
        lambda p: laplacian(p, [float(v) for v in cx_],
                            [float(v) for v in cz_], ORDER))(x))
    mask = np.zeros((NX, NZ), np.float32)
    mask[H:NX - H, H:NZ - H] = 1.0
    mask = jnp.asarray(mask)

    def mask_full(full):
        return full * mask

    cases = [(t, p) for t in [("naive", taps_naive),
                              ("split_zx", taps_split_zx),
                              ("zedge_first", taps_zedge_first),
                              ("center_first", taps_center_first)]
             for p in [("pad", pad_concat), ("dus", pad_dus)]]
    cases.append((("roll_full", taps_roll_full), ("mask", mask_full)))
    for (tname, taps), (pname, pad) in cases:
        try:
            got = np.asarray(jax.jit(build(taps, pad))(x))
            err = np.abs(got - ref).max() / (np.abs(ref).max() or 1.0)
            print(f"{tname:14s} {pname:4s}: OK  max rel diff {err:.2e}",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:100]
            print(f"{tname:14s} {pname:4s}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
