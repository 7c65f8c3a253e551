"""Bit-identity of the separable taper-mask operands and the injection
window (ops/pallas_stream.mask_ramps / separable_mask_operands /
injection_window) against the full-field forms they replace.

The K-step streaming kernels rebuild the (R, W) taper mask per tile from
1D ramp operands and place the source patch from a (48, W) window
(PALLAS_NOTES "lean operand streaming"). These tests assert the
host-level reconstruction is *bitwise* the padded full-field mask
(both taper kinds, ``fd-code.cu:94-117`` / ``taper.c:47-84`` semantics)
and the window reproduces the pre-placed pre-tapered patch for sources
at tile-straddling and near-edge rows.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops.pallas_stream import (
    mask_ramps, separable_mask_operands, injection_window, _mask_from_ramps,
    padded_layout, to_padded)


def _masks(nxe=73, nze=61, nxb=11, nzb=9, fac=0.82):
    tx = numerics.taper_profile(nxb, fac)
    tz = numerics.taper_profile(nzb, fac)
    return (numerics.taper_mask_all(nxe, nze, nxb, nzb, tx, tz),
            numerics.taper_mask_top(nxe, nze, nxb, nzb, tx, tz), nzb)


@pytest.mark.parametrize("kind", ["all", "top"])
@pytest.mark.parametrize("tile_rows", [16, 32])
def test_mask_reconstruction_bitwise(kind, tile_rows):
    mask_all, mask_top, nzb = _masks()
    nxe, nze = mask_all.shape
    order = 8
    full = np.asarray(to_padded(
        jnp.asarray(mask_all if kind == "all" else mask_top),
        order, tile_rows))
    mrow, mzp = separable_mask_operands(
        *mask_ramps(mask_all, mask_top, kind, nzb), order, tile_rows)
    # rebuild slab-by-slab exactly as the kernels do (mrow streams in
    # row tiles; mzp is fully resident)
    R, W, _, _ = padded_layout(nxe, nze, order, tile_rows)
    got = np.asarray(_mask_from_ramps(jnp.asarray(mrow), jnp.asarray(mzp)))
    assert got.shape == (R, W)
    assert np.array_equal(got, full), (
        f"{kind}: {np.abs(got - full).max()} max abs diff")


@pytest.mark.parametrize("sx_off", [0, 3, 14, 15])  # straddle/interior rows
def test_injection_window_matches_full_field(sx_off):
    mask_all, _mask_top, _nzb = _masks()
    nxe, nze = mask_all.shape
    order, tr = 8, 16
    R, W, row0, col0 = padded_layout(nxe, nze, order, tr)
    mask_pad = to_padded(jnp.asarray(mask_all), order, tr)
    patch = jnp.asarray(numerics.gaussian_source_patch(), jnp.float32)
    r = patch.shape[0] // 2
    sx, sz = sx_off + r, 20
    px, pz = row0 + sx - r, col0 + sz - r
    # the form the whole-field kernels used: pre-placed, pre-tapered
    import jax
    full = np.asarray(jax.lax.dynamic_update_slice(
        jnp.zeros((R, W), jnp.float32), patch, (px, pz))
        * mask_pad)
    inj48, win0 = injection_window(patch, px, pz, nxe, nze, order, tr,
                                   mask_pad=mask_pad)
    w0 = int(np.asarray(win0)[0])
    assert w0 % 8 == 0
    rebuilt = np.zeros((R, W), np.float32)
    blk = np.asarray(inj48)[16:32]  # content rows cover [w0, w0+16)
    rebuilt[w0:w0 + 16] = blk
    # margins must be zero so straddling tiles read zeros
    assert not np.asarray(inj48)[:16].any()
    assert not np.asarray(inj48)[32:].any()
    assert np.array_equal(rebuilt, full)
