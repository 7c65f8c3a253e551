"""Fixed-point padded-layout Laplacian (`ops.pallas_stencil.laplacian_
pallas_padded`): interior-bit-identical to `ops.stencil.laplacian`, keeps
its pads exactly zero (so applies chain with no per-apply pad/slice), and
round-trips through the layout helpers. Interpret mode on CPU; the
compiled-Mosaic path is exercised on the TPU by bench.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops.stencil import laplacian
from parallel_finite_difference_computation_tpu.ops.pallas_stencil import (
    laplacian_pallas_padded, padded_layout, to_padded, from_padded)


def _run(nx, nz, order, tile_rows=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((nx, nz)).astype(np.float32)
    cx, cz = numerics.scaled_coefficients(order, 10.0, 7.5)
    p_pad = to_padded(jnp.asarray(base), order, tile_rows)
    out = laplacian_pallas_padded(p_pad, cx, cz, order, nx, nz, tile_rows,
                                  interpret=True)
    ref = laplacian(jnp.asarray(base), jnp.asarray(cx), jnp.asarray(cz),
                    order)
    return np.asarray(out), np.asarray(ref), p_pad


@pytest.mark.parametrize("nx,nz,order,tile_rows", [
    (256, 256, 8, 64),
    (151, 151, 8, 64),     # 3lay dims: nothing divides anything
    (101, 333, 4, 32),
    (64, 200, 2, 16),
    (90, 140, 16, 64),     # hr == h == 8 boundary
])
def test_matches_laplacian_and_pads_stay_zero(nx, nz, order, tile_rows):
    out, ref, _ = _run(nx, nz, order, tile_rows)
    got = np.asarray(from_padded(jnp.asarray(out), nx, nz, order, tile_rows))
    # interpret mode may form FMAs differently than the lax program; on the
    # real TPU the kernel measures bit-identical (max-err 0.0 in bench)
    tol = 4 * np.finfo(np.float32).eps * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=tol, rtol=0)
    leak = out.copy()
    R, W, r0, c0 = padded_layout(nx, nz, order, tile_rows)
    leak[r0:r0 + nx, c0:c0 + nz] = 0
    assert np.abs(leak).max() == 0.0


def test_chain_is_fixed_point():
    """Two chained applies equal laplacian(laplacian(x)) with no glue."""
    nx = nz = 192
    order, tr = 8, 64
    rng = np.random.default_rng(1)
    base = rng.standard_normal((nx, nz)).astype(np.float32)
    cx, cz = numerics.scaled_coefficients(order, 10.0, 10.0)
    p = to_padded(jnp.asarray(base), order, tr)
    for _ in range(2):
        p = laplacian_pallas_padded(p, cx, cz, order, nx, nz, tr,
                                    interpret=True)
    ref2 = laplacian(laplacian(jnp.asarray(base), jnp.asarray(cx),
                               jnp.asarray(cz), order),
                     jnp.asarray(cx), jnp.asarray(cz), order)
    got = np.asarray(from_padded(p, nx, nz, order, tr))
    ref2 = np.asarray(ref2)
    tol = 8 * np.finfo(np.float32).eps * max(1.0, np.abs(ref2).max())
    np.testing.assert_allclose(got, ref2, atol=tol, rtol=0)


@pytest.mark.parametrize("impl,rel_tol", [("mxu", 2e-5), ("mxu6", 2e-7)])
@pytest.mark.parametrize("nx,nz,order,tile_rows", [
    (96, 100, 8, 64),      # W == 128: single-block band matrix
    (151, 151, 8, 64),     # W == 256: first/last blocks only
    (200, 300, 8, 64),     # W == 384: one middle block
    (120, 520, 4, 32),     # several middle blocks, order 4
])
def test_mxu_impl_matches_laplacian(nx, nz, order, tile_rows, impl, rel_tol):
    """impl='mxu' (z-taps as banded MXU matmuls, manual 3-pass bf16) agrees
    with the exact path to the documented ~5e-6 relative tolerance —
    impl='mxu6' (6-pass triple split) to ~f32 level — and both keep the
    same zero-pad support."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((nx, nz)).astype(np.float32)
    cx, cz = numerics.scaled_coefficients(order, 10.0, 7.5)
    p_pad = to_padded(jnp.asarray(base), order, tile_rows)
    out = laplacian_pallas_padded(p_pad, cx, cz, order, nx, nz, tile_rows,
                                  interpret=True, impl=impl)
    ref = np.asarray(laplacian(jnp.asarray(base), jnp.asarray(cx),
                               jnp.asarray(cz), order))
    got = np.asarray(from_padded(jnp.asarray(out), nx, nz, order, tile_rows))
    tol = rel_tol * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=tol, rtol=0)
    leak = np.asarray(out).copy()
    R, W, r0, c0 = padded_layout(nx, nz, order, tile_rows)
    leak[r0:r0 + nx, c0:c0 + nz] = 0
    assert np.abs(leak).max() == 0.0


def test_mxu_impl_rejects_unknown():
    with pytest.raises(ValueError, match="impl"):
        _ = laplacian_pallas_padded(jnp.zeros((192, 256), jnp.float32),
                                    *numerics.scaled_coefficients(8, 1., 1.),
                                    8, 100, 100, 64, interpret=True,
                                    impl="gpu")


def test_layout_roundtrip():
    nx, nz, order, tr = 77, 205, 8, 64
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (nx, nz)).astype(np.float32))
    p = to_padded(x, order, tr)
    R, W, r0, c0 = padded_layout(nx, nz, order, tr)
    assert p.shape == (R, W) and R % tr == 0 and W % 128 == 0
    np.testing.assert_array_equal(np.asarray(from_padded(p, nx, nz, order,
                                                         tr)),
                                  np.asarray(x))
