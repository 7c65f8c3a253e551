"""Tiled Pallas Laplacian (interpret mode) vs the XLA reference op."""

import numpy as np
import pytest
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops.stencil import laplacian
from parallel_finite_difference_computation_tpu.ops.pallas_stencil import (
    laplacian_pallas)


class TestTiledLaplacian:
    @pytest.mark.parametrize("nx,nz,tile", [
        (100, 60, (32, 128)),     # non-divisible nx -> padded final tiles
        (64, 64, (64, 128)),      # single tile
        (130, 300, (32, 128)),    # ragged, multiple z tiles
        (48, 400, (16, 128)),     # tall-z: 4 z-tiles
    ])
    def test_matches_xla(self, rng, nx, nz, tile):
        p = jnp.asarray(rng.standard_normal((nx, nz)).astype(np.float32))
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        ref = laplacian(p, cx, cz, 8)
        got = laplacian_pallas(p, cx, cz, 8, tile=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_order4(self, rng):
        p = jnp.asarray(rng.standard_normal((96, 50)).astype(np.float32))
        cx, cz = numerics.scaled_coefficients(4, 8.0, 25.0)
        ref = laplacian(p, cx, cz, 4)
        got = laplacian_pallas(p, cx, cz, 4, tile=(32, 128), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
