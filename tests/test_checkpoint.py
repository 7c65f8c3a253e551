"""Checkpoint/recompute spectrum tests: save-every-k RTM must reproduce the
full-wavefield image (identical op sequence => bitwise-equal on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, rtm_shot_full, rtm_shot_checkpointed)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    ctx = FDContext.create(30, 26, 24, dx=10.0, dz=10.0, dt=0.001,
                           order=8, nxb=8, nzb=8, fac=0.7)
    v2 = jnp.asarray(
        (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))).astype(np.float32) ** 2)
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
    dobs = jnp.asarray(rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32))
    ref = np.asarray(rtm_shot_full(ctx, v2, wav, dobs, 20, 12, 9))
    return ctx, v2, wav, dobs, ref


class TestCheckpointedRTM:
    @pytest.mark.parametrize("k", [2, 4, 8, 12, 24])
    def test_matches_full(self, setup, k):
        ctx, v2, wav, dobs, ref = setup
        img = np.asarray(rtm_shot_checkpointed(ctx, v2, wav, dobs, 20, 12, 9,
                                               save_every=k))
        np.testing.assert_allclose(img, ref, atol=1e-6, rtol=1e-6)

    def test_rejects_nondivisor(self, setup):
        ctx, v2, wav, dobs, _ = setup
        with pytest.raises(ValueError):
            rtm_shot_checkpointed(ctx, v2, wav, dobs, 20, 12, 9, save_every=7)
