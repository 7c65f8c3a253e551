"""Pallas kernel tests (interpret mode on CPU) against the lax path.

The Mosaic kernels compile only for real TPU; interpret mode executes the
same kernel logic op-by-op, which is slow — configs here are tiny. The
odd/even nt cases exercise the two-step role-alternating unroll's peeled
tails; the TPU-compiled path is additionally gated in bench.py against the
reference goldens.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, rtm_shot_snapshot)
from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
    forward_modeling_pallas, rtm_snapshot_pallas)


def _setup(nt, rng, nx=28, nz=24, nxb=8, nzb=8):
    ctx = FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                           order=8, nxb=nxb, nzb=nzb, fac=0.7)
    v2 = jnp.asarray(
        (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))).astype(np.float32) ** 2)
    wav = jnp.asarray(numerics.ricker_wavelet(nt, 0.001, 25.0))
    return ctx, v2, wav


class TestForwardModelingPallas:
    @pytest.mark.parametrize("nt", [10, 11])
    @pytest.mark.parametrize("source,taper", [("gaussian", "all"),
                                              ("point", "top")])
    def test_matches_lax(self, rng, nt, source, taper):
        ctx, v2, wav = _setup(nt, rng)
        sx, sz, gz = 20, 12, 9
        p0, pp0, s0 = forward_modeling(ctx, v2, wav, sx, sz, gz,
                                       source=source, taper=taper,
                                       record="trace")
        p1, pp1, s1 = forward_modeling_pallas(ctx, v2, wav, sx, sz, gz,
                                              source=source, taper=taper,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pp1), np.asarray(pp0), atol=1e-5)


class TestRTMSnapshotPallas:
    @pytest.mark.parametrize("nt", [10, 11])
    def test_matches_lax(self, rng, nt):
        ctx, v2, wav = _setup(nt, rng)
        sx, sz, gz = 20, 12, 9
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, nt)).astype(np.float32))
        im0 = rtm_shot_snapshot(ctx, v2, wav, dobs, sx, sz, gz)
        im1 = rtm_snapshot_pallas(ctx, v2, wav, dobs, sx, sz, gz,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(im1), np.asarray(im0),
                                   rtol=1e-5, atol=1e-5)

    def test_gaussian_src_rows_match_patch(self, rng):
        """_src_rows embeds the ptsrc Gaussian columns at sx."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            _src_rows)
        ctx, _, _ = _setup(4, rng)
        sx = 15
        rows = np.asarray(_src_rows(ctx, jnp.asarray(sx), gaussian=True))
        assert rows.shape == (7, ctx.nxe)
        patch = numerics.gaussian_source_patch()
        np.testing.assert_allclose(rows[:, sx - 3:sx + 4], patch.T, rtol=1e-5)
        # zero outside the window
        assert rows[:, :sx - 3].max() == 0 and rows[:, sx + 4:].max() == 0


class TestSplitKernels:
    @pytest.mark.parametrize("nt", [10, 11])
    def test_split_matches_whole(self, rng, nt):
        """fd_forward_pallas + fd_back_pallas == rtm_snapshot_pallas == lax."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            fd_forward_pallas, fd_back_pallas)
        from parallel_finite_difference_computation_tpu.solver import (
            fd_forward, fd_back)
        ctx, v2, wav = _setup(nt, rng)
        sx, sz, gz = 20, 12, 9
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, nt)).astype(np.float32))
        p0, pp0 = fd_forward(ctx, v2, wav, sx, sz)
        p1, pp1 = fd_forward_pallas(ctx, v2, wav, sx, sz, interpret=True)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pp1), np.asarray(pp0), atol=1e-5)
        im0 = fd_back(ctx, v2, p0, pp0, dobs, gz)
        im1 = fd_back_pallas(ctx, v2, p1, pp1, dobs, gz, interpret=True)
        np.testing.assert_allclose(np.asarray(im1), np.asarray(im0),
                                   rtol=1e-4, atol=1e-5)


class TestOtherOrders:
    @pytest.mark.parametrize("order", [2, 4])
    def test_rtm_kernel_order(self, rng, order):
        """The whole-shot kernels are order-generic (coefficients are baked
        as compile-time scalars)."""
        ctx = FDContext.create(24, 20, 10, dx=10.0, dz=10.0, dt=0.001,
                               order=order, nxb=8, nzb=8, fac=0.7)
        v2 = jnp.asarray(
            (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
             ).astype(np.float32) ** 2)
        wav = jnp.asarray(numerics.ricker_wavelet(10, 0.001, 25.0))
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, 10)).astype(np.float32))
        im0 = rtm_shot_snapshot(ctx, v2, wav, dobs, 18, 10, 9)
        im1 = rtm_snapshot_pallas(ctx, v2, wav, dobs, 18, 10, 9,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(im1), np.asarray(im0),
                                   rtol=1e-5, atol=1e-5)
