"""Kernel-level tests: JAX ops vs numpy loop oracles (K1-K6)."""

import numpy as np
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops import stencil

import oracles


def _rand_field(rng, nx=37, nz=29):
    return rng.standard_normal((nx, nz)).astype(np.float32)


class TestLaplacian:
    def test_matches_oracle_order8(self, rng):
        p = _rand_field(rng)
        cx, cz = numerics.scaled_coefficients(8, dx=10.0, dz=10.0)
        got = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, 8))
        expect = oracles.lap_oracle(p, cx, cz, 8)
        np.testing.assert_allclose(got, expect, atol=1e-5)
        # borders exactly zero
        assert np.all(got[:4, :] == 0) and np.all(got[:, :4] == 0)
        assert np.all(got[-4:, :] == 0) and np.all(got[:, -4:] == 0)

    def test_matches_oracle_all_orders(self, rng):
        for order in (2, 4, 6, 8, 10):
            p = _rand_field(rng, 25, 31)
            cx, cz = numerics.scaled_coefficients(order, dx=8.0, dz=25.0)
            got = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, order))
            expect = oracles.lap_oracle(p, cx, cz, order)
            np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_laplacian_full_masked_equals_padded(self, rng):
        """The pad-free roll formulation (used inside the Pallas kernels)
        times the interior mask must reproduce the zero-bordered laplacian
        for every supported order — the v2-premask contract of
        pallas_fd._v2_operand / domain_pallas."""
        for order in (2, 4, 6, 8, 10):
            p = _rand_field(rng, 41, 33)
            cx, cz = numerics.scaled_coefficients(order, dx=8.0, dz=25.0)
            ref = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, order))
            mask = stencil.lap_interior_mask(*p.shape, order)
            got = np.asarray(stencil.laplacian_full(
                jnp.asarray(p), cx, cz, order)) * mask
            scale = np.abs(ref).max() or 1.0
            np.testing.assert_allclose(got / scale, ref / scale, atol=2e-7)

    def test_lap_in_kernel_variants(self, rng, monkeypatch):
        """Both PFDC_LAP_IMPL selections agree with the zero-bordered
        laplacian (roll needs the interior mask; padded is bordered)."""
        p = _rand_field(rng, 41, 33)
        cx, cz = numerics.scaled_coefficients(8, dx=8.0, dz=25.0)
        ref = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, 8))
        scale = np.abs(ref).max()
        mask = stencil.lap_interior_mask(*p.shape, 8)
        monkeypatch.setenv("PFDC_LAP_IMPL", "roll")
        got = np.asarray(stencil.lap_in_kernel(jnp.asarray(p), cx, cz, 8))
        np.testing.assert_allclose(got * mask / scale, ref / scale, atol=2e-7)
        monkeypatch.setenv("PFDC_LAP_IMPL", "padded")
        got = np.asarray(stencil.lap_in_kernel(jnp.asarray(p), cx, cz, 8))
        assert np.all(got[:4, :] == 0) and np.all(got[:, -4:] == 0)
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-7)

    def test_constant_field_zero_lap(self):
        # sum of 2nd-derivative coefficients is ~0 -> Laplacian of a constant
        p = np.full((32, 32), 5.0, np.float32)
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        got = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, 8))
        np.testing.assert_allclose(got, 0.0, atol=1e-4)


class TestLeapfrog:
    def test_matches_oracle(self, rng):
        p, pp, v2, lap = (_rand_field(rng) for _ in range(4))
        dt2 = np.float32(1e-6)
        got = np.asarray(stencil.leapfrog(p, pp, v2, lap, dt2))
        np.testing.assert_allclose(
            got, oracles.leapfrog_oracle(p, pp, v2, lap, dt2), rtol=1e-6)


class TestInjection:
    def test_point(self, rng):
        pp = _rand_field(rng)
        got = np.asarray(stencil.inject_point(jnp.asarray(pp), 11, 7, 0.5))
        expect = pp.copy()
        expect[11, 7] += 0.5
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_gaussian_matches_ptsrc(self, rng):
        pp = _rand_field(rng)
        patch = numerics.gaussian_source_patch()
        got = np.asarray(stencil.inject_gaussian(
            jnp.asarray(pp), 10, 12, np.float32(0.7), patch))
        expect = oracles.ptsrc_oracle(pp, 10, 12, np.float32(0.7))
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_receivers_matches_sism(self, rng):
        nxb, gz, nt, it = 5, 3, 12, 4
        ppr = _rand_field(rng)
        nrec = ppr.shape[0] - 2 * nxb
        dobs = rng.standard_normal((nrec, nt)).astype(np.float32)
        # caller passes the time-reversed slice dobs[:, nt-1-it]
        got = np.asarray(stencil.inject_receivers(
            jnp.asarray(ppr), jnp.asarray(dobs[:, nt - 1 - it]), nxb, gz))
        expect = oracles.sism_oracle(ppr, dobs, nxb, nt, it, gz)
        np.testing.assert_allclose(got, expect, rtol=1e-6)


class TestImaging:
    def test_matches_oracle(self, rng):
        nxb, nzb = 6, 4
        p = _rand_field(rng)
        ppr = _rand_field(rng)
        imloc = rng.standard_normal(
            (p.shape[0] - 2 * nxb, p.shape[1] - 2 * nzb)).astype(np.float32)
        got = np.asarray(stencil.imaging_correlation(
            jnp.asarray(imloc), jnp.asarray(p), jnp.asarray(ppr), nxb, nzb))
        expect = oracles.img_oracle(imloc, p, ppr, nxb, nzb)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


class TestFusedStep:
    def test_update_matches_cpu_fd_step(self, rng):
        """laplacian+leapfrog with premultiplied coefs equals the CPU fd_step
        (which multiplies per-tap) to fp tolerance."""
        from parallel_finite_difference_computation_tpu.solver import (
            FDContext, _fd_update)
        order, dx, dz, dt = 8, 10.0, 10.0, 0.001
        nx, nz = 30, 26
        ctx = FDContext.create(nx - 16, nz - 16, nt=1, dx=dx, dz=dz, dt=dt,
                               order=order, nxb=8, nzb=8)
        p, pp = _rand_field(rng, nx, nz), _rand_field(rng, nx, nz)
        v2 = (1500.0 + 100 * rng.random((nx, nz))).astype(np.float32) ** 2
        got = np.asarray(_fd_update(ctx, jnp.asarray(p), jnp.asarray(pp),
                                    jnp.asarray(v2)))
        c = numerics.fd_coefficients(order)
        dx2inv = np.float32(1 / dx) ** 2
        dz2inv = np.float32(1 / dz) ** 2
        expect = oracles.fd_step_oracle(p, pp, v2, c, dx2inv, dz2inv,
                                        np.float32(dt) ** 2, order)
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)
