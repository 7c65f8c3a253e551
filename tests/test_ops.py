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


class TestAnisotropicDrift:
    """Regression for the round-3 merged-accumulator drift: with dx != dz
    the x coefficients are ~(dx/dz)^2 smaller than z, and interleaving both
    axes into one accumulator loses low bits of the x contribution every
    add; compounded over nt steps that drifted marmousi (dz=8, dx=25,
    nt=3004) to 1.75e-4 vs the C oracle — past the 1e-4 external gate.
    The canonical split-axis association (per-axis accumulators like the
    reference's acmz/acmx, fd-code.cu:60-73) stays at oracle-transcription
    level (scripts/exp_lap_assoc.py).

    This test propagates a point source on an anisotropic grid for 600
    steps in f32 and gates the final-field rel RMS vs a float64 naive-order
    transcription at 8e-6: the canonical order measures 3.6e-6, the merged
    order 1.6e-5 (4.4x apart), so a reassociation regression trips it."""

    def test_f32_drift_vs_f64_anisotropic(self):
        import jax
        order, h = 8, 4
        nx, nz, nt = 152, 128, 600
        dz, dx, dt, vel = 8.0, 25.0, 0.001, 2000.0
        cx, cz = numerics.scaled_coefficients(order, dx, dz)
        src = numerics.ricker_wavelet(nt, dt, 20.0)
        sx, sz = nx // 2, nz // 2

        cxj, czj = jnp.asarray(cx), jnp.asarray(cz)
        v2dt2 = np.float32(vel * vel * dt * dt)

        def step(carry, amp):
            p, pp = carry
            lap = jnp.pad(stencil.laplacian_interior(p, cxj, czj, order),
                          ((h, h), (h, h)))
            new = 2.0 * p - pp + v2dt2 * lap
            new = new.at[sx, sz].add(amp)
            return (new, p), None

        p0 = jnp.zeros((nx, nz), jnp.float32)
        (pf, _), _ = jax.lax.scan(step, (p0, p0), jnp.asarray(src))
        got = np.asarray(pf, np.float64)

        # float64 naive-order transcription (per-axis ascending taps,
        # separate accumulators — fd-code.cu:60-73)
        cx64 = np.asarray(cx, np.float64)
        cz64 = np.asarray(cz, np.float64)
        v2dt2_64 = float(vel) ** 2 * float(dt) ** 2
        p = np.zeros((nx, nz))
        pp = np.zeros((nx, nz))
        for it in range(nt):
            accz = np.zeros((nx - order, nz - order))
            accx = np.zeros_like(accz)
            for io in range(order + 1):
                a = io - h
                accz += cz64[io] * p[h:nx - h, h + a:nz - h + a]
                accx += cx64[io] * p[h + a:nx - h + a, h:nz - h]
            lap = np.zeros((nx, nz))
            lap[h:nx - h, h:nz - h] = accz + accx
            new = 2.0 * p - pp + v2dt2_64 * lap
            new[sx, sz] += float(src[it])
            pp, p = p, new

        rel = (np.sqrt(np.mean((got - p) ** 2))
               / np.sqrt(np.mean(p ** 2)))
        assert rel < 8e-6, f"anisotropic f32 drift {rel:.3e} >= 8e-6"
