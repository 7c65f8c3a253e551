"""Unit tests for the numerics layer against closed-form oracles.

The coefficient tables are the reference's own
(``cuda_reference_RTM/lib/src/functions.c:85-117``); wavelet/taper/extension
oracles are direct transcriptions of the C formulas evaluated in numpy.
"""

import numpy as np
import pytest

from parallel_finite_difference_computation_tpu import numerics


class TestCoefficients:
    def test_order2(self):
        np.testing.assert_array_equal(
            numerics.fd_coefficients(2), np.float32([1, -2, 1]))

    def test_order4(self):
        np.testing.assert_allclose(
            numerics.fd_coefficients(4),
            np.float32([-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12]), rtol=0)

    def test_order6(self):
        np.testing.assert_allclose(
            numerics.fd_coefficients(6),
            np.float32([1 / 90, -3 / 20, 3 / 2, -49 / 18, 3 / 2, -3 / 20, 1 / 90]),
            rtol=0)

    def test_order8(self):
        np.testing.assert_allclose(
            numerics.fd_coefficients(8),
            np.float32([-1 / 560, 8 / 315, -1 / 5, 8 / 5, -205 / 72,
                        8 / 5, -1 / 5, 8 / 315, -1 / 560]), rtol=0)

    def test_makeo2_properties(self):
        # windowed arbitrary-even-order construction (functions.c:125-157):
        # symmetric, central term = -2 * sum of one side, alternating signs
        for order in (10, 12, 16):
            c = numerics.fd_coefficients(order)
            assert c.shape == (order + 1,)
            h = order // 2
            np.testing.assert_allclose(c, c[::-1], rtol=1e-6)
            np.testing.assert_allclose(c[h], -2 * np.sum(c[h + 1:]), rtol=1e-5)
            signs = np.sign(c[h + 1:])
            np.testing.assert_array_equal(signs, [(-1) ** i for i in range(h)])

    def test_makeo2_order10_values(self):
        # spot values from the C formula: coef[h+ix] = (2*(-1)^(ix+1)/ix^2)
        #   * (alpha1 + alpha2*cos^2(pi*ix/(2*(h+2))))^3
        alpha1, alpha2 = 2 * .54 - 1, 2 * (1 - .54)
        h = 5
        expected = []
        for ix in range(1, h + 1):
            msign = 1 if ix % 2 == 1 else -1
            w = (alpha1 + alpha2 * np.cos(np.pi * ix / (2 * (h + 2))) ** 2) ** 3
            expected.append((2.0 * msign) / (ix * ix) * w)
        c = numerics.fd_coefficients(10)
        np.testing.assert_allclose(c[h + 1:], np.float32(expected), rtol=1e-6)

    def test_odd_order_rejected(self):
        with pytest.raises(ValueError):
            numerics.fd_coefficients(5)

    def test_exact_symmetry_all_orders(self):
        # the symmetric-pair tap formulation (ops.stencil.laplacian_interior
        # and every pallas tier) computes c[h+k]*(p[-k]+p[+k]) and therefore
        # requires c[h-k] == c[h+k] BITWISE, both raw and premultiplied by
        # the (uniform) 1/dx^2 scaling
        for order in (2, 4, 6, 8, 10, 12, 16):
            c = numerics.fd_coefficients(order)
            np.testing.assert_array_equal(c, c[::-1])
            cx, cz = numerics.scaled_coefficients(order, dx=25.0, dz=8.0)
            np.testing.assert_array_equal(cx, cx[::-1])
            np.testing.assert_array_equal(cz, cz[::-1])

    def test_scaled(self):
        cx, cz = numerics.scaled_coefficients(8, dx=25.0, dz=8.0)
        c = numerics.fd_coefficients(8)
        np.testing.assert_allclose(cx, c / 25.0 ** 2, rtol=1e-6)
        np.testing.assert_allclose(cz, c / 8.0 ** 2, rtol=1e-6)


class TestRicker:
    def test_peak_at_delay(self):
        # s(t) peaks (=1) at t = 1/fpeak (functions.c:293-299)
        fpeak, dt = 20.0, 0.001
        s = numerics.ricker_wavelet(200, dt, fpeak)
        assert abs(np.argmax(s) * dt - 1.0 / fpeak) <= dt
        np.testing.assert_allclose(s.max(), 1.0, atol=1e-3)

    def test_values_closed_form(self):
        fpeak, dt, nt = 30.0, 0.001, 101
        s = numerics.ricker_wavelet(nt, dt, fpeak)
        it = np.arange(nt)
        x = np.pi * fpeak * (it * np.float32(dt) - 1.0 / fpeak)
        expected = np.exp(-x * x) * (1 - 2 * x * x)
        np.testing.assert_allclose(s, expected, atol=1e-5)

    def test_truncated_variant(self):
        # CPU variant zeroes t > 2/fpeak (ptsrc.c:88-99)
        fpeak, dt, nt = 30.0, 0.001, 120
        s = numerics.ricker_wavelet(nt, dt, fpeak, truncated=True)
        cutoff = int(2.0 / fpeak / dt)
        assert np.all(s[cutoff + 1:] == 0)
        su = numerics.ricker_wavelet(nt, dt, fpeak)
        np.testing.assert_array_equal(s[:cutoff], su[:cutoff])


class TestTaper:
    def test_exact_profile_endpoint(self):
        # outermost sample damps to fac exactly: exp(-(sqrt(-ln F)/nb * nb)^2) = F
        for fac in (0.7, 0.75, 0.9):
            w = numerics.taper_profile(40, fac, exact=True)
            np.testing.assert_allclose(w[0], fac, rtol=1e-5)
            assert np.all(np.diff(w) > 0) and w[-1] < 1.0

    def test_fac_profile(self):
        # divergent CPU variant exp(-(F*(nb-i))^2) (taper.c:25-45)
        fac, nb = 0.01, 40
        w = numerics.taper_profile(nb, fac, exact=False)
        i = np.arange(nb)
        np.testing.assert_allclose(w, np.exp(-(fac * (nb - i)) ** 2), rtol=1e-6)

    def test_mask_top_matches_loop_oracle(self, rng):
        # direct transcription of kernel_tapper (fd-code.cu:94-117)
        nx, nz, nxb, nzb = 23, 17, 5, 4
        tx = rng.random(nxb).astype(np.float32)
        tz = rng.random(nzb).astype(np.float32)
        p = rng.standard_normal((nx, nz)).astype(np.float32)
        expect = p.copy()
        for i in range(nx):
            for j in range(nzb):
                expect[i, j] *= tz[j]
        for i in range(nxb):
            for j in range(nzb):
                expect[i, j] *= tx[i]
                expect[nx - 1 - i, j] *= tx[i]
        m = numerics.taper_mask_top(nx, nz, nxb, nzb, tx, tz)
        np.testing.assert_allclose(p * m, expect, rtol=1e-6)

    def test_mask_all_matches_loop_oracle(self, rng):
        # direct transcription of taper_apply (taper.c:47-67); note its nx/nz
        # args are the unextended dims
        nx, nz, nxb, nzb = 13, 11, 5, 4
        nxe, nze = nx + 2 * nxb, nz + 2 * nzb
        tx = rng.random(nxb).astype(np.float32)
        tz = rng.random(nzb).astype(np.float32)
        p = rng.standard_normal((nxe, nze)).astype(np.float32)
        expect = p.copy()
        for itx in range(nxe):
            for itz in range(nzb):
                expect[itx, itz] *= tz[itz]
            for i, itz in enumerate(range(nzb - 1, -1, -1)):
                expect[itx, nz + nzb + i] *= tz[itz]
        for itz in range(nze):
            for itx in range(nxb):
                expect[itx, itz] *= tx[itx]
            for i, itx in enumerate(range(nxb - 1, -1, -1)):
                expect[nx + nxb + i, itz] *= tx[itx]
        m = numerics.taper_mask_all(nxe, nze, nxb, nzb, tx, tz)
        np.testing.assert_allclose(p * m, expect, rtol=1e-6)


class TestExtendVel:
    def test_clamp_matches_loop_oracle(self, rng):
        # direct transcription of extendvel (taper.c:7-23)
        nx, nz, nxb, nzb = 9, 7, 3, 4
        nxe, nze = nx + 2 * nxb, nz + 2 * nzb
        v = np.zeros((nxe, nze), np.float32)
        v[nxb:nxb + nx, nzb:nzb + nz] = rng.random((nx, nz)).astype(np.float32)
        expect = v.copy()
        for ix in range(nx):
            for iz in range(nzb):
                expect[ix + nxb, iz] = expect[ix + nxb, nzb]
            for iz in range(nzb + nz, nz + 2 * nzb):
                expect[ix + nxb, iz] = expect[ix + nxb, nz + nzb - 1]
        for iz in range(nz + 2 * nzb):
            for ix in range(nxb):
                expect[ix, iz] = expect[nxb, iz]
            for ix in range(nxb + nx, nx + 2 * nxb):
                expect[ix, iz] = expect[nx + nxb - 1, iz]
        got = numerics.extendvel_clamp(v, nx, nz, nxb, nzb)
        np.testing.assert_array_equal(got, expect)

    def test_random_extension_ranges(self):
        nx, nz, nxb, nzb = 20, 15, 6, 6
        nxe, nze = nx + 2 * nxb, nz + 2 * nzb
        v = np.zeros((nxe, nze), np.float32)
        v[nxb:nxb + nx, nzb:nzb + nz] = 3000.0
        out = numerics.extendvel_random(v, nx, nz, nxb, nzb, seed=7)
        # interior untouched
        np.testing.assert_array_equal(out[nxb:nxb + nx, nzb:nzb + nz], 3000.0)
        # top border clamps to interior
        np.testing.assert_array_equal(out[nxb:nxb + nx, :nzb], 3000.0)
        # bottom border within [v_ave-delta, v+delta] envelope
        bot = out[nxb:nxb + nx, nzb + nz:]
        assert bot.min() >= 300.0 - 200.0 - 1 and bot.max() <= 3000.0 + 200.0
        # deterministic under the same seed
        out2 = numerics.extendvel_random(v, nx, nz, nxb, nzb, seed=7)
        np.testing.assert_array_equal(out, out2)
        out3 = numerics.extendvel_random(v, nx, nz, nxb, nzb, seed=8)
        assert not np.array_equal(out, out3)

    def test_random_extension_jax_matches_semantics(self):
        """On-device variant (extendvel_random_jax): same envelope/ramp
        semantics as the host version, vmappable over per-shot keys with no
        host step."""
        import jax
        import jax.numpy as jnp
        nx, nz, nxb, nzb = 20, 15, 6, 6
        nxe, nze = nx + 2 * nxb, nz + 2 * nzb
        v = np.zeros((nxe, nze), np.float32)
        v[nxb:nxb + nx, nzb:nzb + nz] = 3000.0
        keys = jax.random.split(jax.random.key(0), 4)
        outs = np.asarray(jax.jit(jax.vmap(
            lambda k: numerics.extendvel_random_jax(
                jnp.asarray(v), nx, nz, nxb, nzb, k)))(keys))
        for out in outs:
            np.testing.assert_array_equal(
                out[nxb:nxb + nx, nzb:nzb + nz], 3000.0)       # interior
            np.testing.assert_array_equal(out[nxb:nxb + nx, :nzb], 3000.0)
            bot = out[nxb:nxb + nx, nzb + nz:]
            assert bot.min() >= 300.0 - 200.0 - 1
            assert bot.max() <= 3000.0 + 200.0
            # ramp: mean decreases toward l_lim with depth into the border
            col_means = bot.mean(axis=0)
            assert col_means[0] > col_means[-1]
            # uniform in [v_ave - delta, v + delta] -> mean (v_ave + v)/2,
            # width 2*delta + (v - v_ave)
            v_ave = 3000.0 - (3000.0 - 300.0) * np.arange(nzb) / (nzb - 1)
            expect = (v_ave + 3000.0) / 2
            width = 2 * 200.0 + (3000.0 - v_ave)
            sigma = width / np.sqrt(12 * nx)
            assert np.all(np.abs(col_means - expect) < 6 * sigma)
            # side ramps stay in their envelopes too
            left = out[:nxb, nzb:nzb + nz]
            assert left.min() >= 300.0 - 200.0 - 1
            assert left.max() <= 3000.0 + 200.0
        # per-shot keys give distinct borders
        assert not np.array_equal(outs[0], outs[1])
        # statistical agreement with the host generator (border means)
        host = numerics.extendvel_random(v, nx, nz, nxb, nzb, seed=3)
        hb = host[nxb:nxb + nx, nzb + nz:].mean()
        jb = np.stack([o[nxb:nxb + nx, nzb + nz:] for o in outs]).mean()
        assert abs(hb - jb) < 120.0


class TestGaussianPatch:
    def test_matches_ptsrc_loop(self):
        # ptsrc adds ts*exp(-(ix-xs)^2-(iz-zs)^2) over a +-3 window
        g = numerics.gaussian_source_patch(3)
        assert g.shape == (7, 7)
        for dx in range(-3, 4):
            for dz in range(-3, 4):
                np.testing.assert_allclose(
                    g[dx + 3, dz + 3], np.exp(-dx * dx - dz * dz), rtol=1e-6)
