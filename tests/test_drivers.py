"""Driver-level oracle tests: the scan drivers vs direct numpy
transcriptions of the reference's time loops (``fd_forward``
``cuda_reference_RTM/src/fd-code.cu:247-288``, ``fd_back`` ``:290-341``,
``mod_main.cpp:146-168``, ``rtm_main.cpp:196-220``)."""

import numpy as np
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, backward_recorded, fd_forward, fd_back)

import oracles


def _mk(rng, nx=14, nz=12, nxb=4, nzb=4, nt=6):
    ctx = FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                           order=8, nxb=nxb, nzb=nzb, fac=0.7)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))).astype(np.float32) ** 2
    wav = numerics.ricker_wavelet(nt, 0.001, 25.0)
    return ctx, v2, wav


def _lap_np(ctx, p):
    return oracles.lap_oracle(p, ctx.coefs_x, ctx.coefs_z, ctx.order)


class TestFdForwardOracle:
    def test_matches_cuda_loop(self, rng):
        """fd_forward: per step swap -> taper both -> lap -> leapfrog ->
        point src (fd-code.cu:259-267)."""
        ctx, v2, wav = _mk(rng)
        sx, sz = 9, 6
        dt2 = np.float32(ctx.dt2)
        mask = ctx.mask_top
        p = np.zeros((ctx.nxe, ctx.nze), np.float32)
        pp = np.zeros_like(p)
        for it in range(ctx.nt):
            p, pp = pp, p
            p = p * mask
            pp = pp * mask
            lap = _lap_np(ctx, p)
            pp = (2.0 * p - pp + v2 * dt2 * lap).astype(np.float32)
            pp[sx, sz] += wav[it]
        gp, gpp = fd_forward(ctx, jnp.asarray(v2), jnp.asarray(wav), sx, sz)
        np.testing.assert_allclose(np.asarray(gp), p, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gpp), pp, atol=1e-5)


class TestFdBackOracle:
    def test_matches_cuda_loop(self, rng):
        """fd_back: snapshot reinjection at it<2, untapered source
        reconstruction, tapered receiver field with time-reversed injection,
        per-step imaging (fd-code.cu:302-333)."""
        ctx, v2, wav = _mk(rng)
        sx, sz, gz = 9, 6, 5
        snap0 = rng.standard_normal((ctx.nxe, ctx.nze)).astype(np.float32)
        snap1 = rng.standard_normal((ctx.nxe, ctx.nze)).astype(np.float32)
        dobs = rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32)
        dt2 = np.float32(ctx.dt2)
        mask = ctx.mask_top

        p = np.zeros((ctx.nxe, ctx.nze), np.float32)
        pp = np.zeros_like(p)
        pr = np.zeros_like(p)
        ppr = np.zeros_like(p)
        imloc = np.zeros((ctx.nx, ctx.nz), np.float32)
        for it in range(ctx.nt):
            if it == 0:
                pp = snap1.copy()
            elif it == 1:
                pp = snap0.copy()
            else:
                lap = _lap_np(ctx, p)
                pp = (2.0 * p - pp + v2 * dt2 * lap).astype(np.float32)
            p, pp = pp, p
            pr = pr * mask
            ppr = ppr * mask
            lap = _lap_np(ctx, pr)
            ppr = (2.0 * pr - ppr + v2 * dt2 * lap).astype(np.float32)
            for i in range(ctx.nx):
                ppr[i + ctx.nxb, gz] += dobs[i, ctx.nt - 1 - it]
            imloc += (p[ctx.nxb:-ctx.nxb, ctx.nzb:-ctx.nzb]
                      * ppr[ctx.nxb:-ctx.nxb, ctx.nzb:-ctx.nzb])
            pr, ppr = ppr, pr

        got = fd_back(ctx, jnp.asarray(v2), jnp.asarray(snap0),
                      jnp.asarray(snap1), jnp.asarray(dobs), gz)
        np.testing.assert_allclose(np.asarray(got), imloc,
                                   rtol=1e-4, atol=1e-5)


class TestModMainOracle:
    def test_forward_modeling_matches_cpu_loop(self, rng):
        """mod_main: fd_step -> ptsrc -> taper(PP) -> taper(P) -> record P
        -> swap (mod_main.cpp:146-168)."""
        ctx, v2, wav = _mk(rng)
        wav = numerics.ricker_wavelet(ctx.nt, 0.001, 25.0, truncated=True)
        sx, sz, gz = 9, 6, 5
        dt2 = np.float32(ctx.dt2)
        mask = ctx.mask_all
        p = np.zeros((ctx.nxe, ctx.nze), np.float32)
        pp = np.zeros_like(p)
        data = np.zeros((ctx.nt, ctx.nx), np.float32)
        for it in range(ctx.nt):
            lap = _lap_np(ctx, p)
            pp = (2.0 * p - pp + v2 * dt2 * lap).astype(np.float32)
            pp = oracles.ptsrc_oracle(pp, sx, sz, wav[it])
            pp = pp * mask
            p = p * mask
            data[it] = p[ctx.nxb:ctx.nxb + ctx.nx, gz]
            p, pp = pp, p
        _, _, seis = forward_modeling(ctx, jnp.asarray(v2), jnp.asarray(wav),
                                      sx, sz, gz, source="gaussian",
                                      taper="all", record="trace")
        np.testing.assert_allclose(np.asarray(seis), data, atol=1e-5)


class TestRtmBackwardOracle:
    def test_backward_recorded_matches_cpu_loop(self, rng):
        """rtm_main backward: injection of dobs[ix][nt-it] (OOB at it=0
        reads the next trace's first sample) at x offset nzb (the
        reference's nzb/nxb quirk), taper_apply2, record interior
        (rtm_main.cpp:196-220)."""
        ctx, v2, _ = _mk(rng)
        gz = 5
        dobs = rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32)
        dt2 = np.float32(ctx.dt2)
        mask = ctx.mask_top
        p = np.zeros((ctx.nxe, ctx.nze), np.float32)
        pp = np.zeros_like(p)
        rwf = np.zeros((ctx.nt, ctx.nx, ctx.nz), np.float32)
        # dobs[ix][nt-it]: flat read one past each trace = next trace's [0]
        flat = np.concatenate([dobs.ravel(), [0.0]]).astype(np.float32)
        for it in range(ctx.nt):
            lap = _lap_np(ctx, p)
            pp = (2.0 * p - pp + v2 * dt2 * lap).astype(np.float32)
            for ix in range(ctx.nx):
                pp[ix + ctx.nzb, gz] += flat[ix * ctx.nt + (ctx.nt - it)]
            pp = pp * mask
            p = p * mask
            rwf[it] = p[ctx.nxb:-ctx.nxb, ctx.nzb:-ctx.nzb]
            p, pp = pp, p
        _, _, got = backward_recorded(ctx, jnp.asarray(v2),
                                      jnp.asarray(dobs), gz)
        np.testing.assert_allclose(np.asarray(got), rwf, atol=1e-5)
