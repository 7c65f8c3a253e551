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

    @pytest.mark.parametrize("lap_impl,rel_tol", [
        ("mxu", 1e-4), ("mxu6", 1e-6)])
    @pytest.mark.parametrize("nx,nxb", [
        (28, 8),     # nxe=44  -> lane pad 128, single band block
        (160, 8),    # nxe=176 -> lane pad 256, first/last blocks
        (280, 8),    # nxe=296 -> lane pad 384, with a middle block
    ])
    def test_mxu_lap_matches_lax(self, rng, nx, nxb, lap_impl, rel_tol):
        """lap_impl='mxu' (x lane-taps as banded MXU matmuls, manual 3-pass
        bf16) matches the lax path to the documented per-step ~5e-6
        rounding accumulated over a short shot; lap_impl='mxu6' (6-pass
        triple split) to ~f32 level."""
        nt = 10
        ctx, v2, wav = _setup(nt, rng, nx=nx, nxb=nxb)
        sx, sz, gz = nxb + nx // 2, 12, 9
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, nt)).astype(np.float32))
        im0 = np.asarray(rtm_shot_snapshot(ctx, v2, wav, dobs, sx, sz, gz))
        im1 = np.asarray(rtm_snapshot_pallas(ctx, v2, wav, dobs, sx, sz, gz,
                                             interpret=True,
                                             lap_impl=lap_impl))
        tol = rel_tol * max(1.0, np.abs(im0).max())
        np.testing.assert_allclose(im1, im0, atol=tol, rtol=0)

    @pytest.mark.parametrize("lap_impl,rel_tol", [
        ("mxu", 1e-4), ("mxu6", 1e-6)])
    def test_mxu_lap_forward_modeling_matches_lax(self, rng, lap_impl,
                                                  rel_tol):
        nt, nx, nxb = 11, 160, 8
        ctx, v2, wav = _setup(nt, rng, nx=nx, nxb=nxb)
        sx, sz, gz = nxb + nx // 2, 12, 9
        p0, pp0, s0 = forward_modeling(ctx, v2, wav, sx, sz, gz,
                                       source="gaussian", taper="all",
                                       record="trace")
        p1, pp1, s1 = forward_modeling_pallas(ctx, v2, wav, sx, sz, gz,
                                              source="gaussian", taper="all",
                                              interpret=True,
                                              lap_impl=lap_impl)
        tol = rel_tol * max(1.0, np.abs(np.asarray(p0)).max())
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   atol=tol, rtol=0)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=tol, rtol=0)
        np.testing.assert_allclose(np.asarray(pp1), np.asarray(pp0),
                                   atol=tol, rtol=0)

    @pytest.mark.parametrize("nt", [10, 11])
    def test_strip_taper_bitwise_equals_fused(self, rng, nt):
        """taper_impl="strip" (taper multiplies restricted to the top
        nzb sublane rows, where the K3 mask differs from 1) is bitwise
        identical to the fused full-grid form — the skipped cells were
        multiplied by exactly 1.0. Kept as a measured NEGATIVE perf result
        (strip is ~4.5% slower on v5e: the partial-tile RMWs cost more
        than the full-grid multiplies they remove; scripts/
        exp_strip_taper.py), but the knob must stay correct. taper_impl
        is an explicit kwarg — trace-time env reads are invisible to the
        jit cache key."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            fd_forward_pallas, fd_back_pallas)
        ctx, v2, wav = _setup(nt, rng)
        sx, sz, gz = 20, 12, 9
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, nt)).astype(np.float32))
        outs = {}
        for mode in ("fused", "strip"):
            im = rtm_snapshot_pallas(ctx, v2, wav, dobs, sx, sz, gz,
                                     interpret=True, taper_impl=mode)
            p, pp = fd_forward_pallas(ctx, v2, wav, sx, sz, interpret=True,
                                      taper_impl=mode)
            im2 = fd_back_pallas(ctx, v2, p, pp, dobs, gz, interpret=True,
                                 taper_impl=mode)
            outs[mode] = tuple(np.asarray(a) for a in (im, p, pp, im2))
        for a, b in zip(outs["fused"], outs["strip"]):
            np.testing.assert_array_equal(a, b)

    def test_mxu_ztaps_slice_bitwise_equals_roll(self, rng):
        """z_taps="slice" (z sublane taps via interior slices + sublane
        pad inside the MXU lane-tap kernel) is bitwise identical to the
        shipping roll lowering — same operand values and association
        order on the interior, and the differing border rows (zero vs
        wrapped garbage) are both killed by the premasked v2 operand.
        Kept as a measured NEGATIVE perf result (slice is ~3% slower at
        3lay size: sublane rolls are cheap, unlike the lane rolls that
        made the padded lowering 1.28x on the all-VPU kernel;
        scripts/exp_mxu_zslice.py), but the escape hatch must stay
        correct. z_taps is an explicit kwarg, not an env var — a
        trace-time env read is invisible to the jit cache key."""
        nt, nx, nxb = 10, 160, 8
        ctx, v2, wav = _setup(nt, rng, nx=nx, nxb=nxb)
        sx, sz, gz = nxb + nx // 2, 12, 9
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, nt)).astype(np.float32))
        outs = {}
        for mode in ("roll", "slice"):
            im = rtm_snapshot_pallas(ctx, v2, wav, dobs, sx, sz, gz,
                                     interpret=True, lap_impl="mxu",
                                     z_taps=mode)
            outs[mode] = np.asarray(im)
        np.testing.assert_array_equal(outs["roll"], outs["slice"])

    def test_taper_rows_rejects_non_strip_mask(self, rng):
        """_taper_rows falls back to the fused path (returns 0) when the
        mask touches rows >= nzb (the all-edges taper_apply mask)."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            _taper_rows)
        ctx, _, _ = _setup(4, rng)
        top = np.transpose(np.asarray(ctx.mask_top))
        assert _taper_rows(ctx, top, "strip") == ctx.nzb
        allm = np.transpose(np.asarray(ctx.mask_all))
        assert _taper_rows(ctx, allm, "strip") == 0
        assert _taper_rows(ctx, top, "fused") == 0

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


class TestMosaicMemoryModel:
    """Derived (not magic) Mosaic memory limits: SMEM wavelet placement and
    the proactive VMEM working-set check (pallas_fd._wav_space/_vmem_plan)."""

    def test_wav_space_boundary(self):
        from jax.experimental.pallas import tpu as pltpu
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            _wav_space, _SMEM_BUDGET, _SMEM_BYTES_PER_SCALAR)
        cutoff = (_SMEM_BUDGET - (_SMEM_BUDGET >> 3)) // _SMEM_BYTES_PER_SCALAR
        assert _wav_space(cutoff) is pltpu.SMEM
        assert _wav_space(cutoff + 1) is pltpu.VMEM
        # the model must keep the validated configs where they ran on TPU:
        # 3lay/new_mod (nt<=1700) in SMEM, marmousi (nt=3004) in VMEM
        assert _wav_space(1700) is pltpu.SMEM
        assert _wav_space(3004) is pltpu.VMEM

    @pytest.mark.parametrize("nt", [1790, 1794])
    def test_kernel_runs_across_smem_boundary(self, rng, nt):
        """Both sides of the SMEM/VMEM wavelet cutoff execute and agree with
        the lax path (interpret mode; nt around the 1792 cutoff)."""
        ctx, v2, wav = _setup(nt, rng, nx=12, nz=10, nxb=4, nzb=4)
        dobs = jnp.asarray(rng.standard_normal((ctx.nx, nt)), jnp.float32)
        got = rtm_snapshot_pallas(ctx, v2, wav, dobs, 10, 5, 5,
                                  interpret=True)
        ref = rtm_shot_snapshot(ctx, v2, wav, dobs, 10, 5, 5)
        # lax and pallas-interpret are differently-structured XLA:CPU
        # programs of the same formula; their f32 rounding drifts apart
        # over ~1790 leapfrog steps (measured 4.1e-4 max rel on this
        # config with the symmetric-pair taps; both are ~1 ulp/apply vs
        # float64). Compiled-TPU parity is gated much tighter in
        # validate.py configs 2-6.
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)

    def test_vmem_overflow_raises_before_compile(self, rng):
        """A config whose working set exceeds core VMEM fails fast with a
        clear error instead of a doomed multi-minute Mosaic compile."""
        ctx = FDContext.create(1500, 1500, 8, dx=10.0, dz=10.0, dt=0.001,
                               order=8, nxb=16, nzb=16, fac=0.7)
        v2 = jnp.ones((ctx.nxe, ctx.nze), jnp.float32)
        wav = jnp.zeros((8,), jnp.float32)
        dobs = jnp.zeros((ctx.nx, 8), jnp.float32)
        with pytest.raises(ValueError, match="VMEM working set"):
            rtm_snapshot_pallas(ctx, v2, wav, dobs, 100, 5, 5)

    def test_pipeline_falls_back_on_vmem_overflow(self, monkeypatch, rng):
        """backend='auto' degrades whole-shot -> split -> lax when the
        working set cannot fit; forced here by shrinking the modeled core
        VMEM below any kernel's needs."""
        import warnings
        import parallel_finite_difference_computation_tpu as pfdc
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.ops import pallas_fd
        from parallel_finite_difference_computation_tpu.models import (
            layered_model)
        monkeypatch.setattr(pallas_fd, "_VMEM_PER_CORE", 1 << 10)
        monkeypatch.setattr(pipeline, "_use_pallas", lambda backend: True)
        p = pfdc.Params(nz=16, nx=16, nt=10, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=2, sz=0, fsx=2, ds=4, gz=0,
                        nxb=4, nzb=4, fac=0.7, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[8])
        dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            img, imlocs = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs,
                                               backend="auto")
        assert any("falling back to the lax path" in str(x.message)
                   for x in w)
        ref_img, _ = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs,
                                          backend="lax")
        np.testing.assert_allclose(img, ref_img, rtol=1e-5, atol=1e-6)
