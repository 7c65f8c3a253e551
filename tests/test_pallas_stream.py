"""HBM-streaming fused FD step (`ops.pallas_stream.fd_step_padded`) and
its scan wrapper `solver.forward_modeling_tiled`: must match the lax-path
`forward_modeling` to float rounding on small grids (interpret mode on
CPU; the compiled path is measured at pluto scale in validate config 9)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, forward_modeling_tiled)
from parallel_finite_difference_computation_tpu.ops.pallas_stream import (
    fd_step_padded, padded_layout, to_padded, from_padded)


def _ctx(nx=30, nz=40, nt=12, order=8, nxb=6, nzb=5):
    return FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                            order=order, nxb=nxb, nzb=nzb, fac=0.7)


def test_single_step_matches_lax_update():
    ctx = _ctx()
    rng = np.random.default_rng(0)
    shape = (ctx.nxe, ctx.nze)
    p = rng.standard_normal(shape).astype(np.float32)
    pp = rng.standard_normal(shape).astype(np.float32)
    v2 = np.full(shape, 4e6, np.float32)
    mask = np.asarray(ctx.mask_all)
    tr = 16
    args = (ctx.coefs_x, ctx.coefs_z, ctx.order, ctx.nxe, ctx.nze, ctx.dt2)
    pn, ppn = fd_step_padded(
        to_padded(jnp.asarray(p), ctx.order, tr),
        to_padded(jnp.asarray(pp), ctx.order, tr),
        to_padded(jnp.asarray(v2), ctx.order, tr),
        to_padded(jnp.asarray(mask), ctx.order, tr),
        *args, tile_rows=tr, interpret=True)
    from parallel_finite_difference_computation_tpu.solver import _fd_update
    want_pp = np.asarray(_fd_update(ctx, jnp.asarray(p), jnp.asarray(pp),
                                    jnp.asarray(v2))) * mask
    want_p = p * mask
    got_pp = np.asarray(from_padded(ppn, ctx.nxe, ctx.nze, ctx.order, tr))
    got_p = np.asarray(from_padded(pn, ctx.nxe, ctx.nze, ctx.order, tr))
    tol = 4 * np.finfo(np.float32).eps * max(1.0, np.abs(want_pp).max())
    np.testing.assert_allclose(got_pp, want_pp, atol=tol, rtol=0)
    np.testing.assert_array_equal(got_p, want_p)
    # pads must stay zero so the scan can carry the layout directly
    R, W, r0, c0 = padded_layout(ctx.nxe, ctx.nze, ctx.order, tr)
    leak = np.array(ppn)
    leak[r0:r0 + ctx.nxe, c0:c0 + ctx.nze] = 0
    assert np.abs(leak).max() == 0.0


@pytest.mark.parametrize("lap_impl,rel_tol", [("mxu", 2e-5),
                                              ("mxu6", 2e-7)])
def test_single_step_mxu_matches_exact(lap_impl, rel_tol):
    """lap_impl='mxu' on the streaming fused step (z lane-taps as banded
    MXU matmuls): matches the exact kernel to the manual-bf16_3x
    tolerance ('mxu6' to ~f32 level) and keeps the pads exactly zero."""
    ctx = _ctx(nz=260)  # W = 384: exercises a middle band block
    rng = np.random.default_rng(4)
    shape = (ctx.nxe, ctx.nze)
    p = rng.standard_normal(shape).astype(np.float32)
    pp = rng.standard_normal(shape).astype(np.float32)
    v2 = np.full(shape, 4e6, np.float32)
    mask = np.asarray(ctx.mask_all)
    tr = 16
    args = (ctx.coefs_x, ctx.coefs_z, ctx.order, ctx.nxe, ctx.nze, ctx.dt2)
    pads = [to_padded(jnp.asarray(a), ctx.order, tr)
            for a in (p, pp, v2, mask)]
    pn0, ppn0 = fd_step_padded(*pads, *args, tile_rows=tr, interpret=True)
    pn1, ppn1 = fd_step_padded(*pads, *args, tile_rows=tr, interpret=True,
                               lap_impl=lap_impl)
    ppn0, ppn1 = np.asarray(ppn0), np.asarray(ppn1)
    tol = rel_tol * max(1.0, np.abs(ppn0).max())
    np.testing.assert_allclose(ppn1, ppn0, atol=tol, rtol=0)
    np.testing.assert_array_equal(np.asarray(pn1), np.asarray(pn0))
    R, W, r0, c0 = padded_layout(ctx.nxe, ctx.nze, ctx.order, tr)
    leak = ppn1.copy()
    leak[r0:r0 + ctx.nxe, c0:c0 + ctx.nze] = 0
    assert np.abs(leak).max() == 0.0


def test_gpu_step_mxu_matches_exact():
    """lap_impl='mxu' on the taper-first GPU-flavor streaming step, with
    the K5/K6 fused image path."""
    from parallel_finite_difference_computation_tpu.ops.pallas_stream import (
        fd_step_gpu_padded, fd_update_padded)
    ctx = _ctx()
    rng = np.random.default_rng(5)
    shape = (ctx.nxe, ctx.nze)
    tr = 16
    pads = {k: to_padded(jnp.asarray(v), ctx.order, tr) for k, v in {
        "y": rng.standard_normal(shape).astype(np.float32),
        "x": rng.standard_normal(shape).astype(np.float32),
        "v2": np.full(shape, 4e6, np.float32),
        "mask": np.asarray(ctx.mask_top),
        "im": np.zeros(shape, np.float32),
        "imsrc": rng.standard_normal(shape).astype(np.float32)}.items()}
    R, W, _, _ = padded_layout(ctx.nxe, ctx.nze, ctx.order, tr)
    sism = jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32))
    args = dict(order=ctx.order, nxe=ctx.nxe, nze=ctx.nze, dt2=ctx.dt2,
                nxb=ctx.nxb, nzb=ctx.nzb, nx=ctx.nx, nz=ctx.nz, gz=7,
                sism_col=sism, imloc_pad=pads["im"],
                imsrc_pad=pads["imsrc"], tile_rows=tr, interpret=True)
    outs0 = fd_step_gpu_padded(pads["y"], pads["x"], pads["v2"],
                               pads["mask"], ctx.coefs_x, ctx.coefs_z,
                               **args)
    outs1 = fd_step_gpu_padded(pads["y"], pads["x"], pads["v2"],
                               pads["mask"], ctx.coefs_x, ctx.coefs_z,
                               lap_impl="mxu", **args)
    for a, b in zip(outs0, outs1):
        a, b = np.asarray(a), np.asarray(b)
        tol = 2e-5 * max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=tol, rtol=0)
    u0 = fd_update_padded(pads["y"], pads["x"], pads["v2"], ctx.coefs_x,
                          ctx.coefs_z, ctx.order, ctx.nxe, ctx.nze,
                          ctx.dt2, tile_rows=tr, interpret=True)
    u1 = fd_update_padded(pads["y"], pads["x"], pads["v2"], ctx.coefs_x,
                          ctx.coefs_z, ctx.order, ctx.nxe, ctx.nze,
                          ctx.dt2, tile_rows=tr, interpret=True,
                          lap_impl="mxu")
    u0, u1 = np.asarray(u0), np.asarray(u1)
    tol = 2e-5 * max(1.0, np.abs(u0).max())
    np.testing.assert_allclose(u1, u0, atol=tol, rtol=0)


@pytest.mark.parametrize("source", ["gaussian", "point"])
def test_modeling_matches_lax_path(source):
    ctx = _ctx()
    rng = np.random.default_rng(1)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    sx, sz, gz = ctx.nxb + 10, ctx.nzb + 3, ctx.nzb + 1
    p1, pp1, rec1 = forward_modeling(ctx, jnp.asarray(v2), wav, sx, sz, gz,
                                     source=source, taper="all",
                                     record="trace")
    p2, pp2, rec2 = forward_modeling_tiled(ctx, jnp.asarray(v2), wav,
                                           sx, sz, gz, source=source,
                                           tile_rows=16, interpret=True)
    scale = max(1.0, float(np.abs(np.asarray(rec1)).max()))
    assert np.abs(np.asarray(rec2) - np.asarray(rec1)).max() < 1e-5 * scale
    fscale = max(1.0, float(np.abs(np.asarray(p1)).max()))
    assert np.abs(np.asarray(p2) - np.asarray(p1)).max() < 1e-5 * fscale
    assert np.abs(np.asarray(pp2) - np.asarray(pp1)).max() < 1e-5 * fscale


@pytest.mark.parametrize("block_k,tile_rows", [
    (2, 16),    # tail pass (nt=12 -> 6 passes, no tail) + small tiles
    (3, 16),    # nt=12 -> 4 passes; K*h=12 rounds to hk=16 == tile_rows
    (5, 24),    # tail pass (12 = 2*5 + 2): second kernel instance
])
def test_kstep_modeling_matches_lax_path(block_k, tile_rows):
    """Temporal blocking (fd_kstep_padded: K fused steps per HBM pass,
    in-kernel injection/taper/trace-recording) matches the lax path to
    float rounding — same bar as the per-step tier."""
    ctx = _ctx()
    rng = np.random.default_rng(6)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    sx, sz, gz = ctx.nxb + 10, ctx.nzb + 3, ctx.nzb + 1
    p1, pp1, rec1 = forward_modeling(ctx, jnp.asarray(v2), wav, sx, sz, gz,
                                     source="gaussian", taper="all",
                                     record="trace")
    p2, pp2, rec2 = forward_modeling_tiled(ctx, jnp.asarray(v2), wav,
                                           sx, sz, gz, source="gaussian",
                                           tile_rows=tile_rows,
                                           interpret=True,
                                           block_k=block_k)
    scale = max(1.0, float(np.abs(np.asarray(rec1)).max()))
    assert np.abs(np.asarray(rec2) - np.asarray(rec1)).max() < 1e-5 * scale
    fscale = max(1.0, float(np.abs(np.asarray(p1)).max()))
    assert np.abs(np.asarray(p2) - np.asarray(p1)).max() < 1e-5 * fscale
    assert np.abs(np.asarray(pp2) - np.asarray(pp1)).max() < 1e-5 * fscale


def test_kstep_rejects_oversize_halo():
    """block_k whose rounded halo exceeds tile_rows is refused up front
    (the shared halo-DMA contract check)."""
    ctx = _ctx()
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    with pytest.raises(ValueError, match="tile_rows must be"):
        forward_modeling_tiled(ctx, jnp.zeros((ctx.nxe, ctx.nze)), wav,
                               10, 8, 8, tile_rows=16, interpret=True,
                               block_k=8)


def test_rtm_snapshot_tiled_matches_lax_path():
    """Full two-snapshot RTM through the streaming kernels == the lax
    rtm_shot_snapshot (forward taper-first steps, untapered source
    reconstruction, K5 column injection, K6 imaging)."""
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_snapshot, rtm_shot_snapshot_tiled)
    ctx = _ctx(nx=26, nz=34, nt=10)
    rng = np.random.default_rng(3)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    dobs = rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32)
    sx, sz, gz = ctx.nxb + 9, ctx.nzb + 2, ctx.nzb + 1
    ref = np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2), wav,
                                       jnp.asarray(dobs), sx, sz, gz))
    got = np.asarray(rtm_shot_snapshot_tiled(ctx, jnp.asarray(v2), wav,
                                             jnp.asarray(dobs), sx, sz, gz,
                                             tile_rows=16, interpret=True))
    scale = max(1.0, np.abs(ref).max())
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * scale


@pytest.mark.parametrize("block_k,tile_rows", [
    (2, 16),    # nt=10: fwd 5 passes, bwd (nt-2)=8 -> 4 passes
    (3, 16),    # fwd 3 passes + tail 1; bwd 2 passes + tail 2
    (4, 24),    # K*h=16 halo on odd-size tiles
])
def test_kstep_rtm_snapshot_matches_lax_path(block_k, tile_rows):
    """Temporally-blocked two-snapshot RTM (fd_kstep_gpu_fwd/bwd_padded:
    K fused taper-first steps per HBM pass, in-kernel K5 injection and
    K6 image accumulation) matches the lax rtm_shot_snapshot to float
    rounding — same bar as the per-step tier."""
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_snapshot, rtm_shot_snapshot_tiled)
    ctx = _ctx(nx=26, nz=34, nt=10)
    rng = np.random.default_rng(9)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    dobs = rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32)
    sx, sz, gz = ctx.nxb + 9, ctx.nzb + 2, ctx.nzb + 1
    ref = np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2), wav,
                                       jnp.asarray(dobs), sx, sz, gz))
    got = np.asarray(rtm_shot_snapshot_tiled(ctx, jnp.asarray(v2), wav,
                                             jnp.asarray(dobs), sx, sz, gz,
                                             tile_rows=tile_rows,
                                             interpret=True,
                                             block_k=block_k))
    scale = max(1.0, np.abs(ref).max())
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * scale


def test_rtm_full_tiled_matches_lax_path():
    """Full-wavefield rtm_main flavor through the streaming kernels ==
    the lax rtm_shot_full (stored swf/rwf, flat-read + nzb-offset
    injection quirks, reverse-time correlation)."""
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_full, rtm_shot_full_tiled)
    ctx = _ctx(nx=26, nz=34, nt=10, nxb=6, nzb=5)  # nxb != nzb: quirk live
    rng = np.random.default_rng(4)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    dobs = rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32)
    sx, sz, gz = ctx.nxb + 9, ctx.nzb + 2, ctx.nzb + 1
    for quirk in (True, False):
        ref = np.asarray(rtm_shot_full(ctx, jnp.asarray(v2), wav,
                                       jnp.asarray(dobs), sx, sz, gz,
                                       x_off_quirk=quirk,
                                       next_shot_first=0.25))
        got = np.asarray(rtm_shot_full_tiled(ctx, jnp.asarray(v2), wav,
                                             jnp.asarray(dobs), sx, sz, gz,
                                             x_off_quirk=quirk,
                                             next_shot_first=0.25,
                                             tile_rows=16, interpret=True))
        scale = max(1.0, np.abs(ref).max())
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-5 * scale


@pytest.mark.parametrize("block_k,tile_rows", [
    (2, 16),    # nt=10 -> 5 passes each way
    (3, 16),    # tail passes (10 = 3*3 + 1) on both propagations
    (4, 24),    # K*h=16 halo on odd-size tiles
])
def test_kstep_rtm_full_matches_lax_path(block_k, tile_rows):
    """Temporally-blocked full-wavefield rtm_main flavor
    (fd_kstep_rec_padded: K fused steps + K tapered frames per HBM pass,
    patch injection forward / pre-masked K5 lane-pack backward) matches
    the lax rtm_shot_full to float rounding, both quirk settings."""
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_full, rtm_shot_full_tiled)
    ctx = _ctx(nx=26, nz=34, nt=10, nxb=6, nzb=5)  # nxb != nzb: quirk live
    rng = np.random.default_rng(11)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    dobs = rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32)
    sx, sz, gz = ctx.nxb + 9, ctx.nzb + 2, ctx.nzb + 1
    for quirk in (True, False):
        ref = np.asarray(rtm_shot_full(ctx, jnp.asarray(v2), wav,
                                       jnp.asarray(dobs), sx, sz, gz,
                                       x_off_quirk=quirk,
                                       next_shot_first=0.25))
        got = np.asarray(rtm_shot_full_tiled(ctx, jnp.asarray(v2), wav,
                                             jnp.asarray(dobs), sx, sz, gz,
                                             x_off_quirk=quirk,
                                             next_shot_first=0.25,
                                             tile_rows=tile_rows,
                                             interpret=True,
                                             block_k=block_k))
        scale = max(1.0, np.abs(ref).max())
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-5 * scale


def test_kstep_wavefield_recording_matches_lax():
    """forward_modeling_tiled(record='wavefield', block_k>1): the K
    tapered time-t frames written per pass equal the per-step recording
    and the lax wavefield."""
    ctx = _ctx()
    rng = np.random.default_rng(12)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    sx, sz, gz = ctx.nxb + 10, ctx.nzb + 3, ctx.nzb + 1
    _, _, ref = forward_modeling(ctx, jnp.asarray(v2), wav, sx, sz, gz,
                                 source="point", taper="top",
                                 record="wavefield")
    p2, pp2, got = forward_modeling_tiled(ctx, jnp.asarray(v2), wav,
                                          sx, sz, gz, source="point",
                                          taper="top", record="wavefield",
                                          tile_rows=16, interpret=True,
                                          block_k=3)
    ref, got = np.asarray(ref), np.asarray(got)
    scale = max(1.0, np.abs(ref).max())
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5 * scale


def test_gpu_kernels_keep_pads_zero():
    """Regression: tile 0's frame-shifted slot must not leak interior
    values into the slack rows through unmasked outputs (the values would
    recirculate and grow through the scan carry)."""
    from parallel_finite_difference_computation_tpu.ops.pallas_stream import (
        fd_update_padded, fd_step_gpu_padded)
    ctx = _ctx()
    rng = np.random.default_rng(5)
    shape = (ctx.nxe, ctx.nze)
    tr = 16
    R, W, r0, c0 = padded_layout(ctx.nxe, ctx.nze, ctx.order, tr)

    def pad(a):
        return to_padded(jnp.asarray(a), ctx.order, tr)

    p = rng.standard_normal(shape).astype(np.float32)
    pp = rng.standard_normal(shape).astype(np.float32)
    v2 = np.full(shape, 4e6, np.float32)
    mask = np.asarray(ctx.mask_top)
    args = (ctx.coefs_x, ctx.coefs_z, ctx.order, ctx.nxe, ctx.nze, ctx.dt2)

    def leak(out):
        a = np.array(out)
        a[r0:r0 + ctx.nxe, c0:c0 + ctx.nze] = 0
        return np.abs(a).max()

    upd = fd_update_padded(pad(p), pad(pp), pad(v2), *args, tile_rows=tr,
                           interpret=True)
    assert leak(upd) == 0.0

    sism = jnp.zeros((R, 128), jnp.float32)
    outs = fd_step_gpu_padded(pad(p), pad(pp), pad(v2), pad(mask), *args,
                              nxb=ctx.nxb, nzb=ctx.nzb, nx=ctx.nx,
                              nz=ctx.nz, gz=ctx.nzb + 1, sism_col=sism,
                              imloc_pad=pad(np.zeros(shape, np.float32)),
                              imsrc_pad=pad(p), tile_rows=tr,
                              interpret=True)
    for out in outs:
        assert leak(out) == 0.0


def test_streaming_step_compiled_on_tpu():
    """Compiled-Mosaic parity for the streaming kernel (the CPU lane only
    exercises interpret mode; this runs in the PFDC_TEST_PLATFORM=tpu lane
    on the real chip and skips elsewhere)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("compiled Mosaic path needs a TPU")
    ctx = _ctx(nx=40, nz=48, nt=8)
    rng = np.random.default_rng(7)
    v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
    sx, sz, gz = ctx.nxb + 10, ctx.nzb + 3, ctx.nzb + 1
    p1, pp1, rec1 = forward_modeling(ctx, jnp.asarray(v2), wav, sx, sz, gz,
                                     source="gaussian", taper="all",
                                     record="trace")
    p2, pp2, rec2 = forward_modeling_tiled(ctx, jnp.asarray(v2), wav,
                                           sx, sz, gz, source="gaussian",
                                           tile_rows=16, interpret=False)
    scale = max(1.0, float(np.abs(np.asarray(rec1)).max()))
    assert np.abs(np.asarray(rec2) - np.asarray(rec1)).max() < 1e-5 * scale
    fscale = max(1.0, float(np.abs(np.asarray(p1)).max()))
    assert np.abs(np.asarray(p2) - np.asarray(p1)).max() < 1e-5 * fscale


def test_rtm_cpu_auto_degrades_when_tiled_fails(monkeypatch):
    """run_rtm_cpu backend='auto' must fall back to the lax whole-grid
    fusion when the tiled Mosaic tier fails (same degrade policy as the
    other pipelines' _run_with_fallback), not crash the run."""
    import warnings
    import parallel_finite_difference_computation_tpu as pfdc
    from parallel_finite_difference_computation_tpu import pipeline, solver
    from parallel_finite_difference_computation_tpu.models import (
        layered_model)

    monkeypatch.setattr(pipeline, "_tiled_rtm_wins", lambda p: True)

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic compile failure")

    monkeypatch.setattr(solver, "rtm_shot_full_tiled", boom)
    p = pfdc.Params(nz=16, nx=16, nt=10, dz=10.0, dx=10.0, dt=0.001,
                    fpeak=25.0, ns=2, sz=0, fsx=2, ds=4, gz=0,
                    nxb=4, nzb=4, fac=0.7, order=8)
    vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[8])
    rng = np.random.default_rng(7)
    dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        img, imlocs = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs,
                                           backend="auto")
    assert any("falling back to the lax path" in str(x.message) for x in w)
    ref_img, _ = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs, backend="lax")
    np.testing.assert_allclose(img, ref_img, rtol=1e-5, atol=1e-6)


class TestRollLowering:
    """The width-derived roll lowering of the exact streaming lap
    (_ROLL_LANES_MIN): whole-frame rolls on wide frames, value-identical
    on every kept cell (wrap garbage is confined to cells the v2m
    premask / output masks zero or the K-step invalidation contract
    discards)."""

    def test_roll_lowering_matches_slice_form_per_step(self, monkeypatch):
        """fd_step_padded under the roll lowering (threshold forced to 0)
        is bit-identical to the slice lowering at a narrow width."""
        import parallel_finite_difference_computation_tpu.ops.pallas_stream \
            as strm
        ctx = _ctx()
        rng = np.random.default_rng(3)
        shape = (ctx.nxe, ctx.nze)
        p = rng.standard_normal(shape).astype(np.float32)
        pp = rng.standard_normal(shape).astype(np.float32)
        v2 = np.full(shape, 4e6, np.float32)
        mask = np.asarray(ctx.mask_all)
        tr = 16
        args = (ctx.coefs_x, ctx.coefs_z, ctx.order, ctx.nxe, ctx.nze,
                ctx.dt2)
        ins = tuple(to_padded(jnp.asarray(a), ctx.order, tr)
                    for a in (p, pp, v2, mask))
        outs = {}
        for thr in (10 ** 9, 0):  # slice form, then roll form
            monkeypatch.setattr(strm, "_ROLL_LANES_MIN", thr)
            pn, ppn = fd_step_padded(*ins, *args, tile_rows=tr,
                                     interpret=True)
            outs[thr] = (np.asarray(pn), np.asarray(ppn))
        np.testing.assert_array_equal(outs[0][0], outs[10 ** 9][0])
        np.testing.assert_array_equal(outs[0][1], outs[10 ** 9][1])

    @pytest.mark.parametrize("block_k,tile_rows", [(1, 16), (3, 32)])
    def test_roll_lowering_matches_slice_form_kstep(self, monkeypatch,
                                                    block_k, tile_rows):
        """forward_modeling_tiled (per-step and K-blocked kernels) under
        the roll lowering is bit-identical to the slice lowering —
        covering the K-step invalidation-front contract with wrap
        garbage at slab edges."""
        import parallel_finite_difference_computation_tpu.ops.pallas_stream \
            as strm
        ctx = _ctx()
        rng = np.random.default_rng(7)
        v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
        sx, sz, gz = ctx.nxb + 10, ctx.nzb + 3, ctx.nzb + 1
        outs = {}
        for thr in (10 ** 9, 0):
            monkeypatch.setattr(strm, "_ROLL_LANES_MIN", thr)
            outs[thr] = forward_modeling_tiled(
                FDContext.create(30, 40, 12, dx=10.0, dz=10.0, dt=0.001,
                                 order=8, nxb=6, nzb=5, fac=0.7),
                jnp.asarray(v2), wav, sx, sz, gz, source="gaussian",
                tile_rows=tile_rows, interpret=True, block_k=block_k)
        # same values modulo FMA formation: the two lowerings produce
        # the same operand reads and association order, but the compiler
        # may fuse mul+add into fma differently across the two graphs —
        # low-bit-only drift, far inside the tier's 1e-5 lax-parity bar
        for a, b in zip(outs[0], outs[10 ** 9]):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            assert np.abs(a - b).max() <= 1e-7 * scale

    def test_roll_lowering_matches_slice_form_rtm_kstep(self, monkeypatch):
        """rtm_shot_snapshot_tiled (the K-blocked GPU-suite fwd+bwd+
        imaging kernels) under the roll lowering is bit-identical to the
        slice lowering."""
        import parallel_finite_difference_computation_tpu.ops.pallas_stream \
            as strm
        from parallel_finite_difference_computation_tpu.solver import (
            rtm_shot_snapshot_tiled)
        rng = np.random.default_rng(9)
        outs = {}
        for thr in (10 ** 9, 0):
            ctx = _ctx()  # fresh identity-hashed ctx -> fresh jit trace
            rng = np.random.default_rng(9)  # same operands per iteration
            v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
                  ).astype(np.float32) ** 2
            wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 30.0))
            dobs = jnp.asarray(
                rng.standard_normal((ctx.nx, ctx.nt)).astype(np.float32))
            monkeypatch.setattr(strm, "_ROLL_LANES_MIN", thr)
            outs[thr] = np.asarray(rtm_shot_snapshot_tiled(
                ctx, jnp.asarray(v2), wav, dobs, ctx.nxb + 10,
                ctx.nzb + 3, ctx.nzb + 1, tile_rows=16, interpret=True,
                block_k=3))
        a, b = outs[0], outs[10 ** 9]
        scale = max(1.0, float(np.abs(a).max()))
        assert np.abs(a - b).max() <= 1e-7 * scale  # FMA formation only

    @pytest.mark.parametrize("lap_impl", ["mxu", "mxu6"])
    def test_roll_lowering_matches_slice_form_kstep_mxu(self, monkeypatch,
                                                        lap_impl):
        """The MXU K-step path's sublane taps under the roll lowering
        (_lap_x_slab wide-frame branch, threshold forced to 0) match the
        slice lowering — same FMA-formation-only bar as the exact
        path."""
        import parallel_finite_difference_computation_tpu.ops.pallas_stream \
            as strm
        rng = np.random.default_rng(11)
        v2 = None
        outs = {}
        for thr in (10 ** 9, 0):
            ctx = _ctx()
            if v2 is None:
                v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
                      ).astype(np.float32) ** 2
                wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001,
                                                          30.0))
            sx, sz, gz = ctx.nxb + 10, ctx.nzb + 3, ctx.nzb + 1
            monkeypatch.setattr(strm, "_ROLL_LANES_MIN", thr)
            outs[thr] = forward_modeling_tiled(
                ctx, jnp.asarray(v2), wav, sx, sz, gz, source="gaussian",
                tile_rows=32, interpret=True, block_k=3,
                lap_impl=lap_impl)
        for a, b in zip(outs[0], outs[10 ** 9]):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            assert np.abs(a - b).max() <= 1e-7 * scale
