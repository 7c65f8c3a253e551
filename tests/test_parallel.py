"""Multi-chip sharding tests on an 8-virtual-device CPU mesh: the sharded
domain-decomposed propagation must match the unsharded single-device path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops import stencil
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, rtm_shot_snapshot)
from parallel_finite_difference_computation_tpu.parallel import (
    make_mesh, halo_exchange, sharded_laplacian,
    make_sharded_forward_modeling, make_sharded_rtm_snapshot,
    embed_source_fields, embed_dobs)
from jax.sharding import PartitionSpec as P


def _ctx(nx=24, nz=20, nt=40, nxb=4, nzb=4):
    return FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                            order=8, nxb=nxb, nzb=nzb, fac=0.7)


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_shot=2, n_x=4)


class TestShardedLaplacian:
    def test_matches_unsharded(self, rng, mesh4):
        nxe, nze, order = 32, 28, 8
        p = rng.standard_normal((nxe, nze)).astype(np.float32)
        cx, cz = numerics.scaled_coefficients(order, 10.0, 10.0)
        expect = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, order))

        n_x = mesh4.shape["x"]
        f = jax.shard_map(
            lambda pl: sharded_laplacian(pl, jnp.asarray(cx), jnp.asarray(cz),
                                         order, nxe, "x", n_x),
            mesh=mesh4, in_specs=P("x", None), out_specs=P("x", None),
            check_vma=False)
        got = np.asarray(jax.jit(f)(p))
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_halo_exchange_zeros_at_edges(self, mesh4):
        nxe, h = 32, 3
        p = np.arange(nxe * 4, dtype=np.float32).reshape(nxe, 4)
        n_x = mesh4.shape["x"]
        f = jax.shard_map(
            lambda pl: halo_exchange(pl, h, "x", n_x),
            mesh=mesh4, in_specs=P("x", None), out_specs=P("x", None),
            check_vma=False)
        out = np.asarray(jax.jit(f)(p))  # (nxe + 2h*n_x, 4) stacked shards
        nxl = nxe // n_x
        blocks = out.reshape(n_x, nxl + 2 * h, 4)
        # first shard's left halo and last shard's right halo are zeros
        assert np.all(blocks[0, :h] == 0)
        assert np.all(blocks[-1, -h:] == 0)
        # interior halos carry the neighbour rows
        np.testing.assert_array_equal(blocks[1, :h], p[nxl - h:nxl])
        np.testing.assert_array_equal(blocks[0, -h:], p[nxl:nxl + h])


class TestShardedDrivers:
    def test_forward_modeling_matches(self, rng, mesh4):
        ctx = _ctx()
        ns, gz, sz = 2, 5, 6
        sxs = [10, 14]
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = numerics.ricker_wavelet(ctx.nt, 0.001, 25.0)

        # unsharded references (per shot)
        ref = []
        for i in range(ns):
            _, _, seis = forward_modeling(
                ctx, jnp.asarray(v2[i]), jnp.asarray(wav), sxs[i], sz, gz,
                source="point", taper="all", record="trace")
            ref.append(np.asarray(seis))
        ref = np.stack(ref)  # (ns, nt, nx)

        fn = make_sharded_forward_modeling(ctx, mesh4, gz, source="point",
                                           taper="all")
        srcf = embed_source_fields(ctx, sxs, sz, gaussian=False)
        seis_ext = np.asarray(fn(v2, srcf, jnp.asarray(wav)))
        got = seis_ext[:, :, ctx.nxb:ctx.nxb + ctx.nx]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_rtm_snapshot_matches(self, rng, mesh4):
        ctx = _ctx()
        ns, gz, sz = 2, 5, 6
        sxs = [10, 14]
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = numerics.ricker_wavelet(ctx.nt, 0.001, 25.0)
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)

        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]),
                                         jnp.asarray(wav), jnp.asarray(dobs[i]),
                                         sxs[i], sz, gz))
            for i in range(ns)])

        fn = make_sharded_rtm_snapshot(ctx, mesh4, gz)
        srcf = embed_source_fields(ctx, sxs, sz, gaussian=False)
        im_ext = np.asarray(fn(v2, srcf, jnp.asarray(wav),
                               embed_dobs(ctx, dobs)))
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb, ctx.nzb:ctx.nze - ctx.nzb]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestShotDistributedPipelines:
    def test_rtm_cpu_pipeline_with_mesh(self, mesh4, tmp_path):
        """run_rtm_cpu with a mesh (shots sharded over devices, padded to
        the device count) must match the single-device run."""
        import parallel_finite_difference_computation_tpu as pfdc
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.models import layered_model
        p = pfdc.Params(nz=24, nx=24, nt=40, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=3, sz=0, fsx=2, ds=8, gz=0,
                        nxb=8, nzb=8, fac=0.01, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        data = pipeline.run_modeling(p, vp=vp, backend="lax")
        img0, im0 = pipeline.run_rtm_cpu(p, vp=vp, dobs=data)
        img1, im1 = pipeline.run_rtm_cpu(p, vp=vp, dobs=data, mesh=mesh4)
        # mesh4 has x=4: the full-wavefield RTM now actually decomposes the
        # grid (and its 2*nt stored wavefields) over x
        scale = np.abs(im0).max() or 1.0
        np.testing.assert_allclose(im1 / scale, im0 / scale, atol=1e-5)
        np.testing.assert_allclose(img1 / scale, img0 / scale, atol=1e-5)

    def test_rtm_gpu_pipeline_with_mesh(self, mesh4):
        import parallel_finite_difference_computation_tpu as pfdc
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.models import layered_model
        p = pfdc.Params(nz=24, nx=24, nt=40, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=3, sz=0, fsx=2, ds=8, gz=0,
                        nxb=8, nzb=8, fac=0.7, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        rng = np.random.default_rng(3)
        dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
        img0, im0 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=5,
                                         backend="lax")
        img1, im1 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=5,
                                         backend="lax", mesh=mesh4)
        # the x>1 mesh routes through domain decomposition, which reorders
        # float accumulation slightly (measured 7.9e-5 max rel with the
        # symmetric-pair taps over nt=40)
        np.testing.assert_allclose(im1, im0, rtol=2e-4, atol=1e-4)


class TestShotShardedPallas:
    def test_matches_unsharded_pallas(self, rng, mesh4):
        """shard_map(shot) around the whole-shot Pallas kernel (interpret
        mode on CPU) equals the unsharded lax path."""
        from parallel_finite_difference_computation_tpu.parallel import (
            make_sharded_rtm_pallas)
        ctx = _ctx(nt=12)
        ns, sz, gz = 4, 6, 5
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        sxs = np.asarray([10, 12, 14, 16], np.int32)
        fn = make_sharded_rtm_pallas(ctx, mesh4, sz, gz, interpret=True)
        got = np.asarray(fn(v2, dobs, sxs, wav))
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(ns)])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_rtm_tiled_matches_unsharded(self, rng, mesh4):
        """shard_map(shot) around the temporally-blocked streaming RTM
        (K=4 fused steps per HBM pass, interpret mode on CPU) equals the
        unsharded lax path — the multi-chip tier for beyond-VMEM grids."""
        from parallel_finite_difference_computation_tpu.parallel import (
            make_sharded_rtm_tiled)
        ctx = _ctx(nt=12)
        ns, sz, gz = 4, 6, 5
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        sxs = np.asarray([10, 12, 14, 16], np.int32)
        fn = make_sharded_rtm_tiled(ctx, mesh4, sz, gz, tile_rows=16,
                                    block_k=4, interpret=True)
        got = np.asarray(fn(v2, dobs, sxs, wav))
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(ns)])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_modeling_tiers_match_unsharded(self, rng, mesh4):
        """Shot-sharded whole-shot and temporally-blocked streaming
        forward modeling (shared clamp-extended model, interpret mode)
        equal the unsharded lax path."""
        from parallel_finite_difference_computation_tpu.parallel import (
            make_sharded_modeling_pallas, make_sharded_modeling_tiled)
        from parallel_finite_difference_computation_tpu.solver import (
            forward_modeling)
        ctx = _ctx(nt=12)
        sz, gz = 6, 5
        v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        sxs = np.asarray([10, 12, 14, 16], np.int32)
        ref = np.stack([
            np.asarray(forward_modeling(ctx, jnp.asarray(v2), wav,
                                        int(sx), sz, gz,
                                        source="gaussian", taper="all",
                                        record="trace")[2])
            for sx in sxs])
        fn_ws = make_sharded_modeling_pallas(ctx, mesh4, sz, gz,
                                             interpret=True)
        got_ws = np.asarray(fn_ws(v2, sxs, wav))
        np.testing.assert_allclose(got_ws, ref, rtol=1e-4, atol=1e-5)
        fn_t = make_sharded_modeling_tiled(ctx, mesh4, sz, gz,
                                           tile_rows=16, block_k=4,
                                           interpret=True)
        got_t = np.asarray(fn_t(v2, sxs, wav))
        np.testing.assert_allclose(got_t, ref, rtol=1e-4, atol=1e-5)


class TestShardedOtherOrders:
    @pytest.mark.parametrize("order", [2, 4])
    def test_sharded_laplacian_order(self, rng, mesh4, order):
        """Halo width = order/2 varies; sharded must still match."""
        nxe, nze = 32, 28
        p = rng.standard_normal((nxe, nze)).astype(np.float32)
        cx, cz = numerics.scaled_coefficients(order, 10.0, 10.0)
        expect = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, order))
        n_x = mesh4.shape["x"]
        f = jax.shard_map(
            lambda pl_: sharded_laplacian(pl_, jnp.asarray(cx),
                                          jnp.asarray(cz), order, nxe,
                                          "x", n_x),
            mesh=mesh4, in_specs=P("x", None), out_specs=P("x", None),
            check_vma=False)
        got = np.asarray(jax.jit(f)(p))
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestDomainPallas:
    """Blocked halo-exchange Pallas RTM (communication-avoiding x-domain
    decomposition; parallel/domain_pallas.py) vs the unsharded path."""

    def _run(self, rng, mesh4, nt, block_k, lap_impl=None, atol=2e-6):
        from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
            import make_sharded_rtm_snapshot_pallas
        # nxe=64 over 4 x-shards -> nxl=16 >= H=K*h (halo fits one hop)
        ctx = _ctx(nx=56, nt=nt)
        ns, sz, gz = 2, 6, 5
        sxs = np.asarray([18, 34], np.int32)
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_pallas(ctx, mesh4, sz, gz,
                                              block_k=block_k,
                                              interpret=True,
                                              lap_impl=lap_impl)
        im_ext = np.asarray(fn(v2, sxs, wav, embed_dobs(ctx, dobs)))
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=atol)

    def test_block_vmem_fail_fast(self):
        """Slabs whose tight buffer bound cannot fit core VMEM are refused
        up front (the remedy is more x shards), except in interpret mode
        where no VMEM exists."""
        import types
        from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
            import _block_vmem_params
        huge = types.SimpleNamespace(nze=2000)
        with pytest.raises(ValueError, match="more x shards"):
            _block_vmem_params(huge, 2000, 20)
        _block_vmem_params(huge, 2000, 20, interpret=True)  # no raise
        _block_vmem_params(types.SimpleNamespace(nze=231), 80, 20)  # fits

    def test_matches_unsharded_even_blocks(self, rng, mesh4):
        self._run(rng, mesh4, nt=40, block_k=4)  # nb=10, no tails

    def test_matches_unsharded_with_tails(self, rng, mesh4):
        # nt=42, K=4: forward tail=2; backward nt-K=38 -> 9 blocks + tail 2
        self._run(rng, mesh4, nt=42, block_k=4)

    def test_matches_unsharded_odd_block(self, rng, mesh4):
        # odd K exercises the parity-aware output mapping
        self._run(rng, mesh4, nt=21, block_k=3)

    def test_matches_unsharded_mxu_taps(self, rng, mesh4):
        """lap_impl='mxu' on the blocked domain kernels: the slab (nxw=48)
        pads to 128 lanes, the zero tail stays inert, and the sharded image
        matches the unsharded exact path to the manual-bf16_3x tolerance
        (tails exercised: nt=42, K=4)."""
        self._run(rng, mesh4, nt=42, block_k=4, lap_impl="mxu", atol=1e-4)

    def test_matches_unsharded_mxu6_taps(self, rng, mesh4):
        """lap_impl='mxu6' (6-pass triple-split accuracy tier) on the
        blocked domain kernels: same lane-padding path, ~f32-level
        tolerance."""
        self._run(rng, mesh4, nt=42, block_k=4, lap_impl="mxu6", atol=1e-6)

    def test_source_near_shard_edge(self, rng, mesh4):
        """Source lane adjacent to a shard boundary: its injection must
        propagate through neighbours' halo recomputation."""
        from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
            import make_sharded_rtm_snapshot_pallas
        ctx = _ctx(nx=56, nt=24)
        n_x = mesh4.shape["x"]
        nxl = ctx.nxe // n_x
        sz, gz = 6, 5
        sxs = np.asarray([nxl - 1, nxl], np.int32)  # straddle the boundary
        v2 = np.full((2, ctx.nxe, ctx.nze), 4e6, np.float32)
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((2, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_pallas(ctx, mesh4, sz, gz,
                                              block_k=2, interpret=True)
        im_ext = np.asarray(fn(v2, sxs, wav, embed_dobs(ctx, dobs)))
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(2)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6)


class TestRtmGpuDomainMesh:
    def test_run_rtm_gpu_with_x_mesh(self, mesh4):
        """run_rtm_gpu with an x>1 mesh routes through the domain-
        decomposition branch and matches the single-device run."""
        import parallel_finite_difference_computation_tpu as pfdc
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.models import (
            layered_model)
        p = pfdc.Params(nz=24, nx=24, nt=40, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=3, sz=0, fsx=2, ds=8, gz=0,
                        nxb=4, nzb=4, fac=0.7, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        rng = np.random.default_rng(3)
        dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
        img0, im0 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=5,
                                         backend="lax")
        img1, im1 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=5,
                                         backend="lax", mesh=mesh4)
        scale = np.abs(im0).max()
        np.testing.assert_allclose(im1 / scale, im0 / scale, atol=1e-5)
        np.testing.assert_allclose(img1 / scale, img0 / scale, atol=1e-5)


class TestModDomainPallas:
    """Blocked-kernel sharded forward modeling vs the unsharded solver."""

    @pytest.mark.parametrize("source,taper,nt,k,lap_impl,atol", [
        ("point", "top", 40, 4, None, 2e-6),
        ("gaussian", "all", 42, 4, None, 2e-6),
        ("gaussian", "all", 42, 4, "mxu", 1e-4)])
    def test_matches_unsharded(self, rng, mesh4, source, taper, nt, k,
                               lap_impl, atol):
        from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
            import make_sharded_forward_modeling_pallas
        from parallel_finite_difference_computation_tpu.solver import (
            forward_modeling)
        ctx = _ctx(nx=56, nt=nt)
        ns, sz, gz = 2, 8, 5
        sxs = np.asarray([18, 34], np.int32)
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        fn = make_sharded_forward_modeling_pallas(ctx, mesh4, sz, gz,
                                                  source=source, taper=taper,
                                                  block_k=k, interpret=True,
                                                  lap_impl=lap_impl)
        seis = np.asarray(fn(v2, sxs, wav))[:, :, ctx.nxb:ctx.nxb + ctx.nx]
        ref = np.stack([
            np.asarray(forward_modeling(ctx, jnp.asarray(v2[i]), wav,
                                        int(sxs[i]), sz, gz, source=source,
                                        taper=taper, record="trace")[2])
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(seis / scale, ref / scale, atol=atol)

    def test_run_modeling_with_x_mesh(self, mesh4):
        import parallel_finite_difference_computation_tpu as pfdc
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.models import (
            layered_model)
        p = pfdc.Params(nz=24, nx=24, nt=40, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=3, sz=0, fsx=2, ds=8, gz=0,
                        nxb=4, nzb=4, fac=0.01, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        d0 = pipeline.run_modeling(p, vp=vp, backend="lax")
        d1 = pipeline.run_modeling(p, vp=vp, backend="lax", mesh=mesh4)
        scale = np.abs(d0).max() or 1.0
        np.testing.assert_allclose(d1 / scale, d0 / scale, atol=1e-5)


class TestDomainPadding:
    """Grids whose nxe does not divide the x-shard count are zero-padded
    (padded columns stay exactly zero; original-edge semantics preserved)."""

    def test_rtm_snapshot_lax_padded(self, rng, mesh4):
        ctx = _ctx(nx=23, nz=20, nt=24)  # nxe=31, 4 shards -> pad to 32
        assert ctx.nxe % mesh4.shape["x"] != 0
        ns, sz, gz = 2, 6, 5
        sxs = [10, 14]
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot(ctx, mesh4, gz)
        srcf = embed_source_fields(ctx, sxs, sz, gaussian=False)
        im_ext = np.asarray(fn(v2, srcf, wav, embed_dobs(ctx, dobs)))
        assert im_ext.shape == (ns, ctx.nxe, ctx.nze)
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         sxs[i], sz, gz))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6)

    def test_rtm_snapshot_pallas_padded(self, rng, mesh4):
        from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
            import make_sharded_rtm_snapshot_pallas
        ctx = _ctx(nx=51, nt=24)  # nxe=59, 4 shards -> pad to 60, nxl=15
        assert ctx.nxe % mesh4.shape["x"] != 0
        ns, sz, gz = 2, 6, 5
        sxs = np.asarray([18, 34], np.int32)
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_pallas(ctx, mesh4, sz, gz,
                                              block_k=3, interpret=True)
        im_ext = np.asarray(fn(v2, sxs, wav, embed_dobs(ctx, dobs)))
        assert im_ext.shape == (ns, ctx.nxe, ctx.nze)
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6)


class TestRtmFullDomain:
    def test_sharded_rtm_full_matches_unsharded_ns3(self, rng, mesh4):
        """x-decomposed full-wavefield RTM == rtm_shot_full, including the
        cross-shot it=0 flat-read threading (ns=3)."""
        from parallel_finite_difference_computation_tpu.parallel import (
            make_sharded_rtm_full, embed_source_fields, embed_injection_rows)
        from parallel_finite_difference_computation_tpu.solver import (
            rtm_shot_full)
        ctx = _ctx(nx=23, nz=20, nt=24)  # nxe=31: also exercises x-padding
        ns, sz, gz = 3, 6, 5
        sxs = [8, 14, 20]
        v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_full(ctx, mesh4, gz)
        v_rep = np.broadcast_to(v2, (ns,) + v2.shape).copy()
        # pad shots to the shot-axis size (mesh4 has shot=2 -> pad to 4)
        n_shot = mesh4.shape["shot"]
        npad = -ns % n_shot
        v_in = np.concatenate([v_rep, v_rep[:npad]])
        d_in = np.concatenate([dobs, np.zeros((npad,) + dobs.shape[1:],
                                              np.float32)])
        sx_in = sxs + [sxs[0]] * npad
        srcf = embed_source_fields(ctx, sx_in, sz, gaussian=False)
        inj = embed_injection_rows(ctx, d_in)
        im_ext = np.asarray(fn(v_in, srcf, wav, inj))
        got = im_ext[:ns, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        nxt = np.concatenate([dobs[1:, 0, 0], np.zeros(1, np.float32)])
        ref = np.stack([
            np.asarray(rtm_shot_full(ctx, jnp.asarray(v2), wav,
                                     jnp.asarray(dobs[i]), sxs[i], sz, gz,
                                     next_shot_first=float(nxt[i])))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6)


class TestShardedRtmFullTiled:
    def test_matches_unsharded_ns3(self, rng):
        """Shot-sharded full-wavefield STREAMING tier
        (make_sharded_rtm_full_tiled — the rtm_main flavor the round-4
        pipeline silently downgraded to lax) == rtm_shot_full, including
        the cross-shot it=0 flat-read threading (ns=3 on a 4-shot mesh:
        exercises the zero-padded dummy shot too)."""
        from parallel_finite_difference_computation_tpu.parallel import (
            make_mesh)
        from parallel_finite_difference_computation_tpu.parallel.shots \
            import make_sharded_rtm_full_tiled, pad_shots
        from parallel_finite_difference_computation_tpu.solver import (
            rtm_shot_full)
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(n_shot=4)
        ctx = _ctx(nx=24, nz=19, nt=24)
        ns, sz, gz = 3, 6, 5
        sxs = np.asarray([8, 14, 20], np.int32)
        v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        nxt = np.concatenate([dobs[1:, 0, 0], np.zeros(1, np.float32)])
        fn = make_sharded_rtm_full_tiled(ctx, mesh, sz, gz, tile_rows=16,
                                         block_k=3, interpret=True)
        sx_pad, _ = pad_shots(sxs, 4)
        d_pad, _ = pad_shots(dobs, 4)
        nxt_pad, _ = pad_shots(nxt, 4)
        got = np.asarray(fn(jnp.asarray(v2), d_pad, sx_pad, nxt_pad,
                            wav))[:ns]
        ref = np.stack([
            np.asarray(rtm_shot_full(ctx, jnp.asarray(v2), wav,
                                     jnp.asarray(dobs[i]), int(sxs[i]),
                                     sz, gz, next_shot_first=float(nxt[i])))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)

    def test_pipeline_shot_mesh_tiled_no_downgrade(self, monkeypatch):
        """run_rtm_cpu with a shot mesh + the tiled tier routes through the
        sharded streaming maker (no lax downgrade, no warning); with
        interpret-mode kernels forced, the result matches the lax path."""
        import warnings as _w
        import parallel_finite_difference_computation_tpu as pfdc
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.parallel import (
            make_mesh, shots as shots_mod)
        from parallel_finite_difference_computation_tpu.models import (
            layered_model)
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(n_shot=4)
        p = pfdc.Params(nz=24, nx=24, nt=24, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=3, sz=0, fsx=2, ds=8, gz=0,
                        nxb=4, nzb=4, fac=0.01, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        rng = np.random.default_rng(3)
        dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
        img0, im0 = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs,
                                         backend="lax")
        # force interpret mode so the Mosaic kernels run on the CPU lane
        orig = shots_mod.make_sharded_rtm_full_tiled
        monkeypatch.setattr(
            shots_mod, "make_sharded_rtm_full_tiled",
            lambda *a, **k: orig(*a, **{**k, "interpret": True,
                                        "tile_rows": 16,
                                        "block_k": 3}))
        with _w.catch_warnings():
            _w.simplefilter("error")  # any downgrade warning -> failure
            img1, im1 = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs,
                                             backend="tiled", mesh=mesh)
        scale = np.abs(im0).max() or 1.0
        np.testing.assert_allclose(im1 / scale, im0 / scale, atol=1e-5)
        np.testing.assert_allclose(img1 / scale, img0 / scale, atol=1e-5)
