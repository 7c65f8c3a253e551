"""2D (x, z) domain-decomposition tests on an 8-virtual-device CPU mesh:
the (shot, x, z)-sharded propagation must match the unsharded path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.ops import stencil
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, rtm_shot_snapshot, rtm_shot_full)
from parallel_finite_difference_computation_tpu.parallel import (
    make_mesh, halo_exchange_axis, sharded_laplacian_2d,
    make_sharded_forward_modeling_2d, make_sharded_rtm_snapshot_2d,
    make_sharded_rtm_full_2d, embed_source_fields, embed_dobs,
    embed_injection_rows)


def _ctx(nx=24, nz=20, nt=40, nxb=4, nzb=4):
    return FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                            order=8, nxb=nxb, nzb=nzb, fac=0.7)


@pytest.fixture(scope="module")
def mesh222():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_shot=2, n_x=2, n_z=2)


@pytest.fixture(scope="module")
def mesh124():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_shot=1, n_x=2, n_z=4)


class TestHaloExchangeAxis:
    def test_z_axis_zeros_at_edges(self, mesh124):
        nze, h = 16, 3
        p = np.arange(4 * nze, dtype=np.float32).reshape(4, nze)
        n_z = mesh124.shape["z"]
        f = jax.shard_map(
            lambda pl: halo_exchange_axis(pl, h, 1, "z", n_z),
            mesh=mesh124, in_specs=P(None, "z"), out_specs=P(None, "z"),
            check_vma=False)
        out = np.asarray(jax.jit(f)(p))  # (4, nze + 2h*n_z) stacked shards
        nzl = nze // n_z
        blocks = out.reshape(4, n_z, nzl + 2 * h).transpose(1, 0, 2)
        assert np.all(blocks[0, :, :h] == 0)
        assert np.all(blocks[-1, :, -h:] == 0)
        np.testing.assert_array_equal(blocks[1, :, :h],
                                      p[:, nzl - h:nzl])
        np.testing.assert_array_equal(blocks[0, :, -h:],
                                      p[:, nzl:nzl + h])


class TestShardedLaplacian2D:
    @pytest.mark.parametrize("meshname", ["mesh222", "mesh124"])
    def test_matches_unsharded(self, rng, meshname, request):
        mesh = request.getfixturevalue(meshname)
        nxe, nze, order = 32, 28, 8
        p = rng.standard_normal((nxe, nze)).astype(np.float32)
        cx, cz = numerics.scaled_coefficients(order, 10.0, 8.0)
        expect = np.asarray(stencil.laplacian(jnp.asarray(p), cx, cz, order))

        n_x, n_z = mesh.shape["x"], mesh.shape["z"]
        f = jax.shard_map(
            lambda pl: sharded_laplacian_2d(
                pl, jnp.asarray(cx), jnp.asarray(cz), order, nxe, nze,
                n_x, n_z),
            mesh=mesh, in_specs=P("x", "z"), out_specs=P("x", "z"),
            check_vma=False)
        got = np.asarray(jax.jit(f)(p))
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestSharded2DDrivers:
    def test_forward_modeling_matches(self, rng, mesh222):
        # nz=19 -> nze=27: exercises the z zero-padding (27 -> 28)
        ctx = _ctx(nx=24, nz=19)
        ns, gz, sz = 2, 5, 6
        sxs = [10, 14]
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = numerics.ricker_wavelet(ctx.nt, 0.001, 25.0)

        ref = np.stack([
            np.asarray(forward_modeling(
                ctx, jnp.asarray(v2[i]), jnp.asarray(wav), sxs[i], sz, gz,
                source="point", taper="all", record="trace")[2])
            for i in range(ns)])

        fn = make_sharded_forward_modeling_2d(ctx, mesh222, gz,
                                              source="point", taper="all")
        srcf = embed_source_fields(ctx, sxs, sz, gaussian=False)
        seis_ext = np.asarray(fn(v2, srcf, jnp.asarray(wav)))
        got = seis_ext[:, :, ctx.nxb:ctx.nxb + ctx.nx]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_rtm_snapshot_matches(self, rng, mesh222):
        ctx = _ctx()
        ns, gz, sz = 2, 5, 6
        sxs = [10, 14]
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = numerics.ricker_wavelet(ctx.nt, 0.001, 25.0)
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)

        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]),
                                         jnp.asarray(wav),
                                         jnp.asarray(dobs[i]),
                                         sxs[i], sz, gz))
            for i in range(ns)])

        fn = make_sharded_rtm_snapshot_2d(ctx, mesh222, gz)
        srcf = embed_source_fields(ctx, sxs, sz, gaussian=False)
        im_ext = np.asarray(fn(v2, srcf, jnp.asarray(wav),
                               embed_dobs(ctx, dobs)))
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb, ctx.nzb:ctx.nze - ctx.nzb]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_source_near_shard_edges(self, rng, mesh124):
        """Gaussian ptsrc patch straddling BOTH the x and z shard cuts."""
        ctx = _ctx(nx=24, nz=24)  # nze=32, nzl=8 on z=4: cuts at 8/16/24
        gz, sz = 5, 15            # patch rows 12..18 straddle the z cut
        sx = int(ctx.nxe // 2 - 1)  # x cut at nxe/2=16: patch 12..18
        v2 = (1500.0 + 500.0 * rng.random((1, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = numerics.ricker_wavelet(ctx.nt, 0.001, 25.0)
        ref = np.asarray(forward_modeling(
            ctx, jnp.asarray(v2[0]), jnp.asarray(wav), sx, sz, gz,
            source="gaussian", taper="all", record="trace")[2])[None]
        fn = make_sharded_forward_modeling_2d(ctx, mesh124, gz,
                                              source="gaussian",
                                              taper="all")
        srcf = embed_source_fields(ctx, [sx], sz, gaussian=True)
        seis_ext = np.asarray(fn(v2, srcf, jnp.asarray(wav)))
        got = seis_ext[:, :, ctx.nxb:ctx.nxb + ctx.nx]
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestRtmFull2D:
    def test_matches_unsharded_ns3(self, rng, mesh222):
        """(x, z)-decomposed full-wavefield RTM == rtm_shot_full, incl. the
        cross-shot it=0 flat-read threading (ns=3) and padding on both
        grid axes (nxe=31 -> 32, nze=27 -> 28)."""
        ctx = _ctx(nx=23, nz=19, nt=24)
        ns, sz, gz = 3, 6, 5
        sxs = [8, 14, 20]
        v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_full_2d(ctx, mesh222, gz)
        v_rep = np.broadcast_to(v2, (ns,) + v2.shape).copy()
        n_shot = mesh222.shape["shot"]
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


class TestPipelines2DMesh:
    def _params(self, fac=0.01):
        import parallel_finite_difference_computation_tpu as pfdc
        return pfdc.Params(nz=24, nx=24, nt=40, dz=10.0, dx=10.0, dt=0.001,
                           fpeak=25.0, ns=3, sz=0, fsx=2, ds=8, gz=0,
                           nxb=8, nzb=8, fac=fac, order=8)

    def test_run_modeling_and_rtm_cpu_with_2d_mesh(self, mesh222, tmp_path):
        """run_modeling / run_rtm_cpu with a (shot, x, z) mesh route through
        the 2D decomposition and match the single-device run."""
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.models import (
            layered_model)
        p = self._params()
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        data0 = pipeline.run_modeling(p, vp=vp, backend="lax")
        data1 = pipeline.run_modeling(p, vp=vp, backend="lax", mesh=mesh222)
        scale = np.abs(data0).max() or 1.0
        np.testing.assert_allclose(data1 / scale, data0 / scale, atol=1e-5)
        img0, im0 = pipeline.run_rtm_cpu(p, vp=vp, dobs=data0)
        img1, im1 = pipeline.run_rtm_cpu(p, vp=vp, dobs=data0, mesh=mesh222)
        scale = np.abs(im0).max() or 1.0
        np.testing.assert_allclose(im1 / scale, im0 / scale, atol=1e-5)
        np.testing.assert_allclose(img1 / scale, img0 / scale, atol=1e-5)

    def test_run_rtm_gpu_with_2d_mesh(self, mesh222):
        from parallel_finite_difference_computation_tpu import pipeline
        from parallel_finite_difference_computation_tpu.models import (
            layered_model)
        p = self._params(fac=0.7)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
        rng = np.random.default_rng(3)
        dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
        img0, im0 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=5,
                                         backend="lax")
        img1, im1 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=5,
                                         backend="lax", mesh=mesh222)
        np.testing.assert_allclose(im1, im0, rtol=2e-4, atol=1e-4)
