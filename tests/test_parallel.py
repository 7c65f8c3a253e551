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
