"""2D (x, z) blocked-Pallas domain decomposition on an 8-virtual-device CPU
mesh (interpret mode): the communication-avoiding kernels
(parallel/domain2d_pallas.py) must match the unsharded solver paths,
including tails, odd blocks, both-axis padding, acquisition rows in
non-root z shards, and sources straddling both shard cuts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, forward_modeling, rtm_shot_snapshot)
from parallel_finite_difference_computation_tpu.parallel import (
    make_mesh, embed_dobs)
from parallel_finite_difference_computation_tpu.parallel.domain2d_pallas \
    import (make_sharded_rtm_snapshot_2d_pallas,
            make_sharded_forward_modeling_2d_pallas, _block2_vmem_params)


def _ctx(nx=24, nz=24, nt=40, nxb=4, nzb=4):
    return FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                            order=8, nxb=nxb, nzb=nzb, fac=0.7)


@pytest.fixture(scope="module")
def mesh222():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_shot=2, n_x=2, n_z=2)


@pytest.fixture(scope="module")
def mesh122():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh(n_shot=1, n_x=2, n_z=2)


class TestRtm2DBlocked:
    def _run(self, rng, mesh, nx=56, nz=48, nt=40, block_k=4, sz=6, gz=5,
             lap_impl=None, atol=2e-6):
        ctx = _ctx(nx=nx, nz=nz, nt=nt)
        ns, n_shot = 2, mesh.shape["shot"]
        sxs = np.asarray([18, 34], np.int32)[:ns]
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_2d_pallas(ctx, mesh, sz, gz,
                                                 block_k=block_k,
                                                 interpret=True,
                                                 lap_impl=lap_impl)
        npad = -ns % n_shot
        v_in = np.concatenate([v2, v2[:1]] if npad else [v2])
        sx_in = np.concatenate([sxs, sxs[:1]] if npad else [sxs])
        d_in = np.concatenate(
            [dobs, np.zeros((1,) + dobs.shape[1:], np.float32)]
            if npad else [dobs])
        im_ext = np.asarray(fn(v_in, sx_in, wav, embed_dobs(ctx, d_in)))
        got = im_ext[:ns, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=atol)

    def test_vmem_fail_fast(self):
        with pytest.raises(ValueError, match="more x/z shards"):
            _block2_vmem_params(4000, 4000, 20)
        _block2_vmem_params(4000, 4000, 20, interpret=True)  # no raise
        _block2_vmem_params(128, 160, 20)  # fits

    def test_halo_too_wide_raises(self, mesh222):
        ctx = _ctx(nx=24, nz=24, nt=40)  # nzl=16 < H=4*8=32
        with pytest.raises(ValueError, match="halo width"):
            make_sharded_rtm_snapshot_2d_pallas(ctx, mesh222, 6, 5,
                                                block_k=8, interpret=True)

    def test_matches_unsharded_even_blocks(self, rng, mesh222):
        self._run(rng, mesh222, nt=40, block_k=4)  # nb=10, no tails

    def test_matches_unsharded_with_tails(self, rng, mesh222):
        # nt=42, K=4: forward tail=2; backward nt-K=38 -> 9 blocks + tail 2
        self._run(rng, mesh222, nt=42, block_k=4)

    def test_matches_unsharded_odd_block(self, rng, mesh222):
        self._run(rng, mesh222, nt=21, block_k=3)

    def test_matches_unsharded_mxu_taps(self, rng, mesh222):
        """lap_impl='mxu': the slab lane axis pads to 128; the zero tail is
        inert; tolerance is the manual-bf16_3x tier's."""
        self._run(rng, mesh222, nt=42, block_k=4, lap_impl="mxu", atol=1e-4)

    def test_matches_unsharded_mxu6_taps(self, rng, mesh222):
        self._run(rng, mesh222, nt=42, block_k=4, lap_impl="mxu6",
                  atol=1e-6)

    def test_both_axes_padded(self, rng, mesh222):
        """nxe=59 -> 60, nze=53 -> 54: zero-padded tails on both axes stay
        exactly zero through halo exchange and blocked kernels."""
        self._run(rng, mesh222, nx=51, nz=45, nt=24, block_k=3)

    def test_acquisition_rows_in_second_z_shard(self, rng, mesh222):
        """sz/gz below the z cut: the dynamic-sublane injection and the
        halo-inclusive ownership must route rows to z shard 1."""
        ctx = _ctx(nx=56, nz=48, nt=24)
        nzl = ctx.nze // mesh222.shape["z"]
        self._run(rng, mesh222, nx=56, nz=48, nt=24, block_k=3,
                  sz=nzl + 3, gz=nzl + 2)

    def test_source_straddles_both_cuts(self, rng, mesh122):
        """Source on the x cut, acquisition depths within a halo of the z
        cut: injections must propagate through neighbours' halo
        recomputation on both axes."""
        ctx = _ctx(nx=56, nz=48, nt=24)
        n_x = mesh122.shape["x"]
        nxl = ctx.nxe // n_x
        nzl = ctx.nze // mesh122.shape["z"]
        sz, gz = nzl - 1, nzl  # straddle the z cut
        sxs = np.asarray([nxl - 1, nxl], np.int32)
        v2 = np.full((2, ctx.nxe, ctx.nze), 4e6, np.float32)
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        rngd = rng
        dobs = rngd.standard_normal((2, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_2d_pallas(ctx, mesh122, sz, gz,
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


class TestPerAxisHalo:
    """Single-shard axes carry no halo (Hz/Hx = 0): the degenerate meshes
    must still match the unsharded path, and force_halo must too."""

    def _run_mesh(self, rng, mesh, force_halo=False):
        ctx = _ctx(nx=56, nz=48, nt=24)
        ns, sz, gz = 2, 6, 5
        sxs = np.asarray([18, 34], np.int32)
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
        fn = make_sharded_rtm_snapshot_2d_pallas(ctx, mesh, sz, gz,
                                                 block_k=3, interpret=True,
                                                 force_halo=force_halo)
        n_shot = mesh.shape["shot"]
        npad = -ns % n_shot
        v_in = np.concatenate([v2, v2[:npad]])
        sx_in = np.concatenate([sxs, sxs[:npad]])
        d_in = np.concatenate([dobs, np.zeros_like(dobs[:npad])])
        im_ext = np.asarray(fn(v_in, sx_in, wav, embed_dobs(ctx, d_in)))
        got = im_ext[:ns, ctx.nxb:ctx.nxe - ctx.nxb,
                     ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2[i]), wav,
                                         jnp.asarray(dobs[i]),
                                         int(sxs[i]), sz, gz))
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6)

    def test_x_only_mesh_zero_z_halo(self, rng):
        """(shot=2, x=2, z=1): Hz = 0 — the z axis degenerates to the 1D
        blocked scheme."""
        from jax.sharding import Mesh
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2, 1),
                    ("shot", "x", "z"))
        self._run_mesh(rng, mesh)

    def test_z_only_mesh_zero_x_halo(self, rng):
        """(shot=2, x=1, z=2): Hx = 0 — z-dominated split."""
        from jax.sharding import Mesh
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 1, 2),
                    ("shot", "x", "z"))
        self._run_mesh(rng, mesh)

    def test_1x1x1_mesh_no_halos(self, rng):
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                    ("shot", "x", "z"))
        self._run_mesh(rng, mesh)

    def test_1x1x1_force_halo(self, rng):
        """force_halo=True (the bench halo-cost proxy) keeps both K*h
        halos on the 1x1x1 mesh and still matches."""
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                    ("shot", "x", "z"))
        self._run_mesh(rng, mesh, force_halo=True)


class TestMod2DBlocked:
    @pytest.mark.parametrize("source,taper,nt,k,lap_impl,atol", [
        ("point", "top", 40, 4, None, 2e-6),
        ("gaussian", "all", 42, 4, None, 2e-6),
        ("gaussian", "all", 42, 4, "mxu", 1e-4)])
    def test_matches_unsharded(self, rng, mesh222, source, taper, nt, k,
                               lap_impl, atol):
        ctx = _ctx(nx=56, nz=48, nt=nt)
        ns, sz, gz = 2, 8, 5
        sxs = np.asarray([18, 34], np.int32)
        v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        fn = make_sharded_forward_modeling_2d_pallas(
            ctx, mesh222, sz, gz, source=source, taper=taper, block_k=k,
            interpret=True, lap_impl=lap_impl)
        seis = np.asarray(fn(v2, sxs, wav))[:, :, ctx.nxb:ctx.nxb + ctx.nx]
        ref = np.stack([
            np.asarray(forward_modeling(ctx, jnp.asarray(v2[i]), wav,
                                        int(sxs[i]), sz, gz, source=source,
                                        taper=taper, record="trace")[2])
            for i in range(ns)])
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(seis / scale, ref / scale, atol=atol)

    def test_gaussian_patch_straddles_z_cut(self, rng, mesh122):
        """The 7x7 ptsrc patch centered within r of the z cut spans two z
        shards — the full-slab injection field must reassemble it."""
        ctx = _ctx(nx=56, nz=48, nt=24)
        nzl = ctx.nze // mesh122.shape["z"]
        nxl = ctx.nxe // mesh122.shape["x"]
        sz, gz = nzl - 2, nzl + 1   # patch rows straddle; gz in shard 1
        sxs = np.asarray([nxl - 2], np.int32)  # patch straddles the x cut
        v2 = (1500.0 + 500.0 * rng.random((1, ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        fn = make_sharded_forward_modeling_2d_pallas(
            ctx, mesh122, sz, gz, source="gaussian", taper="all",
            block_k=3, interpret=True)
        seis = np.asarray(fn(v2, sxs, wav))[:, :, ctx.nxb:ctx.nxb + ctx.nx]
        ref = np.asarray(forward_modeling(
            ctx, jnp.asarray(v2[0]), wav, int(sxs[0]), sz, gz,
            source="gaussian", taper="all", record="trace")[2])[None]
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(seis / scale, ref / scale, atol=2e-6)
