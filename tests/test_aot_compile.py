"""Offline compiled-Mosaic checks via the PJRT TPU AOT topology.

JAX can AOT-compile for a TPU topology with the locally installed libtpu
and *compile-only* devices — no TPU hardware attached
(``jax.experimental.topologies``). This lane catches Mosaic lowering and
layout regressions that interpret mode cannot see (vector-stack scoped-VMEM
OOMs, unimplemented ``tpu.concatenate`` layout cases, window/layout
assignment), from the plain CPU test environment.

Scope note: this compiles with the *local* libtpu's Mosaic. A chip-side
serving stack can run a different compiler version (the dev tunnel's
rejected an offset-carrying concat that libtpu 0.0.34 accepts), so the
on-chip ``validate.py``/``bench.py`` gates remain authoritative for the
deployed path; this lane is the regression net that needs no chip.

Sizes mirror the validated configs where cheap (231-extended grids, the
shape class of ``3lay``), with tiny ``nt`` — Mosaic kernel IR is
``nt``-independent (``fori_loop`` bodies compile once).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import FDContext

pytestmark = pytest.mark.skipif(
    os.environ.get("PFDC_SKIP_AOT") == "1",
    reason="AOT compile lane disabled via PFDC_SKIP_AOT=1")


@pytest.fixture(scope="module")
def tpu_sharding():
    """Single compile-only v5e device sharding, or skip if no local libtpu."""
    try:
        from jax.experimental import topologies
        from jax.sharding import NamedSharding, PartitionSpec as P
        topo = topologies.get_topology_desc(
            "v5e:1x1x1", "tpu", chips_per_host_bounds=[1, 1, 1])
        mesh = topologies.make_mesh(topo, (1,), ("d",))
        return NamedSharding(mesh, P())
    except Exception as e:  # no local libtpu / unsupported jaxlib
        pytest.skip(f"TPU AOT topology unavailable: {e}")


def _aot(sharding, fn, *args):
    """Lower ``fn`` at the args' shapes for the TPU topology and run the
    full XLA+Mosaic compile. Returns the compiled executable (unused —
    compiling without error IS the assertion)."""
    sds = [jax.ShapeDtypeStruct(jnp.asarray(a).shape, jnp.asarray(a).dtype,
                                sharding=sharding) for a in args]
    return jax.jit(fn).lower(*sds).compile()


def _ctx(nt=8, nx=199, nz=199, nxb=16, nzb=16):
    # nxe = nze = 231: the 3lay shape class (non-multiple of 8/128 lanes)
    return FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                            order=8, nxb=nxb, nzb=nzb, fac=0.7)


@pytest.fixture(scope="module")
def small(rng_mod):
    ctx = _ctx()
    v2 = jnp.asarray(
        (1500.0 + 500.0 * rng_mod.random((ctx.nxe, ctx.nze))) ** 2,
        jnp.float32)
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
    return ctx, v2, wav


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(7)


class TestWholeShotKernels:
    def test_rtm_snapshot(self, tpu_sharding, small):
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            rtm_snapshot_pallas)
        ctx, v2, wav = small
        dobs = jnp.zeros((ctx.nx, ctx.nt), jnp.float32)
        _aot(tpu_sharding,
             lambda v2, wav, dobs, sx: rtm_snapshot_pallas(
                 ctx, v2, wav, dobs, sx, 5, 5),
             v2, wav, dobs, jnp.int32(40))

    def test_rtm_snapshot_roll_fallback(self, tpu_sharding, small,
                                        monkeypatch):
        """PFDC_LAP_IMPL=roll (the pad-free escape hatch) also compiles."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            rtm_snapshot_pallas)
        monkeypatch.setenv("PFDC_LAP_IMPL", "roll")
        ctx, v2, wav = small
        dobs = jnp.zeros((ctx.nx, ctx.nt), jnp.float32)
        _aot(tpu_sharding,
             lambda v2, wav, dobs, sx: rtm_snapshot_pallas(
                 ctx, v2, wav, dobs, sx, 5, 5),
             v2, wav, dobs, jnp.int32(40))

    @pytest.mark.parametrize("lap_impl", ["mxu", "mxu6"])
    def test_rtm_snapshot_mxu(self, tpu_sharding, small, lap_impl):
        """The MXU lane-tap fast path (banded block matmuls, manual 3-pass
        bf16 — 6-pass triple-split for "mxu6") compiles: exercises the
        bf16 residual splits, the in-kernel dot_generals, and the
        128-aligned lane concat of the block results."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            rtm_snapshot_pallas)
        ctx, v2, wav = small
        dobs = jnp.zeros((ctx.nx, ctx.nt), jnp.float32)
        _aot(tpu_sharding,
             lambda v2, wav, dobs, sx: rtm_snapshot_pallas(
                 ctx, v2, wav, dobs, sx, 5, 5, lap_impl=lap_impl),
             v2, wav, dobs, jnp.int32(40))

    def test_forward_modeling(self, tpu_sharding, small):
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            forward_modeling_pallas)
        ctx, v2, wav = small
        _aot(tpu_sharding,
             lambda v2, wav, sx: forward_modeling_pallas(
                 ctx, v2, wav, sx, 5, 5),
             v2, wav, jnp.int32(40))

    def test_forward_modeling_mxu(self, tpu_sharding, small):
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            forward_modeling_pallas)
        ctx, v2, wav = small
        _aot(tpu_sharding,
             lambda v2, wav, sx: forward_modeling_pallas(
                 ctx, v2, wav, sx, 5, 5, lap_impl="mxu"),
             v2, wav, jnp.int32(40))

    def test_split_fwd_bwd(self, tpu_sharding, small):
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            fd_forward_pallas, fd_back_pallas)
        ctx, v2, wav = small
        dobs = jnp.zeros((ctx.nx, ctx.nt), jnp.float32)
        snap = jnp.zeros((ctx.nxe, ctx.nze), jnp.float32)
        _aot(tpu_sharding,
             lambda v2, wav, sx: fd_forward_pallas(ctx, v2, wav, sx, 5),
             v2, wav, jnp.int32(40))
        _aot(tpu_sharding,
             lambda v2, p, pp, dobs: fd_back_pallas(ctx, v2, p, pp, dobs, 5),
             v2, snap, snap, dobs)


class TestStressShapes:
    def test_rtm_snapshot_marmousi_size(self, tpu_sharding):
        """The largest GPU-suite config (369x375 -> 409x455 extended,
        anisotropic spacing, VMEM wavelet at nt=3004)."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            rtm_snapshot_pallas)
        ctx = FDContext.create(369, 375, 3004, dx=25.0, dz=8.0, dt=0.001,
                               order=8, nxb=20, nzb=40, fac=0.7)
        dobs = jnp.zeros((ctx.nx, ctx.nt), jnp.float32)
        _aot(tpu_sharding,
             lambda v2, wav, dobs, sx: rtm_snapshot_pallas(
                 ctx, v2, wav, dobs, sx, 5, 5),
             jnp.zeros((ctx.nxe, ctx.nze), jnp.float32),
             jnp.zeros((ctx.nt,), jnp.float32), dobs, jnp.int32(40))

    def test_rtm_snapshot_wide_grid(self, tpu_sharding):
        """Production-width grid (231 z x 2000 x): the shape whose Mosaic
        vector stack overflowed the earlier ~12-grid margin."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            rtm_snapshot_pallas)
        ctx = FDContext.create(1968, 199, 8, dx=10.0, dz=10.0, dt=0.001,
                               order=8, nxb=16, nzb=16, fac=0.7)
        dobs = jnp.zeros((ctx.nx, ctx.nt), jnp.float32)
        _aot(tpu_sharding,
             lambda v2, wav, dobs, sx: rtm_snapshot_pallas(
                 ctx, v2, wav, dobs, sx, 5, 5),
             jnp.zeros((ctx.nxe, ctx.nze), jnp.float32),
             jnp.zeros((ctx.nt,), jnp.float32), dobs, jnp.int32(40))


class TestStencilKernels:
    def test_tiled(self, tpu_sharding, rng_mod):
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import laplacian_pallas
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        p = jnp.asarray(rng_mod.standard_normal((415, 295)), jnp.float32)
        _aot(tpu_sharding,
             lambda p: laplacian_pallas(p, list(map(float, cx)),
                                        list(map(float, cz)), 8), p)

    def test_padded(self, tpu_sharding, rng_mod):
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import laplacian_pallas_padded, padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nx = nz = 231
        R, W, _, _ = padded_layout(nx, nz, 8)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        _aot(tpu_sharding,
             lambda p: laplacian_pallas_padded(p, cx, cz, 8, nx, nz), p)

    def test_padded_mxu(self, tpu_sharding, rng_mod):
        """The MXU z-tap variant of the padded stencil kernel compiles at a
        width with middle band blocks (W=384+)."""
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import laplacian_pallas_padded, padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nx, nz = 231, 500
        R, W, _, _ = padded_layout(nx, nz, 8, 128)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        _aot(tpu_sharding,
             lambda p: laplacian_pallas_padded(p, cx, cz, 8, nx, nz, 128,
                                               impl="mxu"), p)


class TestMultiChip:
    def test_domain_rtm_8chip(self, rng_mod):
        """AOT-compile the shot+x-domain RTM (shard_map + ppermute halo
        exchange + blocked Mosaic kernels) for a 2x4 v5e slice — the real
        TPU lowering of the multi-chip path, vs the dryrun's CPU mesh."""
        try:
            from jax.experimental import topologies
            topo = topologies.get_topology_desc("v5e:2x4x1", "tpu")
        except Exception as e:
            pytest.skip(f"TPU AOT topology unavailable: {e}")
        from jax.sharding import NamedSharding, PartitionSpec as P
        from parallel_finite_difference_computation_tpu.parallel import (
            make_mesh)
        from parallel_finite_difference_computation_tpu.parallel.\
            domain_pallas import make_sharded_rtm_snapshot_pallas

        n_shot, n_x = 2, 4
        mesh = make_mesh(n_shot=n_shot, n_x=n_x, devices=list(topo.devices))
        nxb = nzb = 8
        nxe = n_x * 8 * 2                      # 64: divisible, h-roomy slabs
        ctx = FDContext.create(nxe - 2 * nxb, 16, 8, dx=10.0, dz=10.0,
                               dt=0.001, order=8, nxb=nxb, nzb=nzb, fac=0.7)
        ns = 2 * n_shot
        fn = make_sharded_rtm_snapshot_pallas(ctx, mesh, sz=nzb + 2,
                                              gz=nzb + 1, block_k=2)
        sds = [
            jax.ShapeDtypeStruct((ns, ctx.nxe, ctx.nze), jnp.float32,
                                 sharding=NamedSharding(mesh, P("shot", "x"))),
            jax.ShapeDtypeStruct((ns,), jnp.int32,
                                 sharding=NamedSharding(mesh, P("shot"))),
            jax.ShapeDtypeStruct((ctx.nt,), jnp.float32,
                                 sharding=NamedSharding(mesh, P())),
            jax.ShapeDtypeStruct((ns, ctx.nxe, ctx.nt), jnp.float32,
                                 sharding=NamedSharding(mesh, P("shot", "x"))),
        ]
        jax.jit(fn).lower(*sds).compile()


    def test_domain2d_rtm_8chip(self, rng_mod):
        """AOT-compile the shot + 2D (x, z)-domain blocked-Pallas RTM
        (per-axis ppermute halo exchange, dynamic-sublane acquisition rows)
        for a 2x2x2 mesh on a v5e 2x4 slice — the pod-scale tier's real
        TPU lowering."""
        try:
            from jax.experimental import topologies
            topo = topologies.get_topology_desc("v5e:2x4x1", "tpu")
        except Exception as e:
            pytest.skip(f"TPU AOT topology unavailable: {e}")
        from jax.sharding import NamedSharding, PartitionSpec as P
        from parallel_finite_difference_computation_tpu.parallel import (
            make_mesh)
        from parallel_finite_difference_computation_tpu.parallel.\
            domain2d_pallas import make_sharded_rtm_snapshot_2d_pallas

        mesh = make_mesh(n_shot=2, n_x=2, n_z=2,
                         devices=list(topo.devices))
        nxb = nzb = 8
        ctx = FDContext.create(32, 16, 8, dx=10.0, dz=10.0, dt=0.001,
                               order=8, nxb=nxb, nzb=nzb, fac=0.7)
        ns = 4
        fn = make_sharded_rtm_snapshot_2d_pallas(ctx, mesh, sz=nzb + 2,
                                                 gz=nzb + 1, block_k=2)
        sds = [
            jax.ShapeDtypeStruct(
                (ns, ctx.nxe, ctx.nze), jnp.float32,
                sharding=NamedSharding(mesh, P("shot", "x", "z"))),
            jax.ShapeDtypeStruct((ns,), jnp.int32,
                                 sharding=NamedSharding(mesh, P("shot"))),
            jax.ShapeDtypeStruct((ctx.nt,), jnp.float32,
                                 sharding=NamedSharding(mesh, P())),
            jax.ShapeDtypeStruct(
                (ns, ctx.nxe, ctx.nt), jnp.float32,
                sharding=NamedSharding(mesh, P("shot", "x"))),
        ]
        jax.jit(fn).lower(*sds).compile()

    def test_shot_sharded_streaming_rtm_8chip(self, rng_mod):
        """AOT-compile the shot-sharded temporally-blocked streaming RTM
        (the beyond-VMEM production tier) for all 8 chips of a v5e 2x4
        slice — shard_map around the K-step Mosaic kernels."""
        try:
            from jax.experimental import topologies
            topo = topologies.get_topology_desc("v5e:2x4x1", "tpu")
        except Exception as e:
            pytest.skip(f"TPU AOT topology unavailable: {e}")
        from jax.sharding import NamedSharding, PartitionSpec as P
        from parallel_finite_difference_computation_tpu.parallel import (
            make_mesh)
        from parallel_finite_difference_computation_tpu.parallel.shots \
            import make_sharded_rtm_tiled

        mesh = make_mesh(n_shot=8, devices=list(topo.devices))
        ctx = FDContext.create(268, 228, 8, dx=10.0, dz=10.0, dt=0.001,
                               order=8, nxb=16, nzb=16, fac=0.7)
        ns = 8
        fn = make_sharded_rtm_tiled(ctx, mesh, sz=18, gz=17, tile_rows=32,
                                    block_k=4)
        sds = [
            jax.ShapeDtypeStruct((ns, ctx.nxe, ctx.nze), jnp.float32,
                                 sharding=NamedSharding(mesh, P("shot"))),
            jax.ShapeDtypeStruct((ns, ctx.nx, ctx.nt), jnp.float32,
                                 sharding=NamedSharding(mesh, P("shot"))),
            jax.ShapeDtypeStruct((ns,), jnp.int32,
                                 sharding=NamedSharding(mesh, P("shot"))),
            jax.ShapeDtypeStruct((ctx.nt,), jnp.float32,
                                 sharding=NamedSharding(mesh, P())),
        ]
        jax.jit(fn).lower(*sds).compile()


class TestStreamingKernels:
    def test_fd_step_padded(self, tpu_sharding, rng_mod):
        from parallel_finite_difference_computation_tpu.ops.pallas_stream \
            import fd_step_padded
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nxe = nze = 231
        R, W, _, _ = padded_layout(nxe, nze, 8)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        mask = jnp.ones((R, W), jnp.float32)
        _aot(tpu_sharding,
             lambda p, pp, v2, m: fd_step_padded(
                 p, pp, v2, m, cx, cz, 8, nxe, nze, 1e-6), p, p, p, mask)

    def test_fd_step_padded_mxu(self, tpu_sharding, rng_mod):
        from parallel_finite_difference_computation_tpu.ops.pallas_stream \
            import fd_step_padded
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nxe, nze = 231, 260   # W = 384: middle band block present
        R, W, _, _ = padded_layout(nxe, nze, 8)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        mask = jnp.ones((R, W), jnp.float32)
        _aot(tpu_sharding,
             lambda p, pp, v2, m: fd_step_padded(
                 p, pp, v2, m, cx, cz, 8, nxe, nze, 1e-6,
                 lap_impl="mxu"), p, p, p, mask)

    @pytest.mark.parametrize("lap_impl", [None, "mxu"])
    def test_fd_kstep_padded(self, tpu_sharding, rng_mod, lap_impl):
        """The temporal-blocking modeling kernel (K=4 fused steps per HBM
        pass) compiles for a real v5e target, exact and MXU z-taps."""
        from parallel_finite_difference_computation_tpu.ops.pallas_stream \
            import (fd_kstep_padded, separable_mask_operands,
                    injection_window)
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nxe, nze = 300, 260
        tr = 32
        R, W, row0, col0 = padded_layout(nxe, nze, 8, tr)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        mrow, mzp = separable_mask_operands(
            np.ones(nxe, np.float32), np.ones(nze, np.float32),
            np.ones(nze, np.float32), 8, tr)
        inj48, win0 = injection_window(jnp.ones((7, 7), jnp.float32),
                                       row0 + 50, col0 + 30, nxe, nze, 8, tr)
        wav = jnp.asarray(rng_mod.standard_normal(4), jnp.float32)
        _aot(tpu_sharding,
             lambda p, pp, v2m, mr, mz, i48, w0, w: fd_kstep_padded(
                 p, pp, v2m, mr, mz, i48, w0, w, 20, cx, cz, 8, nxe, nze,
                 4, tr, lap_impl=lap_impl),
             p, p, p, mrow, mzp, inj48, win0, wav)

    @pytest.mark.parametrize("lap_impl", [None, "mxu"])
    def test_fd_kstep_gpu_fwd_padded(self, tpu_sharding, rng_mod, lap_impl):
        """The temporally-blocked fd_forward kernel (taper-first GPU-suite
        flavor) compiles for a real v5e target."""
        from parallel_finite_difference_computation_tpu.ops.pallas_stream \
            import (fd_kstep_gpu_fwd_padded, separable_mask_operands,
                    injection_window)
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nxe, nze = 300, 260
        tr = 32
        R, W, row0, col0 = padded_layout(nxe, nze, 8, tr)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        mrow, mzp = separable_mask_operands(
            np.ones(nxe, np.float32), np.ones(nze, np.float32),
            np.ones(nze, np.float32), 8, tr)
        inj48, win0 = injection_window(jnp.ones((1, 1), jnp.float32),
                                       row0 + 50, col0 + 30, nxe, nze, 8, tr)
        wav = jnp.asarray(rng_mod.standard_normal(4), jnp.float32)
        _aot(tpu_sharding,
             lambda p, pp, v2m, mr, mz, i48, w0, w: fd_kstep_gpu_fwd_padded(
                 p, pp, v2m, mr, mz, i48, w0, w, cx, cz, 8, nxe, nze, 4, tr,
                 lap_impl=lap_impl), p, p, p, mrow, mzp, inj48, win0, wav)

    @pytest.mark.parametrize("lap_impl", [None, "mxu"])
    def test_fd_kstep_gpu_bwd_padded(self, tpu_sharding, rng_mod, lap_impl):
        """The temporally-blocked fd_back kernel (dual-field: untapered
        source reconstruction + tapered receiver + in-kernel K5/K6)
        compiles for a real v5e target."""
        from parallel_finite_difference_computation_tpu.ops.pallas_stream \
            import fd_kstep_gpu_bwd_padded, separable_mask_operands
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nxe, nze = 300, 260
        tr = 32
        R, W, _, _ = padded_layout(nxe, nze, 8, tr)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        mrow, mzp = separable_mask_operands(
            np.ones(nxe, np.float32), np.ones(nze, np.float32),
            np.ones(nze, np.float32), 8, tr)
        sism = jnp.asarray(rng_mod.standard_normal((R, 128)), jnp.float32)
        _aot(tpu_sharding,
             lambda ps, pps, pr, ppr, v2m, mr, mz, s, im:
             fd_kstep_gpu_bwd_padded(
                 ps, pps, pr, ppr, v2m, mr, mz, s, im, 20, cx, cz, 8,
                 nxe, nze, 16, 228, 16, 268, 4, tr, lap_impl=lap_impl),
             p, p, p, p, p, mrow, mzp, sism, p)

    @pytest.mark.parametrize("column_inj", [False, True])
    def test_fd_kstep_rec_padded(self, tpu_sharding, rng_mod, column_inj):
        """The temporally-blocked wavefield-recording kernel (K tapered
        frames per HBM pass; patch and column injection modes) compiles
        for a real v5e target."""
        from parallel_finite_difference_computation_tpu.ops.pallas_stream \
            import (fd_kstep_rec_padded, separable_mask_operands,
                    injection_window)
        from parallel_finite_difference_computation_tpu.ops.pallas_stencil \
            import padded_layout
        cx, cz = numerics.scaled_coefficients(8, 10.0, 10.0)
        nxe, nze = 300, 260
        tr = 32
        R, W, row0, col0 = padded_layout(nxe, nze, 8, tr)
        p = jnp.asarray(rng_mod.standard_normal((R, W)), jnp.float32)
        mrow, mzp = separable_mask_operands(
            np.ones(nxe, np.float32), np.ones(nze, np.float32),
            np.ones(nze, np.float32), 8, tr)
        if column_inj:
            inj = jnp.asarray(rng_mod.standard_normal((R, 128)), jnp.float32)
            amp = 20
            win0 = None
        else:
            inj, win0 = injection_window(jnp.ones((7, 7), jnp.float32),
                                         row0 + 50, col0 + 30,
                                         nxe, nze, 8, tr)
            amp = jnp.asarray(rng_mod.standard_normal(4), jnp.float32)
        _aot(tpu_sharding,
             lambda p, pp, v2m, mr, mz, i: fd_kstep_rec_padded(
                 p, pp, v2m, mr, mz, i, amp, cx, cz, 8, nxe, nze, 4,
                 column_inj=column_inj, win0=win0, tile_rows=tr),
             p, p, p, mrow, mzp, inj)
