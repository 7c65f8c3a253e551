#!/usr/bin/env python
"""Multi-chip demo: shots and the grid's x axis sharded over a device mesh.

Runs on real multi-chip hardware or on virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/multichip.py

Shows the two parallelism axes the reference lacked (its domain-division
variant shipped with no decomposition; SURVEY.md §2c):
  * shot axis — embarrassingly parallel RTM shots, zero communication
  * x axis — spatial decomposition with order/2-wide ppermute halo
    exchanges each time step
and checks the sharded image against the single-device result.
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from parallel_finite_difference_computation_tpu import numerics
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, rtm_shot_snapshot)
from parallel_finite_difference_computation_tpu.parallel import (
    make_mesh, make_sharded_rtm_snapshot, embed_source_fields, embed_dobs)
from parallel_finite_difference_computation_tpu.models import layered_model


def main():
    n_dev = len(jax.devices())
    n_shot, n_x = (2, n_dev // 2) if n_dev >= 4 and n_dev % 2 == 0 else (1, n_dev)
    mesh = make_mesh(n_shot=n_shot, n_x=n_x)
    print(f"devices: {n_dev} ({jax.devices()[0].platform}), "
          f"mesh: shot={n_shot} x x={n_x}")

    # grid sized so nxe divides the x shards
    nxb = nzb = 8
    nx = n_x * 16 - 2 * nxb
    nz, nt, ns = 48, 64, 2 * n_shot
    ctx = FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                           order=8, nxb=nxb, nzb=nzb, fac=0.7)
    vp = layered_model(nx, nz, (1800.0, 2600.0))
    v2 = np.zeros((ctx.nxe, ctx.nze), np.float32)
    v2[nxb:nxb + nx, nzb:nzb + nz] = vp * vp
    v2 = numerics.extendvel_clamp(v2, nx, nz, nxb, nzb)
    v2s = np.broadcast_to(v2, (ns,) + v2.shape).copy()

    rng = np.random.default_rng(0)
    sxs = [nxb + 4 + 3 * i for i in range(ns)]
    sz = gz = nzb + 1
    wav = jnp.asarray(numerics.ricker_wavelet(nt, 0.001, 25.0))
    dobs = rng.standard_normal((ns, nx, nt)).astype(np.float32)

    fn = make_sharded_rtm_snapshot(ctx, mesh, gz=gz)
    srcf = embed_source_fields(ctx, sxs, sz, gaussian=False)
    t0 = time.time()
    im_ext = np.asarray(fn(v2s, srcf, wav, embed_dobs(ctx, dobs)))
    print(f"sharded RTM of {ns} shots on the mesh: {time.time() - t0:.2f}s "
          f"(incl. compile)")
    got = im_ext[:, nxb:ctx.nxe - nxb, nzb:ctx.nze - nzb]

    ref = np.stack([
        np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2s[i]), wav,
                                     jnp.asarray(dobs[i]), sxs[i], sz, gz))
        for i in range(ns)])
    err = np.abs(got - ref).max() / (np.abs(ref).max() or 1.0)
    print(f"sharded vs single-device max rel err: {err:.2e}")
    assert err < 1e-4

    # the fused production path: blocked VMEM Pallas kernels exchanging
    # K*order/2-wide halos once per K steps (interpret mode off-TPU)
    from parallel_finite_difference_computation_tpu.parallel.domain_pallas \
        import make_sharded_rtm_snapshot_pallas
    on_tpu = jax.devices()[0].platform == "tpu"
    fn_blk = make_sharded_rtm_snapshot_pallas(ctx, mesh, sz, gz, block_k=2,
                                              interpret=not on_tpu)
    t0 = time.time()
    im_blk = np.asarray(fn_blk(v2s, np.asarray(sxs, np.int32), wav,
                               embed_dobs(ctx, dobs)))
    got_blk = im_blk[:, nxb:ctx.nxe - nxb, nzb:ctx.nze - nzb]
    err_blk = np.abs(got_blk - ref).max() / (np.abs(ref).max() or 1.0)
    print(f"blocked-Pallas domain path: {time.time() - t0:.2f}s, "
          f"max rel err {err_blk:.2e}")
    assert err_blk < 1e-4

    # the shot-sharded temporally-blocked streaming tier — the multi-chip
    # path for grids beyond any chip's VMEM (each device streams its local
    # shots through K-step HBM-pass kernels, no inter-device communication)
    from parallel_finite_difference_computation_tpu.parallel import (
        make_sharded_rtm_tiled, make_mesh as _mk)
    mesh_s = _mk(n_shot=n_dev, n_x=1)
    ns_s = n_dev
    v2_s = np.broadcast_to(v2, (ns_s,) + v2.shape).copy()
    sxs_s = np.asarray([nxb + 4 + i for i in range(ns_s)], np.int32)
    dobs_s = rng.standard_normal((ns_s, nx, nt)).astype(np.float32)
    fn_t = make_sharded_rtm_tiled(ctx, mesh_s, sz, gz, tile_rows=16,
                                  block_k=4, interpret=not on_tpu)
    t0 = time.time()
    im_t = np.asarray(fn_t(v2_s, dobs_s, sxs_s, wav))
    ref0 = np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2_s[0]), wav,
                                        jnp.asarray(dobs_s[0]),
                                        int(sxs_s[0]), sz, gz))
    err_t = np.abs(im_t[0] - ref0).max() / (np.abs(ref0).max() or 1.0)
    print(f"shot-sharded streaming tier ({ns_s} shots): "
          f"{time.time() - t0:.2f}s, max rel err {err_t:.2e}")
    assert err_t < 1e-4
    print("OK — halo exchange, shot sharding, and the sharded streaming "
          "tier agree with single-device")


if __name__ == "__main__":
    main()
