"""Shot parallelism: distribute independent shots across mesh devices.

The reference runs shots serially (``cuda_reference_RTM/src/fd-code.cu:480``)
even though they are independent given per-shot boundary velocities. Here a
shot-batched computation (vmap over the leading shot axis) is partitioned
over the mesh's ``shot`` axis purely by sharding annotations — XLA inserts
no communication until the caller stacks the per-shot images (a psum-like
reduction it also places automatically). Multi-slice deployments put the
``shot`` axis on DCN (shots never exchange halos) and keep the ``x`` axis
(:mod:`.domain`) on ICI.
"""

from __future__ import annotations

import jax

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["distribute_shots", "pad_shots", "make_sharded_rtm_pallas",
           "make_sharded_modeling_pallas", "make_sharded_modeling_tiled",
           "make_sharded_rtm_tiled", "make_sharded_rtm_full_tiled"]


def pad_shots(arr: np.ndarray, n_devices: int):
    """Pad the leading (shot) axis up to a multiple of ``n_devices``.
    Returns (padded, original_count)."""
    ns = arr.shape[0]
    rem = (-ns) % n_devices
    if rem:
        pad = np.zeros((rem,) + arr.shape[1:], arr.dtype)
        arr = np.concatenate([np.asarray(arr), pad], axis=0)
    return arr, ns


def distribute_shots(mesh: Mesh, *arrays):
    """Place shot-batched arrays (leading axis = shot) across the mesh's
    ``shot`` axis, replicated over ``x``. The shot count must divide the
    shot-axis size (use :func:`pad_shots`)."""
    sharding = NamedSharding(mesh, P("shot"))
    return tuple(jax.device_put(np.asarray(a), sharding) for a in arrays)


def make_sharded_rtm_pallas(ctx, mesh: Mesh, sz: int, gz: int,
                            interpret: bool = False, lap_impl=None):
    """Shot-sharded whole-shot Pallas RTM — the production multi-chip path:
    each device runs the VMEM-resident two-snapshot RTM kernel
    (:func:`..ops.pallas_fd.rtm_snapshot_pallas`) over its local slice of
    shots via ``lax.map`` (one kernel compile), with the shot axis split by
    ``shard_map`` and zero inter-device communication until the caller
    stacks the images.

    Returns ``fn(v2, dobs, sxs, wavelet) -> imlocs`` with (ns, ...) inputs,
    ns divisible by the mesh's ``shot`` size (use :func:`pad_shots`).
    """
    from ..ops.pallas_fd import rtm_snapshot_pallas

    def body(v2, dobs, sxs, wavelet):
        return jax.lax.map(
            lambda a: rtm_snapshot_pallas(ctx, a[0], wavelet, a[1], a[2],
                                          sz, gz, interpret=interpret,
                                          lap_impl=lap_impl),
            (v2, dobs, sxs))

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("shot"), P("shot"), P("shot"), P()),
        out_specs=P("shot"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_modeling_pallas(ctx, mesh: Mesh, sz: int, gz: int,
                                 interpret: bool = False, lap_impl=None):
    """Shot-sharded whole-shot Pallas forward modeling: each device runs
    the VMEM-resident fused kernel
    (:func:`..ops.pallas_fd.forward_modeling_pallas`) over its local
    shots. Returns ``fn(v2, sxs, wavelet) -> (ns, nt, nx) traces`` with
    ``v2`` replicated (the CPU pipeline shares one clamp-extended model
    across shots, ``mod_main.cpp:118-126``) and ``sxs`` sharded."""
    from ..ops.pallas_fd import forward_modeling_pallas

    def body(v2, sxs, wavelet):
        return jax.lax.map(
            lambda sx: forward_modeling_pallas(
                ctx, v2, wavelet, sx, sz, gz, source="gaussian",
                taper="all", interpret=interpret, lap_impl=lap_impl)[2],
            sxs)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("shot"), P()),
        out_specs=P("shot"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_modeling_tiled(ctx, mesh: Mesh, sz: int, gz: int,
                                tile_rows: int = 256, block_k: int = 4,
                                interpret: bool = False, lap_impl=None):
    """Shot-sharded beyond-VMEM forward modeling: each device streams its
    local shots through the temporally-blocked HBM kernels
    (:func:`...solver.forward_modeling_tiled`, K fused steps per pass) —
    the multi-chip tier for production grids (e.g. pluto 1201x6960,
    ns=30) that no chip can hold in VMEM, with zero inter-device
    communication (shots are independent)."""
    from ..solver import forward_modeling_tiled

    def body(v2, sxs, wavelet):
        return jax.lax.map(
            lambda sx: forward_modeling_tiled(
                ctx, v2, wavelet, sx, sz, gz, source="gaussian",
                tile_rows=tile_rows, block_k=block_k,
                interpret=interpret, lap_impl=lap_impl)[2],
            sxs)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("shot"), P()),
        out_specs=P("shot"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_rtm_full_tiled(ctx, mesh: Mesh, sz: int, gz: int,
                                tile_rows: int = 256, block_k: int = 4,
                                interpret: bool = False, lap_impl=None):
    """Shot-sharded beyond-VMEM FULL-WAVEFIELD RTM — the ``rtm_main``
    flavor (``dpct_gpu_rtm_domain_division/src/rtm_main.cpp:158-247``) on
    a shot mesh with the temporally-blocked streaming kernels
    (:func:`...solver.rtm_shot_full_tiled`): each device migrates its
    local shots sequentially (``lax.map``, one kernel compile), zero
    inter-device communication until the caller stacks the images.

    Returns ``fn(v2, dobs, sxs, nxts, wavelet) -> imlocs`` with ``v2``
    replicated (the CPU pipeline shares one clamp-extended model across
    shots, ``rtm_main.cpp:113-132``), ``dobs`` (ns, nx, nt) / ``sxs`` /
    ``nxts`` (the per-shot cross-shot it=0 flat-read samples,
    ``rtm_main.cpp:202``) sharded over ``shot``, ns divisible by the
    mesh's ``shot`` size (:func:`pad_shots`)."""
    from ..solver import rtm_shot_full_tiled

    def body(v2, dobs, sxs, nxts, wavelet):
        return jax.lax.map(
            lambda a: rtm_shot_full_tiled(
                ctx, v2, wavelet, a[0], a[1], sz, gz,
                next_shot_first=a[2], tile_rows=tile_rows,
                block_k=block_k, interpret=interpret, lap_impl=lap_impl),
            (dobs, sxs, nxts))

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("shot"), P("shot"), P("shot"), P()),
        out_specs=P("shot"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_rtm_tiled(ctx, mesh: Mesh, sz: int, gz: int,
                           tile_rows: int = 256, block_k: int = 4,
                           interpret: bool = False, lap_impl=None):
    """Shot-sharded beyond-VMEM two-snapshot RTM: each device runs its
    local shots through the temporally-blocked streaming kernels
    (:func:`...solver.rtm_shot_snapshot_tiled` — 2x the per-step tier at
    pluto scale). Same signature as :func:`make_sharded_rtm_pallas`
    (per-shot ``v2`` — the GPU suite's random boundaries vary by shot,
    ``fd-code.cu:442-494``)."""
    from ..solver import rtm_shot_snapshot_tiled

    def body(v2, dobs, sxs, wavelet):
        return jax.lax.map(
            lambda a: rtm_shot_snapshot_tiled(
                ctx, a[0], wavelet, a[1], a[2], sz, gz,
                tile_rows=tile_rows, block_k=block_k,
                interpret=interpret, lap_impl=lap_impl),
            (v2, dobs, sxs))

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("shot"), P("shot"), P("shot"), P()),
        out_specs=P("shot"),
        check_vma=False,
    )
    return jax.jit(sharded)
