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

__all__ = ["distribute_shots", "pad_shots"]


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
