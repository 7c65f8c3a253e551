"""Device-mesh construction for shot x domain parallelism.

The reference's parallelism is (a) a serial shot loop that is trivially
parallel (``cuda_reference_RTM/src/fd-code.cu:480-529``) and (b) a
domain-division variant that is named but never implemented
(``dpct_gpu_rtm_domain_division/``, see SURVEY.md §2c). Here both become mesh
axes: ``shot`` (embarrassingly parallel, image stacked with a final psum)
and ``x`` (spatial decomposition of the grid's leading axis with
order/2-wide halo exchange over ICI each step; see :mod:`.domain`).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shot_sharding"]


def make_mesh(n_shot: int = 1, n_x: int = 1, n_z: int = 1,
              devices=None) -> Mesh:
    """Build a (shot, x) mesh — or, with ``n_z > 1``, a (shot, x, z) mesh
    for the 2D grid decomposition (:mod:`.domain2d`). ``n_shot * n_x *
    n_z`` must fit in the device count (defaults to all devices)."""
    if devices is None:
        devices = jax.devices()
    n = n_shot * n_x * n_z
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    if n_z > 1:
        dev = np.asarray(devices[:n]).reshape(n_shot, n_x, n_z)
        return Mesh(dev, ("shot", "x", "z"))
    dev = np.asarray(devices[:n]).reshape(n_shot, n_x)
    return Mesh(dev, ("shot", "x"))


def shot_sharding(mesh: Mesh):
    """Sharding for (ns, ...) shot-batched arrays: split shots over the
    ``shot`` axis, replicate over ``x``."""
    return NamedSharding(mesh, P("shot"))
