"""Velocity models: reference loaders and synthetic generators.

The reference ships four model configs (``cuda_reference_RTM/models/``:
1lay_mod, 3lay_mod, marmousi, new_mod; plus the runnable CPU golden set at
``dpct_gpu_rtm_domain_division/build/3lay_mod``). This registry exposes them
by name when a reference checkout is available, and provides synthetic
equivalents for tests and benchmarks.
"""

from __future__ import annotations

import os
import numpy as np

from .. import io
from ..config import parse_input_dat, Params

__all__ = ["layered_model", "constant_model", "load_reference_model",
           "REFERENCE_MODELS"]

# name -> (subpath of a reference checkout, model file, nx, nz)
REFERENCE_MODELS = {
    "1lay_mod": ("cuda_reference_RTM/models/1lay_mod", "vp_101x201.bin", 201, 101),
    "3lay_mod": ("cuda_reference_RTM/models/3lay_mod", "3layer_151x151.bin", 151, 151),
    "marmousi": ("cuda_reference_RTM/models/marmousi", "model-375.cwp", 369, 375),
    "new_mod": ("cuda_reference_RTM/models/new_mod", "vel-koslov.1", 315, 195),
    "3lay_cpu": ("dpct_gpu_rtm_domain_division/build/3lay_mod",
                 "3layer_151x151.bin", 151, 151),
    "1lay_cpu": ("dpct_gpu_rtm_domain_division/build/1lay_mod",
                 "vp_101x201.bin", 201, 101),
    # subsampled Pluto model (build/spluto: 367x351, dx=25 != dz=10); the
    # full-resolution ``build/pluto`` config is not loadable — its
    # pluto-m.bin (1201x6960) is gitignored upstream and absent
    "spluto": ("dpct_gpu_rtm_domain_division/build/spluto",
               "pluto.bin", 367, 351),
}


def constant_model(nx: int, nz: int, v: float = 2000.0) -> np.ndarray:
    return np.full((nx, nz), v, dtype=np.float32)


def layered_model(nx: int, nz: int, velocities=(1500.0, 2500.0, 3500.0),
                  interfaces=None) -> np.ndarray:
    """Horizontally layered (nx, nz) model; default equal-thickness layers —
    a synthetic stand-in for the reference's 3layer_151x151.bin."""
    n = len(velocities)
    if interfaces is None:
        interfaces = [nz * (i + 1) // n for i in range(n - 1)]
    vp = np.empty((nx, nz), dtype=np.float32)
    z0 = 0
    for v, z1 in zip(velocities, list(interfaces) + [nz]):
        vp[:, z0:z1] = v
        z0 = z1
    return vp


def load_reference_model(name: str, reference_root: str = "/root/reference"):
    """Load a reference model by name. Returns ``(params, vp)`` with vp
    shaped (nx, nz). Raises FileNotFoundError if the checkout or blob is
    absent (tests skip in that case)."""
    sub, fname, nx, nz = REFERENCE_MODELS[name]
    d = os.path.join(reference_root, sub)
    cfg = os.path.join(d, "input.dat")
    p = parse_input_dat(cfg) if os.path.exists(cfg) else Params(nx=nx, nz=nz)
    # missing keys parse as -1 (truthy), so guard explicitly
    nx_eff = p.nx if p.nx > 0 else nx
    nz_eff = p.nz if p.nz > 0 else nz
    vp = io.read_velocity(os.path.join(d, fname), nx_eff, nz_eff)
    return p, vp
