"""Raw binary and text I/O for velocity models, shot gathers, and images.

Replaces the reference's direct ``fread``/``fwrite`` of x-major float32
blocks (e.g. velocity load at ``cuda_reference_RTM/src/fd-code.cu:437-449``,
observed-data load at ``:420-424``, image dump at ``:540``) and the
``image.num`` text observability dump (``:478-479,522-528``).

All 2D arrays are (nx, nz) C-order float32 — identical byte layout to the
reference's ``p[ix][iz]`` row-pointer arrays, so files interchange verbatim.
A native C++ fast path (``native/``) is used for the large text dump when
available; see :mod:`..utils.native`.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

__all__ = [
    "read_f32", "write_f32",
    "read_velocity", "read_shot_gathers", "read_vel_ext",
    "write_image", "write_image_num", "read_image_num",
]


def read_f32(path: str, count: int = -1) -> np.ndarray:
    if path is None:
        raise ValueError(
            "no file path given (the config is missing a required key, "
            "e.g. 'datfile' for RTM or 'vpfile' for modeling)")
    return np.fromfile(path, dtype=np.float32, count=count)


def write_f32(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.ascontiguousarray(arr, dtype=np.float32).tofile(path)


def _zero_fill(flat: np.ndarray, n: int, path: str, what: str):
    """Reference ``memset``-then-``fread`` semantics: short files read as
    zero — but warn, so a wrong-dims config cannot run silently on
    truncated data (the reference would)."""
    if flat.size < n:
        warnings.warn(
            f"{what} {path!r} holds {flat.size} float32 values but the "
            f"config implies {n}; zero-filling the tail (check nx/nz/nt/ns)",
            stacklevel=3)
        flat = np.concatenate([flat, np.zeros(n - flat.size, np.float32)])
    return flat


def read_velocity(path: str, nx: int, nz: int) -> np.ndarray:
    """(nx, nz) velocity model, x-major like ``vp[ix][iz]``
    (``fd-code.cu:437-441``). Missing trailing data reads as zero, matching
    the reference's memset-then-fread pattern (with a size warning)."""
    return _zero_fill(read_f32(path, nx * nz), nx * nz, path,
                      "velocity file").reshape(nx, nz)


def read_shot_gathers(path: str, ns: int, nx: int, nt: int) -> np.ndarray:
    """(ns, nx, nt) observed data ``d_obs[is][ix][it]`` (``fd-code.cu:420-424``)."""
    return _zero_fill(read_f32(path, ns * nx * nt), ns * nx * nt, path,
                      "shot-gather file").reshape(ns, nx, nt)


def read_vel_ext(path: str, ns: int, nxe: int, nze: int) -> np.ndarray:
    """(ns, nxe, nze) pre-extended per-shot velocity (``fd-code.cu:412-418``)."""
    return _zero_fill(read_f32(path, ns * nxe * nze), ns * nxe * nze, path,
                      "vel_ext file").reshape(ns, nxe, nze)


def write_image(path: str, img: np.ndarray) -> None:
    """Binary stacked image ``dir.image`` — (nx, nz) float32 row-major,
    byte-identical to ``fwrite(*img, ..., nz*nx)`` (``fd-code.cu:540``)."""
    write_f32(path, img)


def write_image_num(path: str, per_shot_cumulative: list, fmt: str = " %f \n") -> None:
    """Text observability dump compatible with ``image.num``
    (``fd-code.cu:522-528``): per shot, a ``======== <is> ========`` header
    followed by the cumulative stacked image, one ``" %f \\n"`` value per
    line. The reference iterates iz outer / ix inner, i.e. column-major
    over the (nx, nz) image — hence the Fortran-order ravel.
    """
    if fmt == " %f \n":  # the native fast path hardcodes the default format
        try:
            from .utils.native import write_image_num_native
            if write_image_num_native(path, per_shot_cumulative):
                return
        except Exception:
            pass
    with open(path, "w") as f:
        for i, img in enumerate(per_shot_cumulative):
            f.write(f"======== {i} ========\n")
            flat = np.asarray(img, dtype=np.float32).ravel(order="F")
            f.write("".join(fmt % v for v in flat))


def read_image_num(path: str):
    """Parse an ``image.num`` file back into a list of (flat) float arrays."""
    sections, cur = [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("========"):
                if cur:
                    sections.append(np.asarray(cur, np.float32))
                cur = []
            else:
                s = line.strip()
                if s:
                    cur.append(float(s))
    if cur:
        sections.append(np.asarray(cur, np.float32))
    return sections
