"""ctypes bindings to the native C++ runtime helpers (``native/``).

Builds ``libpfdc_native.so`` on demand with the repo Makefile (g++; no
pybind11 in this environment) and falls back to pure numpy implementations
when the toolchain is unavailable — every entry point here has a Python
fallback in :mod:`.compare` / :mod:`..io`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libpfdc_native.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO_PATH)
            lib.pfdc_write_image_num_section.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.pfdc_write_image_num_section.restype = ctypes.c_int
            lib.pfdc_rmse_psnr.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double)]
            lib.pfdc_rmse_psnr.restype = ctypes.c_int
            lib.pfdc_laplace_filter.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float]
            lib.pfdc_laplace_filter.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_image_num_native(path: str, sections) -> bool:
    """Write an image.num-compatible dump via the native fast path.
    Returns False (caller falls back) if the library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    for i, img in enumerate(sections):
        # reference emission order is iz outer / ix inner (fd-code.cu:522)
        flat = np.asarray(img, dtype=np.float32).ravel(order="F").copy()
        rc = lib.pfdc_write_image_num_section(
            path.encode(), 1 if i else 0, i, _fptr(flat), flat.size)
        if rc:
            return False
    return True


def rmse_psnr_native(a: np.ndarray, b: np.ndarray):
    """Native RMSE/PSNR, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32).ravel()
    b = np.ascontiguousarray(b, np.float32).ravel()
    n = min(a.size, b.size)
    r, p = ctypes.c_double(), ctypes.c_double()
    if lib.pfdc_rmse_psnr(_fptr(a), _fptr(b), n,
                          ctypes.byref(r), ctypes.byref(p)):
        return None
    return r.value, p.value


def laplace_filter_native(img: np.ndarray, dx: float, dz: float):
    """Native Laplacian sharpening filter, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    out = np.zeros_like(img)
    if lib.pfdc_laplace_filter(_fptr(img), _fptr(out),
                               img.shape[0], img.shape[1],
                               np.float32(dx), np.float32(dz)):
        return None
    return out
