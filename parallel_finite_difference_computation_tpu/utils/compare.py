"""Validation utilities: RMSE/PSNR comparison and the Laplacian image
post-filter — library replacements for the reference's prebuilt ``psnr`` ELF
(``cuda_reference_RTM/models/marmousi/psnr``) and ``laplace.f90``
(``cuda_reference_RTM/models/3lay_mod/laplace.f90``). Uses the native C++
fast path when built, numpy otherwise.
"""

from __future__ import annotations

import numpy as np

from . import native

__all__ = ["rmse", "psnr", "rmse_psnr", "rel_rms", "laplace_filter"]


def rmse(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    n = min(a.size, b.size)
    return float(np.sqrt(np.mean((a[:n] - b[:n]) ** 2)))


def rel_rms(a, b) -> float:
    """RMS of the difference relative to RMS of ``b`` — the parity gate
    metric (<= 1e-4 per BASELINE.md)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    n = min(a.size, b.size)
    return float(np.sqrt(np.mean((a[:n] - b[:n]) ** 2))
                 / np.sqrt(np.mean(b[:n] ** 2)))


def rmse_psnr(a, b):
    """(rmse, psnr) like the reference tool: ``psnr = 20 log10(peak/rmse)``
    with peak = max|a|."""
    out = native.rmse_psnr_native(np.asarray(a), np.asarray(b))
    if out is not None:
        return out
    r = rmse(a, b)
    peak = float(np.abs(np.asarray(a)).max())
    p = float("inf") if r == 0 else 20.0 * np.log10(peak / r)
    return r, p


def psnr(a, b) -> float:
    return rmse_psnr(a, b)[1]


def laplace_filter(img: np.ndarray, dx: float = 10.0,
                   dz: float = 10.0) -> np.ndarray:
    """Second-derivative sharpening of a migrated (nx, nz) image
    (``laplace.f90:25-30``): interior points get d2/dz2 + d2/dx2, borders 0.
    """
    out = native.laplace_filter_native(img, dx, dz)
    if out is not None:
        return out
    img = np.asarray(img, np.float32)
    out = np.zeros_like(img)
    i = img.astype(np.float64)
    out[1:-1, 1:-1] = (
        (i[1:-1, 2:] - 2 * i[1:-1, 1:-1] + i[1:-1, :-2]) / (dz * dz)
        + (i[2:, 1:-1] - 2 * i[1:-1, 1:-1] + i[:-2, 1:-1]) / (dx * dx)
    ).astype(np.float32)
    return out
