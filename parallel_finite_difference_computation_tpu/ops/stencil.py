"""XLA-level wave-propagation ops — the reference's six device kernels.

These are the lax/jnp formulations of the kernels K1-K6
(``cuda_reference_RTM/src/fd-code.cu:53-144``), written so XLA fuses a whole
time step into a handful of HBM passes (vs the reference's 4+ kernel launches
per step). A further-fused Pallas path lives in :mod:`.pallas_fd`; both share
the interior-sum helpers here so they stay numerically identical.

Conventions: wavefields are (nx, nz) float32 where nx/nz are the *extended*
dims (reference calls them nxe/nze inside the drivers); the x axis is the
leading (sublane) axis and z the trailing (lane) axis, matching the
reference's ``p[ix][iz]`` flattening ``i*nz + j``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "laplacian_interior", "laplacian", "laplacian_full", "lap_in_kernel",
    "lap_interior_mask",
    "leapfrog", "apply_taper", "inject_point", "inject_gaussian",
    "inject_receivers", "imaging_correlation",
]


def laplacian_interior(p, coefs_x, coefs_z, order: int):
    """Order-``order`` central-difference 2D Laplacian on the interior
    ``[h:nx-h, h:nz-h]`` with premultiplied coefficients — kernel K1
    (``kernel_lap``, ``fd-code.cu:53-78``). Returns the (nx-order, nz-order)
    interior block.

    Split-axis symmetric-pair formulation: central-difference coefficients
    satisfy ``c[h-k] == c[h+k]`` *exactly* (closed-form tables and
    ``_makeo2``'s mirrored assignment, preserved by the uniform 1/dx^2
    scaling), so each axis accumulates ``sum_k c[h+k]*(m+p)`` over the
    pairs in descending k (ascending coefficient magnitude — the
    small-terms-first order) with the center tap added last, and the two
    axis accumulators are added once at the end — 3*order+3 vector
    ops/cell vs the naive 4*order+3 (27 vs 35 for order 8), measured
    ~1.3x on the VPU-issue-bound Pallas kernels.

    The per-axis accumulators mirror the reference kernel's
    ``acmz``/``acmx`` (``fd-code.cu:60-73``): with anisotropic spacing
    (marmousi dz=8, dx=25) the x coefficients are ~10x smaller than z,
    and interleaving both axes into ONE accumulator loses low bits of the
    x contribution every add — measured 1.75e-4 drift vs the C oracle
    over nt=3004 (past the 1e-4 gate) vs ~5e-6 for split-axis orders
    (scripts/exp_lap_assoc.py). Descending-k also keeps the chain's FIRST
    term on a pair slice, the layout Mosaic can ``jnp.pad`` (center-first
    chains carry a vpad offset some deployed Mosaic versions reject).
    Every tier in this package uses this exact association order so lax
    and Pallas paths stay bit-identical to each other.
    """
    nx, nz = p.shape
    h = order // 2
    c = jax.lax.slice(p, (h, h), (nx - h, nz - h))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(p, (h, h - k), (nx - h, nz - h - k))
        zp = jax.lax.slice(p, (h, h + k), (nx - h, nz - h + k))
        term = coefs_z[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + coefs_z[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(p, (h - k, h), (nx - h - k, nz - h))
        xp = jax.lax.slice(p, (h + k, h), (nx - h + k, nz - h))
        term = coefs_x[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + coefs_x[h] * c
    return accz + accx


def laplacian(p, coefs_x, coefs_z, order: int):
    """Full-grid Laplacian with zero borders. The reference's ``d_laplace``
    buffer is never written outside the interior, and the leapfrog update
    (K2) reads it over the full grid — borders are zero in practice (memset
    at ``fd-code.cu:219`` on CPU; fresh zero pages on GPU), which we make
    exact here."""
    h = order // 2
    interior = laplacian_interior(p, coefs_x, coefs_z, order)
    return jnp.pad(interior, ((h, h), (h, h)))


def laplacian_full(p, coefs_x, coefs_z, order: int):
    """Full-grid symmetric-pair Laplacian via static rolls — no pad/concat,
    so Mosaic never sees an offset-carrying ``tpu.concatenate`` (the
    merged-center accumulation gives the interior value a nonzero vpad
    offset, which some deployed Mosaic versions cannot pad). Cells within
    ``h`` of any edge read wrapped neighbours and are INVALID; callers must
    zero them, which every Pallas kernel gets for free by pre-masking its
    ``v2`` operand (:func:`lap_interior_mask`) — exact because the kernels
    consume the Laplacian only as ``v2*dt2*lap``. Interior cells see
    bit-identical operand values and association order to
    :func:`laplacian_interior` (split-axis accumulators, pairs descending,
    center last)."""
    h = order // 2
    accz = None
    for k in range(h, 0, -1):
        term = coefs_z[h + k] * (jnp.roll(p, k, 1) + jnp.roll(p, -k, 1))
        accz = term if accz is None else accz + term
    accz = accz + coefs_z[h] * p
    accx = None
    for k in range(h, 0, -1):
        term = coefs_x[h + k] * (jnp.roll(p, k, 0) + jnp.roll(p, -k, 0))
        accx = term if accx is None else accx + term
    accx = accx + coefs_x[h] * p
    return accz + accx


def _laplacian_splitzx_padded(p, coefs_x, coefs_z, order: int):
    """Default in-kernel Laplacian: the canonical split-axis symmetric-pair
    association of :func:`laplacian_interior` (bit-identical interior),
    zero-bordered via ``jnp.pad`` — see :func:`lap_in_kernel` for the
    measured slice-vs-roll lowering costs and the ``PFDC_LAP_IMPL``
    selection."""
    return jnp.pad(laplacian_interior(p, coefs_x, coefs_z, order),
                   ((order // 2,) * 2, (order // 2,) * 2))


# Process-stable snapshot of the PFDC_LAP_IMPL env knob, read ONCE at
# import. Never read os.environ inside traced code: a trace-time read is
# invisible to the jit cache key, so two traces of the same signature
# under different env values silently serve each other's compilations
# (the round-3 footgun class). A module-level snapshot keeps the knob
# while making the value process-constant — change it by restarting, or
# pass the explicit ``impl``/``lap_impl`` kwargs.
import os as _os
_ENV_LAP_IMPL = _os.environ.get("PFDC_LAP_IMPL", "padded")


def lap_in_kernel(p, coefs_x, coefs_z, order: int, impl: str = None):
    """The Laplacian formulation used inside Pallas kernels. ``impl``
    (or, when None, the import-time ``PFDC_LAP_IMPL`` snapshot
    ``_ENV_LAP_IMPL`` — never a trace-time env read) selects:

    * ``padded`` (default): :func:`_laplacian_splitzx_padded` — slice taps
      + ``jnp.pad`` zero border (the caller's v2 premask is then redundant
      but harmless). The descending-k canonical order keeps the chain's
      first term on a pair slice, the layout Mosaic pads (measured 1.28x
      the roll lowering on the whole-shot RTM kernel: 3.65 vs 4.67
      ms/shot slope — lane rolls cost rotate+select where slices are
      offset reads).
    * ``roll``: :func:`laplacian_full` — concat/pad-free static rolls;
      requires the caller's v2 premask (:func:`lap_interior_mask`). The
      escape hatch for serving stacks whose Mosaic rejects the pad
      lowering (none seen since the descending-order fix; the merged-
      center order's pad WAS rejected by the dev tunnel's Mosaic).
    """
    if (impl or _ENV_LAP_IMPL) == "roll":
        return laplacian_full(p, coefs_x, coefs_z, order)
    return _laplacian_splitzx_padded(p, coefs_x, coefs_z, order)


def lap_interior_mask(nx: int, nz: int, order: int):
    """(nx, nz) float32 numpy mask of the Laplacian interior
    ``[h:nx-h, h:nz-h]`` — multiplied into the ``v2`` kernel operand so
    ``v2m * laplacian_full(p)`` equals ``v2 * laplacian(p)`` everywhere."""
    import numpy as np
    h = order // 2
    m = np.zeros((nx, nz), np.float32)
    m[h:nx - h, h:nz - h] = 1.0
    return m


def leapfrog(p, pp, v2, lap, dt2):
    """Two-step leapfrog update ``pp' = 2p - pp + v2*dt2*lap`` over the full
    grid — kernel K2 (``kernel_time``, ``fd-code.cu:80-92``)."""
    return 2.0 * p - pp + v2 * dt2 * lap


def apply_taper(field, mask):
    """Absorbing-taper multiply — kernel K3 (``kernel_tapper``,
    ``fd-code.cu:94-117``) and the CPU ``taper_apply``/``taper_apply2``
    (``taper.c:47-84``), precomputed as a full-grid mask
    (:func:`..numerics.taper_mask_top` / ``taper_mask_all``). XLA fuses this
    multiply into the neighbouring ops, so the strip kernels' special-case
    grids are unnecessary on TPU."""
    return field * mask


def inject_point(pp, sx, sz, amp):
    """Single-cell source injection ``pp[sx, sz] += amp`` — kernel K4
    (``kernel_src``, ``fd-code.cu:119-122``). ``sx``/``sz`` may be traced."""
    return pp.at[sx, sz].add(amp)


def inject_gaussian(pp, sx, sz, amp, patch):
    """Gaussian 7x7 source injection — CPU ``ptsrc`` (``ptsrc.c:51-57``).

    ``patch`` is the (2r+1, 2r+1) Gaussian from
    :func:`..numerics.gaussian_source_patch`. The reference clips the patch
    at grid edges; with bordered grids the source is always interior, and we
    require that here (radius <= min(sx, sz, nx-1-sx, nz-1-sz))."""
    r = patch.shape[0] // 2
    sub = jax.lax.dynamic_slice(pp, (sx - r, sz - r), patch.shape)
    return jax.lax.dynamic_update_slice(pp, sub + amp * patch, (sx - r, sz - r))


def inject_receivers(ppr, dobs_t, nxb, gz):
    """Receiver-row injection for the backward pass — kernel K5
    (``kernel_sism``, ``fd-code.cu:124-131``): adds the time slice
    ``dobs_t`` (length nx-2*nxb) along depth row ``gz`` at interior x
    positions. Time reversal of the observed data is done by the caller."""
    n = dobs_t.shape[0]
    col = jax.lax.dynamic_slice(ppr, (nxb, gz), (n, 1))
    return jax.lax.dynamic_update_slice(ppr, col + dobs_t[:, None], (nxb, gz))


def imaging_correlation(imloc, p, ppr, nxb, nzb):
    """Zero-lag cross-correlation imaging condition — kernel K6
    (``kernel_img``, ``fd-code.cu:133-144``):
    ``imloc += p[interior] * ppr[interior]`` on the border-stripped grid."""
    nx, nz = p.shape
    pi = jax.lax.slice(p, (nxb, nzb), (nx - nxb, nz - nzb))
    ri = jax.lax.slice(ppr, (nxb, nzb), (nx - nxb, nz - nzb))
    return imloc + pi * ri
