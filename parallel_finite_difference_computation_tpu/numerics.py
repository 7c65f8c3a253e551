"""Pure host-side numerics: FD coefficients, wavelets, taper profiles.

TPU-first rebuild of the reference's numerics/setup layer:

* FD coefficients — ``calc_coefs``/``makeo2``
  (``cuda_reference_RTM/lib/src/functions.c:78-157``)
* Ricker wavelet, plain and truncated variants
  (``functions.c:267-299``; ``dpct_gpu_rtm_domain_division/src/source/ptsrc.c:88-99``)
* Absorbing-taper profiles, exact and ``fac``-scaled variants
  (``functions.c:361-379``; ``.../src/boundary/taper.c:25-45``)
* Full-grid taper masks replacing the strip/corner taper kernels
  (``kernel_tapper`` at ``fd-code.cu:94-117``; ``taper_apply``/``taper_apply2``
  at ``taper.c:47-84``) — on TPU a precomputed mask multiply fuses into the
  time-step update, so the taper costs nothing extra.
* Velocity-model extension: deterministic clamp (``taper.c:7-23``) and the
  random linear-ramp boundary (``functions.c:301-359``), the latter rebuilt on
  ``jax.random`` (reproducible, device-side) instead of glibc ``rand()``.
* Gaussian point-source stencil (``ptsrc.c:51-57``).

Everything here returns float32 numpy arrays; intermediate math follows the
reference's C evaluation (float storage, double transcendentals) closely
enough for <=1e-6 agreement.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "fd_coefficients", "scaled_coefficients",
    "ricker", "ricker_wavelet",
    "taper_profile", "taper_mask_top", "taper_mask_all",
    "extendvel_clamp", "extendvel_random",
    "gaussian_source_patch",
]

_F = np.float32


# --------------------------------------------------------------------------
# FD coefficients
# --------------------------------------------------------------------------

def _makeo2(order: int) -> np.ndarray:
    """Arbitrary even-order 2nd-derivative coefficients with a Hamming-style
    window (reference ``makeo2``, ``functions.c:125-157``)."""
    coef = np.zeros(order + 1, dtype=_F)
    alpha = 0.54
    beta = 6.0
    h_beta = 0.5 * beta
    alpha1 = 2.0 * alpha - 1.0
    alpha2 = 2.0 * (1.0 - alpha)
    central = _F(0.0)
    msign = -1
    half = order // 2
    for ix in range(1, half + 1):
        msign = -msign
        coef_filt = _F((2.0 * msign) / (ix * ix))
        arg = np.pi * ix / (2.0 * (half + 2))
        coef_wind = _F(np.power(alpha1 + alpha2 * np.cos(arg) ** 2, h_beta))
        coef[half + ix] = _F(coef_filt * coef_wind)
        central = _F(central + coef[half + ix])
        coef[half - ix] = coef[half + ix]
    coef[half] = _F(-2.0 * central)
    return coef


def fd_coefficients(order: int) -> np.ndarray:
    """Central-difference 2nd-derivative coefficients of length ``order+1``.

    Orders 2/4/6/8 use the closed-form tables (``functions.c:85-117``);
    other even orders use the windowed ``makeo2`` construction.
    """
    if order == 2:
        vals = [1.0, -2.0, 1.0]
    elif order == 4:
        vals = [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12]
    elif order == 6:
        vals = [1 / 90, -3 / 20, 3 / 2, -49 / 18, 3 / 2, -3 / 20, 1 / 90]
    elif order == 8:
        vals = [-1 / 560, 8 / 315, -1 / 5, 8 / 5, -205 / 72,
                8 / 5, -1 / 5, 8 / 315, -1 / 560]
    else:
        if order < 2 or order % 2:
            raise ValueError(f"FD order must be even and >= 2, got {order}")
        return _makeo2(order)
    return np.asarray(vals, dtype=_F)


def scaled_coefficients(order: int, dx: float, dz: float):
    """Coefficients premultiplied by 1/dx^2 and 1/dz^2 (``fd-code.cu:203-217``).

    Returns ``(coefs_x, coefs_z)`` float32 arrays of length ``order+1``.
    """
    c = fd_coefficients(order)
    dx2inv = _F(1.0 / _F(dx)) * _F(1.0 / _F(dx))
    dz2inv = _F(1.0 / _F(dz)) * _F(1.0 / _F(dz))
    return (c * dx2inv).astype(_F), (c * dz2inv).astype(_F)


# --------------------------------------------------------------------------
# Source wavelets
# --------------------------------------------------------------------------

def ricker(t, fpeak: float):
    """Ricker wavelet value(s) at time ``t`` (``functions.c:267-291``)."""
    x = np.float64(np.pi) * np.float64(fpeak) * np.float64(t)
    xx = _F(x) * _F(x)  # C stores x, xx as float
    return _F(np.exp(-np.float64(xx)) * (1.0 - 2.0 * np.float64(xx)))


def ricker_wavelet(nt: int, dt: float, fpeak: float,
                   truncated: bool = False) -> np.ndarray:
    """Sampled causal Ricker wavelet of length ``nt``.

    ``truncated=False``: GPU-suite variant, ``s[it]=ricker(it*dt - 1/fpeak)``
    (``functions.c:293-299``).
    ``truncated=True``: CPU-pipeline variant that zeroes ``t > 2/fpeak``
    (``ptsrc.c:88-99``).
    """
    it = np.arange(nt, dtype=np.float64)
    tg = _F(it * _F(dt))  # it*dt evaluated in float, like the C code
    t = np.float64(tg) - 1.0 / np.float64(fpeak)
    x = _F(np.float64(np.pi) * np.float64(fpeak) * t)
    xx = (x * x).astype(_F)
    s = (np.exp(-np.float64(xx)) * (1.0 - 2.0 * np.float64(xx))).astype(_F)
    if truncated:
        s = np.where(np.float64(tg) > 2.0 / np.float64(fpeak), _F(0.0), s)
    return s.astype(_F)


# --------------------------------------------------------------------------
# Absorbing taper
# --------------------------------------------------------------------------

def taper_profile(nb: int, fac: float, exact: bool = True) -> np.ndarray:
    """1D taper ramp of length ``nb`` increasing toward 1 at the interior.

    ``exact=True``: ``exp(-((sqrt(-ln fac)/nb)*(nb-i))^2)``
    (``functions.c:361-379``), so the outermost sample damps to ``fac``.
    ``exact=False``: the divergent CPU variant ``exp(-((fac*(nb-i))^2))``
    (``taper.c:25-45``), used by mod_main/rtm_main with ``fac=0.01``-style
    values.
    """
    i = np.arange(nb, dtype=np.float64)
    if exact:
        dfrac = _F(np.sqrt(-np.log(np.float64(fac))) / (1.0 * nb))
        w = np.exp(-((np.float64(dfrac) * (nb - i)) ** 2))
    else:
        w = np.exp(-((np.float64(fac) * (nb - i)) ** 2))
    return w.astype(_F)


def _edge_ramp(n_ext: int, nb: int, w: np.ndarray, both: bool) -> np.ndarray:
    """1D multiplier over an extended axis: ``w`` on the leading border,
    mirrored ``w`` on the trailing border when ``both``, 1 in the interior."""
    r = np.ones(n_ext, dtype=_F)
    r[:nb] = w
    if both:
        r[n_ext - nb:] = w[::-1]
    return r


def taper_mask_top(nxe: int, nze: int, nxb: int, nzb: int,
                   taperx: np.ndarray, taperz: np.ndarray) -> np.ndarray:
    """Full-grid multiplier equal to applying ``kernel_tapper``
    (``fd-code.cu:94-117``) / ``taper_apply2`` (``taper.c:69-84``):
    the *top strip* ``j < nzb`` is damped by ``taperz[j]`` for every x, and
    additionally by ``taperx`` in the two top corners (left columns and
    mirrored right columns). Rows ``j >= nzb`` are untouched.
    """
    m = np.ones((nxe, nze), dtype=_F)
    tx = _edge_ramp(nxe, nxb, taperx, both=True)
    m[:, :nzb] = np.float32(tx[:, None]) * taperz[None, :]
    return m


def taper_mask_all(nxe: int, nze: int, nxb: int, nzb: int,
                   taperx: np.ndarray, taperz: np.ndarray) -> np.ndarray:
    """Full-grid multiplier equal to ``taper_apply`` (``taper.c:47-67``):
    all four edges damped by the separable outer product of the x and z edge
    ramps over the whole extended grid."""
    tx = _edge_ramp(nxe, nxb, taperx, both=True)
    tz = _edge_ramp(nze, nzb, taperz, both=True)
    return (tx[:, None] * tz[None, :]).astype(_F)


# --------------------------------------------------------------------------
# Velocity-model extension
# --------------------------------------------------------------------------

def extendvel_clamp(vel_ext: np.ndarray, nx: int, nz: int,
                    nxb: int, nzb: int) -> np.ndarray:
    """Deterministic clamp-pad extension (``taper.c:7-23``).

    ``vel_ext`` is an (nxe, nze) array whose interior block
    ``[nxb:nxb+nx, nzb:nzb+nz]`` is already filled; borders are filled by
    edge replication: first z (top/bottom rows per interior column), then x
    (whole columns, replicating the already-z-extended edge columns).
    Returns a new array.
    """
    v = np.array(vel_ext, dtype=_F, copy=True)
    # z-direction for interior columns
    v[nxb:nxb + nx, :nzb] = v[nxb:nxb + nx, nzb:nzb + 1]
    v[nxb:nxb + nx, nzb + nz:] = v[nxb:nxb + nx, nzb + nz - 1:nzb + nz]
    # x-direction over the full z range
    v[:nxb, :] = v[nxb:nxb + 1, :]
    v[nxb + nx:, :] = v[nxb + nx - 1:nxb + nx, :]
    return v


def extendvel_random(vel_ext: np.ndarray, nx: int, nz: int,
                     nxb: int, nzb: int, seed: int = 0,
                     l_lim: float = 300.0, delta: float = 200.0) -> np.ndarray:
    """Random linear-ramp boundary extension (``functions.c:301-359``).

    The interior block of ``vel_ext`` must be filled. The top border clamps;
    the bottom/left/right borders ramp linearly from the edge velocity toward
    ``l_lim`` with uniform random perturbations of width ``±delta`` — the
    "random boundary condition" that makes border reflections incoherent and
    enables two-snapshot wavefield reconstruction in the backward pass.

    glibc ``rand()`` is unreproducible here by design; we use a numpy
    Generator seeded by ``seed`` (per-shot seeds give per-shot borders like
    the reference's per-shot ``extendvel_linear`` calls at
    ``fd-code.cu:486``). Bit-parity runs use ``vel_ext_file`` instead,
    mirroring the reference's own parity path (``fd-code.cu:483-484``).
    """
    rng = np.random.default_rng(seed)
    v = np.array(vel_ext, dtype=_F, copy=True)

    def runi(lo, hi, shape=()):
        # rand() % (int)(hi - lo + 1) + lo  -> uniform integers in [lo, hi]
        span = np.maximum(np.asarray(hi - lo + 1.0, dtype=np.float64), 1.0)
        r = rng.random(np.broadcast_shapes(np.shape(span), shape))
        return (np.floor(r * span) + lo).astype(_F)

    # top border: clamp to first interior row (functions.c:309)
    v[nxb:nxb + nx, :nzb] = v[nxb:nxb + nx, nzb:nzb + 1]

    # bottom border: ramp from bottom-edge velocity toward l_lim
    iz = np.arange(nzb, dtype=np.float64)
    vbot = v[nxb:nxb + nx, nzb + nz - 1].astype(np.float64)[:, None]
    v_ave = vbot - (vbot - l_lim) * iz[None, :] / (nzb - 1)
    v[nxb:nxb + nx, nzb + nz:] = runi(v_ave - delta, vbot + delta, (nx, nzb))

    # left/right borders: ramp outward from the edge interior columns
    ix = np.arange(nxb, dtype=np.float64)
    vl = v[nxb, nzb:nzb + nz].astype(np.float64)[None, :]
    v_ave = vl - (vl - l_lim) * ix[:, None] / (nxb - 1)
    # left fills columns nxb-1-ix (outward), right fills nxb+nx+ix
    left = runi(v_ave - delta, vl + delta, (nxb, nz))
    v[:nxb, nzb:nzb + nz] = left[::-1, :]
    vr = v[nxb + nx - 1, nzb:nzb + nz].astype(np.float64)[None, :]
    v_ave = vr - (vr - l_lim) * ix[:, None] / (nxb - 1)
    v[nxb + nx:, nzb:nzb + nz] = runi(v_ave - delta, vr + delta, (nxb, nz))

    # top corners: clamp horizontally (functions.c:333-338)
    v[:nxb, :nzb] = v[nxb:nxb + 1, :nzb]
    v[nxb + nx:, :nzb] = v[nxb + nx - 1:nxb + nx, :nzb]

    # bottom corners: randomized triangular fill toward the corner
    vbl = np.float64(v[nxb, nzb + nz - 1])
    vbr = np.float64(v[nxb + nx - 1, nzb + nz - 1])
    for izc in range(nzb):
        for ixc in range(izc + 1):
            va = vbl - (vbl - l_lim) * (nxb - 1 - ixc) / (nzb - 1)
            v[ixc, nz + 2 * nzb - 1 - izc] = runi(va - delta, vbl + delta)
            v[izc, nz + 2 * nzb - 1 - ixc] = runi(va - delta, vbl + delta)
            va = vbr - (vbr - l_lim) * (nxb - 1 - ixc) / (nzb - 1)
            v[nx + 2 * nxb - 1 - ixc, nz + 2 * nzb - 1 - izc] = runi(va - delta, vbr + delta)
            v[nx + 2 * nxb - 1 - izc, nz + 2 * nzb - 1 - ixc] = runi(va - delta, vbr + delta)
    return v


def extendvel_random_jax(vel_ext, nx: int, nz: int, nxb: int, nzb: int,
                         key, l_lim: float = 300.0, delta: float = 200.0):
    """On-device random linear-ramp boundary extension — the jittable,
    vmappable counterpart of :func:`extendvel_random` (``functions.c:
    301-359`` semantics, ``jax.random`` bits). Per-shot boundary generation
    under ``vmap``/shot-sharding runs entirely on device, with no per-shot
    host step — the scaling the reference addresses with its precomputed
    ``vel_ext_file`` (``fd-code.cu:412-418``).

    ``vel_ext`` is the (nxe, nze) extended grid with the interior filled;
    ``nx``..``nzb`` must be static under jit. Returns the extended grid.

    The bottom-corner triangular double-loop (``functions.c:340-358``) is
    vectorized: cell (a, d) of the corner block takes its ramp value from
    ``min(a, d)`` (the second write of the pair overwrites the diagonal),
    which reproduces the loop's final state with one masked fill.
    """
    import jax
    import jax.numpy as jnp

    v = jnp.asarray(vel_ext, jnp.float32)
    nxe, nze = nx + 2 * nxb, nz + 2 * nzb
    keys = jax.random.split(key, 5)

    def runi(k, lo, hi, shape):
        # rand() % (int)(hi - lo + 1) + lo -> uniform integers in [lo, hi]
        span = jnp.maximum(hi - lo + 1.0, 1.0)
        r = jax.random.uniform(k, shape, jnp.float32)
        return jnp.floor(r * span) + lo

    # top border: clamp to the first interior row
    v = v.at[nxb:nxb + nx, :nzb].set(v[nxb:nxb + nx, nzb:nzb + 1])

    # bottom border: ramp from the bottom-edge velocity toward l_lim
    iz = jnp.arange(nzb, dtype=jnp.float32)
    vbot = v[nxb:nxb + nx, nzb + nz - 1][:, None]
    v_ave = vbot - (vbot - l_lim) * iz[None, :] / (nzb - 1)
    v = v.at[nxb:nxb + nx, nzb + nz:].set(
        runi(keys[0], v_ave - delta, vbot + delta, (nx, nzb)))

    # left/right borders: ramp outward from the edge interior columns
    ix = jnp.arange(nxb, dtype=jnp.float32)
    vl = v[nxb, nzb:nzb + nz][None, :]
    v_ave = vl - (vl - l_lim) * ix[:, None] / (nxb - 1)
    left = runi(keys[1], v_ave - delta, vl + delta, (nxb, nz))
    v = v.at[:nxb, nzb:nzb + nz].set(left[::-1, :])
    vr = v[nxb + nx - 1, nzb:nzb + nz][None, :]
    v_ave = vr - (vr - l_lim) * ix[:, None] / (nxb - 1)
    v = v.at[nxb + nx:, nzb:nzb + nz].set(
        runi(keys[2], v_ave - delta, vr + delta, (nxb, nz)))

    # top corners: clamp horizontally
    v = v.at[:nxb, :nzb].set(v[nxb:nxb + 1, :nzb])
    v = v.at[nxb + nx:, :nzb].set(v[nxb + nx - 1:nxb + nx, :nzb])

    # bottom corners: min(a, d)-ramped randomized triangular fill
    a = jnp.arange(nzb)[:, None]            # corner-block x offset
    d = jnp.arange(nzb)[None, :]            # offset from the bottom edge
    m = jnp.minimum(a, d).astype(jnp.float32)
    vbl = v[nxb, nzb + nz - 1]
    va = vbl - (vbl - l_lim) * (nxb - 1 - m) / (nzb - 1)
    blk = runi(keys[3], va - delta, vbl + delta, (nzb, nzb))
    v = v.at[:nzb, nze - nzb:].set(blk[:, ::-1])
    vbr = v[nxb + nx - 1, nzb + nz - 1]
    va = vbr - (vbr - l_lim) * (nxb - 1 - m) / (nzb - 1)
    blk = runi(keys[4], va - delta, vbr + delta, (nzb, nzb))
    v = v.at[nxe - nzb:, nze - nzb:].set(blk[::-1, ::-1])
    return v


# --------------------------------------------------------------------------
# Sources
# --------------------------------------------------------------------------

def gaussian_source_patch(radius: int = 3) -> np.ndarray:
    """(2r+1, 2r+1) Gaussian injection patch ``exp(-dx^2-dz^2)``
    (``ptsrc.c:51-57``). The wavelet amplitude multiplies this patch at the
    source location each step."""
    d = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(d[:, None] ** 2) - (d[None, :] ** 2))
    return g.astype(_F)
