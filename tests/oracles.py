"""Numpy loop oracles: direct transcriptions of the reference kernels'
semantics (K1-K6, ``cuda_reference_RTM/src/fd-code.cu:53-144``; CPU
``fd_step``, ``dpct_gpu_rtm_domain_division/src/timestep/fd.c:24-46``) used
as ground truth for the JAX ops. Deliberately written as plain index loops to
mirror the kernel bodies, not vectorized."""

import numpy as np


def lap_oracle(p, coefs_x, coefs_z, order):
    """kernel_lap: interior-only Laplacian with premultiplied coefs; borders
    of the output stay zero."""
    nx, nz = p.shape
    h = order // 2
    lap = np.zeros_like(p)
    for i in range(h, nx - h):
        for j in range(h, nz - h):
            acmz = np.float32(0)
            acmx = np.float32(0)
            for io in range(order + 1):
                aux = io - h
                acmz += p[i, j + aux] * coefs_z[io]
                acmx += p[i + aux, j] * coefs_x[io]
            lap[i, j] = acmz + acmx
    return lap


def leapfrog_oracle(p, pp, v2, lap, dt2):
    """kernel_time: pp' = 2p - pp + v2*dt2*lap."""
    return (2.0 * p - pp + v2 * dt2 * lap).astype(np.float32)


def sism_oracle(ppr, dobs, nxb, nt, it, gz):
    """kernel_sism: ppr[(i+nxb), gz] += dobs[i, nt-1-it]."""
    out = ppr.copy()
    n = dobs.shape[0]
    for i in range(n):
        out[i + nxb, gz] += dobs[i, nt - 1 - it]
    return out


def img_oracle(imloc, p, ppr, nxb, nzb):
    """kernel_img: imloc += p[interior]*ppr[interior]."""
    out = imloc.copy()
    sx, sz = imloc.shape
    for i in range(sx):
        for j in range(sz):
            out[i, j] += p[i + nxb, j + nzb] * ppr[i + nxb, j + nzb]
    return out


def fd_step_oracle(p, pp, v2, coefs, dx2inv, dz2inv, dt2, order):
    """CPU fd_step (fd.c:24-46): fused Laplacian (non-premultiplied coefs)
    + leapfrog, in-place on pp."""
    nx, nz = p.shape
    h = order // 2
    lap = np.zeros_like(p)
    for ix in range(h, nx - h):
        for iz in range(h, nz - h):
            acm = np.float32(0)
            for io in range(order + 1):
                acm += p[ix, iz + io - h] * coefs[io] * dz2inv
                acm += p[ix + io - h, iz] * coefs[io] * dx2inv
            lap[ix, iz] = acm
    return leapfrog_oracle(p, pp, v2, lap, dt2)


def ptsrc_oracle(s, xs, zs, ts):
    """CPU ptsrc (ptsrc.c:51-57): clipped 7x7 Gaussian add."""
    out = s.copy()
    nx, nz = s.shape
    for ix in range(max(0, xs - 3), min(nx - 1, xs + 3) + 1):
        for iz in range(max(0, zs - 3), min(nz - 1, zs + 3) + 1):
            xn, zn = ix - xs, iz - zs
            out[ix, iz] += ts * np.exp(-xn * xn - zn * zn)
    return out
