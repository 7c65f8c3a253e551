"""Tiled, double-buffered Pallas Laplacian for grids beyond VMEM.

The whole-shot kernels in :mod:`.pallas_fd` require the field to fit in
VMEM (true for every reference config). This kernel covers the standalone
stencil benchmark (``cuda_reference_stencil_computation``) at production
grid sizes: the field streams HBM -> VMEM in 2D tiles with order/2 halos,
with a two-slot double buffer so the next tile's DMA overlaps the current
tile's compute — the HBM-bandwidth-roofline pattern (in+out traffic is the
floor; target >=80% of roofline per BASELINE.md).

Hard-won constraint of this environment's Mosaic compiler: every DMA lane
offset and width must be *provably* 128-aligned (unaligned ones crash the
remote compile without diagnostics). Hence: z-tile starts are multiples of
128 with a ``pl.multiple_of`` hint, reads are ``chunk_w``-wide (tz+order
rounded up to 128), and the kernel computes on the leading tz+order lanes.
Global z-border zeroing happens outside the kernel (lane-axis iota also
crashes the compile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["laplacian_pallas", "laplacian_pallas_padded", "padded_layout",
           "to_padded", "from_padded"]


def _lap_tile(a, cz, cx, order):
    """Laplacian center of a halo-extended tile ``a`` of
    (tx+order, tz+order): returns the (tx, tz) interior."""
    h = order // 2
    rx = a.shape[0] - order
    rz = a.shape[1] - order
    # split-axis symmetric-pair taps (c[h-k] == c[h+k] exactly); association
    # order matches ops.stencil.laplacian_interior (pairs descending,
    # center last) so all tiers stay bit-identical
    c = jax.lax.slice(a, (h, h), (h + rx, h + rz))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(a, (h, h - k), (h + rx, h - k + rz))
        zp = jax.lax.slice(a, (h, h + k), (h + rx, h + k + rz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (h - k, h), (h - k + rx, h + rz))
        xp = jax.lax.slice(a, (h + k, h), (h + k + rx, h + rz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return accz + accx


def _kernel(order, nx, tx, tz, chunk_w, n_tz, cz, cx,
            inp_hbm, out_ref, scratch, sems):
    h = order // 2
    i = pl.program_id(0)   # x-tile index
    j = pl.program_id(1)   # z-tile index
    step = i * n_tz + j

    def copy_ij(ti, tj, slot):
        col = pl.multiple_of(tj * tz, 128)
        return pltpu.make_async_copy(
            inp_hbm.at[pl.ds(ti * tx, tx + order), pl.ds(col, chunk_w)],
            scratch.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _():
        copy_ij(0, 0, 0).start()

    # issue the next tile's DMA before blocking on the current one; offsets
    # stay affine in the program ids (row-major grid order: j fastest)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(j + 1 < n_tz)
    def _():
        copy_ij(i, j + 1, next_slot).start()

    @pl.when((j + 1 == n_tz) & (i + 1 < pl.num_programs(0)))
    def _():
        copy_ij(i + 1, 0, next_slot).start()

    copy_ij(i, j, jax.lax.rem(step, 2)).wait()

    a = scratch[jax.lax.rem(step, 2)][:, :tz + order]
    interior = _lap_tile(a, cz, cx, order)
    # zero rows outside the global x interior [h, nx-h); sublane iota only
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
    out_ref[:, :] = jnp.where((rows >= h) & (rows < nx - h), interior, 0.0)


def laplacian_pallas(p, coefs_x, coefs_z, order: int, tile=(256, 512),
                     interpret: bool = False,
                     vmem_budget: int = 12 * 1024 * 1024):
    """Order-``order`` interior Laplacian of an (nx, nz) field, streaming 2D
    tiles through VMEM with a double-buffered DMA pipeline. Drop-in
    equivalent of :func:`.stencil.laplacian` for grids too large for a
    whole-array kernel. Coefficients must be the premultiplied arrays from
    :func:`...numerics.scaled_coefficients`.
    """
    nx, nz = p.shape
    h = order // 2
    tx, tz = tile
    tz = max(128, min(-(-tz // 128) * 128, -(-nz // 128) * 128))
    chunk_w = -(-(tz + order) // 128) * 128
    # clamp tx to the VMEM budget: 2 input slots + 2 output windows +
    # Mosaic's stack for the unrolled taps ~ 16*tx floats per lane
    max_tx = (vmem_budget // (chunk_w * 4) - 2 * order) // 16
    tx = max(8, min(tx, (max_tx // 8) * 8))
    n_tx = -(-nx // tx)
    n_tz = -(-nz // tz)
    # halo padding on top/left; alignment + read-width padding bottom/right
    p_pad = jnp.pad(p, ((h, n_tx * tx - nx + h),
                        (h, (n_tz - 1) * tz + chunk_w - nz - h)))

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    kern = functools.partial(_kernel, order, nx, tx, tz, chunk_w, n_tz,
                             cz, cx)

    # scoped-VMEM permission derived from the working set: 2 input slots +
    # 2 output windows + Mosaic's ~12-tile vector stack (the default 16 MiB
    # cap crashes the compile for large tiles)
    from .pallas_fd import vmem_params
    cp = vmem_params(((2 + 12) * (tx + order) * chunk_w + 2 * tx * tz) * 4)
    out = pl.pallas_call(
        kern,
        grid=(n_tx, n_tz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tx, tz), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tx * tx, n_tz * tz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tx + order, chunk_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad)
    out = out[:nx, :nz]
    # global z borders are zeroed outside the kernel (lane-axis iota is
    # unavailable in-kernel); two thin strip writes in XLA
    return out.at[:, :h].set(0.0).at[:, nz - h:].set(0.0)


# ---------------------------------------------------------------------------
# Fixed-point padded-layout kernel: chained applies without per-apply pads
# ---------------------------------------------------------------------------
#
# Profiling on the dev chip showed ~45% of each `laplacian_pallas` "apply"
# is the jnp.pad above — a full 2-pass XLA copy per call. For repeated
# application (the sustained-throughput protocol the benchmark measures,
# and the reference stencil program's natural semantics: it reads an
# already-extended nxe x nze grid, fd-source-code.cu:290-312), the fix is a
# layout that is a *fixed point* of the op: input and output share one
# (R, W) buffer layout, so applies chain with zero glue ops.
#
# Layout (h = order//2, hr = h rounded up to 8):
#   cols: [0, h) zero | interior nz | zero-pad to W = roundup(h+nz+h, 128)
#   rows: tr slack tile | [h, h+nx) interior in a roundup(h+nx+hr, tr)
#         block | tr slack tile
# The slack row-tiles (always zero, outputs masked) make every halo read a
# full-slot, in-bounds, 8-aligned DMA — no sliced-destination (3D-ref)
# DMAs, which crash this environment's Mosaic compiler.



def _halo_dma_start(hbm, scratch, sems, ti, slot, tx, hr, n_tx, R):
    """Start the halo read of row-tile ``ti`` into scratch ``slot``: always
    a full-slot dst, 8-aligned src row offset, full width (sliced-dst DMAs
    crash this Mosaic compiler). Tiles 0 / n_tx-1 are layout slack (outputs
    masked) and read a frame-shifted but in-bounds slot."""
    rows_slot = tx + 2 * hr

    @pl.when(ti == 0)
    def _():
        pltpu.make_async_copy(hbm.at[pl.ds(0, rows_slot), :],
                              scratch.at[slot], sems.at[slot]).start()

    @pl.when((ti > 0) & (ti < n_tx - 1))
    def _():
        row = pl.multiple_of(ti * tx - hr, 8)
        pltpu.make_async_copy(hbm.at[pl.ds(row, rows_slot), :],
                              scratch.at[slot], sems.at[slot]).start()

    @pl.when(ti == n_tx - 1)
    def _():
        pltpu.make_async_copy(hbm.at[pl.ds(R - rows_slot, rows_slot), :],
                              scratch.at[slot], sems.at[slot]).start()


def _halo_dma_wait(hbm, scratch, sems, slot, tx, hr):
    pltpu.make_async_copy(hbm.at[pl.ds(0, tx + 2 * hr), :],
                          scratch.at[slot], sems.at[slot]).wait()


def _lap_taps(a, order, hr, tx, W, cz, cx):
    """Laplacian taps on a (tx+2hr, W)-row halo frame: out row r maps to
    frame row r+hr; returns the full-width (tx, W) laplacian, un-masked."""
    h = order // 2
    wz = W - order
    r0 = hr - h
    # split-axis symmetric-pair taps (c[h-k] == c[h+k] exactly); association
    # order matches ops.stencil.laplacian_interior (pairs descending,
    # center last) so all tiers stay bit-identical
    c = jax.lax.slice(a, (hr, h), (hr + tx, h + wz))
    accz = None
    for k in range(h, 0, -1):
        zm = jax.lax.slice(a, (hr, h - k), (hr + tx, h - k + wz))
        zp = jax.lax.slice(a, (hr, h + k), (hr + tx, h + k + wz))
        term = cz[h + k] * (zm + zp)
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * c
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (r0 + h - k, h), (r0 + h - k + tx, h + wz))
        xp = jax.lax.slice(a, (r0 + h + k, h), (r0 + h + k + tx, h + wz))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * c
    return jnp.pad(accz + accx, ((0, 0), (h, W - wz - h)))


def band_matrices(czp, h: int, W: int):
    """Banded z-tap matrices for the MXU formulation (``impl="mxu"``):
    per 128-lane output block b, ``out_z[:, b] = window_b @ S`` where
    ``window_b`` is the 384-lane slice starting one block left of b and
    ``S[m, j] = czp[h + (j + 128 - m)]`` on the band, 0 elsewhere. Edge
    blocks use 256-wide windows pinned to the ends ([0, 256) for block 0
    and [W-256, W) for the last; when W == 128 a single (128, 128)
    diagonal-band matrix is returned for all three slots). Returns
    (s_first, s_mid, s_last) float32 numpy arrays."""
    import numpy as np

    def banded(K, out0):
        s = np.zeros((K, 128), np.float32)
        for j in range(128):
            for d in range(-h, h + 1):
                m = out0 + j + d
                if 0 <= m < K:
                    s[m, j] = czp[h + d]
        return s

    if W == 128:
        s = banded(128, 0)
        return s, s, s
    # mid: out col j of block b sits at window row j + 128
    return banded(256, 0), banded(384, 128), banded(256, 128)


def split_stack(s, parts: int = 2):
    """Split a float32 (K, N) matrix into an N-stacked (K, parts*N)
    bfloat16 operand: column block ``i`` holds the i-th residual split
    (hi first), with the sum of the splits capturing ~8*parts mantissa
    bits — the operand form for the manual multi-pass MXU matmuls
    (:func:`mm3` for parts=2, :func:`mm_banded` generally).

    Stacking on the N axis (instead of a leading (parts, ...) axis with
    separate matmuls) is load-bearing: with separate hi/lo matmuls
    sharing the same lhs, XLA's dot merger (which runs when the kernel
    executes in interpret mode on a TPU) re-associates
    ``ah@Sh + ah@Sl -> ah@(Sh+Sl)`` and the bf16 matrix add rounds Sl to
    zero — a measured 3.5e-4 error. The stacked form leaves no two dots
    sharing an operand, so the split survives every compiler; Mosaic
    cost is identical (one wide-N pass instead of several N-passes)."""
    import numpy as np
    import ml_dtypes
    cols, r = [], s.astype(np.float32)
    for _ in range(parts):
        hi = r.astype(ml_dtypes.bfloat16)
        cols.append(hi)
        r = r - hi.astype(np.float32)
    return np.concatenate(cols, axis=1)


def split_hi_lo(s):
    """2-part :func:`split_stack` — the (K, 2N) hi/lo operand for
    :func:`mm3` (~16 mantissa bits captured)."""
    return split_stack(s, 2)


def _round_bf16_f32(r):
    """Round ``r`` (f32) to the nearest bfloat16 value, *staying* f32,
    via integer bit manipulation: bitcast to uint32, add the
    round-to-nearest-even increment ``0x7FFF + lsb-of-kept-mantissa``,
    mask the low 16 bits, bitcast back.  Bit-identical to the f32->bf16
    RNE convert for all non-NaN inputs (overflow to the next binade /
    inf is the correct RNE carry).

    Why not ``reduce_precision`` or an astype round-trip: the current
    Pallas/Mosaic TPU lowering has no rule for ``reduce_precision``
    inside a kernel body (``Unimplemented primitive ... KernelType.TC:
    reduce_precision`` — this killed every compiled MXU kernel in the
    round-3 bench), and the astype round-trip ``upcast(downcast(r))``
    can be collapsed back to ``r`` by XLA's excess-precision folding on
    the interpret-on-TPU path (measured ~1e-3 image error when the
    residual folds to zero).  The integer form lowers everywhere and is
    opaque to both rewrites."""
    u = jax.lax.bitcast_convert_type(r, jnp.uint32)
    u = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def split_lhs(a, parts: int = 2):
    """In-kernel residual split of a float32 operand into ``parts``
    bfloat16 arrays (hi first), the lhs counterpart of
    :func:`split_stack`.

    The per-level rounding is the bitwise RNE of :func:`_round_bf16_f32`
    — see there for why neither ``reduce_precision`` (no Mosaic kernel
    lowering) nor an astype round-trip (excess-precision folding hazard
    on the interpret path) can be used.  The split values are
    bit-identical to the f32->bf16 convert; the final downcast of an
    already-bf16-representable value is exact and safe to fold."""
    out, r = [], a
    for _ in range(parts):
        hi_f32 = _round_bf16_f32(r)
        out.append(hi_f32.astype(jnp.bfloat16))
        r = r - hi_f32
    return tuple(out)


def _mmf32(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def mm3(lh, ll, s):
    """Manual 3-pass banded product: ``(ah + al) @ (Sh + Sl)`` minus the
    ~2^-18-relative ``al@Sl`` term, with ``s`` the (K, 2N) stacked hi/lo
    operand from :func:`split_hi_lo` and ``lh``/``ll`` the bf16 hi/lo
    parts of the lhs. All accumulation is f32 (``preferred_element_type``
    + an f32 add of the hi result's halves)."""
    n = s.shape[-1] // 2
    y2 = _mmf32(lh, s)
    return (y2[:, :n] + y2[:, n:]) + _mmf32(ll, s[:, :n])


def mm_banded(parts, s):
    """Manual multi-pass banded product for ``p = len(parts)`` residual
    bf16 splits of the lhs against the (K, pN) stacked operand ``s`` from
    :func:`split_stack`: computes every cross product ``parts[i] @ S_j``
    with ``i + j < p`` (the dropped terms are ~2^-(8(p+1)) relative), so
    p=2 is the 3-pass bf16_3x-equivalent and p=3 a 6-pass with ~f32-level
    per-apply accuracy (~2^-24 split residual). p=2 delegates to
    :func:`mm3` so existing gated results stay bit-identical; p>=3 sums
    cross terms in ascending magnitude (deepest split level first) for
    the tightest f32 accumulation. No two dots share an operand —
    dot-merger-proof (see :func:`split_stack`)."""
    p = len(parts)
    if p == 2:
        return mm3(parts[0], parts[1], s)
    n = s.shape[-1] // p
    ys = [_mmf32(parts[i], s[:, :n * (p - i)]) for i in range(p)]
    acc = None
    for lvl in range(p - 1, -1, -1):
        for i in range(min(lvl, p - 1), -1, -1):
            j = lvl - i
            if j < p - i:
                blk = ys[i][:, j * n:(j + 1) * n]
                acc = blk if acc is None else acc + blk
    return acc


def _lap_x_vpu(a, order, hr, tx, W, cx):
    """x-axis (sublane) taps of the padded-layout frame on the VPU, full
    width, center included: the split-axis ``accx`` half of
    :func:`_lap_taps`."""
    h = order // 2
    r0 = hr - h
    az = jax.lax.slice(a, (hr, 0), (hr + tx, W))
    accx = None
    for k in range(h, 0, -1):
        xm = jax.lax.slice(a, (r0 + h - k, 0), (r0 + h - k + tx, W))
        xp = jax.lax.slice(a, (r0 + h + k, 0), (r0 + h + k + tx, W))
        term = cx[h + k] * (xm + xp)
        accx = term if accx is None else accx + term
    return accx + cx[h] * az, az


def _lap_z_mxu_full(az, tx, W, sf_ref, sm_ref, sl_ref):
    """Full-width (tx, W) lane-axis taps of ``az`` via banded MXU matmuls
    in manual 3-pass bf16 (see :func:`band_matrices`/:func:`split_hi_lo`).
    Values within h of the W edges read clipped windows — callers mask
    those columns (every consumer already zeroes cols outside [2h, nz))."""
    p = sf_ref.shape[-1] // 128
    splits = split_lhs(az, p)

    nb = W // 128
    cols = []
    for b in range(nb):
        if b == 0:
            c0, kw, s = 0, min(256, W), sf_ref
        elif b == nb - 1:
            c0, kw, s = W - 256, 256, sl_ref
        else:
            c0, kw, s = 128 * (b - 1), 384, sm_ref
        parts = tuple(jax.lax.slice(a, (0, c0), (tx, c0 + kw))
                      for a in splits)
        cols.append(mm_banded(parts, s[:, :]))
    return jnp.concatenate(cols, axis=1) if nb > 1 else cols[0]


def _lap_taps_mxu(a, order, hr, tx, W, cx, sf_ref, sm_ref, sl_ref):
    """MXU drop-in for :func:`_lap_taps` (z lane-taps on the MXU, x
    sublane-taps on the VPU): agrees with it on every column the padded
    stencil / streaming kernels keep (their colmask zeroes [0, 2h) and
    [nz, W)) to the manual-bf16_3x tolerance (~5e-6)."""
    accx, az = _lap_x_vpu(a, order, hr, tx, W, cx)
    return _lap_z_mxu_full(az, tx, W, sf_ref, sm_ref, sl_ref) + accx


def stream_band_inputs(coefs_z, order: int, W: int, parts: int = 2):
    """Stacked bf16 band matrices (``parts`` residual splits; see
    :func:`split_stack`) for the padded-layout streaming kernels (lanes =
    z there)."""
    cz = [float(v) for v in coefs_z]
    return tuple(jnp.asarray(split_stack(s, parts))
                 for s in band_matrices(cz, order // 2, W))


def _kernel_padded_mxu(order, hr, nx, nz, tx, n_tx, R, W, cx,
                       inp_hbm, mask_ref, sf_ref, sm_ref, sl_ref,
                       out_ref, scratch, sems):
    """Padded-layout Laplacian with the z (lane) taps on the MXU: per
    128-lane block one banded matmul in manual 3-pass bf16 precision
    (``ah@Sh + ah@Sl + al@Sh``; the dropped ``al@Sl`` term is ~2^-18
    relative). The x (sublane) taps stay on the VPU and overlap with the
    matmuls. Measured DMA-bound at 8192^2 (~69 of the ~70 GCell/s copy
    floor vs ~39 for the all-VPU taps; scripts/exp_mxu_ztaps.py)."""
    h = order // 2
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _halo_dma_start(inp_hbm, scratch, sems, 0, 0, tx, hr, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _halo_dma_start(inp_hbm, scratch, sems, i + 1,
                        jax.lax.rem(i + 1, 2), tx, hr, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _halo_dma_wait(inp_hbm, scratch, sems, cur, tx, hr)
    a = scratch[cur]
    accx, az = _lap_x_vpu(a, order, hr, tx, W, cx)

    p = sf_ref.shape[-1] // 128
    splits = split_lhs(az, p)

    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, (tx, 128), 0)
    keep = (rows >= tx + 2 * h) & (rows < tx + h + nx - h)

    nb = W // 128
    for b in range(nb):
        if b == 0:
            c0, kw, s = 0, min(256, W), sf_ref
        elif b == nb - 1:
            c0, kw, s = W - 256, 256, sl_ref
        else:
            c0, kw, s = 128 * (b - 1), 384, sm_ref
        parts = tuple(jax.lax.slice(x, (0, c0), (tx, c0 + kw))
                      for x in splits)
        yz = mm_banded(parts, s[:, :])
        y = (yz + accx[:, 128 * b:128 * (b + 1)]) \
            * mask_ref[0:1, 128 * b:128 * (b + 1)]
        out_ref[:, 128 * b:128 * (b + 1)] = jnp.where(keep, y, 0.0)


def _check_tile_rows(tile_rows, hr):
    if tile_rows % 8 != 0 or tile_rows < hr:
        raise ValueError(
            f"tile_rows must be a multiple of 8 and >= {hr} (the rounded "
            f"halo) — the halo DMA promises 8-aligned row offsets; got "
            f"{tile_rows}")


def padded_layout(nx: int, nz: int, order: int, tile_rows: int = 64):
    """Return (R, W, row0, col0) of the fixed-point layout for an (nx, nz)
    field: the interior lives at [row0, row0+nx) x [col0, col0+nz)."""
    h = order // 2
    hr = -(-h // 8) * 8
    tr = tile_rows
    content = -(-(h + nx + hr) // tr) * tr
    R = content + 2 * tr
    W = -(-(h + nz + h) // 128) * 128
    return R, W, tr + h, h


def to_padded(p, order: int, tile_rows: int = 64):
    """Embed an (nx, nz) field into its fixed-point padded layout."""
    nx, nz = p.shape
    R, W, row0, col0 = padded_layout(nx, nz, order, tile_rows)
    return jnp.zeros((R, W), p.dtype).at[row0:row0 + nx,
                                         col0:col0 + nz].set(p)


def from_padded(out, nx: int, nz: int, order: int, tile_rows: int = 64):
    """Extract the (nx, nz) field from the padded layout."""
    R, W, row0, col0 = padded_layout(nx, nz, order, tile_rows)
    return jax.lax.slice(out, (row0, col0), (row0 + nx, col0 + nz))


def _lap_taps_roll(a, order, hr, tx, W, cz, cx):
    """Roll-form of :func:`_lap_taps` for callers that mask the output to
    the kept cells (rows [hr, hr+tx) of the frame, global-interior
    columns [2h, nz)): both axes' taps as whole-frame rolls with the
    split-axis symmetric-pair association preserved, ONE final static
    slice. Bit-identical to :func:`_lap_taps` on every kept cell — for
    kept columns j the rolled operands read j+-k in [h-..., nz+h) which
    never crosses the (0, W) wrap (W >= 2h+nz), and kept rows read frame
    rows [hr-h, hr+tx+h) in [0, tx+2hr); wrap garbage lands only in
    cells the caller's mask zeroes. Measured +7% over the slice form at
    8192^2 (42.5 vs 39.6 GCell/s slope — scripts/exp_padded_slots.py:
    whole-frame rolls cost fewer issue slots than 17 per-tap unaligned
    slices, though the intrinsic unaligned-access cost remains; the
    aligned-offset diagnostic pins the no-shift ceiling at 74-78)."""
    h = order // 2
    accz = None
    for k in range(h, 0, -1):
        term = cz[h + k] * (jnp.roll(a, k, 1) + jnp.roll(a, -k, 1))
        accz = term if accz is None else accz + term
    accz = accz + cz[h] * a
    accx = None
    for k in range(h, 0, -1):
        term = cx[h + k] * (jnp.roll(a, k, 0) + jnp.roll(a, -k, 0))
        accx = term if accx is None else accx + term
    accx = accx + cx[h] * a
    return jax.lax.slice(accz + accx, (hr, 0), (hr + tx, W))


# Lane-width threshold for the whole-frame roll lowering: rolls amortize
# only over wide frames (measured ~1.6x SLOWER than slices on narrow
# whole-shot-class frames, PALLAS_NOTES "Round 4"); the streaming kernels
# (ops/pallas_stream.py) share this dispatch.
_ROLL_LANES_MIN = 1024


def _kernel_padded(order, hr, nx, nz, tx, n_tx, R, W, cz, cx,
                   inp_hbm, mask_ref, out_ref, scratch, sems):
    h = order // 2
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _halo_dma_start(inp_hbm, scratch, sems, 0, 0, tx, hr, n_tx, R)

    @pl.when(i + 1 < n_tx)
    def _():
        _halo_dma_start(inp_hbm, scratch, sems, i + 1,
                        jax.lax.rem(i + 1, 2), tx, hr, n_tx, R)

    cur = jax.lax.rem(i, 2)
    _halo_dma_wait(inp_hbm, scratch, sems, cur, tx, hr)

    # out row r maps to scratch row r + hr; taps at r + hr + (io - h);
    # roll-form taps on wide frames (bit-identical to the slice form on
    # every kept cell — the mask below supplies that contract, see
    # _lap_taps_roll), slice form on narrow ones where rolls measured
    # ~1.6x slower (the _ROLL_LANES_MIN dispatch the streaming kernels
    # use)
    if W >= _ROLL_LANES_MIN:
        full = _lap_taps_roll(scratch[cur], order, hr, tx, W, cz, cx)
    else:
        full = _lap_taps(scratch[cur], order, hr, tx, W, cz, cx)
    # zero the h-frame and all padding: rows via sublane iota, cols via a
    # VMEM mask row (lane-axis iota is unavailable in-kernel)
    rows = i * tx + jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
    keep = (rows >= tx + 2 * h) & (rows < tx + h + nx - h)
    out_ref[:, :] = jnp.where(keep, full * mask_ref[0:1, :], 0.0)


def laplacian_pallas_padded(p_pad, coefs_x, coefs_z, order: int,
                            nx: int, nz: int, tile_rows: int = 64,
                            interpret: bool = False, impl: str = "vpu"):
    """Order-``order`` interior Laplacian on the fixed-point padded layout
    (see :func:`padded_layout`): maps an (R, W) padded field to an (R, W)
    padded field, so repeated applies chain with no per-apply pad/slice.
    Semantically ``to_padded . laplacian . from_padded`` (borders zeroed).
    Requires order <= 16 (hr = 8 row-halo granularity covers h <= 8).

    ``impl="vpu"`` (default) computes both axes' taps on the VPU and is
    bit-identical to :func:`...ops.stencil.laplacian` on the interior.
    ``impl="mxu"`` computes the z (lane) taps as banded block matmuls on
    the otherwise-idle MXU in manual 3-pass bf16 precision (max rel err
    ~5e-6 vs the exact path) — measured 1.76x at 8192^2, DMA-bound at
    ~98% of the kernel's copy floor (docs/PALLAS_NOTES.md).
    ``impl="mxu6"`` is the 6-pass triple-split variant (~f32-level
    per-apply accuracy, ~2^-24 split residual) at twice the matmul
    passes — still DMA-bound at large sizes."""
    if impl not in ("vpu", "mxu", "mxu6"):
        raise ValueError(f"impl must be 'vpu', 'mxu' or 'mxu6', "
                         f"got {impl!r}")
    h = order // 2
    hr = -(-h // 8) * 8
    _check_tile_rows(tile_rows, hr)
    tx = tile_rows
    R, W, row0, col0 = padded_layout(nx, nz, order, tile_rows)
    assert p_pad.shape == (R, W), (p_pad.shape, (R, W))
    n_tx = R // tx

    cz = [float(v) for v in coefs_z]
    cx = [float(v) for v in coefs_x]
    import numpy as _np
    mask = _np.zeros((8, W), _np.float32)
    mask[:, 2 * h:nz] = 1.0

    from .pallas_fd import vmem_params
    # measured on the v5e dev chip: Mosaic's vector stack for the unrolled
    # taps scales with W — at W=4224/tx=64 actual scoped-vmem usage is
    # ~33.9 MiB while a 10-tile estimate rounds to only 32 MiB and OOMs
    # the compile; budget 2 scratch slots + out pipeline + 24 stack tiles
    # (the wide-grid anchor from docs/PALLAS_NOTES.md "Round 3")
    cp = vmem_params(((2 + 24) * (tx + 2 * hr) * W + 2 * tx * W) * 4)
    if impl in ("mxu", "mxu6"):
        parts = 3 if impl == "mxu6" else 2
        sf, sm, sl = (split_stack(s, parts)
                      for s in band_matrices(cz, h, W))
        kern = functools.partial(_kernel_padded_mxu, order, hr, nx, nz,
                                 tx, n_tx, R, W, cx)
        extra_in = [jnp.asarray(sf), jnp.asarray(sm), jnp.asarray(sl)]
    else:
        kern = functools.partial(_kernel_padded, order, hr, nx, nz, tx,
                                 n_tx, R, W, cz, cx)
        extra_in = []
    return pl.pallas_call(
        kern,
        grid=(n_tx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_in),
        out_specs=pl.BlockSpec((tx, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2 * hr, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(p_pad, jnp.asarray(mask), *extra_in)
