"""Fused Pallas TPU kernels: whole-shot propagation resident in VMEM.

The reference executes 4-6 separate CUDA kernel launches per time step, each
streaming the full wavefield through device memory
(``cuda_reference_RTM/src/fd-code.cu:259-267,302-333``). On TPU the entire
extended grid of every reference config fits in VMEM (128 MiB/core on
v5e; see the memory model below), so these
kernels run the *whole nt-step time loop inside one kernel*: wavefields live
in VMEM scratch for the full shot, HBM is touched only for the initial
operand load and final result store, and each step is pure VPU work on
on-chip data. Double-buffer pointer swaps (``fd-code.cu:260-262``) become a
two-step role-alternating unroll over two scratch buffers.

Layout: kernels are **z-major** — fields are (nze, nxe) with z on sublanes
and x on lanes — so every dynamically-indexed access (seismogram row write,
observed-data row read, receiver-row injection at depth gz, source row at
depth sz) is a *sublane* slice, which Mosaic supports; dynamic lane offsets
are not allowed on TPU. The public wrappers transpose at the boundary (one
cheap XLA transpose per shot) and keep the package-wide (nx, nz) contract.

Per-shot source x positions enter as precomputed one-hot / Gaussian-column
rows (``src_rows``), so shots with different sx share one compiled kernel.

Two kernels cover the hot paths:

* :func:`forward_modeling_pallas` — the mod_main/rtm_main forward loop
  (update -> inject -> taper -> record -> swap) with on-chip seismogram
  accumulation (``mod_main.cpp:146-168``).
* :func:`rtm_snapshot_pallas` — the complete GPU-suite shot: fd_forward
  (``fd-code.cu:247-288``) and fd_back (``:290-341``) including two-snapshot
  source reconstruction, receiver injection, and imaging, in ONE kernel
  call per shot.

The full-wavefield rtm_main variant stays on the lax path
(:func:`..solver.rtm_shot_full`) — storing nt full wavefields is inherently
HBM-bound and XLA already streams it well.

Numerics are identical to the lax path: :func:`..stencil.lap_in_kernel`
applies the same split-axis symmetric-pair taps in the same association
order (slice taps + ``jnp.pad`` by default — the descending-k order keeps
the accumulation in a layout Mosaic pads, measured 1.28x the roll
lowering; ``PFDC_LAP_IMPL=roll`` selects the pad-free
:func:`..stencil.laplacian_full` whose zero border comes from the
pre-masked ``v2`` operand, :func:`_v2_operand` — kept as the escape hatch
for Mosaic versions that reject the pad). The unit tests compare the
paths elementwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import lap_in_kernel, lap_interior_mask
from ..solver import FDContext

__all__ = ["forward_modeling_pallas", "rtm_snapshot_pallas",
           "fd_forward_pallas", "fd_back_pallas"]

# Mosaic memory model (derived, not magic numbers):
#  - VMEM is 128 MiB/core on v5e; Mosaic's default scoped-VMEM cap is a
#    conservative 16 MiB soft limit that the whole-shot working set exceeds
#    on the larger configs. The limit passed below is a permission derived
#    from the estimated working set, not an allocation.
#  - The working set of a whole-shot kernel is its grid-shaped buffers
#    (operands + outputs + scratch) plus Mosaic's vector stack for the
#    unrolled stencil taps. Two measured anchors: the reference configs
#    (grids <= 409x455) compile within the 32 MiB floor, and a 231x2000
#    whole-shot RTM kernel needs 56.7 MiB scoped = 6 declared buffers
#    + ~24 grid-equivalents of stack — so the margin is 24 grid-sized
#    tiles (the earlier ~12 estimate undershot on wide grids; small
#    grids are unaffected because the 32 MiB floor dominates there).
#  - SMEM is ~1 MiB/core and (nt, 1) scalar operands are stored there at
#    ~512 B per element, so wavelets overflow SMEM around nt ~ 1800.
_VMEM_PER_CORE = 128 * 1024 * 1024
_STACK_GRIDS = 24
_SMEM_BUDGET = 1 << 20
_SMEM_BYTES_PER_SCALAR = 512


def _wav_space(nt: int):
    """Wavelet (nt, 1) placement, derived from the SMEM storage model
    (~512 B/scalar against the ~1 MiB budget, 12.5% headroom); larger
    wavelets live in VMEM (dynamic-sublane scalar reads work there too)."""
    fits = nt * _SMEM_BYTES_PER_SCALAR <= _SMEM_BUDGET - (_SMEM_BUDGET >> 3)
    return pltpu.SMEM if fits else pltpu.VMEM


def _vmem_plan(ctx: "FDContext", n_grids: int, extra_bytes: int = 0,
               interpret: bool = False, what: str = "kernel"):
    """Working-set estimate -> proactive fit check + derived VMEM limit.

    Raises early (before a doomed multi-minute Mosaic compile) when the
    estimated working set cannot fit the core's VMEM, which lets the
    pipeline's fallback chain (whole-shot -> split -> lax) respond
    immediately. Returns CompilerParams with the limit rounded up to a
    16 MiB multiple (minimum 32 MiB, the validated value for the largest
    compiling reference config)."""
    grid = ctx.nze * ctx.nxe * 4
    if _wav_space(ctx.nt) is not pltpu.SMEM:
        extra_bytes += ctx.nt * 4
    est = grid * (n_grids + _STACK_GRIDS) + extra_bytes
    if not interpret and est > _VMEM_PER_CORE:
        raise ValueError(
            f"{what}: estimated VMEM working set {est >> 20} MiB "
            f"({n_grids}+{_STACK_GRIDS} grid buffers of "
            f"{ctx.nze}x{ctx.nxe} f32) exceeds the {_VMEM_PER_CORE >> 20} "
            f"MiB core VMEM; use the split kernels, the tiled/lax path, or "
            f"x-domain decomposition")
    return vmem_params(est)


def vmem_params(est_bytes: int = 0):
    """CompilerParams with the scoped-VMEM permission derived from an
    estimated working set: >= the validated 32 MiB, rounded up to a 16 MiB
    multiple, capped at the core size. The single home of this formula
    (used by the whole-shot kernels, the blocked domain kernels, and the
    tiled stencil)."""
    limit = min(_VMEM_PER_CORE,
                max(32 << 20, -(-est_bytes // (16 << 20)) * (16 << 20)))
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=limit)
    except Exception:  # older/newer pallas API without the knob
        return None


def _compiler_params():
    """Default params for small-slab kernels (e.g. the blocked domain
    kernels): the validated 32 MiB permission."""
    return vmem_params(0)


def _v2_operand(ctx: FDContext, v2):
    """z-major ``v2`` kernel operand with the Laplacian interior mask AND
    ``dt2`` folded in: the kernels compute the pad-free
    :func:`..stencil.laplacian_full` (wrapped garbage within h of every
    edge) and ``v2m * lap_full`` equals ``v2 * dt2 * lap_zero_bordered``
    exactly — ``(v2*dt2)*lap`` is the reference association order and the
    fold removes one loop-invariant vector multiply per cell per step.
    No ``tpu.concatenate`` for Mosaic to reject."""
    m = lap_interior_mask(ctx.nze, ctx.nxe, ctx.order)
    return jnp.transpose(v2) * jnp.asarray(m * np.float32(ctx.dt2))


# Measured error-growth envelope of the multi-pass bf16 MXU Laplacian
# tiers (validate 6d rows; docs/PALLAS_NOTES.md "Measured accuracy
# envelope"), the data behind lap_impl="auto" routing:
#   3-pass ("mxu", ~4e-6 rel/apply): 3lay (nt=1001, dx==dz) drifts
#     2.1e-5 vs the C oracle over the full shot — PASS at 1e-4; on
#     marmousi (nt=3004, dz=8 != dx=25, dt at the CFL edge for the fine
#     axis) per-step rounding amplifies to 2.4e-3 — FAIL.
#   6-pass ("mxu6", ~1.3e-7 rel/apply): marmousi full config 4.0e-6 —
#     PASS, indistinguishable from the exact kernel's 4.1e-6.
# Headroom: ~1.5x the validated nt for each tier; longer runs fall back
# to the exact (bit-identical-to-lax) VPU taps.
MXU3_NT_MAX = 1500
MXU6_NT_MAX = 4500


def _mxu3_in_envelope(ctx: FDContext) -> bool:
    """Whether the 3-pass MXU tier's validated accuracy envelope covers
    this config: short-nt AND an isotropic grid (dx == dz — detected via
    the premultiplied center coefficients; anisotropy with a fine axis
    puts dt at the CFL edge, where per-step rounding compounds
    exponentially — the measured marmousi failure mode).

    Caveat (documented limitation): isotropy is a *proxy* for CFL margin
    — the actual ratio dt*vmax/min(dx, dz) depends on the velocity
    model, which is a runtime operand this static check cannot see. An
    isotropic config with a user-chosen dt AT the CFL limit could still
    amplify 3-pass rounding beyond the validated 2.1e-5; ``auto``
    therefore assumes dt comfortably inside the CFL bound (every
    reference config satisfies this; a CFL-edge dt is numerically
    marginal for the FD scheme itself). Use ``mxu6``/``vpu`` explicitly
    for deliberately CFL-edge runs."""
    h = ctx.order // 2
    isotropic = float(ctx.coefs_x[h]) == float(ctx.coefs_z[h])
    return ctx.nt <= MXU3_NT_MAX and isotropic


def resolve_lap_impl(ctx: FDContext, lap_impl):
    """Resolve ``lap_impl="auto"`` against the measured accuracy envelope
    (module constants above): the 3-pass MXU speed tier where its drift
    is validated under 1e-4, the 6-pass accuracy tier for long-nt /
    CFL-edge (marmousi-class) configs, the exact VPU taps beyond the
    validated range. An *explicit* ``"mxu"`` outside its envelope is
    honored but warns — the user is asking for a tier whose error was
    measured past the 1e-4 bar on configs like this one.

    ``lap_impl=None`` resolves ``PFDC_LAP_IMPL`` (import-time snapshot)
    first, so ``PFDC_LAP_IMPL=auto`` routes identically on every path —
    the whole-shot kernels AND the tiled/streaming ones whose kernels
    never see a ctx (``padded``/``roll`` stay None: they select the exact
    VPU taps' lowering inside :func:`..stencil.lap_in_kernel`)."""
    if lap_impl is None:
        from .stencil import _ENV_LAP_IMPL
        if _ENV_LAP_IMPL in ("mxu", "mxu6", "auto"):
            lap_impl = _ENV_LAP_IMPL
    if lap_impl == "auto":
        if _mxu3_in_envelope(ctx):
            return "mxu"
        if ctx.nt <= MXU6_NT_MAX:
            return "mxu6"
        return "vpu"
    if lap_impl == "mxu" and not _mxu3_in_envelope(ctx):
        import warnings
        warnings.warn(
            f"lap_impl='mxu' outside its validated accuracy envelope "
            f"(nt={ctx.nt}, isotropic grid required, nt <= {MXU3_NT_MAX}):"
            f" measured 2.4e-3 image drift on marmousi-class configs. Use"
            f" lap_impl='mxu6' (validated 4.0e-6) or 'auto'.",
            stacklevel=3)
    return lap_impl


def _use_mxu_lap(lap_impl, ctx: FDContext = None) -> int:
    """Resolve the whole-shot kernels' Laplacian lowering: ``lap_impl`` is
    an explicit ``"mxu"``/``"mxu6"``/``"vpu"`` override, ``"auto"`` to
    route by the measured accuracy envelope (:func:`resolve_lap_impl`;
    requires ``ctx``), or None to read ``PFDC_LAP_IMPL`` (``mxu``
    selects the 3-pass MXU path, ``mxu6`` the 6-pass triple-split one;
    ``padded``/``roll`` keep the exact VPU taps and choose their
    lowering inside :func:`..stencil.lap_in_kernel`). Returns the number
    of bf16 residual splits (0 = VPU, 2 = 3-pass, 3 = 6-pass) — truthy
    exactly when the MXU path is selected."""
    if lap_impl is None:
        # import-time snapshot, never a trace-time env read (see
        # ..stencil._ENV_LAP_IMPL)
        from .stencil import _ENV_LAP_IMPL
        lap_impl = _ENV_LAP_IMPL
    if ctx is not None:
        lap_impl = resolve_lap_impl(ctx, lap_impl)
    elif lap_impl == "auto":
        raise ValueError("lap_impl='auto' needs the FDContext to route "
                         "by nt/grid — pass ctx to _use_mxu_lap")
    return {"mxu": 2, "mxu6": 3}.get(lap_impl, 0)


def _pad_lanes(a, wp: int):
    """Zero-pad the lane (last) axis of a 2D operand to width ``wp``."""
    return jnp.pad(a, ((0, 0), (0, wp - a.shape[1])))


def _mxu_band_inputs(ctx: FDContext, wp: int, parts: int = 2):
    """Stacked bf16 band matrices (``parts`` residual splits) for the x
    (lane) taps of the z-major whole-shot kernels (see
    :func:`..pallas_stencil.band_matrices`; here the lane axis is x, so
    the band holds ``coefs_x``)."""
    from .pallas_stencil import band_matrices, split_stack
    cx = [float(v) for v in ctx.coefs_x]
    return tuple(jnp.asarray(split_stack(s, parts))
                 for s in band_matrices(cx, ctx.order // 2, wp))


def _make_lap(ctx: FDContext, mxu_refs=None, z_taps: str = "roll"):
    """In-kernel Laplacian closure for the z-major whole-shot kernels.

    With ``mxu_refs=None``: the exact VPU taps (:func:`..stencil.
    lap_in_kernel`, bit-identical to the lax path). With ``mxu_refs`` a
    (sf, sm, sl) tuple of stacked hi/lo bf16 band-matrix refs: the z
    (sublane) taps stay on the VPU (static rolls; edge garbage killed by
    the premasked ``v2`` operand) and the x (lane) taps run as banded
    block matmuls on the otherwise-idle MXU in manual 3-pass bf16
    precision (~5e-6 rel error per apply — see PALLAS_NOTES "z-taps on
    the MXU"; here the roles of z and x swap because these kernels are
    z-major).

    ``z_taps`` selects the z sublane-tap lowering on the MXU path:
    ``"roll"`` (shipping) or ``"slice"`` (recorded ~3% slower negative,
    scripts/exp_mxu_zslice.py). Explicit argument — never an environment
    read: this closure runs at trace time, and a trace-time env read is
    invisible to the jit cache key (the round-3 footgun class)."""
    cz, cx = _coefs(ctx)
    order = ctx.order
    if mxu_refs is None:
        return lambda s: lap_in_kernel(s, cz, cx, order)
    sf_ref, sm_ref, sl_ref = mxu_refs
    h = order // 2
    z_slice = z_taps == "slice"

    def _accz_roll(s):
        """z (sublane) taps via static rolls: wrapped border rows are
        garbage, killed by the caller's premasked ``v2`` operand."""
        acc = None
        for k in range(h, 0, -1):
            term = cz[h + k] * (jnp.roll(s, k, 0) + jnp.roll(s, -k, 0))
            acc = term if acc is None else acc + term
        return acc + cz[h] * s

    def _accz_slice(s):
        """z taps via interior slices + sublane pad: identical operand
        values and association order on the interior rows (zero instead
        of wrapped garbage on the h border rows — equivalent after the
        v2 premask), traded against the roll lowering purely on measured
        Mosaic cost (slices are offset reads; sublane rolls are real
        rotate ops)."""
        nzd, wp = s.shape
        acc = None
        for k in range(h, 0, -1):
            zm = jax.lax.slice(s, (h - k, 0), (nzd - h - k, wp))
            zp = jax.lax.slice(s, (h + k, 0), (nzd - h + k, wp))
            term = cz[h + k] * (zm + zp)
            acc = term if acc is None else acc + term
        acc = acc + cz[h] * jax.lax.slice(s, (h, 0), (nzd - h, wp))
        return jnp.pad(acc, ((h, h), (0, 0)))

    def lap(s):
        from .pallas_stencil import mm_banded, split_lhs
        nzd, wp = s.shape
        accz = _accz_slice(s) if z_slice else _accz_roll(s)
        p = sf_ref.shape[-1] // 128
        splits = split_lhs(s, p)

        nb = wp // 128
        cols = []
        for b in range(nb):
            if b == 0:
                c0, kw, m = 0, min(256, wp), sf_ref
            elif b == nb - 1:
                c0, kw, m = wp - 256, 256, sl_ref
            else:
                c0, kw, m = 128 * (b - 1), 384, sm_ref
            parts = tuple(jax.lax.slice(x, (0, c0), (nzd, c0 + kw))
                          for x in splits)
            yx = mm_banded(parts, m[:, :])
            cols.append(yx + accz[:, 128 * b:128 * (b + 1)])
        return jnp.concatenate(cols, axis=1) if nb > 1 else cols[0]

    return lap


# Import-time snapshot of the PFDC_TAPER_IMPL knob (never a trace-time
# env read — see ..stencil._ENV_LAP_IMPL for why).
import os as _os
_ENV_TAPER_IMPL = _os.environ.get("PFDC_TAPER_IMPL", "fused")


def _taper_rows(ctx: FDContext, mask_np, taper_impl: str = None) -> int:
    """Number of leading z rows (sublanes, z-major) the taper actually
    modifies, or 0 to force the fused full-grid path.

    The GPU-suite taper (K3, ``kernel_tapper``, ``fd-code.cu:94-117``) runs
    on a ``(gridx, gridBorder_z)`` grid — it touches only ``z < nzb`` (top
    strip + the two top corners), so the mask is exactly 1.0 everywhere
    else and the multiply can be restricted to that sublane strip
    (``taper_impl="strip"`` / import-time ``PFDC_TAPER_IMPL`` snapshot):
    two strip read-modify-writes replace two full-grid mask multiplies
    and the full-grid tapered-source store, saving ~2.7 full-grid
    op-slots of the ~35-slot step. Bitwise identical by construction
    (the skipped cells were multiplied by exactly 1.0). Verified against
    the actual mask at build time; any mask that touches rows >= nzb
    (e.g. the all-edges ``taper_apply`` mask) falls back to the fused
    path."""
    if (taper_impl or _ENV_TAPER_IMPL) != "strip":
        return 0
    rows = ctx.nzb
    if rows <= 0 or not np.all(mask_np[rows:, :] == np.float32(1.0)):
        return 0
    return rows


def _make_taper_leap(ctx: FDContext, v2_ref, mask_ref, lap,
                     taper_rows: int):
    """Shared tapered leapfrog step: taper src and dst, update dst from the
    tapered src (``kernel_tapper`` + ``kernel_lap`` + ``kernel_time``,
    ``fd-code.cu:264-266``), leaving src holding its tapered value.
    ``lap`` is the in-kernel Laplacian closure from :func:`_make_lap`.

    Two lowerings with bitwise-identical results (see :func:`_taper_rows`):
    the fused full-grid form (default) and the strip form that multiplies
    only the ``taper_rows`` sublane rows where the mask is not 1."""

    def fused(dst, src):
        sm = src[:, :] * mask_ref[:, :]
        dst[:, :] = (2.0 * sm - dst[:, :] * mask_ref[:, :]
                     + v2_ref[:, :] * lap(sm))
        src[:, :] = sm

    def strip(dst, src):
        r = taper_rows
        src[:r, :] = src[:r, :] * mask_ref[:r, :]
        dst[:r, :] = dst[:r, :] * mask_ref[:r, :]
        s = src[:, :]
        dst[:, :] = (2.0 * s - dst[:, :]
                     + v2_ref[:, :] * lap(s))

    return strip if taper_rows else fused


def _coefs(ctx: FDContext):
    """Premultiplied coefficients as python floats (compile-time constants;
    pallas kernels cannot capture array-valued constants). Returned in
    z-major order: (axis0=z, axis1=x)."""
    cx = [float(v) for v in ctx.coefs_x]
    cz = [float(v) for v in ctx.coefs_z]
    return cz, cx


def _src_rows(ctx: FDContext, sx, gaussian: bool) -> jnp.ndarray:
    """Injection rows for a source at x=sx (traced): (2r+1, nxe) Gaussian
    columns (``ptsrc.c:51-57``) or (1, nxe) one-hot (K4). Row k corresponds
    to depth sz-r+k."""
    x = jnp.arange(ctx.nxe)
    if gaussian:
        r = ctx.source_patch.shape[0] // 2
        dz = jnp.arange(-r, r + 1, dtype=jnp.float32)[:, None]
        dx = (x[None, :] - sx).astype(jnp.float32)
        rows = jnp.exp(-dz * dz - dx * dx)
        # ptsrc contributes only within the +-r window
        return jnp.where(jnp.abs(dx) <= r, rows, 0.0).astype(jnp.float32)
    return (x[None, :] == sx).astype(jnp.float32)


# ==========================================================================
# Forward modeling (CPU-pipeline flavor) — seismogram in VMEM
# ==========================================================================

def _fwd_mod_kernel(ctx: FDContext, gz: int, sz: int, r: int,
                    use_mxu: bool, z_taps: str,
                    v2_ref, mask_ref, wav_ref, src_ref, *rest):
    """One shot of mod_main's time loop (``mod_main.cpp:146-168``), z-major.
    Buffer roles alternate per step: even it updates B from A and records A;
    odd it updates A from B and records B (the functional double buffer)."""
    if use_mxu:
        mxu_refs, rest = rest[:3], rest[3:]
    else:
        mxu_refs = None
    seis_ref, pout_ref, ppout_ref, A, B = rest
    nt = ctx.nt
    lap = _make_lap(ctx, mxu_refs, z_taps)

    def step(src_buf, dst_buf, it):
        """update dst from src; inject; taper both; record row gz of src.
        The new field's taper fuses with the update everywhere; the source
        band rows (static slice) are rewritten with the injection folded in
        — value-level scatter-add does not lower on TPU."""
        p = src_buf[:, :]
        upd = (2.0 * p - dst_buf[:, :] + v2_ref[:, :] * lap(p))
        amp = wav_ref[it, 0]
        dst_buf[:, :] = upd * mask_ref[:, :]
        band = slice(sz - r, sz + r + 1)
        dst_buf[band, :] = ((upd[band, :] + amp * src_ref[:, :])
                            * mask_ref[band, :])
        tapered_p = p * mask_ref[:, :]
        src_buf[:, :] = tapered_p
        seis_ref[pl.ds(it, 1), :] = tapered_p[gz:gz + 1,
                                              ctx.nxb:ctx.nxb + ctx.nx]

    A[:, :] = jnp.zeros_like(A)
    B[:, :] = jnp.zeros_like(B)

    def pair(i, _):
        step(A, B, 2 * i)
        step(B, A, 2 * i + 1)
        return 0

    jax.lax.fori_loop(0, nt // 2, pair, 0)
    if nt % 2:
        step(A, B, nt - 1)
    # final logical (p, pp) carry = (new field, old field) by parity
    if nt % 2:
        pout_ref[:, :] = B[:, :]
        ppout_ref[:, :] = A[:, :]
    else:
        pout_ref[:, :] = A[:, :]
        ppout_ref[:, :] = B[:, :]


def forward_modeling_pallas(ctx: FDContext, v2, wavelet, sx, sz: int, gz: int,
                            source: str = "gaussian", taper: str = "all",
                            interpret: bool = False, lap_impl=None,
                            z_taps: str = "roll"):
    """VMEM-resident forward modeling. Returns ``(p, pp, seis)`` with seis
    shaped (nt, nx) — identical contract to
    ``solver.forward_modeling(..., record='trace')``.

    ``sz``/``gz`` must be static ints (fixed acquisition depths, like the
    reference); ``sx`` may be a traced per-shot scalar. ``lap_impl``: see
    :func:`rtm_snapshot_pallas`.
    """
    gaussian = source == "gaussian"
    r = ctx.source_patch.shape[0] // 2 if gaussian else 0
    use_mxu = _use_mxu_lap(lap_impl, ctx)
    wp = -(-ctx.nxe // 128) * 128 if use_mxu else ctx.nxe
    mask = jnp.asarray(ctx.mask_all if taper == "all" else ctx.mask_top).T
    src_rows = _src_rows(ctx, jnp.asarray(sx), gaussian)
    v2m = _v2_operand(ctx, v2)
    extra = []
    if use_mxu:
        mask = _pad_lanes(mask, wp)
        src_rows = _pad_lanes(src_rows, wp)
        v2m = _pad_lanes(v2m, wp)
        extra = list(_mxu_band_inputs(ctx, wp, use_mxu))

    kern = functools.partial(_fwd_mod_kernel, ctx, gz, sz, r, use_mxu,
                             z_taps)
    out_shape = (
        jax.ShapeDtypeStruct((ctx.nt, ctx.nx), jnp.float32),    # seis (t, x)
        jax.ShapeDtypeStruct((ctx.nze, wp), jnp.float32),       # p
        jax.ShapeDtypeStruct((ctx.nze, wp), jnp.float32),       # pp
    )
    seis, p, pp = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=_wav_space(ctx.nt)),  # wavelet
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
        scratch_shapes=[
            pltpu.VMEM((ctx.nze, wp), jnp.float32),
            pltpu.VMEM((ctx.nze, wp), jnp.float32),
        ],
        compiler_params=_vmem_plan(
            ctx, 6, ctx.nt * ctx.nx * 4 + 6 * ctx.nze * (wp - ctx.nxe) * 4,
            interpret, "forward_modeling_pallas"),
        interpret=interpret,
    )(v2m, mask, jnp.reshape(wavelet, (ctx.nt, 1)), src_rows, *extra)
    p = p[:, :ctx.nxe]
    pp = pp[:, :ctx.nxe]
    return jnp.transpose(p), jnp.transpose(pp), seis


# ==========================================================================
# Whole-shot two-snapshot RTM (GPU-suite flavor) — one kernel per shot
# ==========================================================================

def _rtm_kernel(ctx: FDContext, gz: int, sz: int, taper_rows: int,
                use_mxu: bool, z_taps: str,
                v2_ref, mask_ref, wav_ref, src_ref, dobs_ref,
                *rest):
    """fd_forward + fd_back in one kernel, z-major.

    Forward (``fd-code.cu:259-267``): per step swap, taper both, update,
    point-inject. Buffer roles: even it updates A from B (post-swap p is the
    source buffer B), odd updates B from A.

    Backward (``fd-code.cu:302-333``): the source pair is seeded from the
    forward's final two states (already sitting in A/B) and re-propagated in
    reverse *without taper* (random-boundary quasi-reversibility); the
    receiver pair C/D is tapered, updated, and data-injected; imaging
    accumulates ``imloc += p * ppr`` every step (borders sliced off by the
    caller).
    """
    if use_mxu:
        mxu_refs, rest = rest[:3], rest[3:]
    else:
        mxu_refs = None
    imloc_ref, A, B, C, D = rest
    nt = ctx.nt
    lap = _make_lap(ctx, mxu_refs, z_taps)

    def leap(dst, src):
        s = src[:, :]
        dst[:, :] = (2.0 * s - dst[:, :] + v2_ref[:, :] * lap(s))

    taper_leap = _make_taper_leap(ctx, v2_ref, mask_ref, lap, taper_rows)

    # ---------------- forward ----------------
    A[:, :] = jnp.zeros_like(A)
    B[:, :] = jnp.zeros_like(B)

    def fstep(dst, src, it):
        # taper fused into the update (or strip form — bitwise identical,
        # see _make_taper_leap): same operand values/order as the
        # reference's taper-then-update
        taper_leap(dst, src)
        dst[sz:sz + 1, :] += wav_ref[it, 0] * src_ref[:, :]

    def fpair(i, _):
        fstep(A, B, 2 * i)
        fstep(B, A, 2 * i + 1)
        return 0

    jax.lax.fori_loop(0, nt // 2, fpair, 0)
    if nt % 2:
        fstep(A, B, nt - 1)

    # snaps: P = final p, PP = final pp (fd-code.cu:285-286,502-507)
    snapP, snapPP = (A, B) if nt % 2 == 0 else (B, A)

    # ---------------- backward ----------------
    # Derivation: with (p,pp) seeded so that imaging sees p=PP at it=0 and
    # p=P at it=1, from it>=2 the source pair leapfrogs in reverse: even it
    # updates the PP-buffer from the P-buffer and images with it; odd the
    # mirror. The receiver pair starts from zero: even it updates D from C
    # and images with D; odd updates C from D and images with C.
    C[:, :] = jnp.zeros_like(C)
    D[:, :] = jnp.zeros_like(D)
    imloc_ref[:, :] = jnp.zeros_like(imloc_ref)

    def rstep(dst, src, it):
        taper_leap(dst, src)
        # receiver row add at interior lanes [nxb, nxb+nx) (kernel_sism)
        dst[gz:gz + 1, ctx.nxb:ctx.nxb + ctx.nx] += dobs_ref[pl.ds(it, 1), :]

    def image_with(pbuf, rbuf):
        imloc_ref[:, :] += pbuf[:, :] * rbuf[:, :]

    # it = 0, 1 peeled: source pair reads the snapshots directly
    rstep(D, C, 0)
    image_with(snapPP, D)
    rstep(C, D, 1)
    image_with(snapP, C)

    def bpair(i, _):
        it = 2 + 2 * i
        leap(snapPP, snapP)
        rstep(D, C, it)
        image_with(snapPP, D)
        leap(snapP, snapPP)
        rstep(C, D, it + 1)
        image_with(snapP, C)
        return 0

    jax.lax.fori_loop(0, (nt - 2) // 2, bpair, 0)
    if (nt - 2) % 2:
        leap(snapPP, snapP)
        rstep(D, C, nt - 1)
        image_with(snapPP, D)


def rtm_snapshot_pallas(ctx: FDContext, v2, wavelet, dobs, sx, sz: int,
                        gz: int, interpret: bool = False, lap_impl=None,
                        z_taps: str = "roll", taper_impl: str = None):
    """Whole-shot two-snapshot RTM in a single Pallas kernel.

    Args match ``solver.rtm_shot_snapshot``: ``dobs`` is (nx, nt) observed
    data (interior receivers); ``sz``/``gz`` static ints, ``sx`` traced.
    Returns the (nx, nz) per-shot image.

    ``lap_impl``: None uses the import-time ``PFDC_LAP_IMPL`` snapshot; ``"mxu"`` pads the lane
    (x) axis to a 128 multiple and computes the x taps as banded MXU
    matmuls (manual 3-pass bf16 — see :func:`_make_lap`); the pad lanes
    carry zero mask/v2 so the fields stay exactly zero there. ``"mxu6"``
    is the 6-pass triple-split variant: ~f32-level per-apply accuracy at
    twice the matmul passes (the accuracy tier for long-nt configs like
    marmousi where 3-pass rounding amplifies past 1e-4).
    """
    mask_np = np.transpose(np.asarray(ctx.mask_top))
    use_mxu = _use_mxu_lap(lap_impl, ctx)
    wp = -(-ctx.nxe // 128) * 128 if use_mxu else ctx.nxe
    mask = jnp.asarray(mask_np)
    src_rows = _src_rows(ctx, jnp.asarray(sx), gaussian=False)
    # time-major receivers at interior width, pre-reversed: row it =
    # dobs[:, nt-1-it]; injected at static lane offset nxb (kernel_sism,
    # fd-code.cu:124-131)
    dobs_tx = dobs[:, ::-1].astype(jnp.float32).T  # (nt, nx)
    v2m = _v2_operand(ctx, v2)
    extra = []
    if use_mxu:
        mask = _pad_lanes(mask, wp)
        src_rows = _pad_lanes(src_rows, wp)
        v2m = _pad_lanes(v2m, wp)
        extra = list(_mxu_band_inputs(ctx, wp, use_mxu))

    kern = functools.partial(_rtm_kernel, ctx, gz, sz,
                             _taper_rows(ctx, mask_np, taper_impl),
                             use_mxu, z_taps)
    imloc_ext = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ctx.nze, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=_wav_space(ctx.nt)),  # wavelet
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra),
        scratch_shapes=[
            pltpu.VMEM((ctx.nze, wp), jnp.float32),
            pltpu.VMEM((ctx.nze, wp), jnp.float32),
            pltpu.VMEM((ctx.nze, wp), jnp.float32),
            pltpu.VMEM((ctx.nze, wp), jnp.float32),
        ],
        compiler_params=_vmem_plan(
            ctx, 7, ctx.nt * ctx.nx * 4 + 7 * ctx.nze * (wp - ctx.nxe) * 4,
            interpret, "rtm_snapshot_pallas"),
        interpret=interpret,
    )(v2m, mask, jnp.reshape(wavelet, (ctx.nt, 1)),
      src_rows, dobs_tx, *extra)
    interior = imloc_ext[ctx.nzb:ctx.nze - ctx.nzb,
                         ctx.nxb:ctx.nxe - ctx.nxb]
    return jnp.transpose(interior)


# ==========================================================================
# Split kernels: fd_forward and fd_back as separate pallas calls
# ==========================================================================
# Same math as _rtm_kernel but one propagation per kernel — half the Mosaic
# IR per compile, which matters for the largest configs, and a direct
# analogue of the reference's driver split (fd_forward / fd_back,
# fd-code.cu:247-341). Snapshots round-trip through HBM between the calls
# (2 fields, negligible traffic).

def _fwd_gpu_kernel(ctx: FDContext, sz: int, taper_rows: int,
                    v2_ref, mask_ref, wav_ref, src_ref,
                    pout_ref, ppout_ref, A, B):
    nt = ctx.nt
    taper_leap = _make_taper_leap(ctx, v2_ref, mask_ref, _make_lap(ctx),
                                  taper_rows)

    def fstep(dst, src, it):
        taper_leap(dst, src)
        dst[sz:sz + 1, :] += wav_ref[it, 0] * src_ref[:, :]

    A[:, :] = jnp.zeros_like(A)
    B[:, :] = jnp.zeros_like(B)

    def fpair(i, _):
        fstep(A, B, 2 * i)
        fstep(B, A, 2 * i + 1)
        return 0

    jax.lax.fori_loop(0, nt // 2, fpair, 0)
    if nt % 2:
        fstep(A, B, nt - 1)
    snapP, snapPP = (A, B) if nt % 2 == 0 else (B, A)
    pout_ref[:, :] = snapP[:, :]
    ppout_ref[:, :] = snapPP[:, :]


def _bwd_gpu_kernel(ctx: FDContext, gz: int, taper_rows: int,
                    v2_ref, mask_ref, snapP_in, snapPP_in, dobs_ref,
                    imloc_ref, A, B, C, D):
    nt = ctx.nt
    lap = _make_lap(ctx)
    taper_leap = _make_taper_leap(ctx, v2_ref, mask_ref, lap, taper_rows)

    def leap(dst, src):
        s = src[:, :]
        dst[:, :] = (2.0 * s - dst[:, :] + v2_ref[:, :] * lap(s))

    snapP, snapPP = A, B
    snapP[:, :] = snapP_in[:, :]
    snapPP[:, :] = snapPP_in[:, :]
    C[:, :] = jnp.zeros_like(C)
    D[:, :] = jnp.zeros_like(D)
    imloc_ref[:, :] = jnp.zeros_like(imloc_ref)

    def rstep(dst, src, it):
        taper_leap(dst, src)
        dst[gz:gz + 1, ctx.nxb:ctx.nxb + ctx.nx] += dobs_ref[pl.ds(it, 1), :]

    def image_with(pbuf, rbuf):
        imloc_ref[:, :] += pbuf[:, :] * rbuf[:, :]

    rstep(D, C, 0)
    image_with(snapPP, D)
    rstep(C, D, 1)
    image_with(snapP, C)

    def bpair(i, _):
        it = 2 + 2 * i
        leap(snapPP, snapP)
        rstep(D, C, it)
        image_with(snapPP, D)
        leap(snapP, snapPP)
        rstep(C, D, it + 1)
        image_with(snapP, C)
        return 0

    jax.lax.fori_loop(0, (nt - 2) // 2, bpair, 0)
    if (nt - 2) % 2:
        leap(snapPP, snapP)
        rstep(D, C, nt - 1)
        image_with(snapPP, D)


def fd_forward_pallas(ctx: FDContext, v2, wavelet, sx, sz: int,
                      interpret: bool = False, taper_impl: str = None):
    """GPU-suite forward propagation as one VMEM-resident kernel
    (``fd_forward``, ``fd-code.cu:247-288``). Returns the final two
    wavefield states ``(p, pp)`` in (nx, nz) layout — the snapshots consumed
    by :func:`fd_back_pallas`."""
    mask_np = np.transpose(np.asarray(ctx.mask_top))
    mask = jnp.asarray(mask_np)
    src_rows = _src_rows(ctx, jnp.asarray(sx), gaussian=False)
    kern = functools.partial(_fwd_gpu_kernel, ctx, sz,
                             _taper_rows(ctx, mask_np, taper_impl))
    p, pp = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((ctx.nze, ctx.nxe), jnp.float32),
                   jax.ShapeDtypeStruct((ctx.nze, ctx.nxe), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=_wav_space(ctx.nt)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ctx.nze, ctx.nxe), jnp.float32),
            pltpu.VMEM((ctx.nze, ctx.nxe), jnp.float32),
        ],
        compiler_params=_vmem_plan(ctx, 6, 0, interpret,
                                   "fd_forward_pallas"),
        interpret=interpret,
    )(_v2_operand(ctx, v2), mask, jnp.reshape(wavelet, (ctx.nt, 1)), src_rows)
    return jnp.transpose(p), jnp.transpose(pp)


def fd_back_pallas(ctx: FDContext, v2, snap_p, snap_pp, dobs, gz: int,
                   interpret: bool = False, taper_impl: str = None):
    """GPU-suite backward propagation + imaging as one VMEM-resident kernel
    (``fd_back``, ``fd-code.cu:290-341``). ``snap_p``/``snap_pp`` are the
    (nx, nz)-layout outputs of :func:`fd_forward_pallas`; ``dobs`` is
    (nx, nt). Returns the (nx, nz) per-shot image."""
    mask_np = np.transpose(np.asarray(ctx.mask_top))
    mask = jnp.asarray(mask_np)
    dobs_tx = dobs[:, ::-1].astype(jnp.float32).T  # (nt, nx)
    kern = functools.partial(_bwd_gpu_kernel, ctx, gz,
                             _taper_rows(ctx, mask_np, taper_impl))
    imloc_ext = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ctx.nze, ctx.nxe), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ctx.nze, ctx.nxe), jnp.float32),
            pltpu.VMEM((ctx.nze, ctx.nxe), jnp.float32),
            pltpu.VMEM((ctx.nze, ctx.nxe), jnp.float32),
            pltpu.VMEM((ctx.nze, ctx.nxe), jnp.float32),
        ],
        compiler_params=_vmem_plan(ctx, 9, ctx.nt * ctx.nx * 4, interpret,
                                   "fd_back_pallas"),
        interpret=interpret,
    )(_v2_operand(ctx, v2), mask, jnp.transpose(snap_p),
      jnp.transpose(snap_pp), dobs_tx)
    interior = imloc_ext[ctx.nzb:ctx.nze - ctx.nzb,
                         ctx.nxb:ctx.nxe - ctx.nxb]
    return jnp.transpose(interior)
