#!/usr/bin/env python
"""Validation harness: the five BASELINE.json configs as runnable recipes.

Runs each capability end-to-end, gates numerical parity against the
reference goldens where they exist (<=1e-4 rel RMS per BASELINE.md), checks
internal consistency (pallas vs lax, sharded vs unsharded) everywhere else,
and writes a VALIDATION.md report.

    python validate.py            # full run on the default platform
    python validate.py --quick    # smaller domain-division mesh check
"""

import argparse
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import io, numerics, pipeline
from parallel_finite_difference_computation_tpu.config import Geometry
from parallel_finite_difference_computation_tpu.solver import (
    FDContext, rtm_shot_full, rtm_shot_checkpointed, rtm_shot_snapshot)
from parallel_finite_difference_computation_tpu.utils.compare import rel_rms

REFERENCE = os.environ.get("PFDC_REFERENCE_ROOT", "/root/reference")
GOLDEN = os.path.join(REFERENCE, "dpct_gpu_rtm_domain_division/build/3lay_mod")
GATE = 1e-4

results = []


def record(config, status, metric, detail):
    results.append((config, status, metric, detail))
    print(f"[{status}] {config}: {metric}  ({detail})")


def _golden_setup():
    p = pfdc.parse_input_dat(os.path.join(GOLDEN, "input.dat"))
    g = Geometry.from_params(p)
    vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    vel2 = jnp.asarray(pipeline.prepare_velocity_cpu(p, vp))
    ctx = FDContext.from_params(p, exact_taper=False)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak,
                                              truncated=True))
    dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
    golden_img = io.read_f32(os.path.join(GOLDEN, "dir.image")
                             ).reshape(p.nx, p.nz)
    return p, g, vp, vel2, ctx, wav, dobs, golden_img


def config1_stencil():
    """stencil_code: one-shot Laplacian on the shipped input.bin."""
    p = pfdc.parse_input_dat(os.path.join(
        REFERENCE, "cuda_reference_stencil_computation/input.dat"))
    # the stencil program abuses the tmpdir key as the data path, relative
    # to its own directory (fd-source-code.cu:43-50)
    inp = os.path.join(REFERENCE, "cuda_reference_stencil_computation",
                       "input.bin")
    t0 = time.time()
    lap = pipeline.run_stencil(p, input_path=inp)
    dt = time.time() - t0
    # oracle: full-field numpy transcription of kernel_lap
    # (cuda_reference_stencil_computation/fd-source-code.cu:110-135) —
    # every interior cell compared, in float64 accumulation
    field = io.read_velocity(inp, p.nxe, p.nze).astype(np.float64)
    cx, cz = numerics.scaled_coefficients(p.order, p.dx, p.dz)
    h = p.order // 2
    expect = np.zeros_like(field)
    for io_ in range(p.order + 1):
        expect[h:-h, h:-h] += (
            cz[io_] * field[h:-h, io_:io_ + field.shape[1] - 2 * h]
            + cx[io_] * field[io_:io_ + field.shape[0] - 2 * h, h:-h])
    got = np.asarray(lap, np.float64)[h:-h, h:-h]
    err = float(np.abs(got - expect[h:-h, h:-h]).max())
    scale = float(np.abs(expect).max()) or 1.0
    ok = err / scale < 1e-6 and np.isfinite(lap).all()
    record("1. stencil (415x295 input.bin)", "PASS" if ok else "FAIL",
           f"full-field max rel err {err / scale:.2e}",
           f"{dt:.2f}s incl compile, {got.shape[0]}x{got.shape[1]} interior")


def config2_modeling():
    """mod_main: forward modeling vs golden dobs.bin."""
    p, g, vp, vel2, ctx, wav, dobs, _ = _golden_setup()
    t0 = time.time()
    data = pipeline.run_modeling(p, vp=vp, backend="lax")
    dt = time.time() - t0
    r = rel_rms(data, dobs)
    record("2. forward modeling (mod_main, 3lay golden)",
           "PASS" if r < GATE else "FAIL", f"rel RMS {r:.2e} vs dobs.bin",
           f"{dt:.2f}s")


def config3_full_rtm():
    """rtm_main/rtm_code: full RTM with cross-correlation imaging."""
    p, g, vp, vel2, ctx, wav, dobs, golden_img = _golden_setup()
    t0 = time.time()
    img = np.asarray(rtm_shot_full(ctx, vel2, wav, jnp.asarray(dobs[0]),
                                   g.sx[0], g.sz, g.gz))
    dt = time.time() - t0
    r = rel_rms(img, golden_img)
    record("3. full RTM (rtm_main, 3lay golden)",
           "PASS" if r < GATE else "FAIL", f"rel RMS {r:.2e} vs dir.image",
           f"{dt:.2f}s")


def config4_checkpointed():
    """RTM_buffers analog: on-device buffering/checkpointing variants."""
    p, g, vp, vel2, ctx, wav, dobs, golden_img = _golden_setup()
    img_ck = np.asarray(rtm_shot_checkpointed(
        ctx, vel2, wav, jnp.asarray(dobs[0]), g.sx[0], g.sz, g.gz,
        save_every=77))
    r_ck = rel_rms(img_ck, golden_img)
    # two-snapshot variant: internal consistency (no golden has its inputs)
    img_sn = np.asarray(rtm_shot_snapshot(ctx, vel2, wav,
                                          jnp.asarray(dobs[0]),
                                          g.sx[0], g.sz, g.gz))
    ok = r_ck < GATE and np.isfinite(img_sn).all() and np.abs(img_sn).max() > 0
    record("4. checkpointed RTM (save-every-k + two-snapshot)",
           "PASS" if ok else "FAIL",
           f"k=77 rel RMS {r_ck:.2e}; 2-snap finite",
           "buffering spectrum: 2 / nt/k+k / 2nt grids")


def config5_domain_division(quick=False):
    """Domain-division RTM: x-sharded grid with halo exchange, multi-shot."""
    from parallel_finite_difference_computation_tpu.parallel import (
        make_mesh, make_sharded_rtm_snapshot, embed_source_fields, embed_dobs)
    cpu = jax.devices("cpu")
    n = min(8, len(cpu))
    n_shot, n_x = (2, n // 2) if n >= 4 else (1, n)
    mesh = make_mesh(n_shot=n_shot, n_x=n_x, devices=cpu)
    ctx = FDContext.create(24, 20, 16 if quick else 40, dx=10.0, dz=10.0,
                           dt=0.001, order=8, nxb=4, nzb=4, fac=0.7)
    rng = np.random.default_rng(0)
    ns = 2 * n_shot
    v2 = (1500.0 + 500.0 * rng.random((ns, ctx.nxe, ctx.nze))
          ).astype(np.float32) ** 2
    sxs = [10 + 2 * i for i in range(ns)]
    wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
    dobs = rng.standard_normal((ns, ctx.nx, ctx.nt)).astype(np.float32)
    fn = make_sharded_rtm_snapshot(ctx, mesh, gz=6)
    srcf = embed_source_fields(ctx, sxs, 7, gaussian=False)
    t0 = time.time()
    with jax.default_device(cpu[0]):
        im_ext = np.asarray(fn(v2, srcf, wav, embed_dobs(ctx, dobs)))
        got = im_ext[:, ctx.nxb:ctx.nxe - ctx.nxb, ctx.nzb:ctx.nze - ctx.nzb]
        ref = np.stack([
            np.asarray(rtm_shot_snapshot(
                ctx, jnp.asarray(v2[i]), wav, jnp.asarray(dobs[i]),
                sxs[i], 7, 6)) for i in range(ns)])
    dt = time.time() - t0
    err = float(np.abs(got - ref).max())
    scale = float(np.abs(ref).max()) or 1.0
    ok = err / scale < 1e-4
    record(f"5. domain-division RTM ({n_shot}x{n_x} mesh, {ns} shots)",
           "PASS" if ok else "FAIL",
           f"sharded vs unsharded max rel err {err / scale:.2e}",
           f"{dt:.2f}s on {n} cpu devices, halo={ctx.order // 2}")


def config6_gpu_oracle(quick=False):
    """GPU-suite two-snapshot RTM vs the serial C oracle at full config —
    the external value gate for the flagship path (whole-shot Pallas on
    TPU via backend=auto for 3lay; lax for the larger configs to keep
    validate's compile budget bounded; the Pallas/lax equivalence is
    separately bit-gated in bench/tests)."""
    import tempfile
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        gpu_goldens)
    runs = [("3lay_gpu", "auto"), ("1lay", "lax")]
    if not quick:
        # marmousi: the flagship GPU-suite model at full configuration
        # (369x375, nt=3004, dz=8 != dx=25) — gated on the lax path
        # everywhere and additionally on the strict whole-shot Pallas
        # path on the real chip (VERDICT r2 items 2)
        runs += [("new_mod", "lax"), ("marmousi", "lax")]
        if jax.devices()[0].platform == "tpu":
            runs += [("marmousi", "pallas")]
    for name, backend in runs:
        try:
            paths = gpu_goldens(name)
        except FileNotFoundError as e:
            record(f"6. GPU-suite RTM vs C oracle ({name})", "SKIP",
                   "reference artifact missing", str(e)[:40])
            continue
        p = pfdc.parse_input_dat(str(paths["input_parity"]))
        with tempfile.TemporaryDirectory() as td:
            try:
                img, imlocs = pipeline.run_rtm_gpu(p, backend=backend,
                                                   outdir=td,
                                                   write_image_num=True)
            except Exception as e:
                # strict backends (pallas) re-raise kernel failures by
                # design; record FAIL and keep the harness going so the
                # remaining configs still run and VALIDATION.md is written
                record(f"6. GPU-suite RTM vs C oracle ({name}, {backend})",
                       "FAIL", f"{type(e).__name__}: {str(e)[:80]}",
                       f"ns={p.ns} nt={p.nt} {p.nx}x{p.nz}")
                continue
            golden = np.fromfile(paths["dir_image"],
                                 np.float32).reshape(p.nx, p.nz)
            gims = np.fromfile(paths["imlocs"],
                               np.float32).reshape(p.ns, p.nx, p.nz)
            r = rel_rms(np.asarray(img), golden)
            rs = max(rel_rms(np.asarray(imlocs[i]), gims[i])
                     for i in range(p.ns))
            got_num = io.read_image_num(os.path.join(td, "image.num"))
            want_num = io.read_image_num(str(paths["image_num"]))
            num_ok = len(got_num) == len(want_num) and all(
                np.sqrt(np.mean((np.asarray(a, np.float64)
                                 - np.asarray(b, np.float64)) ** 2))
                / max(float(np.sqrt(np.mean(np.asarray(b) ** 2))), 1e-3)
                < GATE for a, b in zip(got_num, want_num))
        ok = r < GATE and rs < GATE and num_ok
        record(f"6. GPU-suite RTM vs C oracle ({name}, {backend})",
               "PASS" if ok else "FAIL",
               f"image {r:.2e}, worst shot {rs:.2e}, image.num "
               + ("ok" if num_ok else "MISMATCH"),
               f"ns={p.ns} nt={p.nt} {p.nx}x{p.nz}")

    # split forward/backward kernels on the real chip, gated vs the oracle
    if jax.devices()[0].platform == "tpu" and not quick:
        from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
            fd_forward_pallas, fd_back_pallas)
        try:
            paths = gpu_goldens("3lay_gpu")
        except FileNotFoundError as e:
            record("6b. split fd_forward/fd_back Pallas kernels vs oracle "
                   "(TPU)", "SKIP", "reference artifact missing",
                   str(e)[:40])
            return
        p = pfdc.parse_input_dat(str(paths["input_parity"]))
        g = Geometry.from_params(p)
        ctx = FDContext.from_params(p, exact_taper=True)
        vel2 = pipeline.prepare_velocities_gpu(
            p, io.read_velocity(p.vpfile, p.nx, p.nz))
        wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak))
        dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
        snapP, snapPP = fd_forward_pallas(ctx, jnp.asarray(vel2[0]), wav,
                                          g.sx[0], g.sz)
        im = fd_back_pallas(ctx, jnp.asarray(vel2[0]), snapP, snapPP,
                            jnp.asarray(dobs[0]), g.gz)
        gims = np.fromfile(paths["imlocs"], np.float32).reshape(
            p.ns, p.nx, p.nz)
        r = rel_rms(np.asarray(im), gims[0])
        record("6b. split fd_forward/fd_back Pallas kernels vs oracle (TPU)",
               "PASS" if r < GATE else "FAIL", f"shot 0 rel RMS {r:.2e}",
               "compiled Mosaic, 3lay full config")


def config6c_upstream_norms(quick: bool = False):
    """The one upstream-recorded run value that can be checked:
    norm_source=74.3729 (cuda_reference_RTM/models/marmousi/input.dat:22)
    matches the interior L2 of the final backward source-reconstruction
    field to ~1% (docs/NORMS.md; norm_rev/norm_imloc scale with the
    missing dado_teste.bin and are documented negative results)."""
    if quick:
        # config 6 keeps marmousi (369x375, nt=3004) out of the quick lane
        # to bound the compile budget; the same applies here
        record("6c. upstream-recorded norm_source (marmousi)", "SKIP",
               "full marmousi config excluded from --quick", "docs/NORMS.md")
        return
    if jax.devices()[0].platform != "tpu":
        record("6c. upstream-recorded norm_source (marmousi)", "SKIP",
               "TPU-only (marmousi full config)", "docs/NORMS.md")
        return
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        marmousi_final_fields)
    try:
        p, ctx, fields = marmousi_final_fields()
    except FileNotFoundError as e:
        record("6c. upstream-recorded norm_source (marmousi)", "SKIP",
               "reference artifact missing", str(e)[:40])
        return
    got = float(np.sqrt((np.asarray(
        fields["back_p"], np.float64)[p.nxb:-p.nxb, p.nzb:-p.nzb]
        ** 2).sum()))
    want = 74.3729
    rel = abs(got - want) / want
    record("6c. upstream-recorded norm_source (marmousi)",
           "PASS" if rel < 0.15 else "FAIL",
           f"interior L2 {got:.2f} vs recorded {want} ({rel * 100:.1f}%)",
           "norm_rev/norm_imloc: negative result, docs/NORMS.md")


MXU_ENVELOPE = 5e-3


def config6d_mxu_fast_path(quick: bool = False):
    """The MXU lane-tap fast path (``lap_impl="mxu"``; ~2x the exact
    whole-shot kernel, docs/PALLAS_NOTES.md) vs the C oracle at full
    configuration.

    Two different bars, both measured and recorded: 3lay-class configs
    must meet the same 1e-4 bar as the default path (that is what makes
    the fast path headline-eligible in bench). Marmousi (369x375,
    nt=3004, dz=8 != dx=25) is the measured *limitation*: 3004 forward +
    3004 backward steps amplify the ~4e-6/apply manual-bf16_3x rounding
    to ~2.4e-3 — outside the 1e-4 parity bar, inside the documented
    fast-path envelope (5e-3). The row records the number so the
    limitation stays pinned; the exact kernel (the default, row 6
    marmousi/pallas: ~4e-6) and the 6-pass ``mxu6`` tier (triple bf16
    split, ~f32-level per apply — measured 4.0e-6 on marmousi, gated at
    1e-4 here) are the paths for configs that need 1e-4.
    See docs/PALLAS_NOTES.md "z-taps on the MXU" for the analysis."""
    if jax.devices()[0].platform != "tpu":
        record("6d. MXU fast path vs C oracle", "SKIP",
               "TPU-only (compiled Mosaic)", "lap_impl=mxu")
        return
    import tempfile
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        gpu_goldens)
    runs = ([("3lay_gpu", "mxu")] if quick else
            [("3lay_gpu", "mxu"), ("marmousi", "mxu"),
             ("marmousi", "mxu6"), ("marmousi", "auto")])
    import warnings
    for name, impl in runs:
        with warnings.catch_warnings():
            # marmousi/mxu deliberately probes outside the validated
            # envelope — the envelope warning is this config's subject
            warnings.simplefilter("ignore")
            label = f"6d. MXU fast path vs C oracle ({name}/{impl})"
            try:
                paths = gpu_goldens(name)
            except FileNotFoundError as e:
                record(label, "SKIP",
                       "reference artifact missing", str(e)[:40])
                continue
            p = pfdc.parse_input_dat(str(paths["input_parity"]))
            with tempfile.TemporaryDirectory() as td:
                try:
                    img, imlocs = pipeline.run_rtm_gpu(p, backend="pallas",
                                                       outdir=td,
                                                       lap_impl=impl)
                except Exception as e:
                    record(label,
                           "FAIL", f"{type(e).__name__}: {str(e)[:80]}",
                           f"ns={p.ns} nt={p.nt} {p.nx}x{p.nz}")
                    continue
            golden = np.fromfile(paths["dir_image"],
                                 np.float32).reshape(p.nx, p.nz)
            gims = np.fromfile(paths["imlocs"],
                               np.float32).reshape(p.ns, p.nx, p.nz)
            r = rel_rms(np.asarray(img), golden)
            rs = max(rel_rms(np.asarray(imlocs[i]), gims[i])
                     for i in range(p.ns))
            if name == "3lay_gpu" or impl in ("mxu6", "auto"):
                # "auto" on marmousi must route to the 6-pass tier and
                # clear 1e-4 without the user knowing mxu6 exists
                ok = r < GATE and rs < GATE
                bar = ("1e-4 parity bar (headline-eligibility)"
                       if impl != "auto" else
                       "1e-4 bar via envelope routing (auto -> mxu6)")
            else:
                # marmousi/mxu: the documented 3-pass limitation — must
                # stay within the measured envelope, and the row pins the
                # actual drift (1e-4 runs use the exact kernel or mxu6)
                ok = r < MXU_ENVELOPE and rs < MXU_ENVELOPE
                bar = (f"documented limitation: outside the 1e-4 bar, "
                       f"within the {MXU_ENVELOPE:g} fast-path envelope")
            record(label,
                   "PASS" if ok else "FAIL",
                   f"image {r:.2e}, worst shot {rs:.2e}",
                   f"lap_impl={impl}, ns={p.ns} nt={p.nt} "
                   f"{p.nx}x{p.nz}; {bar}")


def config7_rtm_main_multishot():
    """Multi-shot rtm_main parity (ns=3 golden from the rebuilt reference
    binaries, incl. the cross-shot it=0 flat-read quirk)."""
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        rtm_main_goldens)
    try:
        gpaths = rtm_main_goldens(ns=3)
    except FileNotFoundError as e:
        record("7. rtm_main ns=3 parity", "SKIP", "reference missing",
               str(e)[:40])
        return
    p = pfdc.parse_input_dat(str(gpaths["input"]))
    img, imlocs = pipeline.run_rtm_cpu(p)
    gimg = np.fromfile(gpaths["dir_image"], np.float32).reshape(p.nx, p.nz)
    gims = np.fromfile(gpaths["dir_img"], np.float32).reshape(
        p.ns, p.nx, p.nz)
    r = rel_rms(np.asarray(img), gimg)
    rs = max(rel_rms(np.asarray(imlocs[i]), gims[i]) for i in range(p.ns))
    record("7. rtm_main ns=3 parity (rebuilt reference binaries)",
           "PASS" if r < GATE and rs < GATE else "FAIL",
           f"image {r:.2e}, worst shot {rs:.2e}",
           "cross-shot OOB flat-read emulated")


def config8_spluto():
    """spluto CPU-pipeline parity at full configuration — the subsampled
    Pluto model (367x351, nt=2000), the only CPU-suite config with
    anisotropic spacing (dx=25 != dz=10); goldens from the reference's own
    rebuilt mod_main/rtm_main binaries."""
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        rtm_main_goldens)
    try:
        g = rtm_main_goldens(model="spluto", ns=1)
    except FileNotFoundError as e:
        record("8. spluto full config (mod+rtm)", "SKIP",
               "reference missing", str(e)[:40])
        return
    p = pfdc.parse_input_dat(str(g["input"]))
    t0 = time.time()
    data = pipeline.run_modeling(p, backend="lax")
    golden_d = np.fromfile(g["dobs"], np.float32).reshape(p.ns, p.nx, p.nt)
    rd = rel_rms(np.asarray(data), golden_d)
    img, _ = pipeline.run_rtm_cpu(p)
    gi = np.fromfile(g["dir_image"], np.float32).reshape(p.nx, p.nz)
    ri = rel_rms(np.asarray(img), gi)
    dt = time.time() - t0
    record("8. spluto full config (367x351, nt=2000, dx!=dz)",
           "PASS" if max(rd, ri) < GATE else "FAIL",
           f"dobs {rd:.2e}, image {ri:.2e}", f"{dt:.2f}s")


def config9_pluto_scale():
    """Pluto-scale capability gate: the reference ships a full-resolution
    Pluto config (build/pluto/input.orig: 1201x6960, nt=12860, ns=30) whose
    velocity blob is gitignored upstream — the grid size is the capability.
    Run forward modeling and the memory-light two-snapshot RTM at the exact
    spatial dims with a synthetic layered model and bounded nt. The
    whole-shot Pallas kernel cannot fit this grid in VMEM, so backend=auto
    must degrade cleanly through the derived-VMEM-model fallback chain."""
    from parallel_finite_difference_computation_tpu.config import Params
    from parallel_finite_difference_computation_tpu.models.zoo import (
        layered_model)
    if jax.devices()[0].platform != "tpu":
        # off-TPU, backend=auto resolves to lax and the auto-vs-lax gate
        # degenerates to comparing a computation with itself (after two
        # very slow 6960x1201 CPU runs) — nothing meaningful is validated
        record("9. pluto-scale synthetic (6960x1201, nt=400)", "SKIP",
               "TPU-only", "auto-vs-lax gate is vacuous off-TPU")
        return
    p = Params(nz=1201, nx=6960, nt=400, dz=7.62, dx=7.62, dt=0.0007,
               fpeak=6.0, ns=1, sz=0, fsx=2700, ds=20, gz=0,
               nxb=40, nzb=40, fac=0.75, order=8, rnd=1)
    vp = layered_model(p.nx, p.nz,
                       velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    t0 = time.time()
    data = np.asarray(pipeline.run_modeling(p, vp=vp, backend="auto"))
    t_mod = time.time() - t0
    # auto resolves to the fused HBM-streaming tier at this size (the
    # whole-shot kernel cannot fit VMEM); gate it against the lax path
    data_lax = np.asarray(pipeline.run_modeling(p, vp=vp, backend="lax"))
    r_tier = rel_rms(data, data_lax)
    g = Geometry.from_params(p)
    vel2 = jnp.asarray(pipeline.prepare_velocity_cpu(p, vp))
    ctx = FDContext.from_params(p, exact_taper=True)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak))
    t0 = time.time()
    img = np.asarray(rtm_shot_snapshot(ctx, vel2, wav,
                                       jnp.asarray(data[0]),
                                       g.sx[0], g.sz, g.gz))
    t_rtm = time.time() - t0
    # compiled-Mosaic gate for the streaming RTM tier (the kernels that
    # run_rtm_gpu's fallback chain reaches only at beyond-VMEM configs)
    from parallel_finite_difference_computation_tpu.solver import (
        rtm_shot_snapshot_tiled)
    img_t = np.asarray(rtm_shot_snapshot_tiled(ctx, vel2, wav,
                                               jnp.asarray(data[0]),
                                               g.sx[0], g.sz, g.gz))
    r_rtm = rel_rms(img_t, img)
    # ... and the temporally-blocked variant (K=4 fused fd_forward/fd_back
    # steps per HBM pass — the tier run_rtm_gpu now routes to, gated at
    # the 1e-4 parity bar), plus its 3-pass MXU z-tap fast path (35.7 vs
    # 12.1 per-step GCell-upd/s) — measured 4.9e-4 here: the documented
    # bf16_3x drift class (validate 6d marmousi), so it is gated at the
    # 5e-3 fast-path envelope and is NOT routed by default (mxu6 measures
    # accurate but slower than exact on this DMA-heavy tier: 22.1 vs
    # 24.3 GCell-upd/s — recorded negative, scripts/exp_kstep_rtm.py)
    img_k = np.asarray(rtm_shot_snapshot_tiled(ctx, vel2, wav,
                                               jnp.asarray(data[0]),
                                               g.sx[0], g.sz, g.gz,
                                               tile_rows=256, block_k=4))
    r_rtm_k = rel_rms(img_k, img)
    img_km = np.asarray(rtm_shot_snapshot_tiled(
        ctx, vel2, wav, jnp.asarray(data[0]), g.sx[0], g.sz, g.gz,
        tile_rows=256, block_k=4, lap_impl="mxu"))
    r_rtm_km = rel_rms(img_km, img)
    MXU_ENVELOPE = 5e-3
    ok = (np.isfinite(data).all() and np.abs(data).max() > 0
          and np.isfinite(img).all() and np.abs(img).max() > 0
          and r_tier < GATE and r_rtm < GATE and r_rtm_k < GATE
          and r_rtm_km < MXU_ENVELOPE)
    record("9. pluto-scale synthetic (6960x1201, nt=400)",
           "PASS" if ok else "FAIL",
           f"mod auto-vs-lax {r_tier:.2e}, rtm tiled-vs-lax {r_rtm:.2e}, "
           f"kstep4 {r_rtm_k:.2e}, kstep4-mxu {r_rtm_km:.2e} "
           "(3-pass envelope 5e-3, not routed)",
           f"mod {t_mod:.1f}s, 2-snap rtm {t_rtm:.1f}s incl compile")


def config10_pluto_survey():
    """Full-resolution Pluto survey self-consistency: re-asserts the gates
    of the recorded end-to-end CLI run (``scripts/run_pluto_survey.py`` —
    nt=12860, ns=30, survey checkpoint/resume on the real chip): the
    survey-stored per-shot image must equal a standalone re-run of that
    global shot index (PRNG/quirk threading), and the streaming tier must
    spot-match the lax whole-grid path at truncated nt. SKIPs when the
    artifact is absent or a reduced-scale smoke run."""
    import json as _json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "experiments", "pluto_survey_results.json")
    name = "10. pluto full survey (nt=12860, ns=30, CLI + ckpt resume)"
    if not os.path.exists(path):
        record(name, "SKIP", "-", "run scripts/run_pluto_survey.py first")
        return
    with open(path) as f:
        r = _json.load(f)
    if r.get("nt", 0) < 12860 or r.get("ns", 0) < 30:
        record(name, "SKIP", "-",
               f"artifact is a reduced-scale run (nt={r.get('nt')}, "
               f"ns={r.get('ns')})")
        return
    a = r.get("chunk_vs_standalone_shot_rel_err")
    b = r.get("tiled_vs_lax_truncated_nt_rel_err")
    ok = (a is not None and b is not None and a <= 1e-6 and b <= GATE)
    mod_s = r.get("modeling_wall_s", 0) or 0
    rtm_s = r.get("rtm_total_wall_s", 0) or 0
    per = r.get("rtm_s_per_shot", 0) or 0
    record(name, "PASS" if ok else "FAIL",
           f"chunk-vs-standalone {a:.2e}, tiled-vs-lax {b:.2e}",
           f"recorded {r.get('date')}: mod {mod_s:.0f}s, rtm {rtm_s:.0f}s"
           f" ({per:.1f} s/shot incl tunnel transfers + restart)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"validation on {dev} ({dev.platform})\n")
    config1_stencil()
    config2_modeling()
    config3_full_rtm()
    config4_checkpointed()
    config5_domain_division(quick=args.quick)
    config6_gpu_oracle(quick=args.quick)
    config6c_upstream_norms(quick=args.quick)
    config6d_mxu_fast_path(quick=args.quick)
    config7_rtm_main_multishot()
    config8_spluto()
    config9_pluto_scale()
    config10_pluto_survey()

    with open("VALIDATION.md", "w") as f:
        f.write("# Validation report — BASELINE configs + oracle gates\n\n")
        f.write(f"Device: {dev} ({dev.platform})\n\n")
        f.write("| Config | Status | Parity metric | Detail |\n|---|---|---|---|\n")
        for row in results:
            f.write("| " + " | ".join(row) + " |\n")
    n_fail = sum(1 for r in results if r[1] != "PASS")
    print(f"\n{len(results) - n_fail}/{len(results)} configs PASS"
          + (f" — {n_fail} FAILED" if n_fail else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
