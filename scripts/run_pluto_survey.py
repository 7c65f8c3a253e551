"""The full-resolution Pluto survey, end-to-end, on the real chip.

The reference ships the production-scale config
(``dpct_gpu_rtm_domain_division/build/pluto/input.orig``: 1201x6960,
nt=12860, ns=30) but its velocity blob is absent upstream, and its
``rtm_main`` full-wavefield design point cannot hold 2*nt pluto
wavefields anywhere (2 x 12860 x 6960 x 1201 x 4 B ~ 860 TB) — the
feasible (and intended: ``rnd=1``) design point is the two-snapshot
GPU-suite RTM. This script runs the ENTIRE survey shape the reference
never could, through the CLI:

  1. synthesize the velocity (the same layered pluto-scale model the
     bench uses) and write a reference-format ``input.dat``;
  2. ``cli mod`` — forward-model all 30 shot gathers at full nt=12860
     (beyond-VMEM K-step streaming tier via backend=auto);
  3. ``cli rtm_gpu --checkpoint-dir`` — migrate all 30 shots with
     survey checkpointing, INTERRUPTED mid-run (SIGTERM — see ``cli()``
     for why not SIGKILL on a tunneled chip) and resumed, proving
     production-scale crash recovery;
  4. validate: (a) a chunk shot re-run standalone through the pipeline
     (global-shot-index PRNG threading) must equal the survey's stored
     per-shot image bitwise; (b) the streaming tier vs the lax
     whole-grid path at truncated nt (spot parity).

Writes ``docs/experiments/pluto_survey_results.json`` with wall-clocks,
s/shot, GCell-upd/s, and the HBM footprint model. Run on the real chip:

    python scripts/run_pluto_survey.py [--nt 12860] [--ns 30]
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NZ, NX = 1201, 6960
NB = 40


def build_inputs(work, nt, ns):
    from parallel_finite_difference_computation_tpu.models.zoo import (
        layered_model)
    os.makedirs(work, exist_ok=True)
    vp = layered_model(NX, NZ, velocities=(1500.0, 2200.0, 3000.0, 4000.0))
    vp.astype(np.float32).tofile(os.path.join(work, "pluto-m.bin"))
    # the reference config verbatim (input.orig) minus its absent blobs:
    # same grid/geometry/boundary keys, synthetic vpfile/datfile paths
    cfg = os.path.join(work, "input.dat")
    with open(cfg, "w") as f:
        f.write(f"""tmpdir={work}/
vpfile={work}/pluto-m.bin
datfile={work}/dobs_{ns}shots.bin
nz={NZ}
nx={NX}
nt={nt}
dz=7.62
dx=7.62
dt=0.0007
fpeak=6.
iss=0
sz=0
gz=0
nxb={NB}
nzb={NB}
rnd=1
fac=0.75
order=8
ns={ns}
ds=20
fsx=2700
""")
    return cfg


def cli(args, timeout=None, check=True):
    """Run a CLI invocation; with ``timeout``, SIGTERM it at the deadline
    (abrupt client death — no checkpoint flushing beyond what already
    hit disk — but, unlike SIGKILL, it does not take the tunnel's TPU
    worker process down with the client mid-DMA; a SIGKILL mid-transfer
    was observed to crash the worker and fail the subsequent resume with
    UNAVAILABLE until the worker restarted)."""
    cmd = [sys.executable, "-m",
           "parallel_finite_difference_computation_tpu.cli"] + args
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        out, _ = proc.communicate(timeout=timeout)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        proc.send_signal(signal.SIGTERM)
        try:
            out, _ = proc.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
        rc = -signal.SIGTERM
    dt = time.time() - t0
    out = (out or "")[-6000:]
    if check and rc != 0:
        print(out)
        raise RuntimeError(f"CLI {' '.join(args[:2])} rc={rc}")
    return dt, rc, out


def wait_chip_healthy(max_wait=600):
    """Poll the device with a tiny op in a fresh subprocess until it
    responds (the tunnel worker can take a while to come back after an
    abrupt client death)."""
    t0 = time.time()
    last = ""
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones((8, 8)).sum()))"],
                capture_output=True, text=True, timeout=180)
            if r.returncode == 0 and "64.0" in r.stdout:
                return time.time() - t0
            last = r.stderr[-500:]
        except subprocess.TimeoutExpired:
            last = "probe timed out"
        if time.time() - t0 > max_wait:
            raise RuntimeError("chip did not recover: " + last)
        time.sleep(20)


def cli_interrupt_after_chunk(args_cli, mpath, settle=30.0, cap=2400.0):
    """Run the CLI; SIGTERM it ``settle`` seconds after the manifest
    first records a completed chunk (so the crash drill provably leaves
    resumable work), with an absolute ``cap``."""
    cmd = [sys.executable, "-m",
           "parallel_finite_difference_computation_tpu.cli"] + args_cli
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    import threading

    def pump(buf):
        for line in proc.stdout:
            buf.append(line)
    buf = []
    th = threading.Thread(target=pump, args=(buf,), daemon=True)
    th.start()
    seen_at = None
    while proc.poll() is None:
        now = time.time()
        done = 0
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    done = len(json.load(f).get("chunks", {}))
            except Exception:
                pass
        if done and seen_at is None:
            seen_at = now
        if ((seen_at and now - seen_at > settle)
                or now - t0 > cap):
            proc.send_signal(signal.SIGTERM)
            break
        time.sleep(5)
    try:
        proc.wait(timeout=90)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
    th.join(timeout=10)
    rc = proc.returncode
    return time.time() - t0, (-signal.SIGTERM if rc != 0 else rc), \
        "".join(buf)[-6000:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=12860)
    ap.add_argument("--ns", type=int, default=30)
    ap.add_argument("--work", default="/tmp/pluto_survey")
    ap.add_argument("--interrupt-after", type=float, default=420.0,
                    help="(unused when the adaptive chunk-based interrupt "
                         "applies) absolute cap on the first invocation")
    ap.add_argument("--reuse-dobs", action="store_true",
                    help="skip modeling if the dobs blob already exists "
                         "(record --modeling-wall instead)")
    ap.add_argument("--modeling-wall", type=float, default=None,
                    help="previously measured modeling wall-clock to "
                         "record when --reuse-dobs skips step 1")
    args = ap.parse_args()
    nt, ns = args.nt, args.ns
    work = args.work
    ckpt = os.path.join(work, "ckpt")
    outdir = os.path.join(work, "img")
    os.makedirs(outdir, exist_ok=True)
    results = {"nt": nt, "ns": ns, "grid": [NX, NZ],
               "date": time.strftime("%Y-%m-%d")}
    cfg = build_inputs(work, nt, ns)
    cells = (NX + 2 * NB) * (NZ + 2 * NB)

    # ---- 1. forward modeling (all shots, full nt) ----
    dobs_path0 = os.path.join(work, f"dobs_{ns}shots.bin")
    if (args.reuse_dobs and os.path.exists(dobs_path0)
            and os.path.getsize(dobs_path0) == ns * NX * nt * 4):
        print("== reusing existing dobs blob ==", flush=True)
        dt_mod = args.modeling_wall or float("nan")
    else:
        print(f"== modeling {ns} shots at nt={nt} ==", flush=True)
        dt_mod, _, out = cli(["mod", f"par={cfg}"])
        print(out.splitlines()[-1] if out else "", flush=True)
    results["modeling_wall_s"] = dt_mod
    results["modeling_s_per_shot"] = dt_mod / ns
    results["modeling_gcell_per_s_incl_compile"] = (
        cells * nt * ns / dt_mod / 1e9)
    dobs_path = os.path.join(work, f"dobs_{ns}shots.bin")
    results["dobs_bytes"] = os.path.getsize(dobs_path)
    print(f"modeling: {dt_mod:.1f} s wall ({dt_mod / ns:.2f} s/shot incl. "
          f"compile)", flush=True)

    # ---- 2. RTM survey with checkpointing, interrupted + resumed ----
    print(f"== rtm_gpu survey, interrupt after {args.interrupt_after}s ==",
          flush=True)
    # chunk-shots 3: a 5-shot chunk's single ~1.8 GB dobs upload was
    # observed to crash the tunnel worker; ~1 GB uploads are reliable
    rtm_args = ["rtm_gpu", f"par={cfg}", "--outdir", outdir,
                "--checkpoint-dir", ckpt, "--chunk-shots", "3"]
    dt1, rc1, out1 = cli_interrupt_after_chunk(
        rtm_args, os.path.join(ckpt, "manifest.json"))
    # chunks the resume will load = what the MANIFEST names (an interrupt
    # can land between an npy write and its manifest update; that chunk
    # is consistently recomputed)
    mpath = os.path.join(ckpt, "manifest.json")
    done_before = []
    if os.path.exists(mpath):
        with open(mpath) as f:
            done_before = sorted(json.load(f).get("chunks", {}))
    results["interrupted_after_s"] = dt1
    results["interrupted_rc"] = rc1
    results["chunks_completed_before_kill"] = len(done_before)
    print(f"first invocation: rc={rc1} after {dt1:.0f}s, "
          f"{len(done_before)} chunk(s) checkpointed", flush=True)
    print("--- first invocation tail ---", flush=True)
    print("\n".join(out1.splitlines()[-12:]), flush=True)
    results["chip_recovery_wait_s"] = wait_chip_healthy()

    # resume loop: every attempt loads the manifest's completed chunks
    # and continues — the checkpoint system also absorbs any further
    # worker crashes (observed tunnel flakiness under survey-scale
    # transfer load), which is exactly the failure mode it exists for
    dt2 = 0.0
    attempts = []
    loaded = None
    for attempt in range(8):
        t0 = time.time()
        dta, rca, out2 = cli(rtm_args, check=False)
        dt2 += dta
        n_loaded = sum("loaded from checkpoint" in ln
                       for ln in out2.splitlines())
        attempts.append({"rc": rca, "wall_s": dta,
                         "chunks_loaded": n_loaded})
        if attempt == 0:
            loaded = n_loaded
        if rca == 0:
            break
        print(f"resume attempt {attempt + 1} died (rc={rca}); "
              f"re-resuming after health check", flush=True)
        print("\n".join(out2.splitlines()[-6:]), flush=True)
        results.setdefault("resume_recovery_waits_s", []).append(
            wait_chip_healthy(max_wait=1200))
    else:
        raise RuntimeError("survey did not complete in 8 resume attempts")
    results["resume_wall_s"] = dt2
    results["resume_attempts"] = attempts
    results["resume_chunks_loaded"] = loaded
    assert loaded == len(done_before), (loaded, len(done_before))
    total_rtm = dt1 + dt2
    results["rtm_total_wall_s"] = total_rtm
    results["rtm_s_per_shot"] = total_rtm / ns
    # 3 field-updates per timestep (1 fwd + 2 bwd), as bench_pluto_rtm
    results["rtm_gcell_upd_per_s_incl_compile_and_restart"] = (
        3 * cells * nt * ns / total_rtm / 1e9)
    print(f"resume: {dt2:.1f}s ({loaded} chunks loaded); total RTM "
          f"{total_rtm:.1f}s = {total_rtm / ns:.2f} s/shot", flush=True)

    # HBM footprint model (device memory_stats is unavailable through the
    # axon tunnel — returns None): streaming fields + per-chunk dobs
    import math
    R = math.ceil((NX + 2 * NB + 16) / 256) * 256
    W = math.ceil((NZ + 2 * NB + 8) / 128) * 128
    results["hbm_model_bytes"] = {
        "streaming_fields_8xRW": 8 * R * W * 4,
        "dobs_chunk_3_shots": 3 * NX * nt * 4,
        "snapshots_2xRW": 2 * R * W * 4,
    }

    # ---- 3a. validation: chunked == standalone subset re-run ----
    print("== validate: survey chunk vs standalone shot re-run ==",
          flush=True)
    import jax
    from parallel_finite_difference_computation_tpu import pipeline
    from parallel_finite_difference_computation_tpu.config import (
        parse_input_dat)
    p = parse_input_dat(cfg)
    shot = min(17, ns - 1)
    CS = 3  # must match --chunk-shots above
    ci0 = (shot // CS) * CS
    stored = np.load(os.path.join(
        ckpt, f"imloc_{ci0:05d}_{min(ci0 + CS, ns):05d}.npy"))[shot - ci0]
    _, im = pipeline.run_rtm_gpu(p, seed=0, backend="auto",
                                 shot_indices=np.asarray([shot]))
    scale = float(np.abs(stored).max()) or 1.0
    rel = float(np.abs(im[0] - stored).max()) / scale
    results["chunk_vs_standalone_shot_rel_err"] = rel
    print(f"shot {shot}: survey-stored vs standalone rel err {rel:.2e}",
          flush=True)
    assert rel <= 1e-6, rel

    # ---- 3b. validation: streaming tier vs lax whole-grid, truncated nt ----
    print("== validate: tiled vs lax at truncated nt ==", flush=True)
    import dataclasses
    import jax.numpy as jnp
    from parallel_finite_difference_computation_tpu.solver import (
        FDContext, rtm_shot_snapshot, rtm_shot_snapshot_tiled)
    from parallel_finite_difference_computation_tpu import numerics, io as pio
    pt = dataclasses.replace(p, nt=300)
    vp = pio.read_velocity(p.vpfile, p.nx, p.nz)
    v2 = pipeline.prepare_velocities_gpu(pt, vp, seed=0,
                                         shot_indices=np.asarray([0]))[0]
    ctx = FDContext.from_params(pt, exact_taper=True)
    g = pt.geometry()
    wav = jnp.asarray(numerics.ricker_wavelet(pt.nt, pt.dt, pt.fpeak))
    rng = np.random.default_rng(5)
    d0 = jnp.asarray(rng.standard_normal((pt.nx, pt.nt)), jnp.float32)
    im_lax = np.asarray(rtm_shot_snapshot(ctx, jnp.asarray(v2), wav, d0,
                                          int(g.sx[0]), g.sz, g.gz))
    im_tl = np.asarray(rtm_shot_snapshot_tiled(
        ctx, jnp.asarray(v2), wav, d0, int(g.sx[0]), g.sz, g.gz,
        tile_rows=256, block_k=4))
    scale = float(np.abs(im_lax).max()) or 1.0
    rel2 = float(np.abs(im_tl - im_lax).max()) / scale
    results["tiled_vs_lax_truncated_nt_rel_err"] = rel2
    print(f"tiled vs lax (nt=300): rel err {rel2:.2e}", flush=True)
    assert rel2 <= 1e-4, rel2

    out_json = os.path.join(REPO, "docs", "experiments",
                            "pluto_survey_results.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
