"""Survey-level checkpoint/resume: chunked multi-shot runs with a
crash-safe manifest.

The reference has no job-level fault recovery (SURVEY §5 "failure
detection/elastic recovery: none"): an interrupted ``rtm_code`` run
(``cuda_reference_RTM/src/fd-code.cu:480-529``) or ``rtm_main`` run
(``dpct_gpu_rtm_domain_division/src/rtm_main.cpp:158-247``) restarts from
shot 0 — hours of lost work at production scale. Here a survey runs in
chunks of shots; each chunk's per-shot images are persisted and recorded in
a manifest updated atomically (write-tmp + ``os.replace``), so a re-run
with the same checkpoint directory skips completed chunks and finishes the
survey from where the previous run died.

Chunked results equal the uninterrupted run because every per-shot input is
a function of the *global* shot index, threaded by the pipelines'
``shot_indices`` parameter: boundary-velocity PRNG keys / ``vel_ext_file``
rows (:func:`.pipeline.prepare_velocities_gpu`) and the cross-shot it=0
flat-read sample of ``rtm_main`` (:func:`.solver._injection_rows`,
``rtm_main.cpp:202``).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import numpy as np

from . import io, pipeline
from .config import Params

__all__ = ["run_survey", "survey_fingerprint"]

_MANIFEST = "manifest.json"


def survey_fingerprint(p: Params, kind: str, seed: int) -> str:
    """Hash of everything that determines per-shot results — the full
    parameter set (grid, geometry, boundary, file paths), the pipeline kind
    and the boundary seed — so a checkpoint directory can refuse chunks
    produced by a different configuration."""
    payload = json.dumps(
        {"params": dataclasses.asdict(p), "kind": kind, "seed": seed},
        sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _atomic_save_npy(path: str, arr: np.ndarray) -> None:
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)


def _load_manifest(ckpt_dir: str, fingerprint: str, chunk_shots: int,
                   ns: int):
    path = os.path.join(ckpt_dir, _MANIFEST)
    if not os.path.exists(path):
        return {"fingerprint": fingerprint, "chunk_shots": chunk_shots,
                "ns": ns, "chunks": {}}
    with open(path) as f:
        m = json.load(f)
    if m.get("fingerprint") != fingerprint:
        raise ValueError(
            f"checkpoint dir {ckpt_dir} holds a different survey "
            f"(fingerprint {m.get('fingerprint')} != {fingerprint}); use a "
            "fresh directory or delete the stale one")
    if m.get("chunk_shots") != chunk_shots or m.get("ns") != ns:
        raise ValueError(
            f"checkpoint dir {ckpt_dir} was written with chunk_shots="
            f"{m.get('chunk_shots')}, ns={m.get('ns')} (got {chunk_shots}, "
            f"{ns}); resume with the same chunking")
    return m


def run_survey(p: Params, ckpt_dir: str, kind: str = "rtm_gpu",
               vp: Optional[np.ndarray] = None,
               dobs: Optional[np.ndarray] = None,
               chunk_shots: int = 8, seed: int = 0,
               outdir: Optional[str] = None, backend: str = "auto",
               mesh=None, write_image_num: bool = False,
               progress=None):
    """Run a multi-shot RTM survey in resumable chunks.

    ``kind`` selects the pipeline: ``"rtm_gpu"`` (two-snapshot ``rtm_code``,
    :func:`.pipeline.run_rtm_gpu`) or ``"rtm_cpu"`` (full-wavefield
    ``rtm_main``, :func:`.pipeline.run_rtm_cpu`). Shots [0, ns) are split
    into chunks of ``chunk_shots``; completed chunks recorded in
    ``ckpt_dir/manifest.json`` are loaded from disk instead of recomputed.
    Each per-shot image chunk is written atomically before the manifest
    names it, so a crash at any instant leaves a consistent directory.

    Returns ``(img, imlocs)`` exactly like the underlying pipeline, and
    with ``outdir`` writes the same output files.
    """
    if kind not in ("rtm_gpu", "rtm_cpu"):
        raise ValueError(f"unknown survey kind {kind!r}")
    if chunk_shots < 1:
        raise ValueError("chunk_shots must be >= 1")
    os.makedirs(ckpt_dir, exist_ok=True)
    fp = survey_fingerprint(p, kind, seed)
    manifest = _load_manifest(ckpt_dir, fp, chunk_shots, p.ns)

    # read shared inputs once (the pipelines would re-read per chunk)
    if vp is None:
        vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    if dobs is None:
        dobs = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)

    chunks = [(s, min(s + chunk_shots, p.ns))
              for s in range(0, p.ns, chunk_shots)]
    imlocs = [None] * len(chunks)
    for ci, (start, stop) in enumerate(chunks):
        key = f"{start}_{stop}"
        fname = os.path.join(ckpt_dir, f"imloc_{start:05d}_{stop:05d}.npy")
        if key in manifest["chunks"] and os.path.exists(fname):
            imlocs[ci] = np.load(fname)
            if progress:
                progress(f"chunk {ci + 1}/{len(chunks)} shots "
                         f"[{start},{stop}) loaded from checkpoint")
            continue
        idx = np.arange(start, stop)
        if kind == "rtm_gpu":
            _, im = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=seed,
                                         backend=backend, mesh=mesh,
                                         shot_indices=idx)
        else:
            im = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs, mesh=mesh,
                                      backend=backend, shot_indices=idx)[1]
        _atomic_save_npy(fname, np.asarray(im, np.float32))
        manifest["chunks"][key] = os.path.basename(fname)
        _atomic_write_json(os.path.join(ckpt_dir, _MANIFEST), manifest)
        imlocs[ci] = np.asarray(im, np.float32)
        if progress:
            progress(f"chunk {ci + 1}/{len(chunks)} shots "
                     f"[{start},{stop}) computed")

    imlocs = np.concatenate(imlocs, axis=0)
    img = imlocs.sum(axis=0)
    if outdir:
        if kind == "rtm_gpu":
            pipeline._write_rtm_gpu_outputs(outdir, img, imlocs,
                                            write_image_num)
        else:
            io.write_image(os.path.join(outdir, "dir.image"), img)
            io.write_f32(os.path.join(outdir, "dir.img"), imlocs)
    return img, imlocs
