"""Build-and-run helper for the serial C oracle of the reference GPU RTM
suite (``scripts/gpu_rtm_oracle.c``).

The upstream GPU two-snapshot RTM ships unusable goldens (its ``file-teste``
is all zeros; ``image.num``/``dir.image`` need the missing ``dobs.6`` blob),
so full-configuration golden outputs are generated locally by a standalone
serial C program whose semantics transcribe ``cuda_reference_RTM/src/
fd-code.cu``. This module compiles it (cached in ``/tmp``, keyed by source
hash) and materializes per-config golden directories consumed by
``tests/test_gpu_golden.py`` and ``validate.py``.

Artifacts per config (all float32 raw unless noted):
  ``input_oracle.dat``  config fed to the oracle (datfile synthesized via
                        the oracle's ``mod`` mode when the reference ships
                        none)
  ``input_parity.dat``  same config with ``vel_ext_file`` pointing at the
                        boundaries the oracle actually used — the parity
                        path the reference itself provides (fd-code.cu:483)
  ``dobs.bin``          observed data, [ns][nx][nt]
  ``golden/dir.image``  stacked migrated image, [nx][nz]
  ``golden/imlocs.bin`` per-shot images, [ns][nx][nz]
  ``golden/image.num``  cumulative text dump (fd-code.cu:522-528)
  ``golden/vel_ext_used.bin``  extended velocities used, [ns][nxe][nze]
  ``golden/file-teste`` forward wavefield text probe at it==750
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import subprocess

__all__ = ["build_oracle", "gpu_goldens", "cpu_reference_build",
           "rtm_main_goldens", "CONFIGS", "CPU_MODELS"]

_REPO = pathlib.Path(__file__).resolve().parents[2]
ORACLE_SRC = _REPO / "scripts" / "gpu_rtm_oracle.c"
CACHE = pathlib.Path(os.environ.get("PFDC_ORACLE_CACHE", "/tmp/pfdc_oracle"))
REFERENCE_ROOT = pathlib.Path(
    os.environ.get("PFDC_REFERENCE_ROOT", "/root/reference"))

# base input.dat (relative to the reference root) and whether the reference
# ships a vel_ext parity file / observed data for it
CONFIGS = {
    "3lay_gpu": {
        "input": "cuda_reference_RTM/models/3lay_mod/input.dat",
        "model_dir": "cuda_reference_RTM/models/3lay_mod",
    },
    "1lay": {
        "input": "cuda_reference_RTM/models/1lay_mod/input.dat",
        "model_dir": "cuda_reference_RTM/models/1lay_mod",
    },
    "new_mod": {
        "input": "cuda_reference_RTM/models/new_mod/input.dat",
        "model_dir": "cuda_reference_RTM/models/new_mod",
    },
    # the flagship GPU-suite model (369x375, nt=3004) and the only GPU
    # config with anisotropic spacing (dz=8 != dx=25); its observed data
    # (dado_teste.bin) is missing upstream, so dobs is synthesized via the
    # oracle's mod mode like the others
    "marmousi": {
        "input": "cuda_reference_RTM/models/marmousi/input.dat",
        "model_dir": "cuda_reference_RTM/models/marmousi",
    },
    # synthetic configs broaden quirk coverage beyond the shipped models:
    # order-4 stencil and asymmetric borders (nxb != nzb)
    "order4_asym": {
        "synthetic": dict(nz=100, nx=140, nt=600, dz=10, dx=10, dt=0.001,
                          fpeak=25.0, ns=3, sz=0, fsx=10, ds=40, gz=0,
                          nxb=20, nzb=32, fac=0.05, order=4, rnd=1),
    },
}


def build_oracle() -> pathlib.Path:
    """Compile the oracle (once per source hash) and return the binary."""
    CACHE.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(ORACLE_SRC.read_bytes()).hexdigest()[:16]
    exe = CACHE / f"gpu_rtm_oracle-{tag}"
    if not exe.exists():
        tmp = exe.with_suffix(".tmp")
        # -ffp-contract=off: the reference CUDA build disables FMA
        # (cuda_reference_RTM/Makefile:4 --fmad=false)
        subprocess.run(
            ["gcc", "-O2", "-ffp-contract=off", "-o", str(tmp),
             str(ORACLE_SRC), "-lm"], check=True)
        tmp.rename(exe)
    return exe


def _rewrite_input(base: pathlib.Path, out: pathlib.Path, **overrides):
    """Copy an input.dat, replacing/adding key=value pairs (absolute paths
    for file keys so the config runs from any cwd)."""
    lines, seen = [], set()
    for raw in base.read_text().splitlines():
        key = raw.split("=", 1)[0].strip() if "=" in raw else None
        if key in overrides:
            val = overrides[key]
            seen.add(key)
            if val is None:
                continue
            lines.append(f"{key}={val}")
        else:
            lines.append(raw)
    for key, val in overrides.items():
        if key not in seen and val is not None:
            lines.append(f"{key}={val}")
    out.write_text("\n".join(lines) + "\n")


def gpu_goldens(config: str = "3lay_gpu", force: bool = False) -> dict:
    """Materialize (cached) oracle goldens for ``config``; return paths."""
    spec = CONFIGS[config]
    synthetic = spec.get("synthetic")
    if not synthetic:
        base = REFERENCE_ROOT / spec["input"]
        if not base.exists():
            raise FileNotFoundError(base)
    exe = build_oracle()
    root = CACHE / config
    golden = root / "golden"
    stamp = root / f".done-{exe.name}"
    paths = {
        "input_oracle": root / "input_oracle.dat",
        "input_parity": root / "input_parity.dat",
        "dobs": root / "dobs.bin",
        "dir_image": golden / "dir.image",
        "imlocs": golden / "imlocs.bin",
        "image_num": golden / "image.num",
        "vel_ext_used": golden / "vel_ext_used.bin",
        "file_teste": golden / "file-teste",
    }
    if stamp.exists() and not force:
        return paths
    golden.mkdir(parents=True, exist_ok=True)

    if synthetic:
        import numpy as np
        cfg = dict(synthetic)
        vp_path = root / "vp.bin"
        v = np.full((cfg["nx"], cfg["nz"]), 1500.0, np.float32)
        v[:, cfg["nz"] // 3:] = 2300.0
        v[:, 2 * cfg["nz"] // 3:] = 3100.0
        v.tofile(vp_path)
        cfg.update(tmpdir=str(golden), vpfile=str(vp_path),
                   datfile=str(paths["dobs"]))
        paths["input_oracle"].write_text(
            "\n".join(f"{k}={v}" for k, v in cfg.items()) + "\n")
    else:
        model_dir = REFERENCE_ROOT / spec["model_dir"]
        kv = dict(
            line.split("=", 1) for line in base.read_text().splitlines()
            if "=" in line)
        overrides = {"tmpdir": str(golden)}
        vp = (model_dir / pathlib.Path(kv["vpfile"].strip()).name)
        overrides["vpfile"] = str(vp)
        if "vel_ext_file" in kv:
            overrides["vel_ext_file"] = str(
                model_dir / pathlib.Path(kv["vel_ext_file"].strip()).name)
        # the reference ships no usable observed data for any GPU config
        # (.MISSING_LARGE_BLOBS) — synthesize it with the oracle's mod mode
        overrides["datfile"] = str(paths["dobs"])
        _rewrite_input(base, paths["input_oracle"], **overrides)

    subprocess.run([str(exe), "mod", str(paths["input_oracle"]),
                    str(paths["dobs"])], check=True,
                   stderr=subprocess.DEVNULL)
    subprocess.run([str(exe), "rtm", str(paths["input_oracle"]),
                    str(golden)], check=True, stderr=subprocess.DEVNULL)

    # parity config: pin the boundary velocities the oracle actually used
    _rewrite_input(paths["input_oracle"], paths["input_parity"],
                   vel_ext_file=str(paths["vel_ext_used"]))
    stamp.touch()
    return paths


# --------------------------------------------------------------------------
# CPU-pipeline reference rebuild (mod_main / rtm_main)
# --------------------------------------------------------------------------

def cpu_reference_build() -> pathlib.Path:
    """Rebuild the reference's own CPU binaries (``mod_main``/``rtm_main``)
    against the vendored prebuilt CWP libraries, in ``/tmp`` (keeping the
    repo tree clean). Returns the build directory. The build is validated
    elsewhere by reproducing the committed 3lay ``dir.image`` bit-for-bit
    (scripts/make_reference_baselines.sh did so in round 1)."""
    ref = REFERENCE_ROOT / "dpct_gpu_rtm_domain_division"
    bdir = CACHE / "refbuild"
    done = bdir / ".built"
    if done.exists():
        return bdir
    bdir.mkdir(parents=True, exist_ok=True)
    import shutil
    for sub in ("src", "include"):
        dst = bdir / sub
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(ref / sub, dst)
    inc = [f"-I{bdir}/include", f"-I{bdir}/include/timestep",
           f"-I{bdir}/include/source", f"-I{bdir}/include/boundary",
           f"-I{ref}/lib/cwp/include"]
    common = [f"{bdir}/src/timestep/fd.c", f"{bdir}/src/source/ptsrc.c",
              f"{bdir}/src/boundary/taper.c",
              f"-L{ref}/lib/cwp/lib", "-lsu", "-lpar", "-lcwp", "-lm"]
    for prog in ("mod_main", "rtm_main"):
        subprocess.run(
            ["g++", "-w"] + inc + ["-O3", "-fopenmp", "-o",
             str(bdir / prog), f"{bdir}/src/{prog}.cpp"] + common,
            check=True)
    done.touch()
    return bdir


# runnable configs under dpct_gpu_rtm_domain_division/build/ (model blob +
# input.dat both shipped); ``pluto`` is excluded — its pluto-m.bin is listed
# in the reference's .gitignore and absent from the checkout
CPU_MODELS = {
    "3lay": ("build/3lay_mod", "3layer_151x151.bin"),
    "1lay": ("build/1lay_mod", "vp_101x201.bin"),
    "spluto": ("build/spluto", "pluto.bin"),
}


def rtm_main_goldens(ns: int = 3, force: bool = False,
                     tag: str = "", model: str = "3lay",
                     **overrides) -> dict:
    """Multi-shot CPU-pipeline goldens from the rebuilt reference binaries:
    run ``mod_main`` then ``rtm_main`` on a CPU-build model (``CPU_MODELS``)
    with ``ns`` shots (the committed golden covers only 3lay ns=1, leaving
    the cross-shot it=0 flat-read of ``rtm_main.cpp:202`` and every other
    model untested). Extra ``overrides`` patch input.dat keys (e.g.
    ``nxb``/``nzb`` to exercise the nzb-offset injection quirk with
    asymmetric borders, or ``nt`` to bound runtime). Returns paths to
    ``input.dat``, ``dobs.bin``, ``dir.image``, ``dir.img``."""
    bdir = cpu_reference_build()
    sub, vpname = CPU_MODELS[model]
    ref3 = REFERENCE_ROOT / "dpct_gpu_rtm_domain_division" / sub
    if not (ref3 / vpname).exists():
        raise FileNotFoundError(ref3 / vpname)
    rundir = CACHE / f"{model}_ns{ns}{tag}"
    paths = {
        "input": rundir / "input.dat",
        "dobs": rundir / "dobs.bin",
        "dir_image": rundir / "dir.image",
        "dir_img": rundir / "dir.img",
    }
    stamp = rundir / ".done"
    if stamp.exists() and not force:
        return paths
    rundir.mkdir(parents=True, exist_ok=True)
    _rewrite_input(ref3 / "input.dat", paths["input"],
                   ns=ns, tmpdir="./",
                   vpfile=str(ref3 / vpname),
                   datfile="dobs.bin", **overrides)
    for prog in ("mod_main", "rtm_main"):
        subprocess.run([str(bdir / prog), "par=input.dat"], cwd=rundir,
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    stamp.touch()
    return paths


def marmousi_final_fields():
    """Shared setup for the upstream-norm checks (validate config 6c and
    ``scripts/check_upstream_norms.py``): run one marmousi shot
    (oracle-synthesized dobs + ``vel_ext_file`` parity boundaries) through
    ``fd_forward``/``fd_back`` and return
    ``(params, ctx, fields)`` where ``fields`` maps
    fwd_p/fwd_pp/back_p/back_pp/rev_pr/rev_ppr/imloc to device arrays.

    One definition keeps the gate and the diagnostic it cites from
    diverging (they previously duplicated this ~15-line pipeline)."""
    import jax
    import jax.numpy as jnp
    from .. import config as _config, io, numerics, pipeline
    from ..solver import FDContext, fd_forward, fd_back

    paths = gpu_goldens("marmousi")
    p = _config.parse_input_dat(str(paths["input_parity"]))
    g = p.geometry()
    vp = io.read_velocity(p.vpfile, p.nx, p.nz)
    vel2 = pipeline.prepare_velocities_gpu(p, vp)
    wav = jnp.asarray(numerics.ricker_wavelet(p.nt, p.dt, p.fpeak))
    dobs = io.read_shot_gathers(str(paths["dobs"]), p.ns, p.nx, p.nt)
    ctx = FDContext.from_params(p, exact_taper=True)

    fwd = jax.jit(fd_forward, static_argnames=("ctx", "capture_step"))
    fp, fpp = fwd(ctx, jnp.asarray(vel2[0]), wav, g.sx[0], g.sz)
    imloc, bp, bpp, pr, ppr = fd_back(ctx, jnp.asarray(vel2[0]), fp, fpp,
                                      jnp.asarray(dobs[0]), g.gz,
                                      return_fields=True)
    fields = {"fwd_p": fp, "fwd_pp": fpp, "back_p": bp, "back_pp": bpp,
              "rev_pr": pr, "rev_ppr": ppr, "imloc": imloc}
    return p, ctx, fields
