"""Command-line interface mirroring the reference's four programs.

Usage (reference-compatible invocations):

    python -m parallel_finite_difference_computation_tpu.cli stencil ./input.dat
    python -m parallel_finite_difference_computation_tpu.cli mod par=input.dat
    python -m parallel_finite_difference_computation_tpu.cli rtm par=input.dat
    python -m parallel_finite_difference_computation_tpu.cli rtm_gpu ./models/<m>/input.dat
    python -m parallel_finite_difference_computation_tpu.cli psnr file1 file2
    python -m parallel_finite_difference_computation_tpu.cli laplace dir.image dir.imalap nx nz [--dx D --dz D]

``stencil`` replaces ``stencil_code`` (``cuda_reference_stencil_computation``),
``mod`` replaces ``mod_main``, ``rtm`` replaces ``rtm_main`` (both
``dpct_gpu_rtm_domain_division``), ``rtm_gpu`` replaces ``rtm_code``
(``cuda_reference_RTM``); ``psnr``/``laplace`` replace the prebuilt ELF and
``laplace.f90``. ``par=file`` (Seismic-Unix style) and bare config paths are
both accepted.
"""

from __future__ import annotations

import argparse
import os

import time



from . import io, pipeline
from .config import parse_input_dat


def _config_arg(arg: str) -> str:
    return arg.split("=", 1)[1] if arg.startswith("par=") else arg


def _mesh_from_args(args):
    """Build a (shot, x[, z]) mesh from --shards-shot/--shards-x/--shards-z
    (None if 1x1x1). Multi-chip runs shard shots and/or decompose the grid
    over x (and z for the 2D decomposition); on a single chip a 1x1 mesh
    still exercises the sharded program."""
    n_shot = getattr(args, "shards_shot", 1)
    n_x = getattr(args, "shards_x", 1)
    n_z = getattr(args, "shards_z", 1)
    if n_shot * n_x * n_z <= 1:
        return None
    from .parallel import make_mesh
    return make_mesh(n_shot=n_shot, n_x=n_x, n_z=n_z)


def _echo(p):
    print(f"## vp = {p.vpfile} \n## nz = {p.nz}, nx = {p.nx}, nt = {p.nt} ")
    print(f"## dz = {p.dz}, dx = {p.dx}, dt = {p.dt} ")
    print(f"## ns = {p.ns}, sz = {p.sz}, fsx = {p.fsx}, ds = {p.ds}, gz = {p.gz} ")
    print(f"## order = {p.order}, nzb = {p.nzb}, nxb = {p.nxb}, F = {p.fac} ")


def cmd_stencil(args):
    p = parse_input_dat(_config_arg(args.config))
    out = args.output or "output_tpu.bin"
    t0 = time.time()
    lap = pipeline.run_stencil(p, output_path=out,
                               backend=getattr(args, "backend", "auto"))
    print(f"Laplacian {lap.shape} written to {out} "
          f"({time.time() - t0:.3f}s incl. compile)")


def cmd_mod(args):
    p = parse_input_dat(_config_arg(args.config))
    _echo(p)
    out = args.output or p.datfile or "dobs.bin"
    t0 = time.time()
    data = pipeline.run_modeling(p, out_datfile=out, backend=args.backend,
                                 mesh=_mesh_from_args(args),
                                 lap_impl=args.lap_impl)
    print(f"> Exec time = {time.time() - t0:.2f} (s)")
    print(f"wrote {data.shape} shot gathers to {out}")


def cmd_rtm(args):
    p = parse_input_dat(_config_arg(args.config))
    _echo(p)
    outdir = args.outdir or (p.tmpdir if p.tmpdir and os.path.isdir(p.tmpdir)
                             else ".")
    t0 = time.time()
    if args.checkpoint_dir:
        from . import survey
        img, imlocs = survey.run_survey(
            p, args.checkpoint_dir, kind="rtm_cpu", outdir=outdir,
            chunk_shots=args.chunk_shots, mesh=_mesh_from_args(args),
            progress=print)
    else:
        img, imlocs = pipeline.run_rtm_cpu(p, outdir=outdir,
                                           mesh=_mesh_from_args(args))
    print(f"Execution Time: {time.time() - t0:.2f} seconds")
    print(f"wrote dir.image / dir.img to {outdir}")


def cmd_rtm_gpu(args):
    p = parse_input_dat(_config_arg(args.config))
    _echo(p)
    outdir = args.outdir or (p.tmpdir if p.tmpdir and os.path.isdir(p.tmpdir)
                             else ".")
    t0 = time.time()
    if args.checkpoint_dir:
        from . import survey
        img, imlocs = survey.run_survey(
            p, args.checkpoint_dir, kind="rtm_gpu", seed=args.seed,
            outdir=outdir, chunk_shots=args.chunk_shots,
            backend=args.backend, mesh=_mesh_from_args(args),
            write_image_num=args.image_num, progress=print)
    else:
        img, imlocs = pipeline.run_rtm_gpu(
            p, seed=args.seed, outdir=outdir,
            write_image_num=args.image_num, backend=args.backend,
            mesh=_mesh_from_args(args), lap_impl=args.lap_impl)
    print(f"> Exec time = {time.time() - t0:.2f} (s)")
    print(f"wrote dir.image to {outdir}"
          + (" (+ image.num)" if args.image_num else ""))


def cmd_psnr(args):
    from .utils.compare import rmse_psnr
    a = io.read_f32(args.file1)
    b = io.read_f32(args.file2)
    r, p = rmse_psnr(a, b)
    print(f"RMSE: {r:g}")
    print(f"PSNR: {p:g}")
    with open("dir.output", "w") as f:
        f.write(f"RMSE: {r:g}\nPSNR: {p:g}\n")


def cmd_laplace(args):
    from .utils.compare import laplace_filter
    img = io.read_f32(args.input).reshape(args.nx, args.nz)
    out = laplace_filter(img, dx=args.dx, dz=args.dz)
    io.write_f32(args.output, out)
    print(f"wrote filtered image to {args.output}")


def main(argv=None):
    # honor JAX_PLATFORMS even under environments whose sitecustomize
    # pre-imports jax (the env var alone is read too early there)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    ap = argparse.ArgumentParser(prog="pfdc-tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name, fn, needs_backend in (
            ("stencil", cmd_stencil, True), ("mod", cmd_mod, True),
            ("rtm", cmd_rtm, False), ("rtm_gpu", cmd_rtm_gpu, True)):
        s = sub.add_parser(name)
        s.add_argument("config", help="input.dat path or par=path")
        s.add_argument("--output", default=None)
        s.add_argument("--outdir", default=None)
        if needs_backend:
            s.add_argument("--backend", default="auto",
                           choices=["auto", "lax", "pallas"])
        if name in ("mod", "rtm_gpu"):
            s.add_argument("--lap-impl", default=None, dest="lap_impl",
                           choices=["auto", "vpu", "mxu", "mxu6"],
                           help="Pallas Laplacian lowering: exact VPU "
                                "taps (default), multi-pass bf16 MXU "
                                "(mxu: 3-pass speed tier, mxu6: 6-pass "
                                "accuracy tier), or auto (route by the "
                                "measured accuracy envelope; warns on "
                                "explicit mxu outside it)")
        if name == "rtm_gpu":
            s.add_argument("--seed", type=int, default=0)
            s.add_argument("--image-num", action="store_true",
                           dest="image_num")
        if name in ("rtm", "rtm_gpu"):
            s.add_argument("--checkpoint-dir", default=None,
                           dest="checkpoint_dir",
                           help="chunked checkpoint/resume directory "
                                "(survey.run_survey): an interrupted run "
                                "restarted with the same dir skips "
                                "completed shot chunks")
            s.add_argument("--chunk-shots", type=int, default=8,
                           dest="chunk_shots",
                           help="shots per checkpoint chunk")
        if name != "stencil":
            s.add_argument("--shards-shot", type=int, default=1,
                           dest="shards_shot",
                           help="mesh size along the shot axis")
            s.add_argument("--shards-x", type=int, default=1,
                           dest="shards_x",
                           help="mesh size along the grid x axis "
                                "(domain decomposition)")
            s.add_argument("--shards-z", type=int, default=1,
                           dest="shards_z",
                           help="mesh size along the grid z axis "
                                "(2D domain decomposition)")
        s.set_defaults(fn=fn)

    s = sub.add_parser("psnr")
    s.add_argument("file1")
    s.add_argument("file2")
    s.set_defaults(fn=cmd_psnr)

    s = sub.add_parser("laplace")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("nx", type=int)
    s.add_argument("nz", type=int)
    s.add_argument("--dx", type=float, default=10.0)
    s.add_argument("--dz", type=float, default=10.0)
    s.set_defaults(fn=cmd_laplace)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
