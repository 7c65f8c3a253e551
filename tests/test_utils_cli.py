"""Tests for the native helpers, compare utilities, io round-trips, and CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from parallel_finite_difference_computation_tpu import io
from parallel_finite_difference_computation_tpu.utils import compare, native


class TestCompare:
    def test_rmse_psnr_basic(self, rng):
        a = rng.standard_normal(1000).astype(np.float32)
        b = a + 0.01 * rng.standard_normal(1000).astype(np.float32)
        r, p = compare.rmse_psnr(a, b)
        expected_r = np.sqrt(np.mean((a.astype(np.float64)
                                      - b.astype(np.float64)) ** 2))
        assert abs(r - expected_r) < 1e-9
        expected_p = 20 * np.log10(np.abs(a.astype(np.float64)).max() / r)
        assert abs(p - expected_p) < 1e-9

    def test_identical_gives_inf_psnr(self, rng):
        a = rng.standard_normal(100).astype(np.float32)
        r, p = compare.rmse_psnr(a, a)
        assert r == 0 and p == float("inf")

    def test_native_matches_numpy(self, rng):
        if not native.available():
            pytest.skip("native library not built")
        a = rng.standard_normal(5000).astype(np.float32)
        b = (a + 0.1).astype(np.float32)
        rn, pn = native.rmse_psnr_native(a, b)
        assert abs(rn - compare.rmse(a, b)) < 1e-9

    def test_laplace_filter_matches_f90_oracle(self, rng):
        # direct transcription of laplace.f90:25-30 on an (nx, nz) image
        nx, nz, dx, dz = 12, 10, 10.0, 10.0
        img = rng.standard_normal((nx, nz)).astype(np.float32)
        expect = np.zeros_like(img)
        for ix in range(1, nx - 1):
            for iz in range(1, nz - 1):
                expect[ix, iz] = (
                    (img[ix, iz + 1] - 2 * img[ix, iz] + img[ix, iz - 1]) / (dz * dz)
                    + (img[ix + 1, iz] - 2 * img[ix, iz] + img[ix - 1, iz]) / (dx * dx))
        got = compare.laplace_filter(img, dx=dx, dz=dz)
        np.testing.assert_allclose(got, expect, atol=1e-6)
        # native path, if built, must agree with the numpy fallback
        nat = native.laplace_filter_native(img, dx, dz)
        if nat is not None:
            np.testing.assert_allclose(nat, got, atol=1e-6)


class TestImageNumNative:
    def test_native_matches_python_writer(self, tmp_path, rng):
        if not native.available():
            pytest.skip("native library not built")
        imgs = [rng.standard_normal((4, 5)).astype(np.float32)
                for _ in range(3)]
        p_nat = str(tmp_path / "native.num")
        p_py = str(tmp_path / "python.num")
        assert native.write_image_num_native(p_nat, imgs)
        # force the python fallback; the reference emits iz outer / ix
        # inner (fd-code.cu:522-528) = Fortran order over (nx, nz)
        with open(p_py, "w") as f:
            for i, img in enumerate(imgs):
                f.write(f"======== {i} ========\n")
                f.write("".join(" %f \n" % v
                                for v in img.ravel(order="F")))
        assert open(p_nat).read() == open(p_py).read()

    def test_emission_order_matches_reference_loop(self, tmp_path):
        """Values must appear in the reference's iz-outer/ix-inner order."""
        from parallel_finite_difference_computation_tpu import io as pio
        img = np.arange(6, dtype=np.float32).reshape(2, 3)  # (nx=2, nz=3)
        path = str(tmp_path / "order.num")
        pio.write_image_num(path, [img])
        vals = [float(l) for l in open(path).read().splitlines()[1:] if l.strip()]
        expect = [img[ix, iz] for iz in range(3) for ix in range(2)]
        assert vals == expect


class TestCLI:
    def _run(self, *args):
        return subprocess.run(
            [sys.executable, "-m",
             "parallel_finite_difference_computation_tpu.cli", *args],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def test_psnr_command(self, tmp_path, rng):
        a = rng.standard_normal(100).astype(np.float32)
        f1, f2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
        a.tofile(f1)
        (a + 0.1).astype(np.float32).tofile(f2)
        r = self._run("psnr", f1, f2)
        assert r.returncode == 0
        assert "RMSE:" in r.stdout and "PSNR:" in r.stdout
        os.path.exists("dir.output") and os.remove("dir.output")

    def test_laplace_command(self, tmp_path, rng):
        img = rng.standard_normal((8, 6)).astype(np.float32)
        fin, fout = str(tmp_path / "in.bin"), str(tmp_path / "out.bin")
        img.tofile(fin)
        r = self._run("laplace", fin, fout, "8", "6")
        assert r.returncode == 0, r.stderr
        out = np.fromfile(fout, np.float32).reshape(8, 6)
        np.testing.assert_allclose(
            out, compare.laplace_filter(img, 10.0, 10.0), atol=1e-6)

    def test_mod_command_tiny(self, tmp_path, rng):
        # end-to-end CLI modeling on a tiny synthetic config
        vp = np.full((20, 16), 2000.0, np.float32)
        vpf = str(tmp_path / "vp.bin")
        vp.tofile(vpf)
        cfg = tmp_path / "input.dat"
        cfg.write_text(
            f"tmpdir={tmp_path}\nvpfile={vpf}\ndatfile=dobs.bin\n"
            "nz=16\nnx=20\nnt=12\ndz=10\ndx=10\ndt=0.001\nfpeak=25.\n"
            "ns=1\nsz=0\nfsx=0\nds=1\ngz=0\nnxb=8\nnzb=8\nfac=0.01\norder=8\n")
        out = str(tmp_path / "dobs.bin")
        r = self._run("mod", f"par={cfg}", "--output", out, "--backend", "lax")
        assert r.returncode == 0, r.stderr
        data = np.fromfile(out, np.float32)
        assert data.size == 20 * 12

    def test_mod_command_2d_mesh(self, tmp_path, rng):
        """--shards-x/--shards-z route through the 2D decomposition and
        match the single-device CLI run (8 virtual CPU devices)."""
        vp = np.full((24, 24), 2000.0, np.float32)
        vpf = str(tmp_path / "vp.bin")
        vp.tofile(vpf)
        cfg = tmp_path / "input.dat"
        cfg.write_text(
            f"tmpdir={tmp_path}\nvpfile={vpf}\ndatfile=dobs.bin\n"
            "nz=24\nnx=24\nnt=12\ndz=10\ndx=10\ndt=0.001\nfpeak=25.\n"
            "ns=2\nsz=0\nfsx=2\nds=8\ngz=0\nnxb=8\nnzb=8\nfac=0.01\norder=8\n")
        env = {**os.environ, "JAX_PLATFORMS": "cpu",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}

        def run(*extra):
            return subprocess.run(
                [sys.executable, "-m",
                 "parallel_finite_difference_computation_tpu.cli", "mod",
                 f"par={cfg}", "--backend", "lax", *extra],
                capture_output=True, text=True, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

        out0 = str(tmp_path / "d0.bin")
        out1 = str(tmp_path / "d1.bin")
        r0 = run("--output", out0)
        assert r0.returncode == 0, r0.stderr
        r1 = run("--output", out1, "--shards-shot", "2", "--shards-x", "2",
                 "--shards-z", "2")
        assert r1.returncode == 0, r1.stderr
        a = np.fromfile(out0, np.float32)
        b = np.fromfile(out1, np.float32)
        scale = np.abs(a).max() or 1.0
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-6)
