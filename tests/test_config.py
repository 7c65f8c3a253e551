"""Config parser tests: reference input.dat compatibility and defaults."""

import numpy as np
import pytest

from parallel_finite_difference_computation_tpu.config import (
    Params, Geometry, parse_input_dat)


def _write(tmp_path, text):
    f = tmp_path / "input.dat"
    f.write_text(text)
    return str(f)


class TestParser:
    def test_defaults_applied(self, tmp_path):
        # minimal config: only required grid keys -> init_args defaults
        # (fd-code.cu:368-377)
        p = parse_input_dat(_write(tmp_path,
                                   "nz=100\nnx=200\nnt=500\ndz=10\ndx=10\n"
                                   "dt=0.001\nfpeak=25.\n"))
        assert (p.ns, p.sz, p.fsx, p.ds, p.gz) == (1, 0, 0, 1, 0)
        assert (p.order, p.nzb, p.nxb) == (8, 40, 40)
        assert p.fac == 0.7 and p.iss == 0
        assert not p.vel_ext_flag

    def test_nz_does_not_match_nzb(self, tmp_path):
        # the reference's strstr parser needs a strlen guard for this
        # (fd-source-code.cu:69); exact-key matching handles it naturally
        p = parse_input_dat(_write(tmp_path, "nzb=50\nnxb=60\nnz=100\nnx=200\n"))
        assert (p.nz, p.nx, p.nzb, p.nxb) == (100, 200, 50, 60)

    def test_unknown_keys_ignored(self, tmp_path):
        # marmousi carries norm_* and kernel= strays (input.dat:22-24)
        p = parse_input_dat(_write(
            tmp_path, "nz=10\nnx=10\nnorm_source=74.37\nkernel=foo.cl\n"))
        assert p.nz == 10

    def test_first_match_wins(self, tmp_path):
        p = parse_input_dat(_write(tmp_path, "nz=10\nnz=99\n"))
        assert p.nz == 10

    def test_whitespace_and_blank_lines(self, tmp_path):
        p = parse_input_dat(_write(tmp_path, "\n nz = 42 \n\n nx=7\n"))
        assert (p.nz, p.nx) == (42, 7)

    def test_float_int_coercion(self, tmp_path):
        # SU-style "ds=10." parses as int 10
        p = parse_input_dat(_write(tmp_path, "nz=10\nds=10.\ndt=0.004\n"))
        assert p.ds == 10 and abs(p.dt - 0.004) < 1e-12

    def test_vel_ext_flag(self, tmp_path):
        p = parse_input_dat(_write(tmp_path, "nz=5\nvel_ext_file=v.bin\n"))
        assert p.vel_ext_flag
        assert p.vel_ext_file.endswith("v.bin")


class TestGeometry:
    def test_border_shifts(self):
        p = Params(nz=100, nx=200, nt=10, ns=3, sz=5, fsx=7, ds=10, gz=2,
                   nxb=40, nzb=30)
        g = Geometry.from_params(p)
        assert g.sz == 35 and g.gz == 32
        assert g.sx == (47, 57, 67)  # fsx + is*ds + nxb (fd-code.cu:406)
        assert (g.nxe, g.nze) == (280, 160)
