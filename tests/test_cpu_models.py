"""CPU-pipeline parity on the remaining runnable build/ models.

The reference's ``dpct_gpu_rtm_domain_division/build/`` tree ships three
models with both the velocity blob and an input.dat: 3lay_mod (covered by
the committed goldens + ns=3 tests), 1lay_mod (its run.sh runs only
mod_main), and spluto — a subsampled Pluto model (367x351) that is the only
CPU-suite config with anisotropic spacing (dx=25 != dz=10). Goldens come
from the reference's own rebuilt binaries via ``utils.oracle``; spluto's
nt is reduced 2000 -> 400 here to bound test runtime (the full-nt run is
validate.py's job on TPU). ``build/pluto`` is not testable: its
pluto-m.bin is gitignored upstream and absent from the checkout.
"""

import numpy as np
import pytest

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import pipeline
from parallel_finite_difference_computation_tpu.models.zoo import (
    load_reference_model)
from parallel_finite_difference_computation_tpu.utils.compare import rel_rms
from parallel_finite_difference_computation_tpu.utils.oracle import (
    rtm_main_goldens)

GATE = 1e-4


def _goldens(**kw):
    try:
        return rtm_main_goldens(**kw)
    except FileNotFoundError as e:
        pytest.skip(f"reference artifact missing: {e}")


@pytest.fixture(scope="module")
def spluto():
    return _goldens(model="spluto", ns=1, tag="_nt400", nt=400)


def test_spluto_zoo_loads():
    try:
        p, vp = load_reference_model("spluto")
    except FileNotFoundError as e:
        pytest.skip(str(e))
    assert vp.shape == (367, 351)
    assert p.dx == 25.0 and p.dz == 10.0
    assert 1000.0 < vp.min() and vp.max() < 9000.0


def test_spluto_modeling_parity(spluto):
    p = pfdc.parse_input_dat(str(spluto["input"]))
    assert (p.nx, p.nz, p.nt) == (367, 351, 400)
    data = pipeline.run_modeling(p, backend="lax")
    golden = np.fromfile(spluto["dobs"], np.float32).reshape(
        p.ns, p.nx, p.nt)
    assert rel_rms(np.asarray(data), golden) < GATE


def test_spluto_rtm_parity(spluto):
    p = pfdc.parse_input_dat(str(spluto["input"]))
    img, imlocs = pipeline.run_rtm_cpu(p)
    golden_img = np.fromfile(spluto["dir_image"], np.float32).reshape(
        p.nx, p.nz)
    assert rel_rms(np.asarray(img), golden_img) < GATE


def test_1lay_cpu_pipeline_parity():
    """1lay CPU config (201x101, fac=0.010 — the weakest taper shipped);
    full nt=401 as configured."""
    g = _goldens(model="1lay", ns=1)
    p = pfdc.parse_input_dat(str(g["input"]))
    assert (p.nx, p.nz, p.nt) == (201, 101, 401)
    data = pipeline.run_modeling(p, backend="lax")
    golden = np.fromfile(g["dobs"], np.float32).reshape(p.ns, p.nx, p.nt)
    assert rel_rms(np.asarray(data), golden) < GATE
    img, _ = pipeline.run_rtm_cpu(p)
    golden_img = np.fromfile(g["dir_image"], np.float32).reshape(p.nx, p.nz)
    assert rel_rms(np.asarray(img), golden_img) < GATE
