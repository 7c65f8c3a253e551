"""Model-zoo tests: reference loaders and synthetic generators."""

import numpy as np
import pytest

from parallel_finite_difference_computation_tpu.models import (
    layered_model, constant_model, load_reference_model, REFERENCE_MODELS)

from conftest import REFERENCE_ROOT


class TestSynthetic:
    def test_constant(self):
        m = constant_model(10, 8, 2500.0)
        assert m.shape == (10, 8) and np.all(m == 2500.0)

    def test_layered_default(self):
        m = layered_model(20, 30)
        assert m.shape == (20, 30)
        assert m[0, 0] == 1500.0 and m[0, -1] == 3500.0
        # interfaces horizontal: all columns identical
        assert np.all(m == m[:1, :])

    def test_layered_custom_interfaces(self):
        m = layered_model(5, 10, (1000.0, 2000.0), interfaces=[4])
        assert np.all(m[:, :4] == 1000.0) and np.all(m[:, 4:] == 2000.0)


class TestReferenceLoaders:
    @pytest.mark.parametrize("name", list(REFERENCE_MODELS))
    def test_load(self, name):
        sub, fname, nx, nz = REFERENCE_MODELS[name]
        if not (REFERENCE_ROOT / sub / fname).exists():
            pytest.skip(f"{name} model blob missing")
        p, vp = load_reference_model(name, str(REFERENCE_ROOT))
        assert vp.shape == (p.nx, p.nz) == (nx, nz)
        # physical velocity range (m/s)
        assert 100.0 < vp.min() and vp.max() < 9000.0
