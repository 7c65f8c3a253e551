"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding (mesh/shard_map/ppermute) is exercised without TPU hardware, as the
driver's dryrun does."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE_ROOT = pathlib.Path(
    os.environ.get("PFDC_REFERENCE_ROOT", "/root/reference"))


def require_reference(*relpaths):
    """Skip a test when the reference checkout (or a blob in it) is absent."""
    for rp in relpaths:
        if not (REFERENCE_ROOT / rp).exists():
            pytest.skip(f"reference artifact missing: {rp}")
    return REFERENCE_ROOT


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
