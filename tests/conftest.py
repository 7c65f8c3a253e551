"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding (mesh/shard_map/ppermute) is exercised without TPU hardware, as the
driver's dryrun does."""

import os

# Force CPU regardless of ambient platform (e.g. a tunneled TPU): tests
# exercise sharding on 8 virtual devices. Override with PFDC_TEST_PLATFORM.
# Note: the environment's sitecustomize imports jax at interpreter start, so
# the env var alone is too late — use jax.config as well.
_platform = os.environ.get("PFDC_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if _platform == "tpu":
    # compiled-Mosaic lane: run on the ambient accelerator. The tunneled
    # dev chip registers as the experimental 'axon' platform (its devices
    # still report .platform == 'tpu'), so do NOT force JAX_PLATFORMS=tpu
    # (that would try to init a local libtpu and fail with "no jellyfish
    # device"); leave the ambient platform resolution alone. Compile cache
    # keeps reruns cheap through the remote-compile tunnel.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
else:
    os.environ["JAX_PLATFORMS"] = _platform
    jax.config.update("jax_platforms", _platform)

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
