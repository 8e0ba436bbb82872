"""Test configuration: hermetic 8-virtual-device CPU JAX.

Tests never require real TPU hardware. We force the CPU platform with 8
virtual devices (the standard way to exercise `jax.sharding.Mesh` code
without a pod) *before* jax is imported anywhere.
"""

import os
import sys
from pathlib import Path

# NOTE: this environment's sitecustomize force-registers a TPU backend and
# overrides the JAX_PLATFORMS env var, so we must also pin the platform via
# jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeated suite runs skip XLA compilation
from sykepic_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DATA = REPO_ROOT / "tests" / "data"

import pytest  # noqa: E402


def pytest_addoption(parser):
    # Parity with the reference's conftest (`tests/conftest.py:4-10`):
    # an optional external MATLAB binary for the feature backend.
    parser.addoption("--matlab", action="store")


@pytest.fixture(scope="session")
def matlab(request):
    return request.config.option.matlab
