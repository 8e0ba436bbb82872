"""Test configuration: hermetic 8-virtual-device CPU JAX.

Tests never require real TPU hardware. We force the CPU platform with 8
virtual devices (the standard way to exercise `jax.sharding.Mesh` code
without a pod) *before* jax is imported anywhere.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import _venvfix  # noqa: E402

_venvfix.ensure()

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


@pytest.fixture(scope="session")
def model_dir(tmp_path_factory):
    """A complete model directory: reference config.ini + class_names.txt +
    a seeded random checkpoint in our native format (shared by the engine
    and probability test modules)."""
    import shutil

    from sykepic_tpu.models import checkpoint
    from sykepic_tpu.models.registry import init_variables
    from sykepic_tpu.train import config as tcfg

    src = Path("tests/model/resnet18_ref")
    d = tmp_path_factory.mktemp("model") / "resnet18_tpu"
    d.mkdir()
    shutil.copy(src / "config.ini", d / "config.ini")
    shutil.copy(src / "class_names.txt", d / "class_names.txt")
    config = tcfg.read_config(d / "config.ini")
    model, _ = tcfg.get_network(config, 50)
    shape = tcfg.get_img_shape(config)  # (3, 180, 180)
    variables = init_variables(model, (shape[1], shape[2], shape[0]), seed=0)
    checkpoint.save_variables(d / "best_state.msgpack", variables)
    return d
