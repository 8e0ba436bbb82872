"""Data-parallel inference over a multi-device mesh must produce exactly
the same probabilities as single-device inference (8 virtual CPU devices,
conftest-configured)."""

import shutil
from pathlib import Path

import jax
import numpy as np
import pytest

from sykepic_tpu.compute.engine import Classifier
from sykepic_tpu.ingest import ifcb
from sykepic_tpu.train.trainer import data_mesh


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
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
    shape = tcfg.get_img_shape(config)
    variables = init_variables(model, (shape[1], shape[2], shape[0]), seed=0)
    checkpoint.save_variables(d / "best_state.msgpack", variables)
    return d


@pytest.fixture(scope="module")
def tagged():
    rois = ifcb.read_sample(
        "tests/data/raw/valid/D20180712T065600_IFCB114"
    ).images()
    return [(0, rid, img) for rid, img in rois]


@pytest.fixture(scope="module")
def classifiers(model_dir):
    return (
        Classifier(model_dir, batch_size=8),
        Classifier(model_dir, batch_size=8, mesh=data_mesh()),
    )


def test_sharded_matches_single_device(classifiers, tagged):
    assert jax.device_count() >= 8
    single, sharded = classifiers
    assert sharded.mesh.size == 8

    out_single = {rid: p for _, rid, p in single.classify_rois(iter(tagged))}
    out_sharded = {rid: p for _, rid, p in sharded.classify_rois(iter(tagged))}
    assert out_single.keys() == out_sharded.keys()
    for rid in out_single:
        # atol admits ONE fixed-point D2H quantum (~1.0014e-5 after f32
        # reconstruction): cross-mesh ulp noise that straddles a
        # round(p*1e5) boundary legitimately lands on adjacent integers
        np.testing.assert_allclose(
            out_sharded[rid], out_single[rid], rtol=1e-5, atol=1.1e-5
        )


def test_mesh_batch_divisibility(model_dir):
    with pytest.raises(ValueError):
        Classifier(model_dir, batch_size=6, mesh=data_mesh())


def test_sharded_fused_features(classifiers, tagged):
    """classify_and_feature_rois under a mesh matches single-device."""
    single, sharded = classifiers
    out_s = {r[1]: r for r in single.classify_and_feature_rois(iter(tagged))}
    out_m = {r[1]: r for r in sharded.classify_and_feature_rois(iter(tagged))}
    assert out_s.keys() == out_m.keys()
    for rid in out_s:
        # atol: one fixed-point D2H quantum (see classify test above)
        np.testing.assert_allclose(out_m[rid][2], out_s[rid][2],
                                   rtol=1e-5, atol=1.1e-5)
        np.testing.assert_allclose(out_m[rid][3], out_s[rid][3], rtol=1e-4)
