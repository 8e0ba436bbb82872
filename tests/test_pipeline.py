"""Fused classify+features pipeline: one decode must yield prob and feat
CSVs identical to the separate prob/feat passes."""

import shutil
from pathlib import Path

import pytest


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


def test_fused_matches_separate_passes(tmp_path, model_dir):
    from sykepic_tpu.compute import feature_native, pipeline, probability

    sample = Path("tests/data/raw/valid/D20180712T065600_IFCB114")
    clf = probability.prepare_model(model_dir, batch_size=4)

    written = pipeline.main([sample], clf, tmp_path / "fused",
                            feature_threads=2)
    assert written == {sample.name}
    fused_prob = next((tmp_path / "fused").glob("**/*.prob.csv"))
    fused_feat = next((tmp_path / "fused").glob("**/*.feat.csv"))

    probability.process_sample(sample, clf, tmp_path / "sep_prob")
    feature_native.process_sample(sample, tmp_path / "sep_feat")
    sep_prob = next((tmp_path / "sep_prob").glob("**/*.prob.csv"))
    sep_feat = next((tmp_path / "sep_feat").glob("**/*.feat.csv"))

    assert fused_prob.read_bytes() == sep_prob.read_bytes()
    assert fused_feat.read_bytes() == sep_feat.read_bytes()


def test_skip_if_exists(tmp_path, model_dir):
    from sykepic_tpu.compute import pipeline, probability

    sample = Path("tests/data/raw/valid/D20180712T065600_IFCB114")
    clf = probability.prepare_model(model_dir, batch_size=4)
    pipeline.main([sample], clf, tmp_path)
    prob_csv = next(tmp_path.glob("**/*.prob.csv"))
    mtime = prob_csv.stat().st_mtime_ns
    assert pipeline.main([sample], clf, tmp_path) == set()
    assert prob_csv.stat().st_mtime_ns == mtime


def test_device_features_mode(tmp_path, model_dir):
    """Fused on-chip mode: prob CSV identical to host mode; feat values
    track the host reference within the documented deviations."""
    import pandas as pd

    from sykepic_tpu.compute import pipeline, probability

    sample = Path("tests/data/raw/valid/D20180712T065600_IFCB114")
    clf = probability.prepare_model(model_dir, batch_size=4)

    pipeline.main([sample], clf, tmp_path / "host")
    pipeline.main([sample], clf, tmp_path / "dev", device_features=True)

    host_prob = next((tmp_path / "host").glob("**/*.prob.csv")).read_bytes()
    dev_prob = next((tmp_path / "dev").glob("**/*.prob.csv")).read_bytes()
    assert host_prob == dev_prob

    host_feat = pd.read_csv(
        next((tmp_path / "host").glob("**/*.feat.csv")), comment="#",
        index_col=0,
    )
    dev_feat_path = next((tmp_path / "dev").glob("**/*.feat.csv"))
    assert dev_feat_path.read_text().startswith("# version=tpu-dev-v1")
    dev_feat = pd.read_csv(dev_feat_path, comment="#", index_col=0)
    assert list(dev_feat.index) == list(host_feat.index)
    for roi in dev_feat.index:
        assert dev_feat.loc[roi, "area"] == pytest.approx(
            host_feat.loc[roi, "area"], rel=0.15
        )
        assert dev_feat.loc[roi, "biovolume_px"] == pytest.approx(
            host_feat.loc[roi, "biovolume_px"], rel=0.15
        )
        assert dev_feat.loc[roi, "biomass_ugl"] == pytest.approx(
            host_feat.loc[roi, "biomass_ugl"], rel=0.15
        )
