"""Edge cases: zero-ROI samples, header-only CSVs, empty prob trees."""

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


def make_empty_sample(raw_dir):
    """A sample whose adc rows are all empty triggers (w = h = 0)."""
    raw_dir.mkdir(parents=True, exist_ok=True)
    name = "D20200101T120000_IFCB114"
    cols = ["0"] * 24
    rows = "\n".join(",".join(cols) for _ in range(3)) + "\n"
    (raw_dir / f"{name}.adc").write_text(rows)
    (raw_dir / f"{name}.roi").write_bytes(b"")
    (raw_dir / f"{name}.hdr").write_text("runTime: 60\ninhibitTime: 1\n")
    return raw_dir / name


def test_zero_roi_sample_prob(tmp_path, model_dir):
    from sykepic_tpu.compute import probability

    sample = make_empty_sample(tmp_path / "raw")
    clf = probability.prepare_model(model_dir, batch_size=4)
    written = probability.main(
        [sample], model_dir, tmp_path / "out", progress_bar=False,
        classifier=clf,
    )
    assert written == {sample.name}
    csv = next((tmp_path / "out").glob("**/*.prob.csv"))
    lines = csv.read_text().splitlines()
    assert len(lines) == 1  # header only
    assert lines[0].startswith("roi,")


def test_zero_roi_sample_feat(tmp_path):
    from sykepic_tpu.compute import feature_native

    sample = make_empty_sample(tmp_path / "raw")
    feature_native.process_sample(sample, tmp_path / "out")
    csv = next((tmp_path / "out").glob("**/*.feat.csv"))
    lines = csv.read_text().splitlines()
    assert len(lines) == 3  # two comment headers + column header
    assert lines[2].startswith("roi,")


def test_ingest_zero_rois(tmp_path):
    from sykepic_tpu.ingest import ifcb

    sample = make_empty_sample(tmp_path / "raw")
    rois = ifcb.read_sample(sample)
    assert len(rois) == 0
    assert list(rois.images()) == []
