"""End-to-end training test: tiny folder-per-class dataset -> train ->
model dir artifacts -> inference engine loads the result.

Mirrors the reference train flow (``sykepic/train/train.py``) at toy scale.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from sykepic_tpu.train import loop

CONFIG = """
[dataset]
path = {dataset}
split = 0.6, 0.2, 0.2
external_test =
min_N =
max_N =
exclude =
random_seed = 42
oversample_until = 12
oversample_with_decay =

[model]
path = {models}
network = resnet18
weights =
id = auto
exist_ok = no
head = 32
dropout = -1, 0.25

[image]
shape = 3, 32, 32
augmentations = flip, translate, zoom, brightness
imagenet_normalization = no
border = mode
zoom_range = 0.8, 1.2
brightness_range = 0.95, 1.1
max_rotation = 10
batch_size = 8
num_workers = 2

[train]
gpu = no
max_epochs = 2
early_stop_patience = 3
learning_rate = 0.01
optimizer = Adam

[lr_warmup]
use = yes
factor_1 = 0.1
factor_2 = 0.5
step_1 = 1
step_2 = 2
step_3 = 3
verbose = no

[lr_reduction]
use = yes
factor = 0.1
patience = 2
verbose = no
"""


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory):
    import cv2

    tmp_path = tmp_path_factory.mktemp("train")
    dataset = tmp_path / "dataset"
    rng = np.random.default_rng(0)
    # Three visually distinct classes: dark, bright, striped
    for name, base in [("dark", 30), ("bright", 220), ("striped", 0)]:
        d = dataset / name
        d.mkdir(parents=True)
        for i in range(10):
            h, w = int(rng.integers(20, 40)), int(rng.integers(15, 30))
            img = np.full((h, w), base, np.uint8)
            if name == "striped":
                img[::2] = 255
            img = np.clip(
                img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
            ).astype(np.uint8)
            cv2.imwrite(str(d / f"{name}_{i:02}.png"), img)

    config_path = tmp_path / "train.ini"
    config_path.write_text(
        CONFIG.format(dataset=dataset, models=tmp_path / "models")
    )
    args = SimpleNamespace(
        config=str(config_path), collage=None, dist=None, save_images=None
    )
    model_dir = loop.main(args)
    return model_dir


def test_artifacts(trained_model_dir):
    assert (trained_model_dir / "best_state.msgpack").is_file()
    assert (trained_model_dir / "config.ini").is_file()
    assert (trained_model_dir / "train_state.msgpack").is_file()
    assert (trained_model_dir / "train_stats.png").is_file()
    assert (trained_model_dir / "test_report.txt").is_file()
    names = (trained_model_dir / "class_names.txt").read_text().splitlines()
    assert names == ["bright", "dark", "striped"]
    dist = (trained_model_dir / "class_distribution.csv").read_text()
    assert dist.splitlines()[0] == "class,total,train,validation,test,oversampled"
    report = (trained_model_dir / "test_report.txt").read_text()
    assert "accuracy" in report and "striped" in report


def test_engine_loads_trained_dir(trained_model_dir):
    """The training artifact must be a valid inference model dir."""
    import cv2

    from sykepic_tpu.compute.engine import Classifier

    clf = Classifier(trained_model_dir, batch_size=8)
    assert clf.classes == ["bright", "dark", "striped"]
    img = np.full((24, 20), 220, np.uint8)
    results = list(clf.classify_rois([(0, 1, img)]))
    assert len(results) == 1
    _, roi_id, probs = results[0]
    assert roi_id == 1
    assert probs.shape == (3,)
    assert np.isclose(probs.sum(), 1.0, atol=1e-5)


def test_auto_id_increments(trained_model_dir):
    assert trained_model_dir.name == "resnet18_1"


def test_collage_and_dist_modes(trained_model_dir, tmp_path):
    config_path = trained_model_dir / "config.ini"
    args = SimpleNamespace(
        config=str(config_path),
        collage=("2", "2", str(tmp_path / "collage.png")),
        dist=None,
        save_images=None,
    )
    import configparser

    cfg = configparser.ConfigParser()
    cfg.read(config_path)
    # collage mode reads the dataset; it still exists in the module tmp dir
    loop.main(args)
    assert (tmp_path / "collage.png").is_file()

    args = SimpleNamespace(
        config=str(config_path), collage=None,
        dist=str(tmp_path / "dist"), save_images=None,
    )
    loop.main(args)
    assert (tmp_path / "dist.png").is_file()


def test_resume_continues_in_same_dir(trained_model_dir, tmp_path):
    """resume=yes + id=auto picks up the latest auto dir, restores the
    bookkeeping and does NOT clobber a better best checkpoint."""
    import configparser

    cfg = configparser.ConfigParser()
    cfg.read(trained_model_dir / "config.ini")
    cfg.set("train", "resume", "yes")
    cfg.set("train", "max_epochs", "3")  # one more epoch past the saved 2
    resumed_ini = tmp_path / "resume.ini"
    with open(resumed_ini, "w") as fh:
        cfg.write(fh)

    from flax import serialization

    state_path = trained_model_dir / "train_state.msgpack"
    before = serialization.msgpack_restore(state_path.read_bytes())
    assert int(before["epoch"]) == 2
    # fake a high historical best so the resumed (worse) epoch must not
    # overwrite best_state.msgpack
    best = trained_model_dir / "best_state.msgpack"
    marker = best.read_bytes()
    before["metrics"]["max_val_acc"] = 1.0
    state_path.write_bytes(serialization.msgpack_serialize(before))

    args = SimpleNamespace(
        config=str(resumed_ini), collage=None, dist=None, save_images=None
    )
    out_dir = loop.main(args)
    assert out_dir == trained_model_dir  # reused, not a new auto dir
    after = serialization.msgpack_restore(state_path.read_bytes())
    assert int(after["epoch"]) == 3
    assert best.read_bytes() == marker  # best checkpoint untouched
