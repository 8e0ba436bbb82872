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


def test_bn_free_family_trains(trained_model_dir, tmp_path):
    """The trainer/loop/checkpoint path must work for families WITHOUT
    BatchNorm (empty batch_stats: alexnet here, convnext likewise) — the
    freeze groups, mutable-collection handling and model-dir artifact
    cannot assume BN exists. AlexNet is the cheap proxy; the engine must
    load the result."""
    import cv2  # noqa: F401  (decoders registered by the fixture import)

    from sykepic_tpu.compute.engine import Classifier

    config = (trained_model_dir / "config.ini").read_text()
    config = config.replace("network = resnet18", "network = alexnet")
    config = config.replace("max_epochs = 2", "max_epochs = 1")
    # alexnet's pooling stack needs >= 63px inputs (models/alexnet.py)
    config = config.replace("shape = 3, 32, 32", "shape = 3, 64, 64")
    models = tmp_path / "models_alex"
    # point [model] path at a fresh dir (keep [dataset] path intact)
    lines = config.splitlines()
    in_model = False
    for i, line in enumerate(lines):
        if line.strip() == "[model]":
            in_model = True
        elif line.startswith("["):
            in_model = False
        elif in_model and line.startswith("path ="):
            lines[i] = f"path = {models}"
    (tmp_path / "alex.ini").write_text("\n".join(lines))

    args = SimpleNamespace(config=str(tmp_path / "alex.ini"), collage=None,
                           dist=None, save_images=None)
    model_dir = loop.main(args)
    assert model_dir.name == "alexnet_1"
    assert (model_dir / "best_state.msgpack").is_file()
    clf = Classifier(model_dir, batch_size=8)
    results = list(clf.classify_rois(
        [(0, 1, np.full((24, 20), 220, np.uint8))]))
    assert np.isclose(results[0][2].sum(), 1.0, atol=1e-5)


def test_full_deployment_round_trip(trained_model_dir, tmp_path):
    """The whole deployment contract in one walk (reference
    ``train/train.py:107-198`` + ``compute/probability.py`` +
    ``analyze/evaluation.py``): train (module fixture) -> classify a raw
    sample -> evaluate against human labels with threshold search ->
    export a reference-loadable .pth -> reload the export through the
    converter into a fresh model dir -> identical prediction CSV."""
    import shutil

    import cv2

    from sykepic_tpu.__main__ import main as cli

    # one synthetic raw sample built from class-typical images
    rng = np.random.default_rng(4)
    raw = tmp_path / "raw"
    raw.mkdir()
    name = "D20240101T000000_IFCB114"
    adc_rows, roi_bytes, start = [], bytearray(), 0
    makers = [
        lambda h, w: np.full((h, w), 30, np.uint8),   # dark
        lambda h, w: np.full((h, w), 220, np.uint8),  # bright
    ]
    def striped(h, w):
        img = np.zeros((h, w), np.uint8)
        img[::2] = 255
        return img
    makers.append(striped)
    for i in range(6):
        h, w = int(rng.integers(20, 40)), int(rng.integers(15, 30))
        img = np.clip(makers[i % 3](h, w).astype(int)
                      + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
        cols = ["0"] * 24
        cols[15], cols[16], cols[17] = str(w), str(h), str(start)
        adc_rows.append(",".join(cols))
        roi_bytes.extend(img.tobytes())
        start += h * w
    (raw / f"{name}.adc").write_text("\n".join(adc_rows) + "\n")
    (raw / f"{name}.roi").write_bytes(bytes(roi_bytes))
    (raw / f"{name}.hdr").write_text("runTime: 1200\ninhibitTime: 18\n")

    # 1. classify with the TRAINED model dir
    probs_a = tmp_path / "probs_a"
    cli(["prob", "-r", str(raw), "-m", str(trained_model_dir),
         "-o", str(probs_a)])
    (csv_a,) = sorted(probs_a.glob("**/*.prob.csv"))

    # 2. evaluate against labels: alternate dark/bright/striped as built
    labels = ["dark", "bright", "striped"] * 2
    select = tmp_path / "evals" / f"{name}.select.csv"
    select.parent.mkdir()
    select.write_text("".join(f"{i+1},{labels[i]}\n" for i in range(6)))
    scores = tmp_path / "scores.csv"
    best = tmp_path / "thresholds.txt"
    cli(["evaluate", str(select.parent), str(probs_a), "--search",
         "-p", "0.1", "-o", str(scores), "--best-out", str(best)])
    assert scores.is_file()
    lines = best.read_text().splitlines()
    assert sorted(line.split()[0] for line in lines) == [
        "bright", "dark", "striped"
    ]

    # 3. export the reference-loadable artifact and rebuild a model dir
    #    holding ONLY config + class names + the exported .pth
    pth = tmp_path / "best_state.pth"
    cli(["export", str(trained_model_dir), "-o", str(pth)])
    ported = tmp_path / "ported_model"
    ported.mkdir()
    shutil.copy(trained_model_dir / "config.ini", ported / "config.ini")
    shutil.copy(trained_model_dir / "class_names.txt",
                ported / "class_names.txt")
    shutil.copy(pth, ported / "best_state.pth")

    # 4. classify with the round-tripped model: byte-identical CSV
    probs_b = tmp_path / "probs_b"
    cli(["prob", "-r", str(raw), "-m", str(ported), "-o", str(probs_b)])
    (csv_b,) = sorted(probs_b.glob("**/*.prob.csv"))
    assert csv_a.read_bytes() == csv_b.read_bytes()
