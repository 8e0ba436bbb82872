"""Unit tests for the training data layer (split/oversample/labels;
reference semantics ``sykepic/train/data.py``)."""

import random

import numpy as np
import pytest

from sykepic_tpu.train import data


def make_dataset(root, classes):
    """folder-per-class PNG dataset of tiny images."""
    import cv2

    rng = np.random.default_rng(0)
    for name, count in classes.items():
        d = root / name
        d.mkdir(parents=True)
        for i in range(count):
            img = rng.integers(0, 255, (12 + i % 5, 9 + i % 7), np.uint8)
            cv2.imwrite(str(d / f"{name}_{i:03}.png"), img)


def test_split_deterministic_and_disjoint(tmp_path):
    make_dataset(tmp_path, {"A": 20, "B": 10, "C": 5})
    md1 = data.ModelData(tmp_path, (0.6, 0.2, 0.2), None, None, random_seed=24)
    md2 = data.ModelData(tmp_path, (0.6, 0.2, 0.2), None, None, random_seed=24)
    assert md1.train_x == md2.train_x
    assert md1.val_x == md2.val_x
    assert md1.test_x == md2.test_x
    allsets = set(md1.train_x) | set(md1.val_x) | set(md1.test_x)
    assert len(allsets) == 35
    assert not set(md1.train_x) & set(md1.val_x)
    # int(round(n * split)) boundaries per class (reference data.py:58-60)
    assert md1.distribution["A"] == [20, 12, 4, 4]
    assert md1.distribution["B"] == [10, 6, 2, 2]
    assert md1.distribution["C"] == [5, 3, 1, 1]


def test_split_matches_reference_shuffle_order(tmp_path):
    """The exact membership must equal the reference algorithm (python
    ``random.seed`` + ``shuffle`` on the sorted path list)."""
    make_dataset(tmp_path, {"A": 10})
    md = data.ModelData(tmp_path, (0.7, 0.3), None, None, random_seed=7)
    paths = sorted((tmp_path / "A").glob("*.png"))
    paths = [p.resolve() for p in paths]
    random.seed(7)
    random.shuffle(paths)
    expected_train = paths[: int(round(10 * 0.7))]
    random.seed(7)
    shuffled = list(expected_train)
    random.shuffle(shuffled)
    assert md.train_x == shuffled


def test_labels_sorted_unique(tmp_path):
    make_dataset(tmp_path, {"Zebra": 4, "Alga": 4})
    md = data.ModelData(tmp_path, (0.5, 0.5), None, None)
    assert list(md.le.classes_) == ["Alga", "Zebra"]
    for p, y in zip(md.train_x, md.train_y):
        assert md.le.classes_[y] == p.parent.name


def test_oversample_until(tmp_path):
    make_dataset(tmp_path, {"A": 12, "B": 4})
    md = data.ModelData(tmp_path, (0.5, 0.5), None, None)
    md.oversample(10, None)
    x, y = md.train_set()
    counts = {}
    for label in y:
        counts[label] = counts.get(label, 0) + 1
    # every class's train split grows to >= 10
    assert all(c >= 10 for c in counts.values())
    assert md.oversampled


def test_oversample_decay():
    over_x, over_y = data.oversample(list("abc"), [0, 0, 0], None, 0.9)
    # until = int((1 + 0.9**3) * 3) = int(5.187) = 5 -> 2 extra
    assert over_x == ["a", "b"]
    with pytest.raises(ValueError):
        data.oversample(list("abc"), [0, 0, 0], None, None)


def test_save_artifacts(tmp_path):
    make_dataset(tmp_path / "ds", {"A": 8, "B": 6})
    md = data.ModelData(tmp_path / "ds", (0.5, 0.5), None, None)
    md.save(tmp_path / "model")
    names = (tmp_path / "model" / "class_names.txt").read_text().splitlines()
    assert names == ["A", "B"]
    dist = (tmp_path / "model" / "class_distribution.csv").read_text().splitlines()
    assert dist[0] == "class,total,train,validation"
    # ordered by class size, descending (reference data.py:121-124)
    assert dist[1].startswith("A,8") and dist[2].startswith("B,6")


def test_auto_id(tmp_path):
    assert data.auto_id("resnet18", tmp_path) == 1
    (tmp_path / "resnet18_3").mkdir()
    (tmp_path / "resnet18_junk").mkdir()
    assert data.auto_id("resnet18", tmp_path) == 4


def test_list_files_min_max_exclude(tmp_path):
    make_dataset(tmp_path, {"A": 10, "B": 2, "skipme": 5})
    files = list(data.list_files(tmp_path, ".png", min_N=3, exclude=["skipme"]))
    assert len(files) == 10
    capped = list(data.list_files(tmp_path / "A", ".png", max_N=4))
    assert len(capped) == 4
    # max_N selection is seeded-shuffle deterministic
    capped2 = list(data.list_files(tmp_path / "A", ".png", max_N=4))
    assert capped == capped2
