"""Labeled-dataset handling for training (reference ``sykepic/train/data.py``).

Split/oversample semantics are kept *bit-identical* to the reference so a
given dataset + seed yields the same train/val/test membership:

- per-class deterministic shuffle + split with ``random.seed(seed)`` before
  every shuffle (reference ``data.py:45-95``),
- ``int(round(len * split))`` boundaries (banker's rounding via Python
  ``round``),
- oversampling by round-robin reuse until ``until`` or the exponential-decay
  target ``int((1 + decay**len) * len)`` (reference ``data.py:297-317``),
- label encoding = sorted unique train-class names (sklearn ``LabelEncoder``
  semantics, reference ``data.py:97-108``) without the sklearn dependency.

What changed (TPU-native): there is no torch ``DataLoader``. Batching is the
job of :mod:`sykepic_tpu.train.input`, which packs decoded images into device
canvases; this module only owns file lists, labels, splits and the
``class_distribution.csv`` / ``class_names.txt`` artifacts.
"""

from __future__ import annotations

import os
import random
from itertools import groupby
from pathlib import Path

import numpy as np


class LabelEncoder:
    """Minimal stand-in for ``sklearn.preprocessing.LabelEncoder``:
    ``classes_`` is the sorted unique label set."""

    def fit(self, labels):
        self.classes_ = np.unique(np.asarray(labels, dtype=object))
        self._index = {c: i for i, c in enumerate(self.classes_)}
        return self

    def transform(self, labels):
        try:
            return np.asarray([self._index[label] for label in labels])
        except KeyError as e:
            raise ValueError(f"y contains previously unseen labels: {e}") from e

    def fit_transform(self, labels):
        return self.fit(labels).transform(labels)

    def inverse_transform(self, indices):
        return self.classes_[np.asarray(indices)]


class ModelData:
    """Dataset splitting, labeling and oversampling
    (reference ``data.py:17-192``)."""

    def __init__(self, dataset, split, min_N, max_N, exclude=(), random_seed=24):
        self.dataset = Path(dataset)
        self.split = split
        self.min_N = min_N
        self.max_N = max_N
        self.exclude = list(exclude)
        self.random_seed = random_seed
        self.oversampled = False
        self._init_paths()
        self._init_labels()

    def _init_paths(self):
        """Split dataset into per-split path lists (reference ``:31-95``)."""
        if len(self.split) == 3:
            train_split, val_split, test_split = self.split
            self.test_x = []
        else:
            train_split, val_split = self.split
            test_split = None
            self.test_x = None
        self.train_x = []
        self.val_x = []
        self.distribution = {}

        for class_dir in self.dataset.iterdir():
            paths = sorted(
                list_files(
                    class_dir,
                    ".png",
                    self.min_N,
                    self.max_N,
                    self.exclude,
                    self.random_seed,
                )
            )
            if not paths:
                continue
            random.seed(self.random_seed)
            random.shuffle(paths)
            train_stop = int(round(len(paths) * train_split))
            val_stop = train_stop + int(round(len(paths) * val_split))
            train = paths[:train_stop]
            if test_split is None:
                val = paths[train_stop:]
                assert train and val, (
                    f"'{class_dir.name}' doesn't have enough samples ({len(paths)})."
                    " Consider using another min_N or split value."
                )
                self.distribution[class_dir.name] = [len(paths), len(train), len(val)]
            else:
                val = paths[train_stop:val_stop]
                test = paths[val_stop:]
                assert train and val and test, (
                    f"'{class_dir.name}' doesn't have enough samples ({len(paths)})."
                    " Consider using another min_N or split value."
                )
                self.distribution[class_dir.name] = [
                    len(paths),
                    len(train),
                    len(val),
                    len(test),
                ]
                self.test_x.extend(test)
                random.seed(self.random_seed)
                random.shuffle(self.test_x)
            self.train_x.extend(train)
            self.val_x.extend(val)
        random.seed(self.random_seed)
        random.shuffle(self.train_x)
        random.seed(self.random_seed)
        random.shuffle(self.val_x)

    def _init_labels(self):
        """Integer labels from parent directory names (reference ``:97-108``)."""
        train_labels = [path.parent.name for path in self.train_x]
        val_labels = [path.parent.name for path in self.val_x]
        self.le = LabelEncoder()
        self.le.fit_transform(train_labels)
        self.train_y = list(self.le.transform(train_labels))
        self.val_y = list(self.le.transform(val_labels))
        if self.test_x:
            test_labels = [path.parent.name for path in self.test_x]
            self.test_y = list(self.le.transform(test_labels))

    def save(self, out_dir) -> None:
        """Write ``class_distribution.csv`` + ``class_names.txt``
        (reference ``:110-130``)."""
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "class_distribution.csv", "w") as fh:
            header = "class,total,train,validation"
            if self.test_x:
                header += ",test"
            fh.write(header)
            if self.oversampled:
                fh.write(",oversampled")
            classes = sorted(self.distribution.items())
            classes = sorted(classes, key=lambda x: x[1][0], reverse=True)
            for class_ in classes:
                fh.write(f"\n{class_[0]},")
                fh.write(",".join(str(i) for i in class_[1]))
        with open(out_dir / "class_names.txt", "w") as fh:
            fh.write("\n".join(self.le.classes_))

    def oversample(self, until, decay) -> None:
        """Reuse training samples per class (reference ``:132-148``)."""
        train_zip = sorted(zip(self.train_x, self.train_y), key=lambda x: x[1])
        self.over_x = []
        self.over_y = []
        for key, group in groupby(train_zip, lambda x: x[1]):
            x, y = zip(*list(group))
            over_x, over_y = oversample(list(x), list(y), until, decay)
            name = self.le.inverse_transform([key])[0]
            self.distribution[name].append(len(over_x))
            self.distribution[name][1] += len(over_x)
            self.over_x.extend(over_x)
            self.over_y.extend(over_y)
        self.oversampled = True

    def train_set(self):
        """(paths, labels) for training, oversampling folded in and shuffled
        (reference ``set_data_loaders``, ``:157-165``)."""
        if self.oversampled:
            train_x = self.train_x + self.over_x
            train_y = self.train_y + self.over_y
            train_x, train_y = combined_shuffle(train_x, train_y, self.random_seed)
            return list(train_x), list(train_y)
        return list(self.train_x), list(self.train_y)

    @property
    def num_classes(self) -> int:
        return len(self.le.classes_)


def list_files(root_dir, extension, min_N=None, max_N=None, exclude=(), random_seed=24):
    """Yield files below ``root_dir`` with allowed extensions
    (reference ``data.py:234-275``; identical min/max/exclude + shuffle)."""
    if not isinstance(extension, list):
        extension = [extension]
    for dirpath, _, filenames in os.walk(root_dir):
        dirpath = Path(dirpath)
        if dirpath.name in exclude:
            continue
        if min_N and len(filenames) < min_N:
            continue
        if max_N and len(filenames) > max_N:
            random.seed(random_seed)
            random.shuffle(filenames)
            filenames = filenames[:max_N]
        for filename in filenames:
            filepath = dirpath / filename
            if filepath.suffix in extension:
                yield filepath.resolve()


def auto_id(name, directory) -> int:
    """Next free ``<name>_<N>`` version number (reference ``data.py:278-294``)."""
    max_id = 0
    directory = Path(directory)
    if directory.is_dir():
        for path in directory.glob(f"{name}_*"):
            if path.is_dir():
                try:
                    path_id = int(path.name.split("_")[-1])
                except ValueError:
                    continue
                if path_id > max_id:
                    max_id = path_id
    return max_id + 1


def oversample(x, y, until=None, decay=None):
    """Round-robin reuse until a size target (reference ``data.py:297-317``).

    The reference's argument guard is inverted (``data.py:303-306`` raises
    exactly when decay *is* provided, so its ``oversample_with_decay`` config
    path cannot run); this implements the documented intent: ``until`` wins,
    else the decay target ``int((1 + decay**len(x)) * len(x))``.
    """
    if not until and decay:
        until = int((1 + 1 * decay ** len(x)) * len(x))
    elif not until:
        raise ValueError("Must provide either 'until' or 'decay'")
    over_x = []
    over_y = []
    i = 0
    while len(x) + len(over_x) < until:
        over_x.append(x[i])
        over_y.append(y[i])
        i += 1
        if i >= len(x):
            i = 0
    return over_x, over_y


def combined_shuffle(list1, list2, random_seed=24):
    """Shuffle two lists in lockstep (reference ``data.py:320-326``)."""
    random.seed(random_seed)
    combined = list(zip(list1, list2))
    random.shuffle(combined)
    return zip(*combined)


def external_eval_set(data_dir, model_data, exclude=("Unclassified",),
                      random_seed=24):
    """(paths, labels) for an external test set
    (reference ``extra_eval_dataloader``, ``data.py:329-344``)."""
    x = sorted(list_files(data_dir, ".png", exclude=list(exclude)))
    random.seed(random_seed)
    random.shuffle(x)
    y = [path.parent.name for path in x]
    y = list(model_data.le.transform(y))
    return x, y
