"""Whole-epoch scanned training (one compiled dispatch per epoch).

``Trainer.train_epoch_mixed_scanned`` must be the SAME epoch the per-step
loop runs: identical batch plan (``DeviceDataset.epoch_mixed_stacked`` row
``j`` == streaming batch ``j``), identical RNG chain (one key split per
batch, in batch order), and numerically matching parameter trajectories
and metric totals.
"""

import cv2
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.config import PreprocessSpec
from sykepic_tpu.train.device_data import DeviceDataset
from sykepic_tpu.train.trainer import Trainer

BUCKETS = ((24, 40), (64, 64))  # two buckets so mixing is in play


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scandata")
    rng = np.random.default_rng(11)
    paths, labels = [], []
    for i in range(21):
        h = int(rng.integers(10, 40))
        w = int(rng.integers(12, 60))
        img = rng.integers(0, 255, (h, w), np.uint8)
        p = root / f"img_{i:03}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
        labels.append(i % 3)
    return paths, labels


def _dataset(dataset_dir, seed=3):
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    ds = DeviceDataset(paths, labels, spec, batch_size=8, seed=seed,
                       shuffle=True, buckets=BUCKETS)
    assert len(ds._bucket_keys) > 1
    return ds, spec


def test_stacked_rows_are_the_streaming_batches(dataset_dir):
    """epoch_mixed_stacked row j must be exactly epoch_mixed batch j."""
    ds1, _ = _dataset(dataset_dir)
    ds2, _ = _dataset(dataset_dir)
    stores, idxs_stk, wts_stk = ds1.epoch_mixed_stacked(shuffle=True)
    stream = list(ds2.epoch_mixed(shuffle=True))
    assert wts_stk.shape[0] == len(stream)
    for j, (keys, idxs, weights) in enumerate(stream):
        assert stores == tuple(ds1.stores[k] for k in keys)
        for i, idx in enumerate(idxs):
            np.testing.assert_array_equal(idxs_stk[i][j], idx)
        np.testing.assert_array_equal(wts_stk[j], weights)
    # every occurrence weighted exactly once across the epoch
    assert float(wts_stk.sum()) == ds1.num_samples


def _trainer(spec, n_classes=3, seed=0):
    model = build_model("resnet18", num_classes=n_classes, head=(16,))
    variables = init_variables(model, (32, 32, 3), seed=7)
    return Trainer(
        model, variables, optimizer="Adam", preprocess_spec=spec,
        seed=seed,
        # augmentation ON: the scanned epoch must reproduce the per-step
        # key chain, and augmentation draws are the sharpest probe of it
        augment_kwargs=dict(flip=True, translate=True, zoom=True,
                            brightness=True, zoom_range=(0.8, 1.2),
                            brightness_range=(0.95, 1.05)),
    )


def test_scanned_epoch_matches_per_step_loop(dataset_dir):
    ds1, spec = _dataset(dataset_dir)
    ds2, _ = _dataset(dataset_dir)
    lrs = (1e-3, 1e-4, 1e-5)

    t_loop = _trainer(spec)
    loss = correct = n = 0.0
    for keys, idxs, weights in ds1.epoch_mixed(shuffle=True):
        stores = tuple(ds1.stores[k] for k in keys)
        ls, c, k = t_loop.train_batch_mixed(stores, idxs, weights,
                                            stage=2, lrs=lrs)
        loss += float(ls)
        correct += float(c)
        n += float(k)

    t_scan = _trainer(spec)
    stores, idxs_stk, wts_stk = ds2.epoch_mixed_stacked(shuffle=True)
    ls, c, k = t_scan.train_epoch_mixed_scanned(
        stores, idxs_stk, wts_stk, stage=2, lrs=lrs
    )
    assert float(k) == n == ds1.num_samples
    assert float(c) == pytest.approx(correct, abs=1e-6)
    assert float(ls) == pytest.approx(loss, rel=1e-5)

    flat_a = flatten_dict(t_loop.params)
    flat_b = flatten_dict(t_scan.params)
    assert flat_a.keys() == flat_b.keys()
    for path in flat_a:
        # scan-body vs per-step fusion reorders f32 reductions; Adam's
        # normalizer amplifies that on near-zero-grad leaves (measured
        # absmax 1.5e-5 over an epoch). A wrong batch plan or key chain
        # diverges by orders of magnitude more.
        np.testing.assert_allclose(
            np.asarray(flat_a[path]), np.asarray(flat_b[path]),
            rtol=1e-2, atol=1e-3, err_msg=str(path),
        )
    # the key chain advanced identically (one split per batch)
    np.testing.assert_array_equal(np.asarray(t_loop.key),
                                  np.asarray(t_scan.key))


def test_scanned_epochs_train_across_epochs(dataset_dir):
    """Two scanned epochs in a row: the loss must fall and the state
    (params / opt_state / key) must thread through cleanly."""
    ds, spec = _dataset(dataset_dir)
    t = _trainer(spec)
    lrs = (1e-2, 0.0, 0.0)
    losses = []
    for _ in range(2):
        packed = ds.epoch_mixed_stacked(shuffle=True)
        assert packed is not None
        stores, idxs_stk, wts_stk = packed
        ls, _, n = t.train_epoch_mixed_scanned(stores, idxs_stk, wts_stk,
                                               stage=0, lrs=lrs)
        losses.append(float(ls) / float(n))
    assert np.isfinite(losses).all()
    assert losses[1] < losses[0] * 1.5  # sane, not diverging
