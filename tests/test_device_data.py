"""Device-resident dataset (train/device_data.py): epoch coverage,
oversample row sharing, and numerical equivalence of the gathered train
step with the host-batch step."""

import cv2
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.config import PreprocessSpec
from sykepic_tpu.train.device_data import DeviceDataset
from sykepic_tpu.train.input import HostBatch
from sykepic_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("devdata")
    rng = np.random.default_rng(7)
    paths, labels = [], []
    for i in range(23):
        h = int(rng.integers(10, 40))
        w = int(rng.integers(12, 60))
        img = rng.integers(0, 255, (h, w), np.uint8)
        p = root / f"img_{i:03}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
        labels.append(i % 3)
    return paths, labels


def test_epoch_covers_every_occurrence_once(dataset_dir):
    paths, labels = dataset_dir
    # oversample: repeat the first 5 files (shared store rows)
    paths = list(paths) + list(paths[:5])
    labels = list(labels) + list(labels[:5])
    spec = PreprocessSpec(32, 32, 3, border="black")
    ds = DeviceDataset(paths, labels, spec, batch_size=8, seed=1)
    assert ds.num_samples == 28
    seen = 0
    n_batches = 0
    for key, idx, weights in ds.epoch():
        assert key in ds.stores
        assert len(idx) == len(weights)
        # ladder tails: batches are b, b/2 or b/4 (weight-0 wrap padding
        # is computed work, so tails shrink instead of padding to 8)
        assert len(idx) in (8, 4, 2)
        seen += int(weights.sum())
        n_batches += 1
        # weight-0 slots are wrapped REAL rows, not zeros
        store_n = len(np.asarray(ds.stores[key]["heights"]))
        assert idx.max() < store_n
    assert seen == 28  # every occurrence weighted once
    assert n_batches == len(ds)


def test_oversampled_occurrences_share_rows(dataset_dir):
    paths, labels = dataset_dir
    dup = list(paths) + list(paths)  # every file twice
    spec = PreprocessSpec(32, 32, 3, border="black")
    ds = DeviceDataset(dup, labels + labels, spec, batch_size=8)
    # store rows = unique files, not occurrences
    assert ds.num_rows == len(paths)
    assert ds.num_samples == 2 * len(paths)


def test_gathered_step_matches_host_batch(dataset_dir):
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="mode")
    ds = DeviceDataset(paths, labels, spec, batch_size=8, seed=3)
    key, idx, weights = next(iter(ds.epoch(shuffle=False)))
    store = ds.stores[key]
    host = {k: np.asarray(v) for k, v in store.items()}
    hb = HostBatch(
        canvas=host["canvas"][idx],
        heights=host["heights"][idx],
        widths=host["widths"][idx],
        labels=host["labels"][idx],
        weights=weights,
        paths=[None] * len(idx),
    )

    import jax

    model = build_model("resnet18", num_classes=3, head=(16,))
    # host copy: the train step DONATES its param buffers, so two trainers
    # must not alias one device tree
    variables = jax.device_get(init_variables(model, (32, 32, 3), seed=0))
    kwargs = dict(
        optimizer="SGD", preprocess_spec=spec,
        augment_kwargs=dict(flip=True, translate=True, brightness=True,
                            brightness_range=(0.9, 1.1)),
    )
    lrs = (1e-2, 0.0, 0.0)
    t_host = Trainer(model, jax.tree.map(np.copy, variables), seed=5,
                     **kwargs)
    l1, c1, n1 = t_host.train_batch(hb, stage=0, lrs=lrs)
    t_dev = Trainer(model, jax.tree.map(np.copy, variables), seed=5,
                    **kwargs)
    l2, c2, n2 = t_dev.train_batch_gathered(store, idx, weights,
                                            stage=0, lrs=lrs)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    assert float(n1) == float(n2)
    fa = flatten_dict(t_host.params)
    fb = flatten_dict(t_dev.params)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            rtol=1e-4, atol=1e-6, err_msg=str(k),
        )


def test_gathered_step_on_mesh(dataset_dir):
    """Full gathered train step over the 8-device CPU mesh: store
    replicated, indices data-sharded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sykepic_tpu.parallel import data_mesh

    assert jax.device_count() >= 8
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    mesh = data_mesh()
    replicated = NamedSharding(mesh, P())
    ds = DeviceDataset(paths, labels, spec, batch_size=8,
                       sharding=replicated, batch_multiple=mesh.size)
    model = build_model("resnet18", num_classes=3, head=(16,))
    variables = init_variables(model, (32, 32, 3), seed=0)
    trainer = Trainer(model, variables, optimizer="SGD",
                      preprocess_spec=spec, mesh=mesh)
    total = 0.0
    for key, idx, weights in ds.epoch():
        assert len(idx) % mesh.size == 0
        loss_sum, correct, n = trainer.train_batch_gathered(
            ds.stores[key], idx, weights, stage=0, lrs=(1e-2, 0.0, 0.0)
        )
        total += float(n)
    assert total == len(paths)


def test_estimate_matches_actual_nbytes(dataset_dir):
    """estimate_nbytes (headers only) must equal the constructor's actual
    uploaded bytes — it gates the auto device-cache decision."""
    from sykepic_tpu.train.device_data import estimate_nbytes

    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    est = estimate_nbytes(paths, spec)
    ds = DeviceDataset(paths, labels, spec, batch_size=8)
    assert est == ds.nbytes


def test_gathered_batch_carries_host_labels(dataset_dir):
    """__iter__ batches expose host labels matching the store gather, so
    loop.test_net can read batch.labels like a HostBatch."""
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    ds = DeviceDataset(paths, labels, spec, batch_size=8, shuffle=False)
    for gb in ds:
        store_labels = np.asarray(gb.store["labels"])
        np.testing.assert_array_equal(gb.labels, store_labels[gb.idx])


def test_conflicting_labels_for_duplicate_path_raise(dataset_dir):
    """A file listed under two classes cannot share one store row: the
    dataset must refuse instead of silently relabeling every occurrence
    (the host BatchLoader honors per-occurrence labels)."""
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    dup_paths = list(paths) + [paths[0]]
    dup_labels = list(labels) + [(labels[0] + 1) % 3]  # conflicting class
    with pytest.raises(ValueError, match="conflicting labels"):
        DeviceDataset(dup_paths, dup_labels, spec, batch_size=8)
    # same label twice is fine (oversampling shares the row)
    ok = DeviceDataset(list(paths) + [paths[0]], list(labels) + [labels[0]],
                       spec, batch_size=8)
    assert ok.num_samples == len(paths) + 1


def test_bucket_pure_batches_learn_size_correlated_classes(tmp_path):
    """ROI size correlates with class in plankton data, so device-cache
    batches (canvas-shape-pure by construction) are near-single-class.
    The worried failure mode is skewed BatchNorm statistics breaking
    training. Evidence to the contrary: on a dataset where size and class
    are perfectly correlated, BOTH loaders must learn it (bucket order is
    shuffled every epoch, so BN running stats average across buckets)."""
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    rng = np.random.default_rng(11)
    paths, labels = [], []
    for i in range(200):
        cls = i % 2
        if cls == 0:  # small and dark
            h, w = int(rng.integers(10, 20)), int(rng.integers(12, 24))
            mean = 60
        else:  # large and bright
            h, w = int(rng.integers(40, 60)), int(rng.integers(40, 60))
            mean = 180
        img = np.clip(rng.normal(mean, 25, (h, w)), 0, 255).astype(np.uint8)
        p = tmp_path / f"img_{i:03}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
        labels.append(cls)
    train_x, train_y = paths[:160], labels[:160]
    val_x, val_y = paths[160:], labels[160:]
    spec = PreprocessSpec(32, 32, 3, border="black")

    def accuracy_after_training(make_loader):
        model = build_model("resnet18", num_classes=2, head=(16,))
        variables = init_variables(model, (32, 32, 3), seed=0)
        trainer = Trainer(model, variables, optimizer="Adam",
                          preprocess_spec=spec, seed=0)
        loader = make_loader(trainer)
        best = 0.0
        for _ in range(5):  # best-epoch accuracy, like the real loop's
            for b in loader:  # best-checkpoint selection
                trainer.train_batch(b, stage=0, lrs=(0.01, 0.0, 0.0))
            val = BatchLoader(val_x, val_y, batch_size=8)
            correct = n = 0.0
            for b in val:
                _, c, k, _ = trainer.eval_batch(b)
                correct += float(c)
                n += float(k)
            best = max(best, correct / n)
        return best

    acc_device = accuracy_after_training(
        lambda t: DeviceDataset(train_x, train_y, spec, batch_size=8,
                                seed=0, shuffle=True,
                                sharding=t._replicated)
    )
    acc_host = accuracy_after_training(
        lambda t: BatchLoader(train_x, train_y, batch_size=8, shuffle=True,
                              seed=0)
    )
    assert acc_device >= 0.9, f"device-cache path failed to learn: {acc_device}"
    assert acc_host >= 0.9, f"host path failed to learn: {acc_host}"


def test_pieces_stay_mesh_divisible_with_non_pow2_multiple(dataset_dir):
    """A 3-device data mesh: every emitted batch size must be divisible
    by the mesh axis — halving the full batch breaks that (258 -> 129),
    so tail pieces ride the batch_multiple * 2^k ladder instead."""
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    ds = DeviceDataset(paths, labels, spec, batch_size=8, batch_multiple=3)
    seen = 0
    for key, idx, weights in ds.epoch(shuffle=True):
        assert len(idx) % 3 == 0, f"batch {len(idx)} not mesh-divisible"
        if len(idx) != 9:  # 9 = the full batch (8 rounded up to the mesh)
            k = len(idx) // 3
            assert k & (k - 1) == 0, f"off-ladder tail size {len(idx)}"
        seen += int(weights.sum())
    assert seen == len(paths)
    assert sum(1 for _ in ds.epoch()) == len(ds)
