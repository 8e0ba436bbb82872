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


def test_mixed_epoch_covers_every_occurrence_once(dataset_dir):
    """epoch_mixed invariants: fixed per-bucket composition, every
    occurrence weighted exactly once, every batch drawing from every
    bucket."""
    paths, labels = dataset_dir
    paths = list(paths) + list(paths[:5])  # oversample: shared rows
    labels = list(labels) + list(labels[:5])
    spec = PreprocessSpec(32, 32, 3, border="black")
    # two buckets so mixing is actually in play (the default list holds
    # the whole fixture in one shape)
    ds = DeviceDataset(paths, labels, spec, batch_size=8, seed=1,
                       shuffle=True, buckets=((24, 40), (64, 64)))
    assert len(ds._bucket_keys) > 1  # mixing must actually be in play
    comp = None
    seen = 0.0
    n_batches = 0
    for b in ds:
        n_batches += 1
        sizes = tuple(len(i) for i in b.idxs)
        comp = comp or sizes
        assert sizes == comp  # one compiled program per epoch
        assert len(b.stores) == len(ds._bucket_keys)
        assert len(b.weights) == sum(sizes) == len(b.labels)
        seen += float(b.weights.sum())
        # labels mirror the store gather per bucket
        pos = 0
        for store, idx in zip(b.stores, b.idxs):
            store_labels = np.asarray(store["labels"])
            np.testing.assert_array_equal(
                b.labels[pos : pos + len(idx)], store_labels[idx]
            )
            pos += len(idx)
    assert seen == len(paths)
    assert n_batches == len(ds)


def test_mixed_step_matches_host_batch(dataset_dir):
    """The stratified mixed step must be numerically the host step on the
    same images (augmentation off: the mixed step folds a separate RNG key
    per bucket, so only the augmentation DRAWS differ by construction —
    the math under them is shared via Trainer._core_update)."""
    import jax

    from sykepic_tpu.train.device_data import MixedGatheredBatch

    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    ds = DeviceDataset(paths, labels, spec, batch_size=8, seed=3,
                       shuffle=True, buckets=((24, 40), (64, 64)))
    keys, idxs, weights = next(ds.epoch_mixed(shuffle=False))
    stores = tuple(ds.stores[k] for k in keys)
    batch = MixedGatheredBatch(
        stores, idxs, weights,
        np.concatenate([ds._host_labels[k][i] for k, i in zip(keys, idxs)]),
    )

    # host equivalent: the same images blitted onto one shared canvas
    hosts = [{k: np.asarray(v) for k, v in s.items()} for s in stores]
    bh = max(h["canvas"].shape[1] for h in hosts)
    bw = max(h["canvas"].shape[2] for h in hosts)
    n = sum(len(i) for i in idxs)
    canvas = np.zeros((n, bh, bw), np.uint8)
    cols = {f: [] for f in ("heights", "widths", "labels")}
    pos = 0
    for host, idx in zip(hosts, idxs):
        for row in idx:
            img = host["canvas"][row]
            canvas[pos, : img.shape[0], : img.shape[1]] = img
            pos += 1
        for f in cols:
            cols[f].append(host[f][idx])
    hb = HostBatch(
        canvas=canvas,
        heights=np.concatenate(cols["heights"]),
        widths=np.concatenate(cols["widths"]),
        labels=np.concatenate(cols["labels"]),
        weights=weights,
        paths=[None] * n,
    )

    model = build_model("resnet18", num_classes=3, head=(16,))
    variables = jax.device_get(init_variables(model, (32, 32, 3), seed=0))
    kwargs = dict(optimizer="SGD", preprocess_spec=spec)
    lrs = (1e-2, 0.0, 0.0)
    t_host = Trainer(model, jax.tree.map(np.copy, variables), seed=5,
                     **kwargs)
    l1, c1, n1 = t_host.train_batch(hb, stage=0, lrs=lrs)
    t_mix = Trainer(model, jax.tree.map(np.copy, variables), seed=5,
                    **kwargs)
    l2, c2, n2 = t_mix.train_batch(batch, stage=0, lrs=lrs)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    assert float(n1) == float(n2)
    assert float(c1) == float(c2)
    fa = flatten_dict(t_host.params)
    fb = flatten_dict(t_mix.params)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            rtol=1e-4, atol=1e-6, err_msg=str(k),
        )


def test_mixed_step_on_mesh(dataset_dir):
    """Mixed stratified step over the 8-device CPU mesh: stores replicated,
    indices replicated, concatenated batch data-sharded inside the step
    (no divisibility constraint on the batch)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sykepic_tpu.parallel import data_mesh

    assert jax.device_count() >= 8
    paths, labels = dataset_dir
    spec = PreprocessSpec(32, 32, 3, border="black")
    mesh = data_mesh()
    replicated = NamedSharding(mesh, P())
    # batch_size 7: the stratified composition then sums to a size that
    # does NOT divide the 8-device mesh, which is the property under test
    ds = DeviceDataset(paths, labels, spec, batch_size=7, seed=2,
                       shuffle=True, sharding=replicated,
                       buckets=((24, 40), (64, 64)))
    model = build_model("resnet18", num_classes=3, head=(16,))
    variables = init_variables(model, (32, 32, 3), seed=0)
    trainer = Trainer(model, variables, optimizer="SGD",
                      preprocess_spec=spec, mesh=mesh)
    total = 0.0
    saw_indivisible = False
    for b in ds:
        saw_indivisible |= len(b.weights) % mesh.size != 0
        loss_sum, correct, n = trainer.train_batch(
            b, stage=0, lrs=(1e-2, 0.0, 0.0)
        )
        assert np.isfinite(float(loss_sum))
        total += float(n)
        # eval must also take the mixed batch on the mesh (replicated
        # indices: sub-batch sizes need not divide the data axis)
        els, ec, en, preds = trainer.eval_batch(b)
        assert np.isfinite(float(els)) and len(preds) == len(b.labels)
    assert total == len(paths)
    # the point of this test: at least one batch size was NOT divisible
    # by the mesh, and the step ran anyway
    assert saw_indivisible


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
    """ROI size correlates with class in plankton data, so canvas-pure
    device batches are near-single-class and per-batch BatchNorm
    statistics erase the class signal: on this synthetic set (size and
    brightness perfectly class-correlated) bucket-PURE batches measured
    0.55 accuracy — chance. The shuffled DeviceDataset protocol therefore
    emits stratified MIXED batches (epoch_mixed), which this test pins:
    both the device path and the host loader must learn the set."""
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    rng = np.random.default_rng(11)
    paths, labels = [], []
    for i in range(140):
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
    train_x, train_y = paths[:112], labels[:112]
    val_x, val_y = paths[112:], labels[112:]
    spec = PreprocessSpec(32, 32, 3, border="black")
    # Two buckets keep the class<->canvas-shape correlation under test
    # (class 0 fits (24, 32), class 1 needs (64, 64)) while pinning the
    # number of compiled train-step programs: with the default bucket
    # ladders this test spent ~5 min compiling one ResNet program per
    # observed canvas shape on CPU.
    buckets = ((24, 32), (64, 64))

    def accuracy_after_training(make_loader):
        model = build_model("resnet18", num_classes=2, head=(16,))
        variables = init_variables(model, (32, 32, 3), seed=0)
        trainer = Trainer(model, variables, optimizer="Adam",
                          preprocess_spec=spec, seed=0)
        loader = make_loader(trainer)
        best = 0.0
        for _ in range(4):  # best-epoch accuracy, like the real loop's
            for b in loader:  # best-checkpoint selection
                trainer.train_batch(b, stage=0, lrs=(0.01, 0.0, 0.0))
            val = BatchLoader(val_x, val_y, batch_size=8, buckets=buckets)
            correct = n = 0.0
            for b in val:
                _, c, k, _ = trainer.eval_batch(b)
                correct += float(c)
                n += float(k)
            best = max(best, correct / n)
        return best

    acc_device = accuracy_after_training(
        lambda t: DeviceDataset(train_x, train_y, spec, batch_size=8,
                                seed=0, shuffle=True, buckets=buckets,
                                sharding=t._replicated)
    )
    acc_host = accuracy_after_training(
        lambda t: BatchLoader(train_x, train_y, batch_size=8, shuffle=True,
                              seed=0, buckets=buckets)
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


def test_mixed_epoch_properties_random(tmp_path):
    """Property test over epoch_mixed: for random bucket occupancies,
    batch sizes and oversampling — exact coverage, fixed composition,
    every contributing bucket in every batch, wrap slots weight-0."""
    import cv2

    rng = np.random.default_rng(5)
    spec = PreprocessSpec(32, 32, 3, border="black")
    pool = []
    for i in range(70):
        h = int(rng.integers(8, 70))
        w = int(rng.integers(8, 70))
        p = tmp_path / f"r{i:03}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (h, w), np.uint8))
        pool.append(p)

    for trial in range(6):
        n = int(rng.integers(5, 70))
        b = int(rng.integers(2, 24))
        picks = rng.choice(len(pool), n, replace=False)
        paths = [pool[int(k)] for k in picks]
        labels = rng.integers(0, 3, n).tolist()
        if trial % 2:  # oversample: duplicate a few files (shared rows)
            extra = [paths[int(k)] for k in rng.integers(0, n, n // 3)]
            paths = paths + extra
            labels = labels + [labels[paths.index(p)] for p in extra]
        ds = DeviceDataset(paths, labels, spec, batch_size=b, seed=trial,
                           shuffle=True,
                           buckets=((16, 16), (32, 32), (64, 64)))
        n_occ = len(paths)
        n_batches = -(-n_occ // b)
        comp = None
        seen = 0.0
        count = 0
        for keys, idxs, weights in ds.epoch_mixed():
            count += 1
            sizes = tuple(len(i) for i in idxs)
            comp = comp or sizes
            assert sizes == comp
            assert len(weights) == sum(sizes)
            seen += float(weights.sum())
            for key, idx in zip(keys, idxs):
                rows = len(np.asarray(ds.stores[key]["heights"]))
                assert idx.min() >= 0 and idx.max() < rows
        assert seen == n_occ, f"trial {trial}"
        assert count == n_batches
        if ds._use_mixed:  # len() reflects the __iter__ protocol's mode
            assert len(ds) == n_batches
