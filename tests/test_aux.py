"""Tests for auxiliary subsystems: profiling timers, dataset curation,
train-state resume round trip, file helpers."""

import numpy as np

from sykepic_tpu.train import dataset as dataset_mod
from sykepic_tpu.utils import files, profiling


def test_stage_timer():
    timer = profiling.StageTimer(enabled=True)
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    assert timer.counts["a"] == 2
    assert "a" in timer.summary() and "ms/call" in timer.summary()
    disabled = profiling.StageTimer(enabled=False)
    with disabled.stage("x"):
        pass
    assert not disabled.totals


def test_create_dataset(tmp_path):
    import cv2

    src = tmp_path / "src"
    for name, n in (("A", 5), ("B", 2), ("skip", 3)):
        d = src / name
        d.mkdir(parents=True)
        for i in range(n):
            cv2.imwrite(str(d / f"x{i}.png"), np.zeros((4, 4), np.uint8))
    copied = dataset_mod.create_dataset(
        src, tmp_path / "dst", min_N=3, exclude=("skip",)
    )
    assert copied == {"A": 5}
    out = sorted(p.name for p in (tmp_path / "dst" / "A").iterdir())
    assert out == [f"A_{i}.png" for i in range(5)]


def test_train_state_resume_roundtrip(tmp_path):
    import jax.numpy as jnp

    from sykepic_tpu.models.registry import build_model, init_variables
    from sykepic_tpu.train.config import PreprocessSpec
    from sykepic_tpu.train.input import HostBatch
    from sykepic_tpu.train.loop import load_train_state, save_train_state
    from sykepic_tpu.train.trainer import Trainer

    model = build_model("resnet18", num_classes=3, head=(8,))
    variables = init_variables(model, (32, 32, 3))
    spec = PreprocessSpec(32, 32, 3, border="black")

    def make_trainer():
        return Trainer(model, init_variables(model, (32, 32, 3)),
                       preprocess_spec=spec)

    t1 = Trainer(model, variables, preprocess_spec=spec)
    batch = HostBatch(
        canvas=np.random.default_rng(0).integers(0, 255, (8, 32, 64), np.uint8),
        heights=np.full(8, 30, np.int32),
        widths=np.full(8, 20, np.int32),
        labels=np.arange(8, dtype=np.int32) % 3,
        weights=np.ones(8, np.float32),
        paths=[None] * 8,
    )
    t1.train_batch(batch, stage=0, lrs=(1e-3, 0, 0))
    from sykepic_tpu.train.trainer import LRSchedule

    sched = LRSchedule(0.01, warmup=dict(factor_1=0.1, factor_2=0.5,
                                         step_1=1, step_2=2, step_3=3))
    sched.start_epoch(1)
    save_train_state(tmp_path, t1, epoch=5,
                     metrics={"max_val_acc": 0.9, "min_val_loss": 0.2,
                              "no_improvement": 1},
                     schedule=sched)

    t2 = make_trainer()
    state = load_train_state(tmp_path, t2)
    assert int(state["epoch"]) == 5
    assert state["metrics"]["max_val_acc"] == 0.9
    sched2 = LRSchedule(0.01)
    sched2.restore(state["schedule"])
    assert sched2.lrs == sched.lrs and sched2.stage == sched.stage
    import jax

    a = jax.tree_util.tree_leaves(t1.params)
    b = jax.tree_util.tree_leaves(t2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # missing state returns None
    assert load_train_state(tmp_path / "nope", t2) is None


def test_sample_csv_path_layout(tmp_path):
    out = files.sample_csv_path(
        "raw/D20180712T065600_IFCB114", tmp_path, suffix=".prob"
    )
    assert out.as_posix().endswith("2018/07/12/D20180712T065600_IFCB114.prob.csv")


def test_batchloader_producer_error_propagates(tmp_path):
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    good = tmp_path / "good.png"
    cv2.imwrite(str(good), np.zeros((8, 8), np.uint8))
    bad = tmp_path / "missing.png"  # never written
    loader = BatchLoader([good, bad], [0, 1], batch_size=2)
    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        list(loader)


def test_batchloader_abandoned_iterator_no_hang(tmp_path):
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    paths = []
    for i in range(64):
        p = tmp_path / f"x{i}.png"
        cv2.imwrite(str(p), np.zeros((8, 8), np.uint8))
        paths.append(p)
    loader = BatchLoader(paths, list(range(64)), batch_size=4, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # consumer abandons mid-epoch; must not deadlock
    # a fresh epoch over the same loader still works
    assert len(list(loader)) == 16


def test_parallel_helpers():
    import jax

    from sykepic_tpu import parallel

    mesh = parallel.data_mesh()
    assert mesh.axis_names == ("data",) and mesh.size == 8
    mesh2 = parallel.data_model_mesh(model_parallel=2)
    assert mesh2.axis_names == ("data", "model")
    assert mesh2.devices.shape == (4, 2)
    import pytest

    with pytest.raises(ValueError):
        parallel.data_model_mesh(model_parallel=3)

    x = np.arange(16.0).reshape(16, 1)
    sharded = parallel.shard_batch(mesh, x)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec("data")
    a, b = parallel.shard_batch(mesh, x, x + 1)
    np.testing.assert_array_equal(np.asarray(b), x + 1)
    rep = parallel.replicate(mesh, {"w": x})
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_jaxcache_env_spellings(_restore_jaxcache, tmp_path, monkeypatch):
    from sykepic_tpu.utils import jaxcache

    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", "0")
    assert jaxcache.enable() is None
    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", "off")
    assert jaxcache.enable() is None
    # plain enable spellings use the default dir, not a dir named "1";
    # the active dir is a per-platform partition under the base (the CPU
    # partition is keyed by a host fingerprint so VM migrations cannot
    # poison it with unloadable cross-machine entries)
    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", "1")
    active = jaxcache.enable(cache_dir=tmp_path / "cache")
    assert active.parent == tmp_path / "cache" and active.is_dir()
    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", str(tmp_path / "explicit"))
    active = jaxcache.enable()
    assert active.parent == tmp_path / "explicit" and active.is_dir()
    # legacy flat entries in the base are swept (they are dead weight the
    # partitioned cache would otherwise never reclaim)
    (tmp_path / "explicit" / "jit_x-00-cache").write_bytes(b"z")
    assert jaxcache.enable() == active
    assert not (tmp_path / "explicit" / "jit_x-00-cache").exists()


def test_jaxcache_sweeps_dead_partitions(_restore_jaxcache, tmp_path, monkeypatch):
    """Same-platform partitions from OTHER hosts (different fingerprint)
    and the legacy fingerprint-less directory are deleted — their XLA:CPU
    entries can SIGILL this host; other platforms' partitions survive."""
    from sykepic_tpu.utils import jaxcache

    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", str(tmp_path))
    active_name = jaxcache._platform_tag()
    platform = active_name.rsplit("-", 1)[0]
    dead = tmp_path / f"{platform}-0123456789ab"
    legacy = tmp_path / platform
    other = tmp_path / "otherplat-0123456789ab"
    for d in (dead, legacy, other):
        d.mkdir(parents=True)
        (d / "jit_y-00-cache").write_bytes(b"z")
    active = jaxcache.enable()
    assert active == tmp_path / active_name
    assert not dead.exists() and not legacy.exists()
    assert other.is_dir()  # never touch other platforms


import pytest


@pytest.fixture
def _restore_jaxcache():
    """Re-point the module-global backend-routing state back at the real
    cache base after the test (teardown runs after monkeypatch.undo, so
    enable() sees the restored env/platform)."""
    yield
    from sykepic_tpu.utils import jaxcache

    jaxcache.enable()


def test_jaxcache_accel_partition_survives_migration(
        _restore_jaxcache, tmp_path, monkeypatch):
    """Accelerator partitions are UNfingerprinted (their executables are
    host-independent; fingerprinting them threw the whole warm TPU cache
    away on every VM migration — first epoch 25 s -> 147 s), and the
    current host's legacy fingerprinted dir is migrated in, not
    deleted."""
    from sykepic_tpu.utils import jaxcache

    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", str(tmp_path))
    monkeypatch.setattr(jaxcache, "_main_platform", lambda: "axon")
    fp = jaxcache._host_fingerprint()
    own_legacy = tmp_path / f"axon-{fp}"
    other_legacy = tmp_path / "axon-0123456789ab"
    for d in (own_legacy, other_legacy):
        d.mkdir(parents=True)
    (own_legacy / "jit_warm-00-cache").write_bytes(b"x")
    (own_legacy / "jit_warm-00-atime").write_bytes(b"\0" * 8)
    active = jaxcache.enable()
    assert active == tmp_path / "axon"
    # warm entries moved into the shared partition; stale hosts removed
    assert (active / "jit_warm-00-cache").is_file()
    assert not own_legacy.exists() and not other_legacy.exists()


def test_jaxcache_routes_entries_by_backend(
        _restore_jaxcache, tmp_path, monkeypatch):
    """In an accelerator-platform process, XLA:CPU entries (model init)
    must land in the fingerprinted cpu partition, not the shared
    accelerator partition they would poison."""
    from sykepic_tpu.utils import jaxcache

    monkeypatch.setenv("SYKEPIC_COMPILE_CACHE", str(tmp_path))
    monkeypatch.setattr(jaxcache, "_main_platform", lambda: "axon")
    assert jaxcache.enable() == tmp_path / "axon"

    import jax._src.compilation_cache as cc

    class FakeBackend:
        def __init__(self, platform):
            self.platform = platform
            self.runtime_type = "stream_executor"

    from pathlib import Path

    cpu_cache = cc._get_cache(FakeBackend("cpu"))
    accel_cache = cc._get_cache(FakeBackend("axon"))
    fp = jaxcache._host_fingerprint()
    assert Path(str(cpu_cache.path)) == tmp_path / f"cpu-{fp}"
    assert Path(str(accel_cache.path)) == tmp_path / "axon"


def test_batchloader_size_pooling_tightens_canvases(tmp_path):
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    # 56 small + 8 large images. Class-stratified batching keeps batches
    # size-tight WITHIN each class: when size varies inside a class the
    # canvases stay small for most batches; when size IS the class (the
    # BatchNorm-hazard case) every batch carries the class mix instead and
    # pays the canvas for it.
    rng = np.random.default_rng(0)
    paths = []
    for i in range(56):
        p = tmp_path / f"s{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (20, 30), np.uint8))
        paths.append(p)
    for i in range(8):
        p = tmp_path / f"L{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (150, 180), np.uint8))
        paths.append(p)

    # size varies inside one class: batches stay small-canvas
    labels = [0] * 64
    loader = BatchLoader(paths, labels, batch_size=8, shuffle=True, seed=1,
                         size_pool=8)
    shapes = [b.canvas.shape[1:] for b in loader]
    assert len([s for s in shapes if s[0] <= 64]) >= 5
    assert sum(1 for _ in shapes) == 8  # every image exactly once

    # size == class: every batch must carry the global class mix (the
    # canvas cost is the price of not erasing the class signal in BN)
    labels = [0] * 56 + [1] * 8
    loader = BatchLoader(paths, labels, batch_size=8, shuffle=True, seed=1,
                         size_pool=8)
    for b in loader:
        kinds = set(b.labels[b.weights > 0].tolist())
        assert kinds == {0, 1}


def test_batchloader_pre_shrink_caps_canvas(tmp_path):
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    p = tmp_path / "big.png"
    cv2.imwrite(str(p), np.random.default_rng(1).integers(
        0, 255, (600, 400), np.uint8))
    loader = BatchLoader([p] * 4, [0] * 4, batch_size=4,
                         pre_shrink_to=(180, 180))
    (batch,) = list(loader)
    assert batch.heights.max() <= 180 and batch.widths.max() <= 180
    # fixed-point: the device resize of the pre-shrunk image is identity
    from sykepic_tpu.ingest import pack

    h, w = int(batch.heights[0]), int(batch.widths[0])
    assert (h, w) == pack.target_resize_dims(h, w, 180, 180)


def test_stratified_batching_properties(tmp_path):
    """Property test over the class-stratified host batching
    (input.BatchLoader._index_batches): for random label sets, image-size
    mixes and batch sizes — every index exactly once per epoch, no batch
    exceeds batch_size, and every class with >= n_batches members appears
    in (almost) every batch."""
    import cv2

    from sykepic_tpu.train.input import BatchLoader

    rng = np.random.default_rng(0)
    # one pool of image files, reused across scenarios
    paths = []
    for i in range(90):
        h = int(rng.integers(10, 120))
        w = int(rng.integers(10, 120))
        p = tmp_path / f"i{i:03}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (h, w), np.uint8))
        paths.append(p)

    for trial in range(8):
        n = int(rng.integers(17, 90))
        b = int(rng.integers(4, 33))
        n_classes = int(rng.integers(2, 6))
        sub = [paths[int(k)] for k in rng.choice(len(paths), n, replace=False)]
        labels = rng.integers(0, n_classes, n).tolist()
        loader = BatchLoader(sub, labels, batch_size=b, shuffle=True,
                             seed=trial, size_pool=8)
        n_batches = -(-n // b)
        for epoch in range(2):
            seen: list[int] = []
            got_batches = 0
            class_hits = {c: 0 for c in range(n_classes)}
            for batch in loader:
                got_batches += 1
                real = batch.weights > 0
                assert len(batch.weights) == b  # exact compiled shape
                assert int(real.sum()) <= b
                for lab in set(batch.labels[real].tolist()):
                    class_hits[lab] += 1
                # identity via (h, w) is ambiguous; count coverage by sum
                seen.append(int(real.sum()))
            assert sum(seen) == n, f"trial {trial}: coverage {sum(seen)} != {n}"
            assert got_batches == n_batches
            counts = np.bincount(labels, minlength=n_classes)
            for c in range(n_classes):
                if counts[c] >= n_batches:
                    # quantile dealing puts such a class in every batch;
                    # spill rebalancing may cost it at most one
                    assert class_hits[c] >= n_batches - 1, (
                        f"trial {trial} class {c}: in {class_hits[c]} of "
                        f"{n_batches} batches (count {counts[c]})"
                    )
