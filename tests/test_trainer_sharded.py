"""Sharded trainer vs single-device equivalence over the 8-device CPU mesh
(same math; GSPMD inserts the collectives): the plain dp step, the scanned
mixed-epoch dispatch, the LR-stage unfreeze transition, the eval path, and
the dp x tp mesh."""

import jax
import numpy as np
import pytest

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.parallel import data_mesh, data_model_mesh
from sykepic_tpu.train.config import PreprocessSpec
from sykepic_tpu.train.device_data import make_store
from sykepic_tpu.train.input import HostBatch
from sykepic_tpu.train.trainer import Trainer


def make_batch(b=16, seed=0):
    rng = np.random.default_rng(seed)
    canvas = np.zeros((b, 32, 64), np.uint8)
    heights = np.zeros(b, np.int32)
    widths = np.zeros(b, np.int32)
    for i in range(b):
        h, w = int(rng.integers(8, 32)), int(rng.integers(8, 64))
        canvas[i, :h, :w] = rng.integers(0, 255, (h, w), np.uint8)
        heights[i], widths[i] = h, w
    return HostBatch(
        canvas, heights, widths,
        rng.integers(0, 4, b).astype(np.int32),
        np.ones(b, np.float32), [None] * b,
    )


@pytest.mark.parametrize("stage", [0, 2])
def test_sharded_step_matches_single_device(stage):
    assert jax.device_count() >= 8
    model = build_model("resnet18", num_classes=4, head=(16,))
    spec = PreprocessSpec(32, 32, 3, border="black")
    batch = make_batch()

    def run(mesh):
        # SGD so parameter deltas are proportional to gradients (Adam's
        # first step is sign(grad) and amplifies float-reassociation noise
        # of near-zero gradients to +-lr)
        trainer = Trainer(
            model, init_variables(model, (32, 32, 3), seed=1),
            optimizer="SGD", preprocess_spec=spec, mesh=mesh, seed=7,
        )
        out = trainer.train_batch(batch, stage=stage, lrs=(1e-2, 1e-3, 1e-4))
        return out, trainer

    (loss1, acc1, n1), t1 = run(data_mesh(jax.devices()[:1]))
    (loss8, acc8, n8), t8 = run(data_mesh())
    # metrics come back as device scalars (sharded differently per mesh)
    assert float(n1) == float(n8) == 16
    assert float(acc1) == float(acc8)
    assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)
    # updated parameters agree across the two shardings. Float
    # reassociation of the sharded BatchNorm statistics perturbs gradients
    # by O(1e-5) after one step; semantic bugs (missing grad all-reduce,
    # per-shard BN) would show as O(lr)=1e-2 or 8x-scaled differences.
    a = jax.tree_util.tree_leaves(t1.params)
    b = jax.tree_util.tree_leaves(t8.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=3e-4)


def _make_trainer(mesh, spec, model, seed=7):
    return Trainer(
        model, init_variables(model, (32, 32, 3), seed=1),
        optimizer="SGD", preprocess_spec=spec, mesh=mesh, seed=seed,
    )


def _two_stores(trainer, spec, seed=3):
    """Two replicated bucket stores of ragged fake ROIs (the production
    device-resident layout, train/device_data.py::make_store)."""
    rng = np.random.default_rng(seed)
    stores = []
    for shape in ((32, 64), (24, 40)):
        b = 16
        canvas = np.zeros((b, *shape), np.uint8)
        heights = np.zeros(b, np.int32)
        widths = np.zeros(b, np.int32)
        for i in range(b):
            h = int(rng.integers(8, shape[0]))
            w = int(rng.integers(8, shape[1]))
            canvas[i, :h, :w] = rng.integers(0, 255, (h, w), np.uint8)
            heights[i], widths[i] = h, w
        labels = rng.integers(0, 4, b).astype(np.int32)
        stores.append({
            k: jax.device_put(v, trainer._replicated)
            for k, v in make_store(canvas, heights, widths, labels,
                                   spec).items()
        })
    return tuple(stores)


def test_scanned_mixed_epoch_matches_single_device():
    """The production shuffled-epoch dispatch (one lax.scan over mixed
    gathered sub-batches) on the 8-device mesh vs the identical epoch on
    one device: same loss, same updated parameters."""
    assert jax.device_count() >= 8
    model = build_model("resnet18", num_classes=4, head=(16,))
    spec = PreprocessSpec(32, 32, 3, border="black")
    # 3 scan steps x (12 + 9) ROIs, total deliberately NOT divisible by 8
    idx_a = np.stack([np.arange(12, dtype=np.int32) + s for s in range(3)]) % 16
    idx_b = np.stack([np.arange(9, dtype=np.int32) + s for s in range(3)]) % 16
    wts = np.ones((3, 21), np.float32)

    def run(mesh):
        t = _make_trainer(mesh, spec, model)
        stores = _two_stores(t, spec)
        loss, acc, n = t.train_epoch_mixed_scanned(
            stores, (idx_a, idx_b), wts, stage=2, lrs=(1e-2, 1e-3, 1e-4)
        )
        return (float(loss), float(acc), float(n)), t

    (l1, a1, n1), t1 = run(data_mesh(jax.devices()[:1]))
    (l8, a8, n8), t8 = run(data_mesh())
    assert n1 == n8 == 63
    assert a1 == a8
    assert l1 == pytest.approx(l8, rel=1e-4)
    for x, y in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t8.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3)


def test_stage_transition_on_mesh():
    """The LR-warmup unfreeze sequence (stage 0 -> 1 -> 2 steps) on the
    mesh: stage-gated groups stay EXACTLY frozen per step, and the final
    parameters match the same sequence on one device."""
    assert jax.device_count() >= 8
    model = build_model("resnet18", num_classes=4, head=(16,))
    spec = PreprocessSpec(32, 32, 3, border="black")
    batch = make_batch()
    lrs = (1e-2, 1e-3, 1e-4)

    def run(mesh):
        t = _make_trainer(mesh, spec, model)
        frozen_after = {}
        init_leaves = {
            path: np.asarray(leaf).copy()
            for path, leaf in jax.tree_util.tree_flatten_with_path(t.params)[0]
        }
        for stage in (0, 1, 2):
            t.train_batch(batch, stage=stage, lrs=lrs)
            if stage == 0:
                # groups 1 and 2 must be untouched after a stage-0 step
                for (path, leaf), (_, lab) in zip(
                    jax.tree_util.tree_flatten_with_path(t.params)[0],
                    jax.tree_util.tree_flatten_with_path(t.labels)[0],
                ):
                    if int(lab) > 0:
                        frozen_after[path] = np.array_equal(
                            np.asarray(leaf), init_leaves[path])
        return t, frozen_after

    t1, _ = run(data_mesh(jax.devices()[:1]))
    t8, frozen8 = run(data_mesh())
    assert frozen8 and all(frozen8.values()), (
        "stage-0 step on the mesh touched frozen base groups")
    for x, y in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t8.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3)


def test_eval_batch_matches_single_device():
    """The eval path (loss/accuracy/predictions) on the mesh vs one
    device: identical predictions, loss to float tolerance."""
    assert jax.device_count() >= 8
    model = build_model("resnet18", num_classes=4, head=(16,))
    spec = PreprocessSpec(32, 32, 3, border="black")
    batch = make_batch(seed=5)

    def run(mesh):
        t = _make_trainer(mesh, spec, model)
        ls, cs, n, preds = t.eval_batch(batch)
        return float(ls), float(cs), float(n), np.asarray(preds)

    l1, c1, n1, p1 = run(data_mesh(jax.devices()[:1]))
    l8, c8, n8, p8 = run(data_mesh())
    assert n1 == n8 == 16
    assert c1 == c8
    assert l1 == pytest.approx(l8, rel=1e-5)
    np.testing.assert_array_equal(p1, p8)


def test_mixed_step_on_dp_tp_mesh():
    """One stratified mixed gathered step on a data x model (4x2) mesh —
    wide late-stage kernels tensor-sharded — vs one device."""
    assert jax.device_count() >= 8
    model = build_model("resnet18", num_classes=4, head=(16,))
    spec = PreprocessSpec(32, 32, 3, border="black")
    idx_a = np.arange(12, dtype=np.int32)
    idx_b = np.arange(9, dtype=np.int32)
    wts = np.ones(21, np.float32)

    def run(mesh):
        t = _make_trainer(mesh, spec, model)
        stores = _two_stores(t, spec)
        loss, acc, n = t.train_batch_mixed(
            stores, (idx_a, idx_b), wts, stage=2, lrs=(1e-2, 1e-3, 1e-4)
        )
        return (float(loss), float(acc), float(n)), t

    (l1, a1, n1), t1 = run(data_mesh(jax.devices()[:1]))
    (lm, am, nm), tm = run(data_model_mesh(model_parallel=2))
    assert n1 == nm == 21
    assert a1 == am
    assert l1 == pytest.approx(lm, rel=2e-3)
    for x, y in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(tm.params)):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=2e-3)
