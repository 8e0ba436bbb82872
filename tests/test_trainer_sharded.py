"""A data-parallel training step over the 8-device mesh must match the
single-device step numerically (same math; GSPMD inserts the collectives)."""

import jax
import numpy as np
import pytest

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.parallel import data_mesh
from sykepic_tpu.train.config import PreprocessSpec
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
