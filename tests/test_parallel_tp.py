"""Tensor-parallel parameter placement (parallel.shard_wide_kernels):
library-level tp on the 8-virtual-device CPU mesh — sharded runs must be
numerically equivalent to replicated single-device runs, for both the
trainer and the inference engine."""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sykepic_tpu import parallel
from sykepic_tpu.models.registry import build_model, init_variables


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.data_model_mesh(model_parallel=2, devices=jax.devices()[:8])


def test_placement_rules(mesh):
    model = build_model("resnet18", num_classes=10, head=(128, 64))
    variables = init_variables(model, (32, 32, 3), seed=0)
    placed = parallel.shard_wide_kernels(variables["params"], mesh)
    # wide head kernel: last axis sharded over "model"
    head_spec = placed["head"]["fc0"]["kernel"].sharding.spec
    assert head_spec[-1] == "model"
    # late-stage conv kernel: sharded
    l4 = placed["layer4_0"]["conv1"]["kernel"].sharding.spec
    assert l4[-1] == "model"
    # early conv: replicated
    c1 = placed["conv1"]["kernel"].sharding.spec
    assert all(s is None for s in c1)
    # biases / 1-D leaves: replicated
    b = placed["head"]["fc0"]["bias"].sharding.spec
    assert all(s is None for s in b)
    # odd widths that don't divide the axis stay replicated
    assert parallel.data_axis_size(mesh) == 4
    assert parallel.has_model_axis(mesh)


def test_vgg_backbone_stays_replicated(mesh):
    """VGG's flat layer4_convJ / layer5_convJ modules must NOT match the
    block-structured layer4_<digit> backbone pattern: only its (25088-wide)
    head shards; mid-backbone 3x3 convs would buy collectives for
    nothing (see WIDE_MODULE_PATTERNS)."""
    model = build_model("vgg16", num_classes=6, head=(64,))
    variables = init_variables(model, (32, 32, 3), seed=0)
    placed = parallel.shard_wide_kernels(variables["params"], mesh)
    assert placed["head"]["fc0"]["kernel"].sharding.spec[-1] == "model"
    for stage in (4, 5):
        for j in range(3):
            spec = placed[f"layer{stage}_conv{j}"]["kernel"].sharding.spec
            assert all(s is None for s in spec), (stage, j)


def test_sharded_forward_matches_replicated(mesh):
    import jax
    import jax.numpy as jnp

    model = build_model("resnet18", num_classes=7, head=(64,))
    variables = init_variables(model, (32, 32, 3), seed=1)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (8, 32, 32, 3)), jnp.float32
    )

    def forward(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )

    base = np.asarray(jax.jit(forward)(
        variables["params"], variables["batch_stats"], x
    ))

    params_tp = parallel.shard_wide_kernels(variables["params"], mesh)
    stats_rep = parallel.replicate(mesh, variables["batch_stats"])
    x_sharded = parallel.shard_batch(mesh, np.asarray(x))
    out = np.asarray(jax.jit(forward)(params_tp, stats_rep, x_sharded))
    np.testing.assert_allclose(out, base, rtol=2e-5, atol=2e-6)


def test_sharded_forward_matches_replicated_grouped(mesh):
    """ResNeXt's grouped 3x3 convs ride the layer4 tp pattern: sharding
    the kernel's out-feature axis splits whole groups (2048/2 = 1024 = 16
    of the 32 groups per shard), which XLA partitions exactly — the
    sharded forward must match the replicated one."""
    import jax
    import jax.numpy as jnp

    model = build_model("resnext50_32x4d", num_classes=5, head=(32,))
    variables = init_variables(model, (32, 32, 3), seed=3)

    def forward(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )

    x = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (8, 32, 32, 3)), jnp.float32
    )
    base = np.asarray(jax.jit(forward)(
        variables["params"], variables["batch_stats"], x
    ))
    params_tp = parallel.shard_wide_kernels(variables["params"], mesh)
    assert (params_tp["layer4_0"]["conv2"]["kernel"]
            .sharding.spec[-1] == "model")
    stats_rep = parallel.replicate(mesh, variables["batch_stats"])
    x_sharded = parallel.shard_batch(mesh, np.asarray(x))
    out = np.asarray(jax.jit(forward)(params_tp, stats_rep, x_sharded))
    np.testing.assert_allclose(out, base, rtol=2e-5, atol=2e-6)


def test_sharded_forward_matches_replicated_convnext(mesh):
    """ConvNeXt layer4 blocks ride the tp pattern: the depthwise 7x7
    kernel and both MLP matmuls shard on their out-feature axis; the
    sharded forward must match the replicated run (LayerNorm + erf-GELU
    under GSPMD)."""
    import jax
    import jax.numpy as jnp

    model = build_model("convnext_tiny", num_classes=5, head=(32,))
    variables = init_variables(model, (32, 32, 3), seed=5)

    def forward(params, x):
        return model.apply({"params": params}, x, train=False)

    x = jnp.asarray(
        np.random.default_rng(6).uniform(0, 1, (8, 32, 32, 3)), jnp.float32
    )
    base = np.asarray(jax.jit(forward)(variables["params"], x))
    params_tp = parallel.shard_wide_kernels(variables["params"], mesh)
    assert (params_tp["layer4_0"]["mlp1"]["kernel"]
            .sharding.spec[-1] == "model")
    assert (params_tp["layer4_0"]["dwconv"]["kernel"]
            .sharding.spec[-1] == "model")
    x_sharded = parallel.shard_batch(mesh, np.asarray(x))
    out = np.asarray(jax.jit(forward)(params_tp, x_sharded))
    np.testing.assert_allclose(out, base, rtol=2e-5, atol=2e-6)


def test_trainer_applies_tp_automatically(mesh):
    from sykepic_tpu.train.config import PreprocessSpec
    from sykepic_tpu.train.input import HostBatch
    from sykepic_tpu.train.trainer import Trainer

    model = build_model("resnet18", num_classes=4, head=(64,))
    variables = init_variables(model, (32, 32, 3), seed=0)
    spec = PreprocessSpec(target_h=32, target_w=32, num_chans=3, border="mode")
    trainer = Trainer(model, variables, preprocess_spec=spec, mesh=mesh)
    assert trainer.params["head"]["fc0"]["kernel"].sharding.spec[-1] == "model"

    rng = np.random.default_rng(0)
    b = 8
    batch = HostBatch(
        canvas=rng.integers(0, 255, (b, 32, 48), np.uint8),
        heights=np.full(b, 28, np.int32),
        widths=np.full(b, 40, np.int32),
        labels=(np.arange(b) % 4).astype(np.int32),
        weights=np.ones(b, np.float32),
        paths=[None] * b,
    )
    loss_sum, correct, n = trainer.train_batch(batch, stage=2,
                                               lrs=(1e-3, 1e-4, 1e-5))
    assert np.isfinite(loss_sum) and int(n) == b
    # parameter placement survives the optimizer step
    assert trainer.params["head"]["fc0"]["kernel"].sharding.spec[-1] == "model"


def test_engine_applies_tp_automatically(mesh, tmp_path):
    import shutil
    from pathlib import Path

    from sykepic_tpu.compute.probability import prepare_model
    from sykepic_tpu.models import checkpoint
    from sykepic_tpu.train import config as tcfg

    src = Path("tests/model/resnet18_ref")
    d = tmp_path / "resnet18_tpu"
    d.mkdir()
    shutil.copy(src / "config.ini", d / "config.ini")
    shutil.copy(src / "class_names.txt", d / "class_names.txt")
    config = tcfg.read_config(d / "config.ini")
    model, _ = tcfg.get_network(config, 50)
    shape = tcfg.get_img_shape(config)
    variables = init_variables(model, (shape[1], shape[2], shape[0]), seed=0)
    checkpoint.save_variables(d / "best_state.msgpack", variables)

    clf = prepare_model(d, batch_size=8, mesh=mesh)
    spec = clf.variables["params"]["head"]["fc0"]["kernel"].sharding.spec
    assert spec[-1] == "model"

    from sykepic_tpu.ingest import ifcb

    rois = ifcb.read_sample("tests/data/raw/valid/D20180712T065600_IFCB114")
    rows = list(clf.classify_rois((0, rid, img) for rid, img in rois.images()))
    assert len(rows) == 2
    for _, _, probs in rows:
        np.testing.assert_allclose(np.sum(probs), 1.0, rtol=1e-4)
