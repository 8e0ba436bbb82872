"""EfficientNet-B0 family: forward pass, trainer grouping, one train step."""

import numpy as np
import jax.numpy as jnp
import pytest

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, Trainer, label_params
from sykepic_tpu.train.config import PreprocessSpec
from sykepic_tpu.train.input import HostBatch
from flax.traverse_util import flatten_dict


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model("efficientnet_b0", num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 5)
    feats = model.apply(variables, x, train=False, features_only=True)
    assert feats.shape == (2, 1280)


def test_label_groups(model_and_vars):
    _, variables = model_and_vars
    labels = flatten_dict(label_params(variables["params"]))
    flat = flatten_dict(variables["params"])
    # head and every BN scale/bias -> group 0
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("stem_bn", "scale")] == G_HEAD
    assert labels[("layer3_0", "dw_bn", "scale")] == G_HEAD
    # last layer-group (7) and head_conv -> group 1
    assert labels[("layer7_0", "project_conv", "kernel")] == G_TOP
    assert labels[("head_conv", "kernel")] == G_TOP
    # early convs -> group 2
    assert labels[("stem_conv", "kernel")] == G_REST
    assert labels[("layer1_0", "dw_conv", "kernel")] == G_REST
    assert set(labels) == set(flat)


def test_train_step(model_and_vars):
    model, variables = model_and_vars
    spec = PreprocessSpec(64, 64, 3, border="black")
    trainer = Trainer(model, variables, preprocess_spec=spec)
    rng = np.random.default_rng(0)
    b = 8
    batch = HostBatch(
        canvas=rng.integers(0, 255, (b, 32, 64), np.uint8),
        heights=np.full(b, 30, np.int32),
        widths=np.full(b, 40, np.int32),
        labels=(np.arange(b) % 5).astype(np.int32),
        weights=np.ones(b, np.float32),
        paths=[None] * b,
    )
    loss_sum, correct, n = trainer.train_batch(batch, stage=0, lrs=(1e-3, 0, 0))
    assert np.isfinite(loss_sum) and n == b


def test_resnet_labels_unchanged():
    model = build_model("resnet18", num_classes=3, head=(8,))
    variables = init_variables(model, (32, 32, 3))
    labels = flatten_dict(label_params(variables["params"]))
    assert labels[("layer4_0", "conv1", "kernel")] == G_TOP
    assert labels[("layer4_0", "bn1", "scale")] == G_HEAD
    assert labels[("conv1", "kernel")] == G_REST
    assert labels[("layer1_0", "conv2", "kernel")] == G_REST
