"""ResNeXt / Wide-ResNet variants: grouped-bottleneck forward parity with
a hand-built torch mirror (torchvision is not installed — the mirror below
reproduces torchvision ``resnet.Bottleneck(groups, base_width)`` and its
state-dict key layout exactly), converter reuse, trainer grouping."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, label_params


def _torch_resnext(stage_sizes, groups, base_width, num_classes, head,
                   seed=0):
    """torch mirror of torchvision ResNet(Bottleneck, groups/base_width)
    wrapped reference-style (``base.*`` indices + ``head.K`` Linears,
    ``sykepic/train/network.py:46-63``)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, cin, planes, stride=1):
            super().__init__()
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, 1,
                                    groups=groups, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or cin != planes * 4:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            return self.relu(self.bn3(self.conv3(y)) + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for i, n in enumerate(stage_sizes):
                planes = 64 * 2**i
                blocks = []
                for j in range(n):
                    blocks.append(Bottleneck(
                        cin, planes, stride=2 if i > 0 and j == 0 else 1))
                    cin = planes * 4
                setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            widths = [cin, *head, num_classes]
            self.head = tnn.Sequential(*[
                tnn.Linear(widths[i], widths[i + 1])
                for i in range(len(widths) - 1)
            ])

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(len(stage_sizes)):
                x = getattr(self, f"layer{i + 1}")(x)
            return self.head(self.avgpool(x).flatten(1))

    return Net()


CASES = {
    # name -> (stage_sizes, groups, base_width)
    "resnext50_32x4d": ((3, 4, 6, 3), 32, 4),
    "resnext101_64x4d": ((3, 4, 23, 3), 64, 4),
    "wide_resnet50_2": ((3, 4, 6, 3), 1, 128),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_forward_parity_with_torch_mirror(name):
    import torch

    stage_sizes, groups, base_width = CASES[name]
    net = _torch_resnext(stage_sizes, groups, base_width,
                         num_classes=6, head=(24,)).eval()
    with torch.no_grad():  # non-trivial BN running stats
        net.train()
        net(torch.randn(4, 3, 64, 64))
        net.eval()
    variables = None
    from sykepic_tpu.models import convert_torch
    variables = convert_torch.torch_to_flax(name, net.state_dict())

    model = build_model(name, num_classes=6, head=(24,))
    init = init_variables(model, (64, 64, 3))
    assert set(flatten_dict(variables["params"])) == set(
        flatten_dict(init["params"]))
    assert set(flatten_dict(variables["batch_stats"])) == set(
        flatten_dict(init["batch_stats"]))

    x = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_grouped_width_matches_torchvision_formula():
    """Inner 3x3 widths: resnext50_32x4d stage1 = 4*32 = 128 (not 64),
    wide_resnet50_2 stage1 = 128; kernel in-channel dim reflects the
    grouping (I/g)."""
    v = init_variables(build_model("resnext50_32x4d", num_classes=3,
                                   head=(8,)), (32, 32, 3))
    k = v["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 4, 128)  # 128 in-channels / 32 groups
    v = init_variables(build_model("wide_resnet50_2", num_classes=3,
                                   head=(8,)), (32, 32, 3))
    k = v["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 128, 128)
    # resnext101_64x4d stage1: width = int(64 * 4/64) * 64 = 256
    v = init_variables(build_model("resnext101_64x4d", num_classes=3,
                                   head=(8,)), (32, 32, 3))
    k = v["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 4, 256)  # 256 in-channels / 64 groups


def test_resnet152_builds_with_expected_depth():
    model = build_model("resnet152", num_classes=3, head=(8,))
    variables = init_variables(model, (32, 32, 3))
    mods = [m for m in variables["params"] if m.startswith("layer")]
    # stage sizes (3, 8, 36, 3): deepest block of each stage exists
    assert {"layer1_2", "layer2_7", "layer3_35", "layer4_2"} <= set(mods)
    assert sum(m.startswith("layer") for m in mods) == 3 + 8 + 36 + 3


@pytest.mark.parametrize("name", sorted(CASES))
def test_reverse_export_roundtrip(name):
    from sykepic_tpu.models import convert_torch

    model = build_model(name, num_classes=3, head=(16,))
    variables = init_variables(model, (48, 48, 3), seed=2)
    sd = convert_torch.flax_to_torch(variables, network_name=name)
    back = convert_torch.torch_to_flax(name, sd)
    want = flatten_dict(variables["params"])
    got = flatten_dict(back["params"])
    assert set(want) == set(got)
    for key, leaf in want.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got[key], err_msg=str(key))


def test_label_groups():
    model = build_model("resnext50_32x4d", num_classes=4, head=(16,))
    variables = init_variables(model, (32, 32, 3))
    labels = flatten_dict(label_params(variables["params"]))
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("layer4_2", "bn3", "scale")] == G_HEAD  # BN trainable
    assert labels[("layer4_0", "conv2", "kernel")] == G_TOP
    assert labels[("layer1_0", "conv2", "kernel")] == G_REST
