"""RegNet family: forward parity with a hand-built torch mirror
(torchvision is not installed — the mirror reproduces
``torchvision.models.regnet_y_400mf``'s module/state-dict layout exactly:
stem / trunk_output.blockS.blockS-B stages with proj + f.{a,b,se,c} units,
reference wrapping per ``sykepic/train/network.py:46-63``), conversion
both ways, trainer grouping."""

from collections import OrderedDict

import numpy as np
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.regnet import REGNET_CFGS, STEM_WIDTH
from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.models.convert_torch import (
    flax_to_torch,
    torch_to_flax,
)
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, label_params


def _torch_regnet(name, num_classes=5, head=(32,), seed=0):
    """torch mirror of ``torchvision.models.<name>`` with byte-identical
    ``stem.*`` / ``trunk_output.*`` state-dict keys, wrapped reference-
    style: base.0 = stem, base.1 = trunk_output, base.2 = avgpool, plus
    the MLP ``head.K`` Linear stack."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    depths, widths, group_width, se_ratio = REGNET_CFGS[name]

    class SE(tnn.Module):
        # torchvision.ops.SqueezeExcitation key layout: fc1/fc2 only
        def __init__(self, ch, squeeze):
            super().__init__()
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Conv2d(ch, squeeze, 1)
            self.fc2 = tnn.Conv2d(squeeze, ch, 1)

        def forward(self, x):
            s = torch.relu(self.fc1(self.avgpool(x)))
            return x * torch.sigmoid(self.fc2(s))

    def cna(cin, cout, k, stride=1, groups=1, act=True):
        layers = [
            tnn.Conv2d(cin, cout, k, stride, k // 2, groups=groups,
                       bias=False),
            tnn.BatchNorm2d(cout),
        ]
        if act:
            layers.append(tnn.ReLU())
        return tnn.Sequential(*layers)

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.proj = (cna(cin, cout, 1, stride, act=False)
                         if cin != cout or stride != 1 else None)
            f = OrderedDict()
            f["a"] = cna(cin, cout, 1)
            f["b"] = cna(cout, cout, 3, stride,
                         groups=cout // group_width)
            if se_ratio:
                f["se"] = SE(cout, int(round(se_ratio * cin)))
            f["c"] = cna(cout, cout, 1, act=False)
            self.f = tnn.Sequential(f)

        def forward(self, x):
            y = self.f(x)
            x = self.proj(x) if self.proj is not None else x
            return torch.relu(x + y)

    class Wrapped(tnn.Module):
        def __init__(self):
            super().__init__()
            stem = cna(3, STEM_WIDTH, 3, 2)
            stages = OrderedDict()
            cin = STEM_WIDTH
            for si, (d, w) in enumerate(zip(depths, widths), 1):
                blocks = OrderedDict()
                for b in range(d):
                    blocks[f"block{si}-{b}"] = Block(
                        cin, w, 2 if b == 0 else 1)
                    cin = w
                stages[f"block{si}"] = tnn.Sequential(blocks)
            self.base = tnn.Sequential(
                stem, tnn.Sequential(stages), tnn.AdaptiveAvgPool2d(1))
            sizes = [widths[-1], *head, num_classes]
            self.head = tnn.Sequential(*[
                tnn.Linear(sizes[i], sizes[i + 1])
                for i in range(len(sizes) - 1)
            ])

        def forward(self, x):
            x = self.base(x)
            return self.head(x.view(x.size(0), -1))

    # randomize BN stats so parity actually exercises the stats mapping
    net = Wrapped().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.parametrize("name", ["regnet_y_400mf", "regnet_x_400mf"])
def test_forward_parity_with_torch_mirror(name):
    import torch

    tnet = _torch_regnet(name)
    variables = torch_to_flax(None, tnet.state_dict())  # sniffed
    model = build_model(name, num_classes=5, head=(32,))
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conversion_round_trip():
    model = build_model("regnet_y_400mf", num_classes=7, head=(16,))
    variables = init_variables(model, (64, 64, 3))
    sd = flax_to_torch(variables)  # sniffed from the tree
    assert "base.0.0.weight" in sd                      # stem under base.0
    assert any(k.startswith("base.1.block1.block1-0.f.a.0") for k in sd)
    assert any(".f.se.fc1.weight" in k for k in sd)     # Y variant has SE
    back = torch_to_flax("regnet_y_400mf", sd)
    flat_a = flatten_dict(variables["params"])
    flat_b = flatten_dict(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), rtol=1e-6)
    for k, v in flatten_dict(variables["batch_stats"]).items():
        np.testing.assert_allclose(
            np.asarray(v),
            np.asarray(flatten_dict(back["batch_stats"])[k]), rtol=1e-6)


def test_x_variant_has_no_se():
    model = build_model("regnet_x_400mf", num_classes=3, head=())
    variables = init_variables(model, (64, 64, 3))
    assert not any("se" in tree for m, tree in variables["params"].items()
                   if m.startswith("layer"))
    sd = flax_to_torch(variables, network_name="regnet_x_400mf")
    assert not any(".se." in k for k in sd)


def test_label_groups():
    model = build_model("regnet_y_400mf", num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    labels = flatten_dict(label_params(variables["params"]))
    flat = flatten_dict(variables["params"])
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("stem_bn", "scale")] == G_HEAD          # BN anywhere
    assert labels[("layer2_0", "a_bn", "scale")] == G_HEAD
    # SE convs inside layer4 ride the stage group, earlier ones the rest
    assert labels[("layer4_0", "a_conv", "kernel")] == G_TOP
    assert labels[("layer4_5", "se", "fc1", "kernel")] == G_TOP
    assert labels[("layer1_0", "b_conv", "kernel")] == G_REST
    assert labels[("stem_conv", "kernel")] == G_REST
    assert set(labels) == set(flat)


def test_stage_geometry():
    """Stem + 4 stage strides = /32 total; feature width = last stage."""
    model = build_model("regnet_y_400mf", num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    feats = model.apply(variables, jnp.zeros((1, 64, 64, 3)),
                        train=False, features_only=True)
    assert feats.shape == (1, REGNET_CFGS["regnet_y_400mf"][1][-1])
