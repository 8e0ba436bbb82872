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
    stage_gw = (tuple(group_width)
                if isinstance(group_width, (tuple, list))
                else (group_width,) * len(depths))

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
        def __init__(self, cin, cout, stride, gw):
            super().__init__()
            self.proj = (cna(cin, cout, 1, stride, act=False)
                         if cin != cout or stride != 1 else None)
            f = OrderedDict()
            f["a"] = cna(cin, cout, 1)
            f["b"] = cna(cout, cout, 3, stride, groups=cout // gw)
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
                        cin, w, 2 if b == 0 else 1, stage_gw[si - 1])
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


@pytest.mark.parametrize("name", [
    "regnet_y_400mf",
    "regnet_x_400mf",
    # larger-tier representatives: y_1_6gf (SE + deep stage 3) and x_8gf
    # (the one variant whose first-stage group width is clamped 120 -> 80)
    "regnet_y_1_6gf",
    "regnet_x_8gf",
])
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


def test_cfg_tables_derive_from_published_inits():
    """Every REGNET_CFGS stage plan must equal the quantized-linear
    parameterization of its published (depth, w_0, w_a, w_m, group_width)
    init params (torchvision ``BlockParams.from_init_params``: widths
    w_0 + w_a*j snapped to powers of w_m, quantized to multiples of 8,
    split into stages where the width changes, then rounded to the group
    width with round-half-up ``_make_divisible``). Guards the transcribed
    tables — a wrong width would make pretrained conversion land on
    mismatched shapes."""
    inits = {
        "regnet_x_400mf": (22, 24, 24.48, 2.54, 16),
        "regnet_x_800mf": (16, 56, 35.73, 2.28, 16),
        "regnet_x_1_6gf": (18, 80, 34.01, 2.25, 24),
        "regnet_x_3_2gf": (25, 88, 26.31, 2.25, 48),
        "regnet_x_8gf": (23, 80, 49.56, 2.88, 120),
        "regnet_x_16gf": (22, 216, 55.59, 2.1, 128),
        "regnet_x_32gf": (23, 320, 69.86, 2.0, 168),
        "regnet_y_400mf": (16, 48, 27.89, 2.09, 8),
        "regnet_y_800mf": (14, 56, 38.84, 2.4, 16),
        "regnet_y_1_6gf": (27, 48, 20.71, 2.65, 24),
        "regnet_y_3_2gf": (21, 80, 42.63, 2.66, 24),
        "regnet_y_8gf": (17, 192, 76.82, 2.19, 56),
        "regnet_y_16gf": (18, 200, 106.23, 2.48, 112),
        "regnet_y_32gf": (20, 232, 115.89, 2.53, 232),
    }

    def make_divisible(v, d):
        new = max(d, int(v + d / 2) // d * d)
        if new < 0.9 * v:
            new += d
        return new

    def derive(depth, w_0, w_a, w_m, g):
        ws_cont = np.arange(depth) * w_a + w_0
        ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
        bw = (np.round(w_0 * np.power(w_m, ks) / 8) * 8).astype(int)
        bw = bw.tolist()
        splits = ([True]
                  + [bw[i] != bw[i - 1] for i in range(1, depth)]
                  + [True])
        stage_w = [w for w, t in zip(bw, splits[:-1]) if t]
        idx = [i for i, t in enumerate(splits) if t]
        stage_d = np.diff(idx).tolist()
        gmin = [min(g, w) for w in stage_w]
        stage_w = [make_divisible(w, gg) for w, gg in zip(stage_w, gmin)]
        return tuple(stage_d), tuple(stage_w), tuple(gmin)

    assert set(inits) == set(REGNET_CFGS)
    for name, (d, w0, wa, wm, g) in inits.items():
        depths, widths, gmin = derive(d, w0, wa, wm, g)
        cfg_d, cfg_w, cfg_g, _ = REGNET_CFGS[name]
        cfg_g = (tuple(cfg_g) if isinstance(cfg_g, (tuple, list))
                 else (cfg_g,) * len(cfg_d))
        assert (depths, widths, gmin) == (cfg_d, cfg_w, cfg_g), name


def test_stage_geometry():
    """Stem + 4 stage strides = /32 total; feature width = last stage."""
    model = build_model("regnet_y_400mf", num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    feats = model.apply(variables, jnp.zeros((1, 64, 64, 3)),
                        train=False, features_only=True)
    assert feats.shape == (1, REGNET_CFGS["regnet_y_400mf"][1][-1])
