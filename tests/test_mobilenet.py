"""MobileNetV3 family: forward shapes, trainer grouping, torch-exact
conversion in both directions (torchvision itself is not installed — the
torch mirror below reproduces its module/state-dict layout exactly)."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.mobilenet import (
    V3_LARGE_CONFIG,
    V3_SMALL_CONFIG,
    _make_divisible,
)
from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, label_params


@pytest.mark.parametrize("name,last_ch", [
    ("mobilenet_v3_large", 960), ("mobilenet_v3_small", 576),
])
def test_forward_shapes(name, last_ch):
    model = build_model(name, num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 5)
    feats = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False,
                        features_only=True)
    assert feats.shape == (2, last_ch)


def test_label_groups():
    model = build_model("mobilenet_v3_small", num_classes=4, head=(16,))
    variables = init_variables(model, (64, 64, 3))
    labels = flatten_dict(label_params(variables["params"]))
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("layer11_0", "project_bn", "scale")] == G_HEAD  # BN
    assert labels[("layer11_0", "project_conv", "kernel")] == G_TOP
    assert labels[("head_conv", "kernel")] == G_TOP
    assert labels[("layer1_0", "dw_conv", "kernel")] == G_REST
    assert labels[("stem_conv", "kernel")] == G_REST


def _torch_mobilenet_v3(config, num_classes=1000, stem_ch=16):
    """torch mirror of torchvision ``mobilenet_v3_*`` with byte-identical
    state-dict keys (``features.I.block.J...``, SE ``fc1``/``fc2``,
    ``classifier.0/3``)."""
    import torch.nn as tnn

    def cba(in_ch, out_ch, k, s, groups=1, act="hs"):
        acts = {"hs": tnn.Hardswish, "re": tnn.ReLU, None: tnn.Identity}
        return tnn.Sequential(
            tnn.Conv2d(in_ch, out_ch, k, s, (k - 1) // 2, groups=groups,
                       bias=False),
            tnn.BatchNorm2d(out_ch, eps=1e-3, momentum=0.01),
            acts[act](),
        )

    class SE(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            sq = _make_divisible(ch // 4)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Conv2d(ch, sq, 1)
            self.activation = tnn.ReLU()
            self.fc2 = tnn.Conv2d(sq, ch, 1)
            self.scale_activation = tnn.Hardsigmoid()

        def forward(self, x):
            s = self.avgpool(x)
            s = self.fc2(self.activation(self.fc1(s)))
            return x * self.scale_activation(s)

    class InvRes(tnn.Module):
        def __init__(self, in_ch, k, exp, out, se, hs, s):
            super().__init__()
            act = "hs" if hs else "re"
            units = []
            if exp != in_ch:
                units.append(cba(in_ch, exp, 1, 1, act=act))
            units.append(cba(exp, exp, k, s, groups=exp, act=act))
            if se:
                units.append(SE(exp))
            units.append(cba(exp, out, 1, 1, act=None))
            self.block = tnn.Sequential(*units)
            self.res = s == 1 and in_ch == out

        def forward(self, x):
            y = self.block(x)
            return x + y if self.res else y

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            feats = [cba(3, stem_ch, 3, 2, act="hs")]
            in_ch = stem_ch
            for k, exp, out, se, hs, s in config:
                feats.append(InvRes(in_ch, k, exp, out, se, hs, s))
                in_ch = out
            last = 6 * in_ch
            feats.append(cba(in_ch, last, 1, 1, act="hs"))
            self.features = tnn.Sequential(*feats)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.classifier = tnn.Sequential(
                tnn.Linear(last, 1280), tnn.Hardswish(), tnn.Dropout(0.2),
                tnn.Linear(1280, num_classes),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x).flatten(1)
            return self.classifier(x)

    return Net()


@pytest.mark.parametrize("name,config", [
    ("mobilenet_v3_large", V3_LARGE_CONFIG),
    ("mobilenet_v3_small", V3_SMALL_CONFIG),
])
def test_torch_roundtrip_forward_agreement(name, config):
    """TorchVisionNet-style V3 checkpoint (base.0 = features + head.K
    Linears) -> flax: identical structure to our init, forward agreement
    to f32 tolerance."""
    import torch
    import torch.nn as tnn

    from sykepic_tpu.models import convert_torch

    torch.manual_seed(0)
    net = _torch_mobilenet_v3(config, num_classes=7).eval()
    with torch.no_grad():  # non-trivial BN stats
        net.train()
        net(torch.randn(4, 3, 64, 64))
        net.eval()
    last_ch = 6 * config[-1][2]
    head_fc0 = tnn.Linear(last_ch, 24)
    head_fc1 = tnn.Linear(24, 7)
    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith("features."):
            sd["base.0." + k[len("features."):]] = v
    sd["head.0.weight"], sd["head.0.bias"] = (
        head_fc0.weight.data, head_fc0.bias.data)
    sd["head.1.weight"], sd["head.1.bias"] = (
        head_fc1.weight.data, head_fc1.bias.data)

    variables = convert_torch.torch_to_flax(None, sd)  # sniffed as V3
    model = build_model(name, num_classes=7, head=(24,))
    init = init_variables(model, (64, 64, 3))
    assert set(flatten_dict(variables["params"])) == set(
        flatten_dict(init["params"])
    )
    assert set(flatten_dict(variables["batch_stats"])) == set(
        flatten_dict(init["batch_stats"])
    )

    x = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32
    )
    ours = np.asarray(
        model.apply(variables, jnp.asarray(x), train=False)
    )
    with torch.no_grad():
        t = net.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t = t.mean(dim=(2, 3))
        # plain Linear stack, no inter-layer activation — exactly the
        # reference's TorchVisionNet head (network.py:58)
        theirs = head_fc1(head_fc0(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_reverse_export_roundtrip():
    from sykepic_tpu.models import convert_torch

    model = build_model("mobilenet_v3_small", num_classes=3, head=(16,))
    variables = init_variables(model, (64, 64, 3), seed=2)
    sd = convert_torch.flax_to_torch(variables,
                                     network_name="mobilenet_v3_small")
    assert "base.0.0.0.weight" in sd
    back = convert_torch.torch_to_flax("mobilenet_v3_small", sd)
    want = flatten_dict(variables["params"])
    got = flatten_dict(back["params"])
    assert set(want) == set(got)
    for key, leaf in want.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got[key], err_msg=str(key))
