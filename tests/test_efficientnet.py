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


def _torch_efficientnet_b0(num_classes=1000):
    """torch mirror of torchvision ``efficientnet_b0`` whose ``state_dict``
    keys match torchvision exactly (``features.G.R.block.I...``,
    ``classifier.1``) — torchvision itself is not installed here."""
    import torch.nn as tnn

    from sykepic_tpu.models.efficientnet import B0_CONFIG

    def conv_bn_act(cin, cout, k, s, groups=1, act=True):
        mods = [
            tnn.Conv2d(cin, cout, k, s, padding=k // 2, groups=groups,
                       bias=False),
            tnn.BatchNorm2d(cout),
        ]
        if act:
            mods.append(tnn.SiLU(inplace=True))
        return tnn.Sequential(*mods)

    class SE(tnn.Module):
        def __init__(self, ch, squeeze):
            super().__init__()
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Conv2d(ch, squeeze, 1)
            self.fc2 = tnn.Conv2d(squeeze, ch, 1)
            self.activation = tnn.SiLU()
            self.scale_activation = tnn.Sigmoid()

        def forward(self, x):
            s = self.activation(self.fc1(self.avgpool(x)))
            return x * self.scale_activation(self.fc2(s))

    class MBConv(tnn.Module):
        def __init__(self, cin, cout, expand, k, s):
            super().__init__()
            mid = cin * expand
            layers = []
            if expand != 1:
                layers.append(conv_bn_act(cin, mid, 1, 1))
            layers.append(conv_bn_act(mid, mid, k, s, groups=mid))
            layers.append(SE(mid, max(1, cin // 4)))
            layers.append(conv_bn_act(mid, cout, 1, 1, act=False))
            self.block = tnn.Sequential(*layers)
            self.use_res = s == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    stages = [conv_bn_act(3, 32, 3, 2)]
    cin = 32
    for expand, cout, reps, s, k in B0_CONFIG:
        blocks = []
        for r in range(reps):
            blocks.append(MBConv(cin, cout, expand, k, s if r == 0 else 1))
            cin = cout
        stages.append(tnn.Sequential(*blocks))
    stages.append(conv_bn_act(cin, 1280, 1, 1))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*stages)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.classifier = tnn.Sequential(
                tnn.Dropout(0.2), tnn.Linear(1280, num_classes)
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x).flatten(1)
            return self.classifier(x)

    return Net()


def test_torch_efficientnet_roundtrip():
    """torchvision-keyed EfficientNet-B0 state dict -> Flax: identical
    structure to our init and forward agreement to f32 tolerance."""
    import torch

    from sykepic_tpu.models import convert_torch

    torch.manual_seed(0)
    net = _torch_efficientnet_b0(num_classes=7).eval()
    # non-trivial batch stats so the BN conversion is actually exercised
    with torch.no_grad():
        net.train()
        net(torch.randn(4, 3, 64, 64))
        net.eval()
    variables = convert_torch.torch_to_flax(
        "efficientnet_b0", net.state_dict()
    )
    model = build_model("efficientnet_b0", num_classes=7, head=())
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
        model.apply(
            {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
            jnp.asarray(x),
            train=False,
        )
    )
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_torchvisionnet_style_efficientnet_keys():
    """Reference TorchVisionNet wrapping (base.0 == features, custom
    ``head.K`` Linear stack) converts too — the key namespace an actual
    reference ``best_state.pth`` model dir would carry."""
    import torch

    from sykepic_tpu.models import convert_torch

    torch.manual_seed(1)
    net = _torch_efficientnet_b0(num_classes=3).eval()
    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith("features."):
            sd["base.0." + k[len("features."):]] = v
        # drop the torchvision classifier: TorchVisionNet replaces it
    head_w1 = torch.randn(32, 1280)
    head_b1 = torch.randn(32)
    head_w2 = torch.randn(3, 32)
    head_b2 = torch.randn(3)
    sd["head.0.weight"], sd["head.0.bias"] = head_w1, head_b1
    # index 2: a Dropout at 1 makes Linear indices non-contiguous
    sd["head.2.weight"], sd["head.2.bias"] = head_w2, head_b2

    variables = convert_torch.torch_to_flax(None, sd)  # sniffed family
    head = variables["params"]["head"]
    assert set(head) == {"fc0", "fc1"}
    np.testing.assert_array_equal(
        head["fc0"]["kernel"], head_w1.numpy().transpose(1, 0)
    )
    np.testing.assert_array_equal(head["fc1"]["bias"], head_b2.numpy())

    model = build_model("efficientnet_b0", num_classes=3, head=(32,))
    init = init_variables(model, (64, 64, 3))
    assert set(flatten_dict(variables["params"])) == set(
        flatten_dict(init["params"])
    )


def test_compound_scaling_matches_torchvision_channels():
    """B1-B3 compound scaling must reproduce torchvision's channel/repeat
    plan exactly, or pretrained conversions land on mismatched shapes."""
    from sykepic_tpu.models.efficientnet import (
        _round_filters,
        _scaled_config,
    )

    # torchvision efficientnet_b3: width 1.2, depth 1.4
    cfg = _scaled_config(1.2, 1.4)
    assert [c for _, c, _, _, _ in cfg] == [24, 32, 48, 96, 136, 232, 384]
    assert [r for _, _, r, _, _ in cfg] == [2, 3, 3, 5, 5, 6, 2]
    assert _round_filters(32, 1.2) == 40      # stem
    assert _round_filters(1280, 1.2) == 1536  # head
    # b2: width 1.1, depth 1.2
    cfg2 = _scaled_config(1.1, 1.2)
    assert [c for _, c, _, _, _ in cfg2] == [16, 24, 48, 88, 120, 208, 352]
    assert [r for _, _, r, _, _ in cfg2] == [2, 3, 3, 4, 4, 5, 2]
    # b4: width 1.4, depth 1.8 (published EfficientNet-B4 plan)
    cfg4 = _scaled_config(1.4, 1.8)
    assert [c for _, c, _, _, _ in cfg4] == [24, 32, 56, 112, 160, 272, 448]
    assert [r for _, _, r, _, _ in cfg4] == [2, 4, 4, 6, 6, 8, 2]
    assert _round_filters(32, 1.4) == 48      # stem
    assert _round_filters(1280, 1.4) == 1792  # head
    # b7: width 2.0, depth 3.1
    cfg7 = _scaled_config(2.0, 3.1)
    assert [c for _, c, _, _, _ in cfg7] == [32, 48, 80, 160, 224, 384, 640]
    assert [r for _, _, r, _, _ in cfg7] == [4, 7, 7, 10, 10, 13, 4]
    assert _round_filters(32, 2.0) == 64
    assert _round_filters(1280, 2.0) == 2560


def test_efficientnet_b1_builds_and_runs():
    model = build_model("efficientnet_b1", num_classes=4, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 4)


def _torch_efficientnet_v2(config, stem_ch, num_classes=1000):
    """torch mirror of torchvision ``efficientnet_v2_*`` (FusedMBConv +
    MBConv stages, BatchNorm eps 1e-3) with torchvision-identical
    ``state_dict`` keys — torchvision itself is not installed here."""
    import torch.nn as tnn

    def conv_bn_act(cin, cout, k, s, groups=1, act=True):
        mods = [
            tnn.Conv2d(cin, cout, k, s, padding=k // 2, groups=groups,
                       bias=False),
            tnn.BatchNorm2d(cout, eps=1e-3),
        ]
        if act:
            mods.append(tnn.SiLU(inplace=True))
        return tnn.Sequential(*mods)

    class SE(tnn.Module):
        def __init__(self, ch, squeeze):
            super().__init__()
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Conv2d(ch, squeeze, 1)
            self.fc2 = tnn.Conv2d(squeeze, ch, 1)
            self.activation = tnn.SiLU()
            self.scale_activation = tnn.Sigmoid()

        def forward(self, x):
            s = self.activation(self.fc1(self.avgpool(x)))
            return x * self.scale_activation(self.fc2(s))

    class MBConv(tnn.Module):
        def __init__(self, cin, cout, expand, k, s):
            super().__init__()
            mid = cin * expand
            layers = []
            if expand != 1:
                layers.append(conv_bn_act(cin, mid, 1, 1))
            layers.append(conv_bn_act(mid, mid, k, s, groups=mid))
            layers.append(SE(mid, max(1, cin // 4)))
            layers.append(conv_bn_act(mid, cout, 1, 1, act=False))
            self.block = tnn.Sequential(*layers)
            self.use_res = s == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    class FusedMBConv(tnn.Module):
        def __init__(self, cin, cout, expand, k, s):
            super().__init__()
            mid = cin * expand
            if expand != 1:
                layers = [conv_bn_act(cin, mid, k, s),
                          conv_bn_act(mid, cout, 1, 1, act=False)]
            else:
                layers = [conv_bn_act(cin, cout, k, s)]
            self.block = tnn.Sequential(*layers)
            self.use_res = s == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    stages = [conv_bn_act(3, stem_ch, 3, 2)]
    cin = stem_ch
    for kind, expand, cout, reps, s, k in config:
        block_cls = FusedMBConv if kind == "fused" else MBConv
        blocks = []
        for r in range(reps):
            blocks.append(block_cls(cin, cout, expand, k, s if r == 0 else 1))
            cin = cout
        stages.append(tnn.Sequential(*blocks))
    stages.append(conv_bn_act(cin, 1280, 1, 1))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*stages)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.classifier = tnn.Sequential(
                tnn.Dropout(0.2), tnn.Linear(1280, num_classes)
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x).flatten(1)
            return self.classifier(x)

    return Net()


def test_torch_efficientnet_v2_s_roundtrip():
    """torchvision-keyed EfficientNetV2-S state dict -> Flax: identical
    tree structure to our init and forward agreement to f32 tolerance —
    covers both FusedMBConv shapes (expand 1 single-conv, expand 4
    conv+project) and the SE'd MBConv stages under eps-1e-3 BN."""
    import torch

    from sykepic_tpu.models import convert_torch
    from sykepic_tpu.models.efficientnet import V2_S_CONFIG

    torch.manual_seed(0)
    net = _torch_efficientnet_v2(V2_S_CONFIG, stem_ch=24, num_classes=6)
    with torch.no_grad():
        net.train()
        net(torch.randn(4, 3, 64, 64))
        net.eval()
    variables = convert_torch.torch_to_flax(
        "efficientnet_v2_s", net.state_dict()
    )
    model = build_model("efficientnet_v2_s", num_classes=6, head=())
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
        model.apply(
            {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
            jnp.asarray(x),
            train=False,
        )
    )
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_v2_reverse_export_roundtrip():
    """Our V2 variables -> reference-style .pth dict -> back, bit-exact,
    with the fused blocks landing on ``block.0/.1`` torchvision indices."""
    from sykepic_tpu.models import convert_torch

    model = build_model("efficientnet_v2_s", num_classes=4, head=(16,))
    variables = init_variables(model, (64, 64, 3), seed=5)
    sd = convert_torch.flax_to_torch(
        variables, dropout=(), network_name="efficientnet_v2_s"
    )
    # fused stage 1: single conv (expand 1) -> only block.0
    assert "base.0.1.0.block.0.0.weight" in sd
    assert "base.0.1.0.block.1.0.weight" not in sd
    # fused stage 2: expand 4 -> conv + 1x1 project, no SE
    assert "base.0.2.0.block.0.0.weight" in sd
    assert "base.0.2.0.block.1.0.weight" in sd
    assert not any("fc1" in k and ".2.0." in k for k in sd)
    back = convert_torch.torch_to_flax(None, sd)  # family sniffed
    for coll in ("params", "batch_stats"):
        want = flatten_dict(variables[coll])
        got = flatten_dict(back[coll])
        assert set(want) == set(got)
        for key, leaf in want.items():
            np.testing.assert_array_equal(
                np.asarray(leaf, np.float32), got[key], err_msg=str(key)
            )


def test_reverse_export_roundtrip():
    """Our variables -> reference-loadable .pth state dict -> back: every
    leaf returns bit-identical, and the head Linears land on the
    Dropout-shifted Sequential indices the reference would use."""
    from sykepic_tpu.models import convert_torch

    model = build_model("efficientnet_b0", num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3), seed=3)
    dropout = ((1, 0.3),)  # Dropout inserted before the last Linear
    sd = convert_torch.flax_to_torch(variables, dropout=dropout)
    assert "base.0.0.0.weight" in sd          # stem conv under base.0
    assert {"head.0.weight", "head.2.weight"} <= set(sd)  # 1 -> Dropout
    back = convert_torch.torch_to_flax(None, sd)  # family sniffed
    want_p = flatten_dict(variables["params"])
    got_p = flatten_dict(back["params"])
    assert set(want_p) == set(got_p)
    for key, leaf in want_p.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got_p[key], err_msg=str(key))
    want_s = flatten_dict(variables["batch_stats"])
    got_s = flatten_dict(back["batch_stats"])
    assert set(want_s) == set(got_s)
    for key, leaf in want_s.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got_s[key], err_msg=str(key))
