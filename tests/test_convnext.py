"""ConvNeXt family: forward parity with a hand-built torch mirror
(torchvision is not installed — the mirror reproduces ``torchvision.models
.convnext_tiny``'s module/state-dict layout exactly, reference wrapping
per ``sykepic/train/network.py:46-63``), conversion both ways, trainer
grouping, stochastic depth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.convnext import CONVNEXT_CFGS, torch_feature_layout
from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, label_params


def _torch_convnext(name, seed=0):
    """torch mirror of ``torchvision.models.<name>`` with byte-identical
    ``features.*`` state-dict keys (stem / CNBlock stages / LayerNorm+conv
    downsamples; ``torchvision.models.convnext``)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    dims, blocks, _ = CONVNEXT_CFGS[name]

    class LayerNorm2d(tnn.LayerNorm):
        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, self.normalized_shape, self.weight,
                             self.bias, self.eps)
            return x.permute(0, 3, 1, 2)

    class Permute(tnn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = dims

        def forward(self, x):
            return x.permute(self.dims)

    class CNBlock(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
                Permute([0, 2, 3, 1]),
                tnn.LayerNorm(dim, eps=1e-6),
                tnn.Linear(dim, 4 * dim),
                tnn.GELU(),
                tnn.Linear(4 * dim, dim),
                Permute([0, 3, 1, 2]),
            )
            # init 1e-6 would make blocks near-identity and the parity
            # test vacuous: randomize so every block contributes
            self.layer_scale = tnn.Parameter(torch.randn(dim, 1, 1) * 0.5)

        def forward(self, x):
            return x + self.layer_scale * self.block(x)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            feats = [tnn.Sequential(tnn.Conv2d(3, dims[0], 4, 4),
                                    LayerNorm2d(dims[0], eps=1e-6))]
            for i, n in enumerate(blocks):
                if i > 0:
                    feats.append(tnn.Sequential(
                        LayerNorm2d(dims[i - 1], eps=1e-6),
                        tnn.Conv2d(dims[i - 1], dims[i], 2, 2),
                    ))
                feats.append(tnn.Sequential(
                    *[CNBlock(dims[i]) for _ in range(n)]))
            self.features = tnn.Sequential(*feats)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)

        def forward(self, x):
            # reference base = children[:-1] = [features, avgpool]: NO
            # classifier[0] LayerNorm before the head
            return self.avgpool(self.features(x)).flatten(1)

    return Net()


def test_forward_shapes():
    model = build_model("convnext_tiny", num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 5)
    feats = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False,
                        features_only=True)
    assert feats.shape == (2, 768)


def test_too_small_input_raises():
    """Below 32px a downsample conv empties the map; raise loudly."""
    model = build_model("convnext_tiny", num_classes=3, head=(16,))
    with pytest.raises(ValueError, match="32"):
        init_variables(model, (16, 16, 3))


def test_torch_roundtrip_forward_agreement():
    """Reference TorchVisionNet-style ConvNeXt checkpoint (base.0 =
    features + head.K Linears) -> flax: identical variable structure and
    forward agreement to f32 tolerance (incl. the erf-form GELU and the
    dropped classifier LayerNorm)."""
    import torch
    import torch.nn as tnn

    from sykepic_tpu.models import convert_torch

    net = _torch_convnext("convnext_tiny").eval()
    torch.manual_seed(1)
    head_fc0 = tnn.Linear(768, 24)
    head_fc1 = tnn.Linear(24, 7)
    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith("features."):
            sd["base.0." + k[len("features."):]] = v
    sd["head.0.weight"], sd["head.0.bias"] = (
        head_fc0.weight.data, head_fc0.bias.data)
    sd["head.1.weight"], sd["head.1.bias"] = (
        head_fc1.weight.data, head_fc1.bias.data)

    variables = convert_torch.torch_to_flax(None, sd)  # sniffed: ConvNeXt
    model = build_model("convnext_tiny", num_classes=7, head=(24,))
    init = init_variables(model, (64, 64, 3))
    assert set(flatten_dict(variables["params"])) == set(
        flatten_dict(init["params"]))

    x = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        t = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        theirs = head_fc1(head_fc0(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_reverse_export_roundtrip():
    from sykepic_tpu.models import convert_torch

    model = build_model("convnext_tiny", num_classes=3, head=(16,))
    variables = init_variables(model, (64, 64, 3), seed=2)
    sd = convert_torch.flax_to_torch(variables, network_name="convnext_tiny")
    assert "base.0.0.0.weight" in sd  # stem conv
    assert "base.0.1.0.layer_scale" in sd
    assert sd["base.0.1.0.layer_scale"].shape == (96, 1, 1)
    back = convert_torch.torch_to_flax("convnext_tiny", sd)
    want = flatten_dict(variables["params"])
    got = flatten_dict(back["params"])
    assert set(want) == set(got)
    for key, leaf in want.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got[key], err_msg=str(key))
    # sniffed export (no network_name): stem_ln marks ConvNeXt, not MBConv
    sd2 = convert_torch.flax_to_torch(variables)
    assert set(sd2) == set(sd)


def test_base_reverse_export_roundtrip():
    """convnext_base exercises the width-disambiguated variant inference
    (small/base/large all have 27 stage-3 blocks; base is told apart by
    its 128-wide stem)."""
    from sykepic_tpu.models import convert_torch

    model = build_model("convnext_base", num_classes=3, head=(16,))
    variables = init_variables(model, (64, 64, 3), seed=3)
    sd = convert_torch.flax_to_torch(variables)  # sniffed: base by width
    assert sd["base.0.1.0.layer_scale"].shape == (128, 1, 1)
    back = convert_torch.torch_to_flax(None, sd)
    want = flatten_dict(variables["params"])
    got = flatten_dict(back["params"])
    assert set(want) == set(got)
    for key, leaf in want.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got[key], err_msg=str(key))


def test_raw_torchvision_dict_maps_classifier_linear():
    """A raw torchvision dict (features.* + classifier.*) must map the
    classifier's Linear into the head and skip the dropped LayerNorm
    (classifier.0, 1-D weight)."""
    import torch
    import torch.nn as tnn

    from sykepic_tpu.models import convert_torch

    net = _torch_convnext("convnext_tiny")
    torch.manual_seed(2)
    ln = tnn.LayerNorm(768, eps=1e-6)
    fc = tnn.Linear(768, 11)
    sd = dict(net.state_dict())
    sd["classifier.0.weight"], sd["classifier.0.bias"] = (
        ln.weight.data, ln.bias.data)
    sd["classifier.2.weight"], sd["classifier.2.bias"] = (
        fc.weight.data, fc.bias.data)
    variables = convert_torch.torch_to_flax("convnext_tiny", sd)
    head = variables["params"]["head"]
    assert list(head) == ["fc0"]
    np.testing.assert_array_equal(head["fc0"]["kernel"],
                                  fc.weight.data.numpy().T)


def test_reverse_export_rejects_unknown_depth():
    """A stem_ln tree with a non-tiny/small stage-3 depth must raise the
    named UnsupportedArchitectureError, not an opaque KeyError."""
    from sykepic_tpu.models import convert_torch

    model = build_model("convnext_tiny", num_classes=3, head=(8,))
    variables = init_variables(model, (32, 32, 3), seed=4)
    params = dict(variables["params"])
    del params["layer3_8"]  # 9 -> 8 stage-3 blocks
    with pytest.raises(convert_torch.UnsupportedArchitectureError,
                       match="stage-3"):
        convert_torch.flax_to_torch({"params": params})


def test_label_groups():
    model = build_model("convnext_tiny", num_classes=4, head=(16,))
    variables = init_variables(model, (64, 64, 3))
    labels = flatten_dict(label_params(variables["params"]))
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("layer4_2", "mlp1", "kernel")] == G_TOP
    assert labels[("layer4_down_conv", "kernel")] == G_TOP
    assert labels[("layer1_0", "dwconv", "kernel")] == G_REST
    assert labels[("stem_conv", "kernel")] == G_REST


def test_stochastic_depth_train_mode():
    """Row-mode stochastic depth: train-mode outputs vary with the
    dropout rng and eval-mode outputs are deterministic."""
    model = build_model("convnext_tiny", num_classes=3, head=(16,))
    variables = init_variables(model, (32, 32, 3), seed=3)
    x = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (4, 32, 32, 3)), jnp.float32)
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # fresh params carry layer_scale=1e-6, so dropped residuals move the
    # output by ~1e-6 relative — assert bit-level divergence, not allclose
    t1 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(0)})
    t2 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_feature_layout_matches_torchvision():
    """torch ``features`` Sequential indices: [stem, stage, down, stage,
    down, stage, down, stage] = 0..7 with stage-3 at features.5."""
    rows = torch_feature_layout("convnext_tiny")
    by_kind = {}
    for fi, kind, stage, j in rows:
        by_kind.setdefault(kind, []).append((fi, stage, j))
    assert by_kind["stem"] == [(0, 0, 0)]
    assert by_kind["down"] == [(2, 2, 0), (4, 3, 0), (6, 4, 0)]
    assert [fi for fi, s, j in by_kind["stage"] if j == 0] == [1, 3, 5, 7]
    assert sum(1 for fi, s, j in by_kind["stage"] if fi == 5) == 9
