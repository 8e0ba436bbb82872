"""VGG family: forward shapes, adaptive-pool parity, trainer grouping,
torch-exact conversion in both directions (torchvision is not installed —
the torch mirror below reproduces its module/state-dict layout exactly,
reference wrapping per ``sykepic/train/network.py:46-63``)."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.models.vgg import VGG_CFGS, adaptive_avg_pool, feature_index_map
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, label_params


@pytest.mark.parametrize("name", ["vgg16", "vgg16_bn"])
def test_forward_shapes(name):
    model = build_model(name, num_classes=5, head=(32,))
    variables = init_variables(model, (64, 64, 3))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 5)
    feats = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False,
                        features_only=True)
    assert feats.shape == (2, 512 * 7 * 7)


def test_too_small_input_raises():
    """Below 32px the fifth max pool empties the map; raise loudly."""
    model = build_model("vgg16", num_classes=3, head=(16,))
    with pytest.raises(ValueError, match="32"):
        init_variables(model, (31, 31, 3))


def test_adaptive_pool_matches_torch():
    """Both directions of torch AdaptiveAvgPool2d: downsample (in > out)
    and the overlapping upsample a 180x180 input hits (5x5 -> 7x7)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for size in (5, 7, 11, 23):
        x = rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), 7, 7))
        theirs = F.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (7, 7)
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6,
                                   err_msg=f"size {size}")


def test_label_groups():
    model = build_model("vgg16_bn", num_classes=4, head=(16,))
    variables = init_variables(model, (64, 64, 3))
    labels = flatten_dict(label_params(variables["params"]))
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("layer5_bn2", "scale")] == G_HEAD  # BN stays trainable
    assert labels[("layer5_conv2", "kernel")] == G_TOP
    assert labels[("layer1_conv0", "kernel")] == G_REST


def _torch_vgg(name, seed=0):
    """torch mirror of ``torchvision.models.<name>`` with byte-identical
    ``features.*`` state-dict keys (Conv, [BatchNorm], ReLU, MaxPool
    module order, torchvision ``vgg.make_layers``)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    batch_norm = name.endswith("_bn")
    layers = []
    in_ch = 3
    for v in VGG_CFGS[name.split("_")[0]]:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
            continue
        # torchvision make_layers leaves Conv2d's default bias=True even
        # with batch_norm — real vgg*_bn checkpoints carry conv biases
        layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
        if batch_norm:
            layers.append(tnn.BatchNorm2d(v))
        layers.append(tnn.ReLU(inplace=True))
        in_ch = v

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))

        def forward(self, x):
            return self.avgpool(self.features(x)).flatten(1)

    return Net()


@pytest.mark.parametrize("name", ["vgg16", "vgg16_bn", "vgg11_bn", "vgg13"])
def test_torch_roundtrip_forward_agreement(name):
    """Reference TorchVisionNet-style VGG checkpoint (base.0 = features +
    head.K Linears) -> flax: identical variable structure to our init and
    forward agreement to f32 tolerance (incl. the channel-major flatten
    into the first head Linear)."""
    import torch
    import torch.nn as tnn

    from sykepic_tpu.models import convert_torch

    net = _torch_vgg(name).eval()
    if name.endswith("_bn"):
        with torch.no_grad():  # non-trivial BN running stats
            net.train()
            net(torch.randn(4, 3, 64, 64))
            net.eval()
    torch.manual_seed(1)
    head_fc0 = tnn.Linear(512 * 7 * 7, 24)
    head_fc1 = tnn.Linear(24, 7)
    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith("features."):
            sd["base.0." + k[len("features."):]] = v
    sd["head.0.weight"], sd["head.0.bias"] = (
        head_fc0.weight.data, head_fc0.bias.data)
    sd["head.1.weight"], sd["head.1.bias"] = (
        head_fc1.weight.data, head_fc1.bias.data)

    variables = convert_torch.torch_to_flax(None, sd)  # sniffed as VGG
    model = build_model(name, num_classes=7, head=(24,))
    init = init_variables(model, (64, 64, 3))
    assert set(flatten_dict(variables["params"])) == set(
        flatten_dict(init["params"])
    )
    assert set(flatten_dict(variables.get("batch_stats", {}))) == set(
        flatten_dict(init.get("batch_stats", {}))
    )

    x = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32
    )
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        t = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        theirs = head_fc1(head_fc0(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("name", ["vgg16", "vgg16_bn", "vgg19",
                                  "vgg11", "vgg13_bn"])
def test_reverse_export_roundtrip(name):
    from sykepic_tpu.models import convert_torch

    model = build_model(name, num_classes=3, head=(16,))
    variables = init_variables(model, (48, 48, 3), seed=2)
    sd = convert_torch.flax_to_torch(variables, network_name=name)
    assert "base.0.0.weight" in sd
    back = convert_torch.torch_to_flax(name, sd)
    want = flatten_dict(variables["params"])
    got = flatten_dict(back["params"])
    assert set(want) == set(got)
    for key, leaf in want.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got[key], err_msg=str(key))
    # sniffed export (no network_name) must pick the VGG exporter too
    sd2 = convert_torch.flax_to_torch(variables)
    assert set(sd2) == set(sd)


def test_feature_index_map_matches_torchvision():
    """Conv module indices inside ``features`` — pinned against the known
    torchvision layouts."""
    assert [i for i, _, _ in feature_index_map("vgg16")] == [
        0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    assert [i for i, _, _ in feature_index_map("vgg16_bn")] == [
        0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40]
    assert [i for i, _, _ in feature_index_map("vgg19")] == [
        0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    assert [i for i, _, _ in feature_index_map("vgg11")] == [
        0, 3, 6, 8, 11, 13, 16, 18]
    assert [i for i, _, _ in feature_index_map("vgg11_bn")] == [
        0, 4, 8, 11, 15, 18, 22, 25]
    assert [i for i, _, _ in feature_index_map("vgg13")] == [
        0, 2, 5, 7, 10, 12, 15, 17, 20, 22]
