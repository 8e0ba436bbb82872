"""AlexNet family: forward parity with a hand-built torch mirror
(torchvision is not installed — the mirror reproduces ``torchvision.models
.alexnet``'s module/state-dict layout exactly, reference wrapping per
``sykepic/train/network.py:46-63``), conversion both ways, trainer
grouping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.trainer import G_HEAD, G_REST, G_TOP, label_params


def _torch_alexnet(seed=0):
    """torch mirror of ``torchvision.models.alexnet().features`` +
    6x6 adaptive pool, byte-identical ``features.*`` keys."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=True),
                tnn.MaxPool2d(3, 2),
                tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
                tnn.MaxPool2d(3, 2),
                tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
                tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
                tnn.MaxPool2d(3, 2),
            )
            self.avgpool = tnn.AdaptiveAvgPool2d((6, 6))

        def forward(self, x):
            return self.avgpool(self.features(x)).flatten(1)

    return Net()


def test_forward_shapes():
    model = build_model("alexnet", num_classes=5, head=(32,))
    variables = init_variables(model, (180, 180, 3))
    out = model.apply(variables, jnp.zeros((2, 180, 180, 3)), train=False)
    assert out.shape == (2, 5)
    feats = model.apply(variables, jnp.zeros((2, 180, 180, 3)), train=False,
                        features_only=True)
    assert feats.shape == (2, 256 * 6 * 6)


def test_too_small_input_raises():
    """Below 63px torch's pooling stack errors; we must raise the same
    loud config error instead of emitting NaNs from an empty map."""
    model = build_model("alexnet", num_classes=3, head=(16,))
    with pytest.raises(ValueError, match="63"):
        init_variables(model, (32, 32, 3))


def test_torch_roundtrip_forward_agreement():
    """Reference TorchVisionNet-style AlexNet checkpoint (base.0 =
    features + head.K Linears) -> flax: identical variable structure and
    forward agreement to f32 tolerance, at the production 180x180 input
    (the adaptive pool upsamples 4x4 -> 6x6 there)."""
    import torch
    import torch.nn as tnn

    from sykepic_tpu.models import convert_torch

    net = _torch_alexnet().eval()
    torch.manual_seed(1)
    head_fc0 = tnn.Linear(256 * 6 * 6, 24)
    head_fc1 = tnn.Linear(24, 7)
    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith("features."):
            sd["base.0." + k[len("features."):]] = v
    sd["head.0.weight"], sd["head.0.bias"] = (
        head_fc0.weight.data, head_fc0.bias.data)
    sd["head.1.weight"], sd["head.1.bias"] = (
        head_fc1.weight.data, head_fc1.bias.data)

    variables = convert_torch.torch_to_flax(None, sd)  # sniffed as AlexNet
    model = build_model("alexnet", num_classes=7, head=(24,))
    init = init_variables(model, (180, 180, 3))
    assert set(flatten_dict(variables["params"])) == set(
        flatten_dict(init["params"]))

    x = np.random.default_rng(1).uniform(0, 1, (2, 180, 180, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        t = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        theirs = head_fc1(head_fc0(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_reverse_export_roundtrip():
    from sykepic_tpu.models import convert_torch

    model = build_model("alexnet", num_classes=3, head=(16,))
    variables = init_variables(model, (96, 96, 3), seed=2)
    sd = convert_torch.flax_to_torch(variables, network_name="alexnet")
    assert "base.0.0.weight" in sd and "base.0.10.bias" in sd
    back = convert_torch.torch_to_flax("alexnet", sd)
    want = flatten_dict(variables["params"])
    got = flatten_dict(back["params"])
    assert set(want) == set(got)
    for key, leaf in want.items():
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      got[key], err_msg=str(key))
    # sniffed export (no network_name): 5 layerS_convJ modules means
    # AlexNet, not VGG
    sd2 = convert_torch.flax_to_torch(variables)
    assert set(sd2) == set(sd)


def test_label_groups():
    model = build_model("alexnet", num_classes=4, head=(16,))
    variables = init_variables(model, (64, 64, 3))
    labels = flatten_dict(label_params(variables["params"]))
    assert labels[("head", "fc0", "kernel")] == G_HEAD
    assert labels[("layer3_conv2", "kernel")] == G_TOP
    assert labels[("layer3_conv0", "kernel")] == G_TOP
    assert labels[("layer1_conv0", "kernel")] == G_REST


@pytest.mark.parametrize("size", [180, 64])
def test_train_forward_runs(size):
    """Dropout-spliced head + train-mode apply (no BN: train mode only
    toggles dropout)."""
    model = build_model("alexnet", num_classes=3, head=(16,),
                        dropout=((0, 0.5),))
    variables = init_variables(model, (size, size, 3))
    out = model.apply(
        variables, jnp.zeros((2, size, size, 3)), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    assert out.shape == (2, 3)
