"""Model parity: Flax ResNet vs a PyTorch oracle with torchvision naming.

The oracle replicates torchvision's resnet18 topology + the reference's
TorchVisionNet head (stacked Linear layers, network.py:46-64). Passing this
test validates: conv padding (explicit symmetric), BN eval semantics,
maxpool -inf padding, global average pooling, head ordering, and the
state-dict converter for both torchvision and `base.N`/`head.K` namespaces.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from sykepic_tpu.models import build_model, checkpoint, convert_torch
from sykepic_tpu.models.registry import init_variables

NUM_CLASSES = 7


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet18Head(tnn.Module):
    """torchvision-resnet18 topology + reference head (no activations)."""

    def __init__(self, num_classes, head=(256, 128), dropout=()):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, s) in enumerate(cfg, start=1):
            setattr(
                self,
                f"layer{i}",
                tnn.Sequential(
                    TorchBasicBlock(cin, cout, s), TorchBasicBlock(cout, cout)
                ),
            )
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        widths = [512, *head, num_classes]
        layers = [tnn.Linear(widths[i], widths[i + 1]) for i in range(len(widths) - 1)]
        for idx, p in dropout:
            layers.insert(idx, tnn.Dropout(p))
        self.head = tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.head(x)


def randomized_torch_net(dropout=()):
    torch.manual_seed(0)
    net = TorchResNet18Head(NUM_CLASSES, dropout=dropout)
    # randomize BN running stats so converter mapping is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    net.eval()
    return net


@pytest.fixture(scope="module")
def torch_and_flax():
    net = randomized_torch_net(dropout=((1, 0.5),))
    model = build_model(
        "resnet18", NUM_CLASSES, head=(256, 128), dropout=((1, 0.5),)
    )
    variables = convert_torch.torch_resnet_to_flax(net.state_dict())
    return net, model, variables


def test_forward_parity(torch_and_flax):
    net, model, variables = torch_and_flax
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 96, 96, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_forward_parity_odd_input(torch_and_flax):
    # odd spatial size exercises the padding parity (SAME would diverge)
    net, model, variables = torch_and_flax
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 97, 83, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_reference_base_head_namespace():
    """state dicts saved by the reference's TorchVisionNet (base.N / head.K)
    convert to the identical tree as torchvision naming."""
    net = randomized_torch_net()
    sd = net.state_dict()
    renames = {"conv1": "base.0", "bn1": "base.1", "layer1": "base.4",
               "layer2": "base.5", "layer3": "base.6", "layer4": "base.7"}
    ref_sd = {}
    for key, value in sd.items():
        stem, _, rest = key.partition(".")
        if stem in renames:
            ref_sd[f"{renames[stem]}.{rest}"] = value
        else:
            ref_sd[key] = value
    a = convert_torch.torch_resnet_to_flax(sd)
    b = convert_torch.torch_resnet_to_flax(ref_sd)
    flat_a = _flatten(a)
    flat_b = _flatten(b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_checkpoint_roundtrip(tmp_path, torch_and_flax):
    _, model, variables = torch_and_flax
    path = tmp_path / "best_state.msgpack"
    checkpoint.save_variables(path, variables)
    template = init_variables(model, (96, 96, 3))
    restored = checkpoint.load_variables(path, template=template)
    x = np.random.default_rng(2).standard_normal((1, 96, 96, 3), np.float32)
    got1 = np.asarray(model.apply(variables, x, train=False))
    got2 = np.asarray(model.apply(restored, x, train=False))
    np.testing.assert_allclose(got1, got2, atol=1e-6)


def test_converted_tree_matches_init_structure(torch_and_flax):
    import jax

    _, model, variables = torch_and_flax
    template = init_variables(model, (96, 96, 3))
    conv_paths = {p for p, _ in _flatten(variables).items()}
    init_paths = {p for p, _ in _flatten(_plain(template)).items()}
    assert conv_paths == init_paths
    # shapes too
    fa, fb = _flatten(variables), _flatten(_plain(template))
    for k in fa:
        assert np.asarray(fa[k]).shape == np.asarray(fb[k]).shape, k
    del jax


def _plain(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    return tree


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def test_load_pretrained_offline_is_hard_error():
    """A torchvision weights name with no torchvision install/cache must
    raise, not silently train from random init (the reference ALWAYS warm
    starts: config.py:63-77). ``[model] allow_random_init`` opts out."""
    import pytest

    from sykepic_tpu.models.registry import build_model, init_variables
    from sykepic_tpu.train.loop import load_pretrained

    model = build_model("resnet18", num_classes=3, head=(16,))
    variables = init_variables(model, (32, 32, 3))

    with pytest.raises(RuntimeError, match="allow_random_init"):
        load_pretrained(variables, "DEFAULT", "resnet18")

    # explicit opt-in: warns and returns the fresh init unchanged
    out = load_pretrained(
        variables, "DEFAULT", "resnet18", allow_random_init=True
    )
    assert out is variables

    # empty spec is the explicit random-init path and never raises
    assert load_pretrained(variables, None, "resnet18") is variables

    # a missing checkpoint path is always an error, flag or not
    with pytest.raises(FileNotFoundError):
        load_pretrained(
            variables, "/nonexistent/weights.msgpack", "resnet18",
            allow_random_init=True,
        )


def test_flax_to_torch_roundtrip(tmp_path):
    """Export our variables to a reference-style .pth and re-import: the
    tree must come back identical (two-way model-dir compatibility)."""
    import torch

    from sykepic_tpu.models import convert_torch
    from sykepic_tpu.models.registry import build_model, init_variables

    model = build_model("resnet18", num_classes=5, head=(32, 16))
    variables = init_variables(model, (32, 32, 3), seed=3)
    dropout = ((-1, 0.25),)  # reference-style insertion before last Linear
    sd = convert_torch.flax_resnet_to_torch(variables, dropout=dropout)
    # dropout insertion shifts the last Linear's index
    assert "head.0.weight" in sd and "head.1.weight" in sd
    assert "head.3.weight" in sd  # fc2 pushed past the Dropout at -1
    path = tmp_path / "best_state.pth"
    convert_torch.save_pth(variables, path, dropout=dropout)
    back = convert_torch.load_pth(path, "resnet18")

    from flax.traverse_util import flatten_dict

    want_p = flatten_dict(variables["params"])
    got_p = flatten_dict(back["params"])
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_allclose(np.asarray(want_p[k]),
                                   np.asarray(got_p[k]), rtol=1e-6)
    want_s = flatten_dict(variables["batch_stats"])
    got_s = flatten_dict(back["batch_stats"])
    assert set(want_s) == set(got_s)
    del torch


def test_unsupported_architecture_errors():
    """A non-implemented torchvision family must fail with a named error
    listing the supported families, not fall through to the resnet
    converter (the reference loads ANY torchvision model by string,
    ``train/network.py:46-48`` — we approximate with three families)."""
    import pytest

    from sykepic_tpu.models import convert_torch

    # densenet-style keys: neither resnet, efficientnet, nor mobilenet
    sd = {
        "features.denseblock1.denselayer1.conv1.weight": np.zeros((4, 4, 1, 1)),
        "features.norm0.weight": np.zeros(4),
        "classifier.weight": np.zeros((10, 4)),
    }
    with pytest.raises(convert_torch.UnsupportedArchitectureError,
                       match="resnet\\*, efficientnet_b\\*, "
                             "efficientnet_v2_\\*, mobilenet_v3_\\*"):
        convert_torch.torch_to_flax(None, sd)
    with pytest.raises(convert_torch.UnsupportedArchitectureError,
                       match="densenet121"):
        convert_torch.torch_to_flax("densenet121", sd)


def test_vgg_style_state_dict_rejected():
    """A bare numbered features.N. namespace (VGG/AlexNet/SqueezeNet
    style) must NOT sniff as EfficientNet — it has no MBConv .block.
    modules and would die in that converter with an opaque KeyError."""
    import pytest

    from sykepic_tpu.models import convert_torch

    sd = {
        "features.0.weight": np.zeros((64, 3, 3, 3)),
        "features.0.bias": np.zeros(64),
        "features.2.weight": np.zeros((64, 64, 3, 3)),
        "classifier.0.weight": np.zeros((10, 64)),
    }
    with pytest.raises(convert_torch.UnsupportedArchitectureError):
        convert_torch.torch_to_flax(None, sd)
