"""Convert PyTorch ResNet checkpoints to our Flax variable tree.

Supports two key namespaces:

1. raw torchvision ``resnetNN`` state dicts (``conv1.weight``,
   ``layer3.1.bn2.running_mean``, ...),
2. the reference's ``TorchVisionNet`` state dicts (``base.N...`` /
   ``head.K.weight``), where ``base`` is ``Sequential(children[:-1])`` of a
   torchvision resnet (reference ``sykepic/train/network.py:46-63``):
   base.0=conv1, base.1=bn1, base.4..7=layer1..4, and ``head`` is the stacked
   Linear head (dropout layers hold no parameters, so Linear indices may be
   non-contiguous).

This is what makes an existing ``best_state.pth`` model directory a drop-in
for this framework (loaded lazily by :mod:`sykepic_tpu.models.checkpoint`).

Layout conversions:
- conv weight OIHW -> HWIO
- linear weight (out, in) -> kernel (in, out)
- bn weight/bias -> scale/bias (params); running_mean/var -> batch_stats
"""

from __future__ import annotations

import re

import numpy as np

# base.N -> torchvision child name, for reference TorchVisionNet state dicts
_BASE_CHILDREN = {
    "0": "conv1",
    "1": "bn1",
    "4": "layer1",
    "5": "layer2",
    "6": "layer3",
    "7": "layer4",
}


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _put(tree, path, leaf):
    """Insert ``leaf`` at ``path`` (key tuple) of a nested dict tree."""
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def normalize_state_dict(state_dict: dict) -> dict:
    """Rewrite reference ``base.N.*`` / ``head.K.*`` keys into torchvision
    naming (``conv1.*`` / ``layerX.Y.*`` / ``head.K.*`` kept as-is)."""
    out = {}
    for key, value in state_dict.items():
        m = re.match(r"^base\.(\d+)\.(.*)$", key)
        if m:
            child = _BASE_CHILDREN.get(m.group(1))
            if child is None:  # relu / maxpool / avgpool have no params
                continue
            rest = m.group(2)
            key = f"{child}.{rest}" if rest else child
        out[key] = value
    return out


def torch_resnet_to_flax(state_dict: dict) -> dict:
    """Convert a torch ResNet(+head) state dict to
    ``{"params": ..., "batch_stats": ...}`` with our module naming."""
    sd = normalize_state_dict(state_dict)
    params: dict = {}
    stats: dict = {}

    head_linears = []  # (torch_index, weight, bias)
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(value)
        parts = key.split(".")
        if parts[0] in ("head", "fc"):
            if parts[0] == "fc":
                idx = 0
            else:
                idx = int(parts[1])
            if key.endswith("weight"):
                head_linears.append((idx, v))
            continue
        if parts[0] == "conv1":
            _put(params, ("conv1", "kernel"), v.transpose(2, 3, 1, 0))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn1",), parts[-1], v)
        elif parts[0].startswith("layer"):
            stage = parts[0]  # layer1..layer4
            block = parts[1]
            mod = f"{stage}_{block}"
            sub = parts[2]
            if sub.startswith("conv"):
                _put(params, (mod, sub, "kernel"), v.transpose(2, 3, 1, 0))
            elif sub.startswith("bn"):
                _put_bn(params, stats, (mod, sub), parts[-1], v)
            elif sub == "downsample":
                if parts[3] == "0":
                    _put(
                        params,
                        (mod, "downsample_conv", "kernel"),
                        v.transpose(2, 3, 1, 0),
                    )
                else:
                    _put_bn(params, stats, (mod, "downsample_bn"), parts[-1], v)
            else:
                raise KeyError(f"Unhandled key {key}")
        else:
            raise KeyError(f"Unhandled key {key}")

    # Head: map Linear layers in torch-Sequential order to fc0, fc1, ...
    head_params: dict = {}
    for out_i, (torch_idx, weight) in enumerate(sorted(head_linears)):
        bias_key = (
            f"head.{torch_idx}.bias" if "head.0.weight" in sd or any(
                k.startswith("head.") for k in sd
            ) else "fc.bias"
        )
        head_params[f"fc{out_i}"] = {
            "kernel": weight.transpose(1, 0),
            "bias": _to_numpy(sd[bias_key]),
        }
    if head_params:
        params["head"] = head_params
    return {"params": params, "batch_stats": stats}


def _put_bn(params, stats, path, leaf_name, v):
    if leaf_name == "weight":
        _put(params, (*path, "scale"), v)
    elif leaf_name == "bias":
        _put(params, (*path, "bias"), v)
    elif leaf_name == "running_mean":
        _put(stats, (*path, "mean"), v)
    elif leaf_name == "running_var":
        _put(stats, (*path, "var"), v)
    else:
        raise KeyError(f"Unhandled bn leaf {leaf_name}")


def load_pth(path) -> dict:
    """Load a ``.pth`` state dict (CPU) -> flax variables."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return torch_resnet_to_flax(state_dict)
