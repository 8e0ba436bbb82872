"""Convert PyTorch ResNet / EfficientNet checkpoints to our Flax variable
tree.

Supports two key namespaces per family:

1. raw torchvision state dicts (``conv1.weight``,
   ``layer3.1.bn2.running_mean``, ``features.2.1.block.0.0.weight``, ...),
2. the reference's ``TorchVisionNet`` state dicts (``base.N...`` /
   ``head.K.weight``), where ``base`` is ``Sequential(children[:-1])`` of a
   torchvision model (reference ``sykepic/train/network.py:46-63``): for
   resnets base.0=conv1, base.1=bn1, base.4..7=layer1..4; for efficientnets
   base.0=features. ``head`` is the stacked Linear head (dropout layers hold
   no parameters, so Linear indices may be non-contiguous).

This is what makes an existing ``best_state.pth`` model directory a drop-in
for this framework (loaded lazily by :mod:`sykepic_tpu.models.checkpoint`).
The family is detected from the keys (:func:`torch_to_flax` /
:func:`load_pth` dispatch automatically).

Layout conversions:
- conv weight OIHW -> HWIO (depthwise convs keep their (H, W, 1, C) group
  layout under the same transpose)
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


# ---------------------------------------------------------------------------
# EfficientNet (torchvision ``efficientnet_bN`` / TorchVisionNet-wrapped)
# ---------------------------------------------------------------------------

def _normalize_base0_keys(state_dict: dict) -> dict:
    """Rewrite reference ``base.0.*`` (base.0 == features) into torchvision
    ``features.*`` naming; ``head.K.*`` / ``classifier.*`` kept as-is.
    Shared by the EfficientNet, MobileNetV3 and VGG converters — all three
    families wrap a ``features`` Sequential as the first base child."""
    out = {}
    for key, value in state_dict.items():
        m = re.match(r"^base\.0\.(.*)$", key)
        if m:
            key = f"features.{m.group(1)}"
        out[key] = value
    return out


def _conv_kernel(v) -> np.ndarray:
    return _to_numpy(v).transpose(2, 3, 1, 0)


def torch_efficientnet_to_flax(state_dict: dict) -> dict:
    """Convert a torchvision EfficientNet(+head) state dict to our
    :class:`~sykepic_tpu.models.efficientnet.EfficientNet` variable tree.

    torchvision block layout: ``features.0`` stem conv+bn; ``features.G.R
    .block.{i}`` MBConv stages where the expand conv+bn (index 0) exists
    only when expand_ratio > 1 (first stage omits it); the last ``features``
    entry is the 1x1 head conv+bn; ``classifier.1`` the final Linear.

    Handles V2 (``efficientnet_v2_*``) too: FusedMBConv blocks have no SE
    module — one dense kxk conv+bn (plus a 1x1 projection when the expand
    ratio > 1) — which is exactly how they are told apart from MBConv
    (every V1/V2 MBConv carries ``block.{i}.fc1`` SE convs).
    """
    sd = _normalize_base0_keys(state_dict)
    params: dict = {}
    stats: dict = {}
    head_linears: dict[int, dict] = {}

    feature_ids = sorted(
        {int(m.group(1)) for k in sd
         if (m := re.match(r"^features\.(\d+)\.", k))}
    )
    if not feature_ids:
        raise KeyError("no features.* keys: not an EfficientNet state dict")
    last_fid = feature_ids[-1]

    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] in ("head", "classifier"):
            idx = int(parts[1])
            head_linears.setdefault(idx, {})[leaf] = _to_numpy(value)
            continue
        if parts[0] != "features":
            raise KeyError(f"Unhandled key {key}")
        fid = int(parts[1])
        if fid == 0 or fid == last_fid:  # stem / head conv+bn pairs
            prefix = "stem" if fid == 0 else "head"
            if parts[2] == "0":
                _put(params, (f"{prefix}_conv", "kernel"), _conv_kernel(value))
            else:
                _put_bn(params, stats, (f"{prefix}_bn",), leaf, _to_numpy(value))
            continue
        block_r = int(parts[2])
        mod = f"layer{fid}_{block_r}"
        base = f"features.{fid}.{block_r}.block"
        if f"{base}.2.fc1.weight" in sd:    # MBConv, expand ratio > 1
            role_by_index = {0: "expand", 1: "dw", 2: "se", 3: "project"}
        elif f"{base}.1.fc1.weight" in sd:  # MBConv, expand ratio 1
            role_by_index = {0: "dw", 1: "se", 2: "project"}
        else:                               # FusedMBConv (V2) — SE-free
            role_by_index = {0: "fused", 1: "project"}
        sub = int(parts[4])
        role = role_by_index[sub]
        if role == "se":
            fc = parts[5]  # fc1 / fc2
            _put(params, (mod, "se", fc,
                          "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(value) if leaf == "weight" else _to_numpy(value))
        else:
            inner = parts[5]  # "0" conv, "1" bn
            if inner == "0":
                _put(params, (mod, f"{role}_conv", "kernel"),
                     _conv_kernel(value))
            else:
                _put_bn(params, stats, (mod, f"{role}_bn"), leaf,
                        _to_numpy(value))

    if head_params := _collect_head(head_linears):
        params["head"] = head_params
    return {"params": params, "batch_stats": stats}


# --- shared pieces of the per-family converters ---------------------------

def _collect_head(head_linears: dict) -> dict:
    """``head.K`` Linears (torch-Sequential order) -> ``fc0, fc1, ...``."""
    head_params = {}
    for out_i, idx in enumerate(sorted(k for k, v in head_linears.items()
                                       if "weight" in v)):
        head_params[f"fc{out_i}"] = {
            "kernel": head_linears[idx]["weight"].transpose(1, 0),
            "bias": head_linears[idx]["bias"],
        }
    return head_params


def _sd_put(sd: dict, key, arr) -> None:
    import torch

    sd[key] = torch.from_numpy(np.ascontiguousarray(arr))


def _sd_put_conv(sd: dict, key, tree) -> None:
    _sd_put(sd, key, np.asarray(tree["kernel"]).transpose(3, 2, 0, 1))


def _sd_put_bn(sd: dict, prefix, p_tree, s_tree) -> None:
    import torch

    _sd_put(sd, f"{prefix}.weight", np.asarray(p_tree["scale"]))
    _sd_put(sd, f"{prefix}.bias", np.asarray(p_tree["bias"]))
    _sd_put(sd, f"{prefix}.running_mean", np.asarray(s_tree["mean"]))
    _sd_put(sd, f"{prefix}.running_var", np.asarray(s_tree["var"]))
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _sd_put_block(sd: dict, block_prefix: str, tree: dict,
                  stats_tree: dict) -> None:
    """Export one MBConv/InvertedResidual/FusedMBConv block at
    ``block_prefix``: torchvision unit order [expand] dw [se] project
    (MBConv) or fused [project] (V2 FusedMBConv), each conv+bn pair at
    ``block.{i}.0/.1`` and SE at ``block.{i}.fc1/fc2``. Roles present are
    discovered from the tree (expand/se/project are optional)."""
    if "fused_conv" in tree:
        roles = ["fused"]
        if "project_conv" in tree:
            roles.append("project")
    else:
        roles = []
        if "expand_conv" in tree:
            roles.append("expand")
        roles.append("dw")
        if "se" in tree:
            roles.append("se")
        roles.append("project")
    for i, role in enumerate(roles):
        prefix = f"{block_prefix}.block.{i}"
        if role == "se":
            for fc in ("fc1", "fc2"):
                _sd_put_conv(sd, f"{prefix}.{fc}.weight", tree["se"][fc])
                _sd_put(sd, f"{prefix}.{fc}.bias",
                        np.asarray(tree["se"][fc]["bias"]))
        else:
            _sd_put_conv(sd, f"{prefix}.0.weight", tree[f"{role}_conv"])
            _sd_put_bn(sd, f"{prefix}.1", tree[f"{role}_bn"],
                       stats_tree[f"{role}_bn"])


def _sd_put_head(sd: dict, params: dict, dropout) -> None:
    """Export ``params['head']`` as Dropout-shifted ``head.K`` Linears."""
    head = params.get("head", {})
    indices = _head_linear_indices(len(head), dropout)
    for k in range(len(head)):
        fc = head[f"fc{k}"]
        _sd_put(sd, f"head.{indices[k]}.weight",
                np.asarray(fc["kernel"]).transpose(1, 0))
        _sd_put(sd, f"head.{indices[k]}.bias", np.asarray(fc["bias"]))


def torch_mobilenet_v3_to_flax(state_dict: dict) -> dict:
    """Convert a torchvision MobileNetV3(+head) state dict to our
    :class:`~sykepic_tpu.models.mobilenet.MobileNetV3` variable tree.

    torchvision layout: ``features.0`` stem conv+bn; ``features.I.block.J``
    units where J's roles depend on the block ([expand] dw [se] project);
    the last ``features`` entry is the 1x1 widening conv+bn. The stock
    ``classifier.*`` Sequential is DISCARDED — the reference's
    ``TorchVisionNet`` drops it and attaches its own head at the first
    classifier Linear's in_features (``network.py:50-56``); model-dir
    ``head.K`` Linears map to ``head.fcK``.
    """
    sd = _normalize_base0_keys(state_dict)  # base.0.* -> features.*
    params: dict = {}
    stats: dict = {}
    head_linears: dict[int, dict] = {}

    feature_ids = sorted(
        {int(m.group(1)) for k in sd
         if (m := re.match(r"^features\.(\d+)\.", k))}
    )
    if not feature_ids:
        raise KeyError("no features.* keys: not a MobileNetV3 state dict")
    last_fid = feature_ids[-1]

    # role of each block.J index, discovered from the keys themselves
    roles_by_fid: dict[int, dict[int, str]] = {}
    for fid in feature_ids:
        if fid in (0, last_fid):
            continue
        conv_js = sorted(
            {int(m.group(1)) for k in sd
             if (m := re.match(rf"^features\.{fid}\.block\.(\d+)\.0\.weight$",
                               k))}
        )
        se_js = {int(m.group(1)) for k in sd
                 if (m := re.match(
                     rf"^features\.{fid}\.block\.(\d+)\.fc1\.weight$", k))}
        names = (["expand", "dw", "project"] if len(conv_js) == 3
                 else ["dw", "project"])
        roles = dict(zip(conv_js, names))
        for j in se_js:
            roles[j] = "se"
        roles_by_fid[fid] = roles

    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "classifier":
            continue  # replaced by the reference-style head
        if parts[0] == "head":
            head_linears.setdefault(int(parts[1]), {})[leaf] = _to_numpy(value)
            continue
        if parts[0] != "features":
            raise KeyError(f"Unhandled key {key}")
        fid = int(parts[1])
        if fid == 0 or fid == last_fid:
            prefix = "stem" if fid == 0 else "head"
            if parts[2] == "0":
                _put(params, (f"{prefix}_conv", "kernel"), _conv_kernel(value))
            else:
                _put_bn(params, stats, (f"{prefix}_bn",), leaf,
                        _to_numpy(value))
            continue
        mod = f"layer{fid}_0"
        role = roles_by_fid[fid][int(parts[3])]
        if role == "se":
            fc = parts[4]  # fc1 / fc2
            _put(params, (mod, "se", fc,
                          "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(value) if leaf == "weight" else _to_numpy(value))
        elif parts[4] == "0":
            _put(params, (mod, f"{role}_conv", "kernel"), _conv_kernel(value))
        else:
            _put_bn(params, stats, (mod, f"{role}_bn"), leaf,
                    _to_numpy(value))

    if head_params := _collect_head(head_linears):
        params["head"] = head_params
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# VGG (torchvision ``vgg16[_bn]`` / ``vgg19[_bn]`` / TorchVisionNet-wrapped)
# ---------------------------------------------------------------------------

_VGG_BY_CONV_COUNT = {8: "vgg11", 10: "vgg13", 13: "vgg16", 16: "vgg19"}


def _vgg_variant_from_keys(sd: dict) -> str:
    """Infer vgg11/13/16/19 (+_bn) from normalized feature keys: the conv
    count identifies the depth, ``running_mean`` presence the BN flavor."""
    conv_keys = [k for k in sd
                 if re.match(r"^features\.\d+\.weight$", k)
                 and getattr(sd[k], "ndim", np.asarray(sd[k]).ndim) == 4]
    bn = any(k.startswith("features.") and k.endswith("running_mean")
             for k in sd)
    n_convs = len(conv_keys)
    base = _VGG_BY_CONV_COUNT.get(n_convs)
    if base is None:
        raise UnsupportedArchitectureError(
            f"VGG-style state dict with {n_convs} convs matches none of "
            "vgg11 (8), vgg13 (10), vgg16 (13), vgg19 (16)"
        )
    return f"{base}_bn" if bn else base


def torch_vgg_to_flax(state_dict: dict) -> dict:
    """Convert a torch VGG(+head) state dict to our
    :class:`~sykepic_tpu.models.vgg.VGG` variable tree. Accepts raw
    torchvision dicts (``features.*`` + ``classifier.*``) and reference
    ``TorchVisionNet`` dicts (``base.0.*`` + ``head.K.*``). Head kernels
    transpose 1:1 because our flatten runs in torch's channel-major order
    (``models/vgg.py``)."""
    from . import vgg as vgg_mod

    sd = _normalize_base0_keys(state_dict)
    name = _vgg_variant_from_keys(sd)
    batch_norm = name.endswith("_bn")
    params: dict = {}
    stats: dict = {}

    for idx, stage, j in vgg_mod.feature_index_map(name):
        conv = f"layer{stage}_conv{j}"
        kernel = _conv_kernel(sd[f"features.{idx}.weight"])
        _put(params, (conv, "kernel"), kernel)
        # torchvision make_layers keeps Conv2d bias=True in the _bn
        # variants too — every real vgg*_bn checkpoint has these tensors
        _put(params, (conv, "bias"), _to_numpy(sd[f"features.{idx}.bias"]))
        if batch_norm:
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                _put_bn(params, stats, (f"layer{stage}_bn{j}",), leaf,
                        _to_numpy(sd[f"features.{idx + 1}.{leaf}"]))

    head_linears: dict = {}
    for key, value in sd.items():
        m = re.match(r"^(?:head|classifier)\.(\d+)\.(weight|bias)$", key)
        if m:
            head_linears.setdefault(int(m.group(1)), {})[m.group(2)] = (
                _to_numpy(value)
            )
    if head_linears:
        params["head"] = _collect_head(head_linears)
    return {"params": params, "batch_stats": stats}


def flax_vgg_to_torch(variables: dict, dropout=()) -> dict:
    """Our VGG variable tree -> a reference ``TorchVisionNet`` state dict
    (``base.0.*`` = features, ``head.K.*`` Linears). Inverse of
    :func:`torch_vgg_to_flax`; the variant is inferred from the tree's
    conv count and BN presence."""
    from . import vgg as vgg_mod

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    convs = [m for m in params if re.match(r"^layer\d+_conv\d+$", m)]
    if not convs:
        raise KeyError("variable tree is not a VGG (no layerS_convJ)")
    bn = any(re.match(r"^layer\d+_bn\d+$", m) for m in params)
    base = _VGG_BY_CONV_COUNT[len(convs)]
    name = f"{base}_bn" if bn else base
    sd: dict = {}
    for idx, stage, j in vgg_mod.feature_index_map(name):
        conv = params[f"layer{stage}_conv{j}"]
        _sd_put_conv(sd, f"base.0.{idx}.weight", conv)
        # conv bias exists in the _bn variants too (torchvision layout);
        # a strict reference-side load_state_dict requires every key
        _sd_put(sd, f"base.0.{idx}.bias", np.asarray(conv["bias"]))
        if bn:
            mod = f"layer{stage}_bn{j}"
            _sd_put_bn(sd, f"base.0.{idx + 1}", params[mod], stats[mod])
    _sd_put_head(sd, params, dropout)
    return sd


# (stage-3 depth, stem width) -> variant. tiny/small differ only in
# stage-3 depth; small/base/large all run 27 stage-3 blocks and differ
# only in width.
_CONVNEXT_BY_SHAPE = {
    (9, 96): "convnext_tiny",
    (27, 96): "convnext_small",
    (27, 128): "convnext_base",
    (27, 192): "convnext_large",
}


def _convnext_variant_from_keys(sd: dict) -> str:
    stage3 = {
        int(m.group(1)) for k in sd
        if (m := re.match(r"^features\.5\.(\d+)\.block\.", k))
    }
    stem = sd.get("features.0.0.weight")
    width = int(np.asarray(stem).shape[0]) if stem is not None else 0
    name = _CONVNEXT_BY_SHAPE.get((len(stage3), width))
    if name is None:
        raise UnsupportedArchitectureError(
            f"ConvNeXt-style state dict with {len(stage3)} stage-3 blocks"
            f" at stem width {width} matches none of "
            f"{sorted(_CONVNEXT_BY_SHAPE.values())}"
        )
    return name


def torch_convnext_to_flax(state_dict: dict) -> dict:
    """Convert a torch ConvNeXt(+head) state dict to our
    :class:`~sykepic_tpu.models.convnext.ConvNeXt` variable tree. Accepts
    raw torchvision dicts (``features.*`` [+ ``classifier.*``]) and
    reference ``TorchVisionNet`` dicts (``base.0.*`` + ``head.K.*``).
    torchvision's final LayerNorm (``classifier.0``) has no counterpart
    on our side — the reference's ``children[:-1]`` drops it (see
    ``models/convnext.py``) — so it is ignored here."""
    from . import convnext as cnx_mod

    sd = _normalize_base0_keys(state_dict)
    name = _convnext_variant_from_keys(sd)
    params: dict = {}

    def put_ln(mod, prefix):
        _put(params, (mod, "scale"), _to_numpy(sd[f"{prefix}.weight"]))
        _put(params, (mod, "bias"), _to_numpy(sd[f"{prefix}.bias"]))

    for fi, kind, stage, j in cnx_mod.torch_feature_layout(name):
        if kind == "stem":
            _put(params, ("stem_conv", "kernel"),
                 _conv_kernel(sd["features.0.0.weight"]))
            _put(params, ("stem_conv", "bias"),
                 _to_numpy(sd["features.0.0.bias"]))
            put_ln("stem_ln", "features.0.1")
        elif kind == "down":
            put_ln(f"layer{stage}_down_norm", f"features.{fi}.0")
            _put(params, (f"layer{stage}_down_conv", "kernel"),
                 _conv_kernel(sd[f"features.{fi}.1.weight"]))
            _put(params, (f"layer{stage}_down_conv", "bias"),
                 _to_numpy(sd[f"features.{fi}.1.bias"]))
        else:
            mod = f"layer{stage}_{j}"
            p = f"features.{fi}.{j}"
            _put(params, (mod, "dwconv", "kernel"),
                 _conv_kernel(sd[f"{p}.block.0.weight"]))
            _put(params, (mod, "dwconv", "bias"),
                 _to_numpy(sd[f"{p}.block.0.bias"]))
            _put(params, (mod, "norm", "scale"),
                 _to_numpy(sd[f"{p}.block.2.weight"]))
            _put(params, (mod, "norm", "bias"),
                 _to_numpy(sd[f"{p}.block.2.bias"]))
            _put(params, (mod, "mlp1", "kernel"),
                 _to_numpy(sd[f"{p}.block.3.weight"]).transpose(1, 0))
            _put(params, (mod, "mlp1", "bias"),
                 _to_numpy(sd[f"{p}.block.3.bias"]))
            _put(params, (mod, "mlp2", "kernel"),
                 _to_numpy(sd[f"{p}.block.5.weight"]).transpose(1, 0))
            _put(params, (mod, "mlp2", "bias"),
                 _to_numpy(sd[f"{p}.block.5.bias"]))
            # torch (dim, 1, 1) -> flax (dim,)
            _put(params, (mod, "layer_scale"),
                 _to_numpy(sd[f"{p}.layer_scale"]).reshape(-1))

    head_linears: dict = {}
    for key, value in sd.items():
        m = re.match(r"^(?:head|classifier)\.(\d+)\.(weight|bias)$", key)
        if not m:
            continue
        # classifier.0 is the dropped LayerNorm (1-D weight), not a head
        # Linear; only 2-D weights (and their biases) are head layers
        w_key = f"{key.rsplit('.', 1)[0]}.weight"
        if getattr(sd[w_key], "ndim", np.asarray(sd[w_key]).ndim) != 2:
            continue
        head_linears.setdefault(int(m.group(1)), {})[m.group(2)] = (
            _to_numpy(value)
        )
    if head_linears:
        params["head"] = _collect_head(head_linears)
    return {"params": params, "batch_stats": {}}


def flax_convnext_to_torch(variables: dict, dropout=()) -> dict:
    """Our ConvNeXt variable tree -> a reference ``TorchVisionNet`` state
    dict (``base.0.*`` = features, ``head.K.*`` Linears). Inverse of
    :func:`torch_convnext_to_flax`."""
    from . import convnext as cnx_mod

    params = variables["params"]
    stage3 = sum(bool(re.match(r"^layer3_\d+$", m)) for m in params)
    width = int(np.asarray(params["stem_conv"]["kernel"]).shape[-1])
    name = _CONVNEXT_BY_SHAPE.get((stage3, width))
    if name is None:
        raise UnsupportedArchitectureError(
            f"variable tree with {stage3} stage-3 blocks at stem width "
            f"{width} matches none of {sorted(_CONVNEXT_BY_SHAPE.values())}"
        )
    sd: dict = {}

    def put_ln(prefix, tree):
        _sd_put(sd, f"{prefix}.weight", np.asarray(tree["scale"]))
        _sd_put(sd, f"{prefix}.bias", np.asarray(tree["bias"]))

    def put_dense(prefix, tree):
        _sd_put(sd, f"{prefix}.weight",
                np.asarray(tree["kernel"]).transpose(1, 0))
        _sd_put(sd, f"{prefix}.bias", np.asarray(tree["bias"]))

    for fi, kind, stage, j in cnx_mod.torch_feature_layout(name):
        if kind == "stem":
            _sd_put_conv(sd, "base.0.0.0.weight", params["stem_conv"])
            _sd_put(sd, "base.0.0.0.bias",
                    np.asarray(params["stem_conv"]["bias"]))
            put_ln("base.0.0.1", params["stem_ln"])
        elif kind == "down":
            put_ln(f"base.0.{fi}.0", params[f"layer{stage}_down_norm"])
            _sd_put_conv(sd, f"base.0.{fi}.1.weight",
                         params[f"layer{stage}_down_conv"])
            _sd_put(sd, f"base.0.{fi}.1.bias",
                    np.asarray(params[f"layer{stage}_down_conv"]["bias"]))
        else:
            mod = params[f"layer{stage}_{j}"]
            p = f"base.0.{fi}.{j}"
            _sd_put_conv(sd, f"{p}.block.0.weight", mod["dwconv"])
            _sd_put(sd, f"{p}.block.0.bias",
                    np.asarray(mod["dwconv"]["bias"]))
            put_ln(f"{p}.block.2", mod["norm"])
            put_dense(f"{p}.block.3", mod["mlp1"])
            put_dense(f"{p}.block.5", mod["mlp2"])
            _sd_put(sd, f"{p}.layer_scale",
                    np.asarray(mod["layer_scale"]).reshape(-1, 1, 1))
    _sd_put_head(sd, params, dropout)
    return sd


def _looks_like_convnext(state_dict: dict) -> bool:
    """ConvNeXt fingerprint: per-block ``layer_scale`` parameters (no
    other torchvision family has them). Checked BEFORE the MBConv
    sniffers — ConvNeXt's ``features.N.M.block.*`` keys would otherwise
    match the EfficientNet repeat-level pattern."""
    return any(k.endswith("layer_scale") for k in state_dict)


def torch_alexnet_to_flax(state_dict: dict) -> dict:
    """Convert a torch AlexNet(+head) state dict to our
    :class:`~sykepic_tpu.models.alexnet.AlexNet` variable tree. Accepts raw
    torchvision dicts (``features.*`` + ``classifier.*``) and reference
    ``TorchVisionNet`` dicts (``base.0.*`` + ``head.K.*``). Head kernels
    transpose 1:1 because our flatten runs in torch's channel-major order
    (``models/alexnet.py``)."""
    from . import alexnet as alex_mod

    sd = _normalize_base0_keys(state_dict)
    params: dict = {}
    for idx, (stage, j, *_rest) in zip(alex_mod.FEATURE_INDICES,
                                       alex_mod.ALEXNET_CONVS):
        conv = f"layer{stage}_conv{j}"
        _put(params, (conv, "kernel"), _conv_kernel(sd[f"features.{idx}.weight"]))
        _put(params, (conv, "bias"), _to_numpy(sd[f"features.{idx}.bias"]))

    head_linears: dict = {}
    for key, value in sd.items():
        m = re.match(r"^(?:head|classifier)\.(\d+)\.(weight|bias)$", key)
        if m:
            head_linears.setdefault(int(m.group(1)), {})[m.group(2)] = (
                _to_numpy(value)
            )
    if head_linears:
        params["head"] = _collect_head(head_linears)
    return {"params": params, "batch_stats": {}}


def flax_alexnet_to_torch(variables: dict, dropout=()) -> dict:
    """Our AlexNet variable tree -> a reference ``TorchVisionNet`` state
    dict (``base.0.*`` = features, ``head.K.*`` Linears). Inverse of
    :func:`torch_alexnet_to_flax`."""
    from . import alexnet as alex_mod

    params = variables["params"]
    sd: dict = {}
    for idx, (stage, j, *_rest) in zip(alex_mod.FEATURE_INDICES,
                                       alex_mod.ALEXNET_CONVS):
        conv = params[f"layer{stage}_conv{j}"]
        _sd_put_conv(sd, f"base.0.{idx}.weight", conv)
        _sd_put(sd, f"base.0.{idx}.bias", np.asarray(conv["bias"]))
    _sd_put_head(sd, params, dropout)
    return sd


def _looks_like_alexnet(state_dict: dict) -> bool:
    """AlexNet fingerprint on normalized keys: the 11x11x3->64 first
    features conv (unique across torchvision — VGG's is 3x3)."""
    sd = _normalize_base0_keys(state_dict)
    v = sd.get("features.0.weight")
    if v is None or any(".block." in k for k in sd):
        return False
    shape = tuple(getattr(v, "shape", np.asarray(v).shape))
    return shape == (64, 3, 11, 11)


def _looks_like_vgg(state_dict: dict) -> bool:
    """VGG fingerprint on normalized keys: a 3x3x3->64 first features conv
    (AlexNet's is 11x11; EfficientNet/MobileNet carry ``.block.``;
    ResNet has no ``features.`` prefix)."""
    sd = _normalize_base0_keys(state_dict)
    v = sd.get("features.0.weight")
    if v is None or any(".block." in k for k in sd):
        return False
    shape = tuple(getattr(v, "shape", np.asarray(v).shape))
    return shape == (64, 3, 3, 3)


def _looks_like_efficientnet(state_dict: dict) -> bool:
    """MBConv fingerprints: ``.block.`` submodules (torchvision
    ``features.N.M.block.*``) or the TorchVisionNet-wrapped stem
    ``base.0.0.0``. A bare numbered ``features.N.`` prefix is NOT enough:
    VGG/AlexNet/SqueezeNet-style dicts use exactly those keys and must
    fall through to :class:`UnsupportedArchitectureError` instead of
    dying inside the EfficientNet converter."""
    return any(".block." in k or k.startswith("base.0.0.0")
               for k in state_dict)


def _looks_like_mobilenet_v3(state_dict: dict) -> bool:
    """V3 blocks sit directly under features.I (``features.3.block.0``);
    EfficientNet has a repeat level (``features.3.1.block.0``)."""
    return any(re.match(r"^(base\.0\.|features\.)\d+\.block\.", k)
               for k in state_dict)


def _looks_like_resnet(state_dict: dict) -> bool:
    """ResNet fingerprints, raw torchvision (``layer1.0.conv1``) or
    TorchVisionNet-wrapped (``base.4.0.conv1``)."""
    return any(
        re.match(r"^(base\.\d+|layer\d+)\.\d+\.conv\d", k) or
        k in ("conv1.weight", "base.0.weight")
        for k in state_dict
    )


# ---------------------------------------------------------------------------
# RegNet (torchvision ``regnet_x/y_*`` / TorchVisionNet-wrapped)
# ---------------------------------------------------------------------------

def _normalize_regnet_keys(state_dict: dict) -> dict:
    """Rewrite reference ``base.N.*`` into torchvision RegNet naming:
    children = [stem, trunk_output, avgpool, fc], so base.0 == stem and
    base.1 == trunk_output (avgpool holds no parameters)."""
    out = {}
    for key, value in state_dict.items():
        m = re.match(r"^base\.([01])\.(.*)$", key)
        if m:
            child = "stem" if m.group(1) == "0" else "trunk_output"
            key = f"{child}.{m.group(2)}"
        out[key] = value
    return out


def torch_regnet_to_flax(state_dict: dict) -> dict:
    """Convert a torch RegNet(+head) state dict to our variable tree.

    torchvision key layout (``torchvision/models/regnet.py``):
    ``stem.0/.1`` conv+bn; ``trunk_output.block{S}.block{S}-{B}`` blocks
    with ``proj.0/.1`` (projection conv+bn) and ``f.{a,b,c}.0/.1``
    bottleneck conv+bn units plus optional ``f.se.fc{1,2}`` 1x1 convs;
    ``fc`` (raw) or ``head.K`` (wrapped) Linears."""
    sd = _normalize_regnet_keys(state_dict)
    params: dict = {}
    stats: dict = {}
    head_linears: dict = {}

    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(value)
        parts = key.split(".")
        if parts[0] in ("head", "fc"):
            idx = int(parts[1]) if parts[0] == "head" else 0
            head_linears.setdefault(idx, {})[parts[-1]] = v
            continue
        if parts[0] == "stem":
            if parts[1] == "0":
                _put(params, ("stem_conv", "kernel"), v.transpose(2, 3, 1, 0))
            else:
                _put_bn(params, stats, ("stem_bn",), parts[-1], v)
            continue
        if parts[0] != "trunk_output":
            raise KeyError(f"Unhandled key {key}")
        # trunk_output.block{S}.block{S}-{B}.(proj|f).<unit>...
        stage = int(parts[1][len("block"):])
        block = int(parts[2].split("-")[1])
        mod = f"layer{stage}_{block}"
        if parts[3] == "proj":
            if parts[4] == "0":
                _put(params, (mod, "proj_conv", "kernel"),
                     v.transpose(2, 3, 1, 0))
            else:
                _put_bn(params, stats, (mod, "proj_bn"), parts[-1], v)
        elif parts[3] == "f":
            unit = parts[4]
            if unit == "se":
                fc = parts[5]  # fc1 / fc2 (1x1 convs WITH bias)
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                arr = v.transpose(2, 3, 1, 0) if leaf == "kernel" else v
                _put(params, (mod, "se", fc, leaf), arr)
            elif parts[5] == "0":
                _put(params, (mod, f"{unit}_conv", "kernel"),
                     v.transpose(2, 3, 1, 0))
            else:
                _put_bn(params, stats, (mod, f"{unit}_bn"), parts[-1], v)
        else:
            raise KeyError(f"Unhandled key {key}")

    head_params = _collect_head(head_linears)
    if head_params:
        params["head"] = head_params
    return {"params": params, "batch_stats": stats}


def flax_regnet_to_torch(variables: dict, dropout=()) -> dict:
    """Our RegNet variable tree -> a reference ``TorchVisionNet`` state
    dict (base.0 == stem, base.1 == trunk_output). Inverse of
    :func:`torch_regnet_to_flax`."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    if "stem_conv" not in params:
        raise KeyError("variable tree is not a RegNet (no stem_conv)")
    _sd_put_conv(sd, "base.0.0.weight", params["stem_conv"])
    _sd_put_bn(sd, "base.0.1", params["stem_bn"], stats["stem_bn"])

    for mod, tree in params.items():
        m = re.match(r"^layer(\d+)_(\d+)$", mod)
        if not m:
            continue
        stage, block = m.groups()
        prefix = f"base.1.block{stage}.block{stage}-{block}"
        if "proj_conv" in tree:
            _sd_put_conv(sd, f"{prefix}.proj.0.weight", tree["proj_conv"])
            _sd_put_bn(sd, f"{prefix}.proj.1", tree["proj_bn"],
                       stats[mod]["proj_bn"])
        for unit in ("a", "b", "c"):
            _sd_put_conv(sd, f"{prefix}.f.{unit}.0.weight",
                         tree[f"{unit}_conv"])
            _sd_put_bn(sd, f"{prefix}.f.{unit}.1", tree[f"{unit}_bn"],
                       stats[mod][f"{unit}_bn"])
        if "se" in tree:
            for fc in ("fc1", "fc2"):
                _sd_put_conv(sd, f"{prefix}.f.se.{fc}.weight",
                             tree["se"][fc])
                _sd_put(sd, f"{prefix}.f.se.{fc}.bias",
                        np.asarray(tree["se"][fc]["bias"]))

    _sd_put_head(sd, params, dropout)
    return sd


def _looks_like_regnet(state_dict: dict) -> bool:
    """RegNet fingerprint: the ``trunk_output.blockS.blockS-B`` stage
    naming, raw (``trunk_output.``) or TorchVisionNet-wrapped
    (``base.1.block1.``). No other torchvision family nests named
    ``blockS-B`` children."""
    return any(
        k.startswith("trunk_output.block") or
        re.match(r"^base\.1\.block\d+\.block\d+-\d+\.", k)
        for k in state_dict
    )


def _flax_tree_is_regnet(params: dict) -> bool:
    """Our RegNet blocks are the only ones with ``a_conv``/``b_conv``/
    ``c_conv`` bottleneck units."""
    return any(
        re.match(r"^layer\d+_\d+$", m) and "a_conv" in params[m]
        for m in params
    )


SUPPORTED_FAMILIES = ("resnet*/resnext*/wide_resnet*, efficientnet_b*, "
                      "efficientnet_v2_*, mobilenet_v3_*, "
                      "vgg11/13/16/19[_bn], alexnet, "
                      "convnext_tiny/small/base/large, "
                      "regnet_x/y_400mf-32gf")


class UnsupportedArchitectureError(ValueError):
    """A ``.pth`` state dict (or network name) from a torchvision family
    this framework does not implement. The reference nominally
    instantiates ANY ``torchvision.models.<name>`` by string
    (``train/network.py:46-48``), but its construction — ``base =
    Sequential(children[:-1])`` followed by flatten into a Linear sized
    from ``children[-1].in_features`` — only actually works for families
    whose global pooling is a CHILD MODULE (resnet/resnext/wide_resnet,
    efficientnet, mobilenet, vgg, alexnet, convnext, regnet).
    densenet-style models pool functionally inside ``forward()``, so the
    reference feeds a (1024*5*5)-dim flatten into a 1024-dim Linear and
    crashes; googlenet crashes it too (the aux classifiers are child
    modules between inception5b and avgpool, so the Sequential pipes
    features through them mid-stream — shape mismatch); mnasnet and
    shufflenet pool with a functional ``x.mean([2, 3])`` and crash the
    same way densenet does; squeezenet's classifier Sequential contains
    no Linear at all, so the wrapper's ``in_features`` lookup dies at
    construction. The families implemented here cover every torchvision
    CONVNET the reference's construction actually runs at its production
    input size; the transformer families are out of scope (ViT's
    functional patch-embed reshape crashes the wrapper's Sequential, and
    nobody deploys Swin through this pipeline's 180px plankton
    contract)."""


def torch_to_flax(network_name: str | None, state_dict: dict) -> dict:
    """Family dispatcher: pick the converter from ``network_name`` when
    given (e.g. "resnet18", "efficientnet_b0"), else sniff the keys.

    Raises :class:`UnsupportedArchitectureError` for anything outside the
    implemented families instead of mis-converting it (e.g. a
    ``densenet121`` checkpoint must not fall through to the resnet
    converter and die with an opaque key error)."""
    if network_name:
        if network_name.startswith("mobilenet_v3"):
            return torch_mobilenet_v3_to_flax(state_dict)
        if network_name.startswith("efficientnet"):
            return torch_efficientnet_to_flax(state_dict)
        if network_name.startswith(("resnet", "resnext", "wide_resnet")):
            return torch_resnet_to_flax(state_dict)
        if network_name.startswith("vgg"):
            return torch_vgg_to_flax(state_dict)
        if network_name == "alexnet":
            return torch_alexnet_to_flax(state_dict)
        if network_name.startswith("convnext"):
            return torch_convnext_to_flax(state_dict)
        if network_name.startswith("regnet"):
            return torch_regnet_to_flax(state_dict)
        raise UnsupportedArchitectureError(
            f"Network '{network_name}' is not supported; "
            f"supported families: {SUPPORTED_FAMILIES}"
        )
    if _looks_like_regnet(state_dict):
        return torch_regnet_to_flax(state_dict)
    if _looks_like_convnext(state_dict):
        return torch_convnext_to_flax(state_dict)
    if _looks_like_mobilenet_v3(state_dict):
        return torch_mobilenet_v3_to_flax(state_dict)
    if _looks_like_efficientnet(state_dict):
        return torch_efficientnet_to_flax(state_dict)
    if _looks_like_alexnet(state_dict):
        return torch_alexnet_to_flax(state_dict)
    if _looks_like_vgg(state_dict):
        return torch_vgg_to_flax(state_dict)
    if _looks_like_resnet(state_dict):
        return torch_resnet_to_flax(state_dict)
    raise UnsupportedArchitectureError(
        "State dict matches none of the supported architecture families "
        f"({SUPPORTED_FAMILIES}); example keys: "
        f"{sorted(state_dict)[:3]}"
    )


def load_pth(path, network_name: str | None = None) -> dict:
    """Load a ``.pth`` state dict (CPU) -> flax variables (family
    auto-detected from the keys unless ``network_name`` is given)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return torch_to_flax(network_name, state_dict)


# ---------------------------------------------------------------------------
# Reverse direction: our Flax checkpoints -> reference-loadable .pth
# ---------------------------------------------------------------------------

def _head_linear_indices(n_linears: int, dropout=()) -> list[int]:
    """torch Sequential index of each head Linear after the reference's
    Dropout insertions (``network.py:58-61``: Dropouts are list.insert()ed
    at the spec's indices, shifting later Linears)."""
    layers = [("L", i) for i in range(n_linears)]
    for idx, _p in dropout:
        layers.insert(int(idx), ("D", None))
    return [pos for pos, (kind, i) in enumerate(layers) if kind == "L"]


def flax_resnet_to_torch(variables: dict, dropout=()) -> dict:
    """Our ResNet variable tree -> a reference ``TorchVisionNet`` state
    dict (``base.N.*`` / ``head.K.*`` naming), so models trained HERE load
    straight into the original torch pipeline. ``dropout`` must be the
    model dir's ``[model] dropout`` spec — it determines the head's torch
    Sequential indices."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    inv_children = {v: k for k, v in _BASE_CHILDREN.items()}
    sd: dict = {}

    def put(key, arr):
        _sd_put(sd, key, arr)

    def put_bn(prefix, p_tree, s_tree):
        _sd_put_bn(sd, prefix, p_tree, s_tree)

    put(f"base.{inv_children['conv1']}.weight",
        np.asarray(params["conv1"]["kernel"]).transpose(3, 2, 0, 1))
    put_bn(f"base.{inv_children['bn1']}", params["bn1"], stats["bn1"])
    for mod, tree in params.items():
        if not mod.startswith("layer"):
            continue
        stage, block = mod.split("_")
        base_idx = inv_children[stage]
        prefix = f"base.{base_idx}.{block}"
        for sub, leaf in tree.items():
            if sub.startswith("conv"):
                put(f"{prefix}.{sub}.weight",
                    np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1))
            elif sub.startswith("bn"):
                put_bn(f"{prefix}.{sub}", leaf, stats[mod][sub])
            elif sub == "downsample_conv":
                put(f"{prefix}.downsample.0.weight",
                    np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1))
            elif sub == "downsample_bn":
                put_bn(f"{prefix}.downsample.1", leaf, stats[mod][sub])
            else:
                raise KeyError(f"Unhandled module {mod}.{sub}")

    _sd_put_head(sd, params, dropout)
    return sd


def flax_efficientnet_to_torch(variables: dict, dropout=()) -> dict:
    """Our EfficientNet variable tree -> a reference ``TorchVisionNet``
    state dict. Inverse of :func:`torch_efficientnet_to_flax`: torchvision
    wraps the whole ``features`` stack as ``base.0`` (children[:-1] =
    [features, avgpool]), so every conv/bn key lands under ``base.0.*``;
    the MLP head Linears use the same Dropout-shifted Sequential indices
    as the ResNet exporter."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    def put_conv(key, tree):
        _sd_put_conv(sd, key, tree)

    def put_bn(prefix, p_tree, s_tree):
        _sd_put_bn(sd, prefix, p_tree, s_tree)

    stages = sorted(
        {int(m.group(1)) for mod in params
         if (m := re.match(r"^layer(\d+)_", mod))}
    )
    if "stem_conv" not in params or not stages:
        raise KeyError("variable tree is not an EfficientNet "
                       "(no stem_conv/layerG_R modules)")
    last_fid = stages[-1] + 1  # features.{last} is the 1x1 head conv+bn

    put_conv("base.0.0.0.weight", params["stem_conv"])
    put_bn("base.0.0.1", params["stem_bn"], stats["stem_bn"])
    put_conv(f"base.0.{last_fid}.0.weight", params["head_conv"])
    put_bn(f"base.0.{last_fid}.1", params["head_bn"], stats["head_bn"])

    for mod, tree in params.items():
        m = re.match(r"^layer(\d+)_(\d+)$", mod)
        if not m:
            continue
        fid, block_r = m.groups()
        _sd_put_block(sd, f"base.0.{fid}.{block_r}", tree, stats[mod])

    _sd_put_head(sd, params, dropout)
    return sd


def flax_mobilenet_v3_to_torch(variables: dict, dropout=()) -> dict:
    """Our MobileNetV3 variable tree -> a reference ``TorchVisionNet``
    state dict (``base.0.*`` = features). Inverse of
    :func:`torch_mobilenet_v3_to_flax`; block sub-indices follow the
    torchvision unit order [expand] dw [se] project."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    def put_conv(key, tree):
        _sd_put_conv(sd, key, tree)

    def put_bn(prefix, p_tree, s_tree):
        _sd_put_bn(sd, prefix, p_tree, s_tree)

    blocks = sorted(
        {int(m.group(1)) for mod in params
         if (m := re.match(r"^layer(\d+)_0$", mod))}
    )
    if "stem_conv" not in params or not blocks:
        raise KeyError("variable tree is not a MobileNetV3")
    last_fid = blocks[-1] + 1

    put_conv("base.0.0.0.weight", params["stem_conv"])
    put_bn("base.0.0.1", params["stem_bn"], stats["stem_bn"])
    put_conv(f"base.0.{last_fid}.0.weight", params["head_conv"])
    put_bn(f"base.0.{last_fid}.1", params["head_bn"], stats["head_bn"])

    for fid in blocks:
        mod = f"layer{fid}_0"
        _sd_put_block(sd, f"base.0.{fid}", params[mod], stats[mod])

    _sd_put_head(sd, params, dropout)
    return sd


def _flax_tree_is_mobilenet_v3(params: dict) -> bool:
    """Our MobileNetV3 trees always have single-repeat ``layerN_0``
    modules and at least one block WITHOUT squeeze-excitation (both V3
    configs include SE-free blocks; EfficientNet blocks all carry SE)."""
    mods = [m for m in params if re.match(r"^layer\d+_\d+$", m)]
    if not mods or any(not m.endswith("_0") for m in mods):
        return False
    return any("se" not in params[m] for m in mods)


def flax_to_torch(variables: dict, dropout=(),
                  network_name: str | None = None) -> dict:
    """Family dispatcher for the reverse direction (``network_name`` from
    the model dir's config wins; otherwise the tree is sniffed)."""
    params = variables.get("params", {})
    if network_name and network_name.startswith("mobilenet_v3"):
        return flax_mobilenet_v3_to_torch(variables, dropout)
    if network_name and network_name.startswith("efficientnet"):
        return flax_efficientnet_to_torch(variables, dropout)
    if network_name and network_name.startswith(
            ("resnet", "resnext", "wide_resnet")):
        return flax_resnet_to_torch(variables, dropout)
    if network_name and network_name.startswith("vgg"):
        return flax_vgg_to_torch(variables, dropout)
    if network_name == "alexnet":
        return flax_alexnet_to_torch(variables, dropout)
    if network_name and network_name.startswith("convnext"):
        return flax_convnext_to_torch(variables, dropout)
    if network_name and network_name.startswith("regnet"):
        return flax_regnet_to_torch(variables, dropout)
    if "stem_ln" in params:  # ConvNeXt (before the MBConv stem_conv check)
        return flax_convnext_to_torch(variables, dropout)
    if _flax_tree_is_regnet(params):  # before the MBConv stem_conv check
        return flax_regnet_to_torch(variables, dropout)
    if "conv1" in params:
        return flax_resnet_to_torch(variables, dropout)
    if any(re.match(r"^layer\d+_conv\d+$", m) for m in params):
        # AlexNet and VGG share the layerS_convJ naming; the conv census
        # separates them (5 vs 13/16)
        n_convs = sum(bool(re.match(r"^layer\d+_conv\d+$", m))
                      for m in params)
        if n_convs == 5:
            return flax_alexnet_to_torch(variables, dropout)
        return flax_vgg_to_torch(variables, dropout)
    if "stem_conv" in params:
        if _flax_tree_is_mobilenet_v3(params):
            return flax_mobilenet_v3_to_torch(variables, dropout)
        return flax_efficientnet_to_torch(variables, dropout)
    raise KeyError(
        "cannot export: variable tree is not a ResNet (conv1), "
        "EfficientNet or MobileNetV3 (stem_conv), or VGG (layerS_convJ); "
        f"top-level modules: {sorted(params)[:8]}"
    )


def save_pth(variables: dict, path, dropout=(),
             network_name: str | None = None) -> None:
    """Write a reference-loadable ``best_state.pth`` from our variables."""
    import torch

    torch.save(flax_to_torch(variables, dropout, network_name), str(path))
