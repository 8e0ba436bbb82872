"""Flax ConvNeXt backbones (convnext_tiny / convnext_small) + MLP head.

Sixth model family the reference can genuinely instantiate by string
(``sykepic/train/network.py:46-64``): torchvision's ConvNeXt children are
``[features, avgpool, classifier]`` and the classifier's first Linear sits
inside a Sequential, which the reference's in_features sniff handles — so
``base = children[:-1]`` flattens a (C,1,1) pooled map into a C-wide head
and actually runs (unlike densenet, see
``convert_torch.UnsupportedArchitectureError``).

A consequence reproduced deliberately: torchvision puts ConvNeXt's FINAL
LayerNorm inside ``classifier[0]``, which ``children[:-1]`` drops — the
reference feeds the head *un-normalized* pooled features. We match that
(no final norm before the head), so converted checkpoints agree exactly.

TPU notes: ConvNeXt is the most MXU-friendly family here — each block is
a 7x7 depthwise conv (cheap, VPU/fused) followed by two dim<->4*dim
matmuls that tile perfectly; LayerNorm avoids the BatchNorm class-purity
hazard entirely (no cross-sample statistics), and the wide layer4 MLPs
ride the tensor-parallel wide-kernel patterns (``parallel``).

Parity notes:

- Stem: 4x4/4 VALID conv + LayerNorm(eps=1e-6); stage transitions are
  LayerNorm + 2x2/2 conv (torchvision order: norm BEFORE the conv).
- Block (torchvision ``CNBlock``): depthwise 7x7 pad 3 (bias) ->
  LayerNorm -> Linear 4x expand -> GELU (exact erf form, torch
  ``nn.GELU`` default — flax's default is the tanh approximation) ->
  Linear project -> per-channel ``layer_scale`` (init 1e-6) -> row-mode
  stochastic depth, residual add.
- Stochastic depth probability ramps linearly over the block index,
  ``p = sd_prob * block_id / (total - 1)`` (torchvision), train only.
- Stage names ``layer1..layer4`` (downsamples belong to the stage they
  feed) give the trainer's gradual-unfreeze grouping the same "last
  stage" split as ResNet.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import Head

# name -> (dims per stage, blocks per stage, stochastic depth prob)
CONVNEXT_CFGS: dict[str, tuple] = {
    "convnext_tiny": ((96, 192, 384, 768), (3, 3, 9, 3), 0.1),
    "convnext_small": ((96, 192, 384, 768), (3, 3, 27, 3), 0.4),
    "convnext_base": ((128, 256, 512, 1024), (3, 3, 27, 3), 0.5),
    "convnext_large": ((192, 384, 768, 1536), (3, 3, 27, 3), 0.5),
}

_LN = dict(epsilon=1e-6, use_bias=True, use_scale=True)


class CNBlock(nn.Module):
    """torchvision ``CNBlock``: dw7x7 -> LN -> 4x MLP -> layer_scale ->
    stochastic depth -> residual."""

    dim: int
    sd_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.dim, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(**_LN, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default: erf
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(y)
        scale = self.param(
            "layer_scale", nn.initializers.constant(1e-6), (self.dim,)
        )
        y = y * scale.astype(y.dtype)
        if train and self.sd_prob > 0:
            # row-mode stochastic depth (torchvision StochasticDepth):
            # drop the whole residual per sample, rescale survivors
            keep = 1.0 - self.sd_prob
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
            y = y * (mask.astype(y.dtype) / keep)
        return x + y


class ConvNeXt(nn.Module):
    """ConvNeXt backbone + MLP head (reference ``TorchVisionNet``
    equivalent)."""

    dims: Sequence[int]
    blocks: Sequence[int]
    sd_prob: float
    num_classes: int
    head: Sequence[int] = (256, 128)
    dropout: Sequence[tuple[int, float]] = ()
    last_activation: str | None = None
    dtype: Any = jnp.float32

    # Below 32px (4x stem * three 2x2/2 downsamples) a downsample conv
    # runs on a 1x1 map and empties it (torch errors there; silently
    # convolving would NaN the global pool).
    MIN_INPUT = 32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        if x.shape[1] < self.MIN_INPUT or x.shape[2] < self.MIN_INPUT:
            raise ValueError(
                f"convnext needs inputs of at least {self.MIN_INPUT}x"
                f"{self.MIN_INPUT} (got {x.shape[1]}x{x.shape[2]}): the "
                "stem and downsample strides empty the feature map below "
                "that — raise [image] shape in the training INI"
            )
        x = nn.Conv(
            self.dims[0], (4, 4), (4, 4), padding="VALID",
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.LayerNorm(**_LN, dtype=self.dtype, name="stem_ln")(x)
        total = sum(self.blocks)
        block_id = 0
        for i, (dim, n) in enumerate(zip(self.dims, self.blocks)):
            if i > 0:
                x = nn.LayerNorm(
                    **_LN, dtype=self.dtype, name=f"layer{i + 1}_down_norm"
                )(x)
                x = nn.Conv(
                    dim, (2, 2), (2, 2), padding="VALID",
                    dtype=self.dtype, name=f"layer{i + 1}_down_conv",
                )(x)
            for j in range(n):
                p = self.sd_prob * block_id / max(total - 1, 1)
                x = CNBlock(
                    dim=dim, sd_prob=p, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
                block_id += 1
        # reference base = [features, avgpool]: pooled features reach the
        # head WITHOUT torchvision's classifier[0] LayerNorm (dropped by
        # children[:-1]) — see module docstring
        x = jnp.mean(x, axis=(1, 2))
        if features_only:
            return x
        x = Head(
            sizes=self.head, num_classes=self.num_classes,
            dropout=self.dropout, dtype=self.dtype, name="head",
        )(x, train=train)
        if self.last_activation:
            x = getattr(nn, self.last_activation)(x)
        return x


def convnext_tiny(**kw) -> ConvNeXt:
    dims, blocks, sd = CONVNEXT_CFGS["convnext_tiny"]
    return ConvNeXt(dims=dims, blocks=blocks, sd_prob=sd, **kw)


def convnext_small(**kw) -> ConvNeXt:
    dims, blocks, sd = CONVNEXT_CFGS["convnext_small"]
    return ConvNeXt(dims=dims, blocks=blocks, sd_prob=sd, **kw)


def convnext_base(**kw) -> ConvNeXt:
    dims, blocks, sd = CONVNEXT_CFGS["convnext_base"]
    return ConvNeXt(dims=dims, blocks=blocks, sd_prob=sd, **kw)


def convnext_large(**kw) -> ConvNeXt:
    dims, blocks, sd = CONVNEXT_CFGS["convnext_large"]
    return ConvNeXt(dims=dims, blocks=blocks, sd_prob=sd, **kw)


def torch_feature_layout(name: str):
    """(torch ``features`` index, kind, stage, block) rows describing
    torchvision's ConvNeXt features Sequential — the single source of
    truth both converters use. Layout: [stem, stage1, down, stage2,
    down, stage3, down, stage4]."""
    _, blocks, _ = CONVNEXT_CFGS[name]
    rows = [(0, "stem", 0, 0)]
    fi = 1
    for i, n in enumerate(blocks):
        if i > 0:
            rows.append((fi, "down", i + 1, 0))
            fi += 1
        for j in range(n):
            rows.append((fi, "stage", i + 1, j))
        fi += 1
    return rows
