"""Flax ResNet backbones + configurable MLP head (TPU-native model family).

Numerics-parity notes against the reference model
(``sykepic/train/network.py:11-72`` builds ``base = torchvision resnet minus
fc`` + ``head = stacked Linear layers``):

- NHWC layout (TPU conv native); weights convertible from torch NCHW/OIHW via
  :mod:`sykepic_tpu.models.convert_torch`.
- Explicit symmetric padding everywhere (torch semantics). Flax/XLA "SAME"
  pads asymmetrically for even inputs under stride 2 and would NOT match
  torchvision.
- BatchNorm eps 1e-5, running-average momentum 0.9 (flax convention; equals
  torch ``momentum=0.1``).
- The classification head is *literally* stacked ``Linear`` layers with no
  activations in between, with optional Dropout layers spliced in by index
  using Python ``list.insert`` semantics (reference ``network.py:56-63``).
- Optional ``last_activation`` (softmax / log_softmax), reference
  ``network.py:66-72``.

The ``base`` / ``head`` split and the base sub-structure (``layer4`` +
pooling as the "last sequential part") are preserved because the gradual
unfreezing schedule addresses them (reference ``network.py:98-130``:
``base[-2:]`` then ``base[:-2]``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class BasicBlock(nn.Module):
    """ResNet-18/34 basic block (two 3x3 convs)."""

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(
            self.filters,
            (3, 3),
            (self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            name="conv1",
        )(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = conv(
                self.filters,
                (1, 1),
                (self.strides, self.strides),
                name="downsample_conv",
            )(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet-50/101/152 bottleneck block (1x1 -> 3x3 -> 1x1, expansion 4).

    ``groups`` / ``base_width`` parameterize the ResNeXt and Wide-ResNet
    variants exactly as torchvision's ``Bottleneck`` does: the inner width
    is ``filters * base_width/64 * groups`` and the 3x3 conv is grouped.
    A grouped conv is a block-diagonal contraction — XLA tiles each group
    onto the MXU independently, so no custom kernel is needed.
    """

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        residual = x
        y = conv(width, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(
            width,
            (3, 3),
            (self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.groups,
            name="conv2",
        )(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = conv(
                self.filters * self.expansion,
                (1, 1),
                (self.strides, self.strides),
                name="downsample_conv",
            )(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Head(nn.Module):
    """Stacked-Linear classification head with index-spliced Dropout.

    Mirrors reference ``network.py:56-63``: ``sizes`` lists the hidden layer
    widths, the final ``num_classes`` layer is appended, and each
    ``(idx, p)`` in ``dropout`` is inserted into the layer list with Python
    ``list.insert`` semantics (so negative indices count from the end).
    """

    sizes: Sequence[int]
    num_classes: int
    dropout: Sequence[tuple[int, float]] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = list(self.sizes) + [self.num_classes]
        layers: list = [("dense", i, w) for i, w in enumerate(widths)]
        for idx, p in self.dropout:
            layers.insert(idx, ("dropout", None, p))
        for kind, i, v in layers:
            if kind == "dense":
                x = nn.Dense(v, dtype=self.dtype, name=f"fc{i}")(x)
            else:
                x = nn.Dropout(rate=v, deterministic=not train)(x)
        return x


class ResNet(nn.Module):
    """ResNet backbone + MLP head (reference ``TorchVisionNet`` equivalent).

    Structure: conv7x7/2 -> bn -> relu -> maxpool3x3/2 -> 4 stages ->
    global average pool -> head. Stage/block names are chosen so the
    torchvision state-dict converter is a pure renaming.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int
    head: Sequence[int] = (256, 128)
    dropout: Sequence[tuple[int, float]] = ()
    last_activation: str | None = None
    num_filters: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        x = nn.Conv(
            self.num_filters,
            (7, 7),
            (2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): explicit -inf padding
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool (AdaptiveAvgPool2d(1))
        if features_only:
            return x
        x = Head(
            sizes=self.head,
            num_classes=self.num_classes,
            dropout=self.dropout,
            dtype=self.dtype,
            name="head",
        )(x, train=train)
        if self.last_activation:
            x = getattr(nn, self.last_activation)(x)
        return x


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck, **kw)


# ResNeXt / Wide-ResNet: torchvision builds these from the same Bottleneck
# with (groups, width_per_group) overrides, so their state dicts carry
# byte-identical key names to resnet50/101 and both converters apply
# unchanged (a grouped torch weight (O, I/g, kH, kW) transposes to flax's
# grouped kernel (kH, kW, I/g, O) exactly like an ungrouped one).

def resnext50_32x4d(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3),
                  block_cls=partial(Bottleneck, groups=32, base_width=4),
                  **kw)


def resnext101_32x8d(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3),
                  block_cls=partial(Bottleneck, groups=32, base_width=8),
                  **kw)


def resnext101_64x4d(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3),
                  block_cls=partial(Bottleneck, groups=64, base_width=4),
                  **kw)


def wide_resnet50_2(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3),
                  block_cls=partial(Bottleneck, base_width=128), **kw)


def wide_resnet101_2(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3),
                  block_cls=partial(Bottleneck, base_width=128), **kw)
