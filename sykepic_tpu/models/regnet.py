"""Flax RegNet family (torchvision ``regnet_x/y_*``-compatible topology)
— the last torchvision classifier family the reference's construction
actually runs.

The reference instantiates any ``torchvision.models.<name>`` by string and
wraps ``children()[:-1]`` as the base (``sykepic/train/network.py:46-64``).
That construction only works when global pooling is a child module; RegNet
qualifies (children = [stem, trunk_output, avgpool, fc]), so a config naming
``regnet_y_400mf`` runs in the reference — unlike densenet/googlenet, which
crash it (see ``convert_torch.UnsupportedArchitectureError``). This module
closes that final runnable-surface gap.

Topology follows torchvision's RegNet (``torchvision/models/regnet.py``):
a 3x3/2 stem into four stages of ResBottleneckBlocks, each stage
downsampling by 2 in its first block; every block is a 1x1 -> grouped 3x3
-> [SE] -> 1x1 bottleneck with bottleneck_multiplier 1.0, plus a projected
residual where shape changes. The Y variants add squeeze-excitation with
``squeeze = round(0.25 * block_input_width)``. Per-stage (depth, width)
tables below are the quantized-linear-parameterization outputs published
for each variant (Radosavovic et al., "Designing Network Design Spaces",
pycls model zoo; torchvision reproduces them).

Gradual-unfreeze grouping: stages are named ``layer1..layer4`` so the
trainer's LR groups treat ``layer4`` as the reference's "last backbone
part" (the role ResNet's layer4 plays), consistent with the other
wrapped-features families.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import Head

# name -> (per-stage depths, per-stage widths, group_width, se_ratio).
# group_width is a scalar, or a per-stage tuple where torchvision's
# compatibility pass clamps a stage (group width = min(g, stage width):
# regnet_x_8gf's first stage is 80 wide against g=120).
#
# Stage plans are the quantized-linear-parameterization outputs of each
# variant's published (depth, w_0, w_a, w_m, group_width) inits
# (torchvision ``BlockParams.from_init_params``: widths w_0 + w_a*j
# snapped to powers of w_m, quantized to multiples of 8, grouped into
# stages where the width changes, then rounded to the group width with
# round-half-up ``_make_divisible``). The generator was validated by
# reproducing all four *_400mf/800mf tables exactly before deriving the
# larger variants.
REGNET_CFGS = {
    "regnet_x_400mf": ((1, 2, 7, 12), (32, 64, 160, 400), 16, 0.0),
    "regnet_x_800mf": ((1, 3, 7, 5), (64, 128, 288, 672), 16, 0.0),
    "regnet_x_1_6gf": ((2, 4, 10, 2), (72, 168, 408, 912), 24, 0.0),
    "regnet_x_3_2gf": ((2, 6, 15, 2), (96, 192, 432, 1008), 48, 0.0),
    "regnet_x_8gf": ((2, 5, 15, 1), (80, 240, 720, 1920),
                     (80, 120, 120, 120), 0.0),
    "regnet_x_16gf": ((2, 6, 13, 1), (256, 512, 896, 2048), 128, 0.0),
    "regnet_x_32gf": ((2, 7, 13, 1), (336, 672, 1344, 2520), 168, 0.0),
    "regnet_y_400mf": ((1, 3, 6, 6), (48, 104, 208, 440), 8, 0.25),
    "regnet_y_800mf": ((1, 3, 8, 2), (64, 144, 320, 784), 16, 0.25),
    "regnet_y_1_6gf": ((2, 6, 17, 2), (48, 120, 336, 888), 24, 0.25),
    "regnet_y_3_2gf": ((2, 5, 13, 1), (72, 216, 576, 1512), 24, 0.25),
    "regnet_y_8gf": ((2, 4, 10, 1), (224, 448, 896, 2016), 56, 0.25),
    "regnet_y_16gf": ((2, 4, 11, 1), (224, 448, 1232, 3024), 112, 0.25),
    "regnet_y_32gf": ((2, 5, 12, 1), (232, 696, 1392, 3712), 232, 0.25),
}

STEM_WIDTH = 32  # torchvision uses stem width 32 for every variant


class SqueezeExcite(nn.Module):
    """torchvision ``ops.SqueezeExcitation`` with ReLU (RegNet passes its
    network activation): global-avg -> fc1 1x1 -> relu -> fc2 1x1 ->
    sigmoid gate. Both 1x1 convs carry biases."""

    channels: int
    squeeze: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class ResBottleneckBlock(nn.Module):
    """torchvision ``ResBottleneckBlock``: f = 1x1 (a) -> grouped 3x3,
    stride here (b) -> [se] -> 1x1, no activation (c); out = relu(x + f)
    with a 1x1-conv+BN projection when shape changes."""

    in_ch: int
    out_ch: int
    stride: int
    group_width: int
    se_ratio: float = 0.0
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
        # bottleneck_multiplier is 1.0 for every published variant
        w_b = self.out_ch
        groups = w_b // self.group_width
        shortcut = x
        if self.in_ch != self.out_ch or self.stride != 1:
            shortcut = nn.Conv(
                self.out_ch, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="proj_conv")(x)
            shortcut = norm(name="proj_bn")(shortcut)
        y = nn.Conv(w_b, (1, 1), use_bias=False, dtype=self.dtype,
                    name="a_conv")(x)
        y = norm(name="a_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(
            w_b, (3, 3), (self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            feature_group_count=groups,
            use_bias=False, dtype=self.dtype, name="b_conv")(y)
        y = norm(name="b_bn")(y)
        y = nn.relu(y)
        if self.se_ratio:
            # squeeze width is computed from the BLOCK'S INPUT width, not
            # the bottleneck width (torchvision BottleneckTransform:
            # width_se_out = round(se_ratio * width_in))
            y = SqueezeExcite(
                w_b, max(1, int(round(self.se_ratio * self.in_ch))),
                dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c_conv")(y)
        y = norm(name="c_bn")(y)
        return nn.relu(shortcut + y)


class RegNet(nn.Module):
    """RegNet backbone + the shared MLP :class:`Head`."""

    num_classes: int
    depths: Sequence[int]
    widths: Sequence[int]
    group_width: int | Sequence[int]
    se_ratio: float = 0.0
    head: Sequence[int] = (256, 128)
    dropout: Sequence = ()
    last_activation: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = nn.Conv(STEM_WIDTH, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        in_ch = STEM_WIDTH
        for si, (depth, width) in enumerate(zip(self.depths, self.widths)):
            gw = (self.group_width[si]
                  if isinstance(self.group_width, (tuple, list))
                  else self.group_width)
            for b in range(depth):
                x = ResBottleneckBlock(
                    in_ch=in_ch,
                    out_ch=width,
                    # every stage downsamples in its first block (the stem
                    # plus 4 stage strides = /32 total)
                    stride=2 if b == 0 else 1,
                    group_width=gw,
                    se_ratio=self.se_ratio,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_{b}",
                )(x, train=train)
                in_ch = width
        x = jnp.mean(x, axis=(1, 2))
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


def _regnet(name: str, **kw) -> RegNet:
    depths, widths, group_width, se_ratio = REGNET_CFGS[name]
    return RegNet(depths=depths, widths=widths, group_width=group_width,
                  se_ratio=se_ratio, **kw)


def regnet_x_400mf(**kw) -> RegNet:
    return _regnet("regnet_x_400mf", **kw)


def regnet_x_800mf(**kw) -> RegNet:
    return _regnet("regnet_x_800mf", **kw)


def regnet_y_400mf(**kw) -> RegNet:
    return _regnet("regnet_y_400mf", **kw)


def regnet_y_800mf(**kw) -> RegNet:
    return _regnet("regnet_y_800mf", **kw)


def regnet_x_1_6gf(**kw) -> RegNet:
    return _regnet("regnet_x_1_6gf", **kw)


def regnet_x_3_2gf(**kw) -> RegNet:
    return _regnet("regnet_x_3_2gf", **kw)


def regnet_x_8gf(**kw) -> RegNet:
    return _regnet("regnet_x_8gf", **kw)


def regnet_x_16gf(**kw) -> RegNet:
    return _regnet("regnet_x_16gf", **kw)


def regnet_x_32gf(**kw) -> RegNet:
    return _regnet("regnet_x_32gf", **kw)


def regnet_y_1_6gf(**kw) -> RegNet:
    return _regnet("regnet_y_1_6gf", **kw)


def regnet_y_3_2gf(**kw) -> RegNet:
    return _regnet("regnet_y_3_2gf", **kw)


def regnet_y_8gf(**kw) -> RegNet:
    return _regnet("regnet_y_8gf", **kw)


def regnet_y_16gf(**kw) -> RegNet:
    return _regnet("regnet_y_16gf", **kw)


def regnet_y_32gf(**kw) -> RegNet:
    return _regnet("regnet_y_32gf", **kw)
