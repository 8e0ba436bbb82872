"""Flax EfficientNet family (torchvision ``efficientnet_b0``-``b7``
compatible topology) — widens the model registry beyond ResNets.

The reference's ``TorchVisionNet`` nominally accepts any torchvision model
name (``sykepic/train/network.py:48``: ``getattr(models, name)(...)``; its
example config even names ``efficientnet_b0``), though only ResNets were
used in production. This implementation follows the torchvision topology
(MBConv with expansion, depthwise conv, squeeze-excitation, SiLU,
stochastic-depth-free eval path) so the same ``base`` + MLP ``head``
contract and the gradual-unfreeze grouping apply: the last stage
(``layer-group 7``+) plays the role of ResNet's ``layer4`` for LR group 1.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import Head

# (expand_ratio, channels, repeats, stride, kernel)  -- EfficientNet-B0
B0_CONFIG = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# V2 configs carry a leading block kind ("fused" = FusedMBConv, "mb" =
# MBConv): (kind, expand, channels, repeats, stride, kernel). Tables are
# torchvision's ``_efficientnet_conf("efficientnet_v2_*")`` stage plans
# (Tan & Le, "EfficientNetV2: Smaller Models and Faster Training"). All
# V2 variants use BatchNorm eps 1e-3 (torchvision passes
# ``partial(BatchNorm2d, eps=1e-03)``) where V1 keeps the 1e-5 default.
V2_S_CONFIG = (
    ("fused", 1, 24, 2, 1, 3),
    ("fused", 4, 48, 4, 2, 3),
    ("fused", 4, 64, 4, 2, 3),
    ("mb", 4, 128, 6, 2, 3),
    ("mb", 6, 160, 9, 1, 3),
    ("mb", 6, 256, 15, 2, 3),
)
V2_M_CONFIG = (
    ("fused", 1, 24, 3, 1, 3),
    ("fused", 4, 48, 5, 2, 3),
    ("fused", 4, 80, 5, 2, 3),
    ("mb", 4, 160, 7, 2, 3),
    ("mb", 6, 176, 14, 1, 3),
    ("mb", 6, 304, 18, 2, 3),
    ("mb", 6, 512, 5, 1, 3),
)
V2_L_CONFIG = (
    ("fused", 1, 32, 4, 1, 3),
    ("fused", 4, 64, 7, 2, 3),
    ("fused", 4, 96, 7, 2, 3),
    ("mb", 4, 192, 10, 2, 3),
    ("mb", 6, 224, 19, 1, 3),
    ("mb", 6, 384, 25, 2, 3),
    ("mb", 6, 640, 7, 1, 3),
)


class SqueezeExcite(nn.Module):
    channels: int
    squeeze: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=self.bn_eps,
            dtype=self.dtype,
        )
        mid = self.in_ch * self.expand
        residual = x
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = norm(name="expand_bn")(y)
            y = nn.silu(y)
        pad = self.kernel // 2
        y = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
            name="dw_conv",
        )(y)
        y = norm(name="dw_bn")(y)
        y = nn.silu(y)
        y = SqueezeExcite(mid, max(1, self.in_ch // 4), dtype=self.dtype,
                          name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = norm(name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + residual
        return y


class FusedMBConv(nn.Module):
    """EfficientNetV2's fused block (torchvision ``FusedMBConv``): the
    expand 1x1 + depthwise 3x3 pair collapses into ONE dense kxk conv —
    a deliberately MXU-friendlier block for early high-resolution stages
    — followed by a 1x1 projection without activation. No
    squeeze-excitation. With expand == 1 the single kxk conv maps
    straight to out_ch and keeps its activation."""

    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    dtype: Any = jnp.float32
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=self.bn_eps,
            dtype=self.dtype,
        )
        residual = x
        pad = self.kernel // 2
        mid = self.in_ch * self.expand if self.expand != 1 else self.out_ch
        y = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            name="fused_conv",
        )(x)
        y = norm(name="fused_bn")(y)
        y = nn.silu(y)
        if self.expand != 1:
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, name="project_conv")(y)
            y = norm(name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + residual
        return y


class EfficientNet(nn.Module):
    """EfficientNet backbone + the shared MLP :class:`Head`.

    ``config`` rows are either V1 5-tuples ``(expand, channels, repeats,
    stride, kernel)`` (always MBConv) or V2 6-tuples with a leading block
    kind (``"fused"``/``"mb"``). ``bn_eps`` applies to every BatchNorm in
    the network (1e-5 for V1, 1e-3 for V2, matching torchvision)."""

    num_classes: int
    config: Sequence = B0_CONFIG
    stem_ch: int = 32
    head_ch: int = 1280
    head: Sequence[int] = (256, 128)
    dropout: Sequence = ()
    last_activation: str | None = None
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=self.bn_eps,
            dtype=self.dtype,
        )
        x = nn.Conv(self.stem_ch, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.silu(x)
        in_ch = self.stem_ch
        for gi, entry in enumerate(self.config):
            if len(entry) == 6:
                kind, expand, out_ch, repeats, stride, kernel = entry
            else:
                kind = "mb"
                expand, out_ch, repeats, stride, kernel = entry
            block_cls = FusedMBConv if kind == "fused" else MBConv
            for r in range(repeats):
                x = block_cls(
                    in_ch=in_ch,
                    out_ch=out_ch,
                    expand=expand,
                    stride=stride if r == 0 else 1,
                    kernel=kernel,
                    dtype=self.dtype,
                    bn_eps=self.bn_eps,
                    # layer-group naming keeps the trainer's stage labeling
                    # meaningful (last groups ~ ResNet layer4)
                    name=f"layer{gi + 1}_{r}",
                )(x, train=train)
                in_ch = out_ch
        x = nn.Conv(self.head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.silu(x)
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


def efficientnet_b0(**kw) -> EfficientNet:
    return EfficientNet(**kw)


def _round_filters(channels: float, width: float) -> int:
    """EfficientNet compound-scaling channel rounding (multiples of 8,
    never dropping below 90% of the scaled value — the torchvision /
    original-paper rule, so scaled variants stay checkpoint-compatible)."""
    channels *= width
    new = max(8, (int(channels + 4) // 8) * 8)
    if new < 0.9 * channels:
        new += 8
    return int(new)


def _round_repeats(repeats: int, depth: float) -> int:
    import math

    return int(math.ceil(repeats * depth))


def _scaled_config(width: float, depth: float):
    return tuple(
        (e, _round_filters(c, width), _round_repeats(r, depth), s, k)
        for e, c, r, s, k in B0_CONFIG
    )


def _scaled_efficientnet(width: float, depth: float, **kw) -> EfficientNet:
    return EfficientNet(
        config=_scaled_config(width, depth),
        stem_ch=_round_filters(32, width),
        head_ch=_round_filters(1280, width),
        **kw,
    )


def efficientnet_b1(**kw) -> EfficientNet:
    return _scaled_efficientnet(1.0, 1.1, **kw)


def efficientnet_b2(**kw) -> EfficientNet:
    return _scaled_efficientnet(1.1, 1.2, **kw)


def efficientnet_b3(**kw) -> EfficientNet:
    return _scaled_efficientnet(1.2, 1.4, **kw)


def efficientnet_b4(**kw) -> EfficientNet:
    return _scaled_efficientnet(1.4, 1.8, **kw)


def efficientnet_b5(**kw) -> EfficientNet:
    return _scaled_efficientnet(1.6, 2.2, **kw)


def efficientnet_b6(**kw) -> EfficientNet:
    return _scaled_efficientnet(1.8, 2.6, **kw)


def efficientnet_b7(**kw) -> EfficientNet:
    return _scaled_efficientnet(2.0, 3.1, **kw)


def _v2(config, **kw) -> EfficientNet:
    # torchvision: stem channels = first stage's input channels; the final
    # 1x1 conv widens to 1280 for every V2 variant; all BN use eps 1e-3.
    return EfficientNet(
        config=config,
        stem_ch=config[0][2],
        head_ch=1280,
        bn_eps=1e-3,
        **kw,
    )


def efficientnet_v2_s(**kw) -> EfficientNet:
    return _v2(V2_S_CONFIG, **kw)


def efficientnet_v2_m(**kw) -> EfficientNet:
    return _v2(V2_M_CONFIG, **kw)


def efficientnet_v2_l(**kw) -> EfficientNet:
    return _v2(V2_L_CONFIG, **kw)
