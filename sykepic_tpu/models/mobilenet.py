"""Flax MobileNetV3 family (torchvision ``mobilenet_v3_large/small``
-compatible topology) — the third backbone family of the registry.

The reference's ``TorchVisionNet`` accepts any torchvision name
(``sykepic/train/network.py:48``) and its head-input rule takes the FIRST
Linear of the classifier Sequential (``network.py:50-56``), which for
MobileNetV3 is ``Linear(last_backbone_ch, 1280)`` — so the reference's
head attaches at the backbone's pooled features (960 large / 576 small)
and the classifier's 1280-wide intermediate is discarded. Mirrored here:
stem -> inverted-residual blocks (optional SE with hard-sigmoid, ReLU or
hard-swish per block) -> 1x1 last conv -> global mean -> the shared MLP
``Head``. (MobileNetV2 is deliberately absent: torchvision's V2 has no
``avgpool`` child, so the reference's ``Sequential(children[:-1])``
construction crashes on it — nothing to be compatible with.)

BatchNorm uses torchvision V3's eps=1e-3 / momentum 0.01 (flax 0.99) so
converted ``.pth`` checkpoints reproduce torch outputs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import Head


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision ``_make_divisible``: nearest multiple of 8, never below
    90% of the input."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (kernel, expanded_ch, out_ch, use_se, use_hs, stride) per block
# torchvision _mobilenet_v3_conf("mobilenet_v3_large")
V3_LARGE_CONFIG = (
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
)
# torchvision _mobilenet_v3_conf("mobilenet_v3_small")
V3_SMALL_CONFIG = (
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
)


class HardSqueezeExcite(nn.Module):
    """torchvision V3 SqueezeExcitation: ReLU then hard-sigmoid gate,
    squeeze channels = make_divisible(expanded // 4)."""

    channels: int
    squeeze: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    exp_ch: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
        )
        act = nn.hard_swish if self.use_hs else nn.relu
        residual = x
        y = x
        if self.exp_ch != self.in_ch:
            y = nn.Conv(self.exp_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand_conv")(y)
            y = norm(name="expand_bn")(y)
            y = act(y)
        pad = (self.kernel - 1) // 2
        y = nn.Conv(
            self.exp_ch,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.exp_ch,
            use_bias=False,
            dtype=self.dtype,
            name="dw_conv",
        )(y)
        y = norm(name="dw_bn")(y)
        y = act(y)
        if self.use_se:
            y = HardSqueezeExcite(
                self.exp_ch, _make_divisible(self.exp_ch // 4),
                dtype=self.dtype, name="se",
            )(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = norm(name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + residual
        return y


class MobileNetV3(nn.Module):
    """MobileNetV3 backbone + the shared MLP :class:`Head` attached at the
    pooled backbone features (the reference's first-classifier-Linear
    in_features rule)."""

    num_classes: int
    config: Sequence = V3_LARGE_CONFIG
    stem_ch: int = 16
    head: Sequence[int] = (256, 128)
    dropout: Sequence = ()
    last_activation: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
        )
        x = nn.Conv(self.stem_ch, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.hard_swish(x)
        in_ch = self.stem_ch
        for bi, (k, exp, out, se, hs, stride) in enumerate(self.config):
            x = InvertedResidual(
                in_ch=in_ch, out_ch=out, exp_ch=exp, kernel=k,
                stride=stride, use_se=se, use_hs=hs, dtype=self.dtype,
                name=f"layer{bi + 1}_0",
            )(x, train=train)
            in_ch = out
        # last 1x1 conv widens to 6x the final block channels
        last_ch = 6 * in_ch
        x = nn.Conv(last_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.hard_swish(x)
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


def mobilenet_v3_large(**kw) -> MobileNetV3:
    return MobileNetV3(config=V3_LARGE_CONFIG, **kw)


def mobilenet_v3_small(**kw) -> MobileNetV3:
    return MobileNetV3(config=V3_SMALL_CONFIG, **kw)
