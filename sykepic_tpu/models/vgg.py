"""Flax VGG backbones (vgg16 / vgg16_bn / vgg19 / vgg19_bn) + MLP head.

Fourth model family the reference can genuinely instantiate by string
(``sykepic/train/network.py:46-64``): torchvision's VGG children are
``[features, avgpool, classifier]``, so ``base = children[:-1]`` keeps the
7x7 adaptive average pool as a module and the flatten -> Linear head sizes
correctly (unlike e.g. densenet, whose functional pooling makes the
reference crash — see ``convert_torch.UnsupportedArchitectureError``).

Parity notes:

- Plain 3x3 stride-1 convs with symmetric padding; torch semantics exact.
  Convs keep their bias in the ``_bn`` variants too: torchvision's
  ``vgg.make_layers`` constructs ``Conv2d`` with the default ``bias=True``
  regardless of ``batch_norm``, so every real ``vgg*_bn`` checkpoint
  carries ``features.N.bias`` tensors that must survive conversion.
- ``AdaptiveAvgPool2d((7, 7))``: torch's adaptive windows are
  ``[floor(i*in/out), ceil((i+1)*in/out))`` — reproduced exactly, for
  inputs both larger and SMALLER than 7 (a 180x180 input reaches this pool
  at 5x5, where adaptive windows overlap/duplicate).
- The flatten into the head runs in torch's channel-major order
  (transpose NHWC -> NCHW first), so head kernels convert between torch
  and flax with the same plain transpose as every other family.
- Stage names ``layer1..layer5`` (split at the maxpools) give the trainer's
  gradual-unfreeze grouping a "last stage" to address
  (``train/trainer.py::label_params``); the reference's ``base[-2:]`` for
  VGG is [features, avgpool] — i.e. the whole backbone at warmup step 2 —
  so our per-stage grouping is strictly finer, documented as an
  improvement rather than a deviation.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import Head

# Conv widths per stage; "M" = 2x2/2 max pool closing the stage
# (torchvision ``vgg.cfgs`` D/E).
VGG_CFGS: dict[str, tuple] = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M",
              512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M",
              512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


def adaptive_avg_pool(x, out_h: int, out_w: int):
    """torch ``AdaptiveAvgPool2d`` over NHWC: window ``i`` spans rows
    ``[floor(i*H/out), ceil((i+1)*H/out))``. Static unroll (49 means for
    7x7) — shapes are compile-time constants."""
    n, h, w, c = x.shape
    rows = []
    for i in range(out_h):
        r0, r1 = (i * h) // out_h, -(-((i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            c0, c1 = (j * w) // out_w, -(-((j + 1) * w) // out_w)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, out_h, out_w, C)


class VGG(nn.Module):
    """VGG backbone + MLP head (reference ``TorchVisionNet`` equivalent)."""

    cfg: Sequence
    batch_norm: bool
    num_classes: int
    head: Sequence[int] = (256, 128)
    dropout: Sequence[tuple[int, float]] = ()
    last_activation: str | None = None
    dtype: Any = jnp.float32

    # Below 32px the fifth 2x2/2 max pool runs on a 1x1 map and empties it
    # (torch errors there; silently pooling would NaN the adaptive pool).
    MIN_INPUT = 32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        if x.shape[1] < self.MIN_INPUT or x.shape[2] < self.MIN_INPUT:
            raise ValueError(
                f"vgg needs inputs of at least {self.MIN_INPUT}x"
                f"{self.MIN_INPUT} (got {x.shape[1]}x{x.shape[2]}): five "
                "2x2/2 max pools empty the feature map below that — raise "
                "[image] shape in the training INI"
            )
        stage, j = 1, 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                stage += 1
                j = 0
                continue
            # bias stays on even under BN (torchvision make_layers keeps
            # Conv2d's default bias=True for the _bn variants)
            x = nn.Conv(
                v, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"layer{stage}_conv{j}",
            )(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype,
                    name=f"layer{stage}_bn{j}",
                )(x)
            x = nn.relu(x)
            j += 1
        x = adaptive_avg_pool(x, 7, 7)
        # flatten in torch's NCHW order: head weights then map 1:1
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        if features_only:
            return x
        x = Head(
            sizes=self.head, num_classes=self.num_classes,
            dropout=self.dropout, dtype=self.dtype, name="head",
        )(x, train=train)
        if self.last_activation:
            x = getattr(nn, self.last_activation)(x)
        return x


def vgg11(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg11"], batch_norm=False, **kw)


def vgg11_bn(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg11"], batch_norm=True, **kw)


def vgg13(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg13"], batch_norm=False, **kw)


def vgg13_bn(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg13"], batch_norm=True, **kw)


def vgg16(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg16"], batch_norm=False, **kw)


def vgg16_bn(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg16"], batch_norm=True, **kw)


def vgg19(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg19"], batch_norm=False, **kw)


def vgg19_bn(**kw) -> VGG:
    return VGG(cfg=VGG_CFGS["vgg19"], batch_norm=True, **kw)


def feature_index_map(name: str):
    """``(torch features index, stage, conv-within-stage)`` for each conv
    of the given variant — the single source of truth both converters use.
    torchvision's ``features`` Sequential counts Conv, [BatchNorm], ReLU
    and MaxPool modules."""
    base = name.split("_")[0]
    batch_norm = name.endswith("_bn")
    idx, stage, j = 0, 1, 0
    out = []
    for v in VGG_CFGS[base]:
        if v == "M":
            idx += 1
            stage += 1
            j = 0
            continue
        out.append((idx, stage, j))
        idx += 2 + (1 if batch_norm else 0)  # conv [+bn] +relu
        j += 1
    return out
