"""Flax AlexNet backbone + MLP head.

Fifth model family the reference can genuinely instantiate by string
(``sykepic/train/network.py:46-64``): torchvision's AlexNet children are
``[features, avgpool, classifier]``, so ``base = children[:-1]`` keeps the
6x6 adaptive average pool as a module and the flatten -> Linear head sizes
correctly (like VGG, unlike densenet — see
``convert_torch.UnsupportedArchitectureError``).

Parity notes:

- Conv stack is torchvision ``alexnet().features`` exactly: 11x11/4 pad 2,
  5x5 pad 2, then three 3x3 pad 1, with 3x3/2 VALID max pools after convs
  0, 1 and 4. All convs keep their default bias.
- ``AdaptiveAvgPool2d((6, 6))`` reuses the VGG adaptive pool (exact torch
  window semantics, including inputs SMALLER than 6 — a 180x180 input
  reaches the pool at 4x4, where windows overlap/duplicate).
- The flatten into the head runs in torch's channel-major order
  (transpose NHWC -> NCHW first), so head kernels convert 1:1.
- Stage names ``layer1..layer3`` split at the max pools so the trainer's
  gradual-unfreeze grouping has a "last stage" (the three 3x3 convs);
  the reference's ``base[-2:]`` = [features, avgpool] would unfreeze the
  whole backbone at warmup step 2, so our grouping is strictly finer.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import Head
from .vgg import adaptive_avg_pool

# (stage, conv-within-stage, out_ch, kernel, stride, pad); a stage ends at
# each torch MaxPool2d(3, 2).
ALEXNET_CONVS: tuple = (
    (1, 0, 64, 11, 4, 2),
    (2, 0, 192, 5, 1, 2),
    (3, 0, 384, 3, 1, 1),
    (3, 1, 256, 3, 1, 1),
    (3, 2, 256, 3, 1, 1),
)
# torch ``features`` Sequential index of each conv (Conv, ReLU, [MaxPool]).
FEATURE_INDICES = (0, 3, 6, 8, 10)
_POOL_AFTER = {(1, 0), (2, 0), (3, 2)}


class AlexNet(nn.Module):
    """AlexNet backbone + MLP head (reference ``TorchVisionNet`` equivalent)."""

    num_classes: int
    head: Sequence[int] = (256, 128)
    dropout: Sequence[tuple[int, float]] = ()
    last_activation: str | None = None
    dtype: Any = jnp.float32

    # Below 63px the third 3x3/2 max pool runs on a 1x1 map and empties it
    # (torch raises "Output size is too small"; silently pooling a 0x0 map
    # would mean NaNs from the adaptive pool instead).
    MIN_INPUT = 63

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        if x.shape[1] < self.MIN_INPUT or x.shape[2] < self.MIN_INPUT:
            raise ValueError(
                f"alexnet needs inputs of at least {self.MIN_INPUT}x"
                f"{self.MIN_INPUT} (got {x.shape[1]}x{x.shape[2]}): the "
                "torchvision pooling stack produces an empty feature map "
                "below that, exactly where torch itself errors — raise "
                "[image] shape in the training INI"
            )
        for stage, j, ch, k, s, p in ALEXNET_CONVS:
            x = nn.Conv(
                ch, (k, k), (s, s), padding=((p, p), (p, p)),
                dtype=self.dtype, name=f"layer{stage}_conv{j}",
            )(x)
            x = nn.relu(x)
            if (stage, j) in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = adaptive_avg_pool(x, 6, 6)
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


def alexnet(**kw) -> AlexNet:
    return AlexNet(**kw)
