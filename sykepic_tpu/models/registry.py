"""Model registry: name -> builder (reference used ``getattr(torchvision
.models, name)``, ``sykepic/train/network.py:48``; we use an explicit
registry of TPU-native implementations)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import alexnet, convnext, efficientnet, mobilenet, regnet, resnet, vgg

MODEL_REGISTRY = {
    "resnet18": resnet.resnet18,
    "resnet34": resnet.resnet34,
    "resnet50": resnet.resnet50,
    "resnet101": resnet.resnet101,
    "resnet152": resnet.resnet152,
    "resnext50_32x4d": resnet.resnext50_32x4d,
    "resnext101_32x8d": resnet.resnext101_32x8d,
    "resnext101_64x4d": resnet.resnext101_64x4d,
    "wide_resnet50_2": resnet.wide_resnet50_2,
    "wide_resnet101_2": resnet.wide_resnet101_2,
    "efficientnet_b0": efficientnet.efficientnet_b0,
    "efficientnet_b1": efficientnet.efficientnet_b1,
    "efficientnet_b2": efficientnet.efficientnet_b2,
    "efficientnet_b3": efficientnet.efficientnet_b3,
    "efficientnet_b4": efficientnet.efficientnet_b4,
    "efficientnet_b5": efficientnet.efficientnet_b5,
    "efficientnet_b6": efficientnet.efficientnet_b6,
    "efficientnet_b7": efficientnet.efficientnet_b7,
    "efficientnet_v2_s": efficientnet.efficientnet_v2_s,
    "efficientnet_v2_m": efficientnet.efficientnet_v2_m,
    "efficientnet_v2_l": efficientnet.efficientnet_v2_l,
    "mobilenet_v3_large": mobilenet.mobilenet_v3_large,
    "mobilenet_v3_small": mobilenet.mobilenet_v3_small,
    "vgg11": vgg.vgg11,
    "vgg11_bn": vgg.vgg11_bn,
    "vgg13": vgg.vgg13,
    "vgg13_bn": vgg.vgg13_bn,
    "vgg16": vgg.vgg16,
    "vgg16_bn": vgg.vgg16_bn,
    "vgg19": vgg.vgg19,
    "vgg19_bn": vgg.vgg19_bn,
    "alexnet": alexnet.alexnet,
    "convnext_tiny": convnext.convnext_tiny,
    "convnext_small": convnext.convnext_small,
    "convnext_base": convnext.convnext_base,
    "convnext_large": convnext.convnext_large,
    "regnet_x_400mf": regnet.regnet_x_400mf,
    "regnet_x_800mf": regnet.regnet_x_800mf,
    "regnet_x_1_6gf": regnet.regnet_x_1_6gf,
    "regnet_x_3_2gf": regnet.regnet_x_3_2gf,
    "regnet_x_8gf": regnet.regnet_x_8gf,
    "regnet_x_16gf": regnet.regnet_x_16gf,
    "regnet_x_32gf": regnet.regnet_x_32gf,
    "regnet_y_400mf": regnet.regnet_y_400mf,
    "regnet_y_800mf": regnet.regnet_y_800mf,
    "regnet_y_1_6gf": regnet.regnet_y_1_6gf,
    "regnet_y_3_2gf": regnet.regnet_y_3_2gf,
    "regnet_y_8gf": regnet.regnet_y_8gf,
    "regnet_y_16gf": regnet.regnet_y_16gf,
    "regnet_y_32gf": regnet.regnet_y_32gf,
}


def build_model(
    name: str,
    num_classes: int,
    head=(256, 128),
    dropout=(),
    last_activation=None,
    dtype=jnp.float32,
):
    """Build a model by torchvision-style name (reference ``config.py:63-77``)."""
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown network '{name}'. Available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](
        num_classes=num_classes,
        head=tuple(head),
        dropout=tuple(tuple(d) for d in dropout),
        last_activation=last_activation,
        dtype=dtype,
    )


def init_variables(model, img_shape_hwc, seed: int = 0, batch: int = 1):
    """Initialize {params, batch_stats} for a model at the given input shape.

    Initialization runs pinned to the host CPU backend: compiling the init
    program on a (possibly tunneled) TPU takes minutes for nothing — the
    consumer device_puts the variables wherever they belong anyway.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    def init():
        x = jnp.zeros((batch, *img_shape_hwc), jnp.float32)
        return model.init({"params": jax.random.PRNGKey(seed)}, x, train=False)

    if cpu is not None:
        with jax.default_device(cpu):
            return init()
    return init()


def head_in_features(params) -> int:
    """Input width of the first head layer (reference ``network.py:50-56``
    reads ``last_linear.in_features``)."""
    return int(np.asarray(params["head"]["fc0"]["kernel"]).shape[0])
