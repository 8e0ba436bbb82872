"""Mesh and sharding helpers (the framework's multi-chip story).

The reference is hard-wired single-device (``torch.device("cuda:0"...)``,
``sykepic/compute/probability.py:127``). Here scale-out is idiomatic JAX:
pick a mesh, annotate shardings, let XLA insert the collectives over ICI.

- :func:`data_mesh` -- 1-D ``("data",)`` mesh over local devices; batches
  shard over it, parameters replicate (used by both the inference engine and
  the trainer).
- :func:`data_model_mesh` -- 2-D ``("data", "model")`` mesh for optional
  tensor-parallel sharding of wide kernels.
- :func:`shard_wide_kernels` -- tensor-parallel parameter placement: the
  last (output-feature) axis of wide late-stage kernels shards over the
  ``model`` mesh axis; GSPMD inserts the activation collectives. Used by
  both the trainer and the inference engine when their mesh has a ``model``
  axis.
- :func:`shard_batch` / :func:`replicate` -- NamedSharding device_put
  helpers for library users (the engine/trainer inline their own puts so
  their single-program-per-shape guarantees stay local).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Module groups whose wide kernels benefit from tensor parallelism: the MLP
# head plus the widest final stage of each backbone family (ResNet layer4,
# EfficientNet layer7/head_conv). Early narrow convs replicate — sharding
# them trades negligible memory for extra collectives.
# VGG is absent on purpose: its only wide matmul is the 25088-wide head
# fc0, which the "head" pattern already covers; its mid-backbone
# layer4_conv*/layer5_conv* 3x3 convs would buy collectives for nothing.
# The backbone patterns therefore anchor on the block-structured
# "layerN_<block index>" naming (ResNet/EfficientNet/MobileNet) so VGG's
# flat "layer4_convJ" modules do NOT match.
WIDE_MODULE_PATTERNS = (r"head", r"layer4_\d+$", r"layer7_\d+$",
                        r"head_conv$")


def data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("data",))


def data_model_mesh(model_parallel: int = 2, devices=None) -> Mesh:
    """2-D (data, model) mesh; ``model_parallel`` must divide device count."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % model_parallel:
        raise ValueError(
            f"{len(devices)} devices not divisible by model_parallel="
            f"{model_parallel}"
        )
    arr = np.array(devices).reshape(len(devices) // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, *arrays):
    """device_put arrays with their leading axis sharded over ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def data_axis_size(mesh: Mesh) -> int:
    """Size of the batch-sharding axis (``data``), 1 if the mesh has none."""
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)


def has_model_axis(mesh: Mesh) -> bool:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return sizes.get("model", 1) > 1


def shard_wide_kernels(params, mesh: Mesh, axis: str = "model",
                       min_width: int = 64,
                       module_patterns=WIDE_MODULE_PATTERNS):
    """Tensor-parallel parameter placement over the mesh's ``axis``.

    Kernels whose top-level module matches one of the ``module_patterns``
    regexes (``re.match`` — anchored at the start) and whose last
    (output-feature) dimension is at least ``min_width`` and divisible
    by the axis size get that dimension sharded; every other leaf
    replicates. Returns the device_put tree — run jitted programs on it
    under the same mesh and GSPMD partitions the matmuls/convs and inserts
    the all-gathers/reduce-scatters over ICI.
    """
    import re

    from flax.traverse_util import flatten_dict, unflatten_dict

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_shards = sizes.get(axis, 1)
    if n_shards <= 1:
        return replicate(mesh, params)

    compiled = tuple(re.compile(p) for p in module_patterns)

    def placement(path, leaf):
        wide = (
            getattr(leaf, "ndim", 0) >= 2
            and leaf.shape[-1] >= min_width
            and leaf.shape[-1] % n_shards == 0
        )
        if wide and any(p.match(str(path[0])) for p in compiled):
            return P(*([None] * (leaf.ndim - 1) + [axis]))
        return P()

    flat = flatten_dict(params)
    placed = {
        path: jax.device_put(leaf, NamedSharding(mesh, placement(path, leaf)))
        for path, leaf in flat.items()
    }
    return unflatten_dict(placed)
