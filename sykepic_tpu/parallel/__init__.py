"""Mesh and sharding helpers (the framework's multi-chip story).

The reference is hard-wired single-device (``torch.device("cuda:0"...)``,
``sykepic/compute/probability.py:127``). Here scale-out is idiomatic JAX:
pick a mesh, annotate shardings, let XLA insert the collectives over ICI.

- :func:`data_mesh` -- 1-D ``("data",)`` mesh over local devices; batches
  shard over it, parameters replicate (used by both the inference engine and
  the trainer).
- :func:`data_model_mesh` -- 2-D ``("data", "model")`` mesh for optional
  tensor-parallel sharding of wide kernels (used by
  ``__graft_entry__.dryrun_multichip``).
- :func:`shard_batch` / :func:`replicate` -- NamedSharding device_put
  helpers for library users (the engine/trainer inline their own puts so
  their single-program-per-shape guarantees stay local).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
