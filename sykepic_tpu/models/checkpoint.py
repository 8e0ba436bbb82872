"""Checkpoint save/load and the model-directory contract.

The deployment artifact keeps the reference's "model directory" shape
(reference ``train/train.py:116-119``, ``compute/probability.py:118-130``):

    <model_dir>/
        config.ini              # architecture + preprocessing spec
        class_names.txt         # one class per line, LabelEncoder order
        class_distribution.csv  # split bookkeeping
        best_state.msgpack      # our native checkpoint (flax msgpack)
        best_state.pth          # (optional) torch checkpoint, auto-converted

Our native format is a flax ``msgpack`` serialization of
``{"params": ..., "batch_stats": ...}``. If only a ``best_state.pth`` exists
(a reference-era model dir), it is converted on load via
:mod:`sykepic_tpu.models.convert_torch`, so reference model dirs are drop-in.

For *mid-training resume* (an upgrade over the reference, which never saves
optimizer state -- SURVEY.md section 5), the training loop additionally
writes ``train_state.msgpack`` with optimizer state; see
``sykepic_tpu.train.loop``.
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import serialization

BEST_STATE = "best_state.msgpack"
TORCH_STATE = "best_state.pth"


def save_variables(path, variables) -> None:
    """Serialize a variable tree (params/batch_stats) to msgpack bytes."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    variables = jax.device_get(variables)
    path.write_bytes(serialization.msgpack_serialize(_unfreeze(variables)))


def load_variables(path, template=None):
    """Load a variable tree. With ``template``, shapes/dtypes are restored
    onto the template structure (strict); without, raw nested dicts return."""
    data = Path(path).read_bytes()
    tree = serialization.msgpack_restore(data)
    if template is not None:
        return serialization.from_state_dict(template, tree)
    return tree


def load_model_state(model_dir, template=None):
    """Load ``best_state`` from a model dir: native msgpack first, torch
    ``.pth`` fallback (converted)."""
    model_dir = Path(model_dir)
    native = model_dir / BEST_STATE
    if native.is_file():
        return load_variables(native, template)
    torch_ckpt = model_dir / TORCH_STATE
    if torch_ckpt.is_file():
        from . import convert_torch
        from flax import serialization

        tree = convert_torch.load_pth(torch_ckpt)
        if template is not None:
            # same strict shape/structure validation as the native path
            return serialization.from_state_dict(template, tree)
        return tree
    raise FileNotFoundError(
        f"No {BEST_STATE} or {TORCH_STATE} in {model_dir}"
    )


def read_class_names(model_dir) -> list[str]:
    """``class_names.txt`` -> list (reference ``probability.py:120-121``)."""
    with open(Path(model_dir) / "class_names.txt") as fh:
        return fh.read().splitlines()


def _unfreeze(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    return tree
