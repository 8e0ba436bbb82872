"""Jit-compiled training machinery: staged fine-tuning, 3-group learning
rates, data-parallel sharding.

Reference semantics being reproduced (``sykepic/train/network.py:75-187``,
``train.py:122-163``):

- ``freeze(net.base)``: at start only the head trains, *except* BatchNorm
  affine params which stay trainable everywhere (``network.py:149-172``).
  Those BN params ride in LR group 0 with the head (they are in the initial
  ``requires_grad`` set, ``train.py:131-138``).
- ``LRWarmup`` stages: at ``step_2`` the last base stage (layer4) unfreezes
  into group 1 at ``head_lr * factor_1``; at ``step_3`` the rest of the base
  unfreezes into group 2 at ``group1_lr * factor_1``; the head LR decays by
  ``factor_1`` at ``step_1`` and ``factor_2`` at steps 2 and 3
  (``network.py:98-130``).
- ``ReduceLROnPlateau`` on val loss multiplies every group's LR by
  ``factor`` after ``patience`` non-improving epochs, active only after
  warmup ``step_3`` (``train.py:155-163,310-312``).

TPU-native design: the whole epoch-varying state is a 3-vector of learning
rates (a *dynamic* jit input, so LR changes never recompile) plus a static
``stage`` in {0, 1, 2} that masks gradients of still-frozen groups (3
compilations total per canvas shape). The optimizer is one optax
``scale_by_adam`` over all params: masked groups see zero gradients, so
their moments stay exactly zero until their stage opens — equivalent to the
reference's "fresh param group" up to Adam's bias-correction counter (the
reference starts a new torch Adam state per group; training is stochastic,
bit-parity is not a goal here).

Multi-chip: the step is jit-compiled with batch inputs sharded over the
``data`` axis of a 1-D device mesh and parameters replicated; XLA inserts
the gradient all-reduce over ICI (no hand-written collectives).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import augment as augment_ops
from ..ops import preprocess
from ..parallel import (  # noqa: F401  (canonical home; re-exported)
    data_axis_size,
    data_mesh,
    has_model_axis,
    shard_wide_kernels,
)

G_HEAD, G_TOP, G_REST = 0, 1, 2  # LR groups: head+BN / layer4 / rest of base


def label_params(params):
    """Group-id pytree matching ``params``: head + all BatchNorm -> group 0,
    the LAST backbone stage (ResNet ``layer4*``; EfficientNet's final
    layer-group + head_conv — the reference's ``base[-2:]``) -> group 1,
    rest -> group 2."""
    flat = flatten_dict(params)
    # highest layer-group index present = the "last sequential part"
    top = 0
    for path in flat:
        name = str(path[0])
        if name.startswith("layer"):
            try:
                top = max(top, int(name[5:].split("_")[0]))
            except ValueError:
                pass
    labels = {}
    for path in flat:
        parts = [str(p) for p in path]
        # BatchNorm module names across families: "bn1" (resnet),
        # "stem_bn"/"project_bn" (efficientnet/mobilenet),
        # "layer5_bn2" (vgg_bn)
        is_bn = any(
            re.search(r"(^|_)bn\d*$", p) for p in parts[:-1]
        )
        if parts[0] == "head":
            g = G_HEAD
        elif is_bn:
            g = G_HEAD
        elif parts[0].startswith(f"layer{top}") or parts[0] == "head_conv":
            g = G_TOP
        else:
            g = G_REST
        labels[path] = g
    return unflatten_dict(labels)


def make_optimizer(name: str):
    """Gradient-direction transform for a torch ``optim`` name
    (reference ``train.py:132``: ``getattr(optim, name)``)."""
    name = name.lower()
    if name == "adam":
        return optax.scale_by_adam()
    if name == "adamw":
        return optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(1e-2))
    if name == "sgd":
        return optax.identity()
    if name == "rmsprop":
        # torch RMSprop defaults: alpha=0.99, eps=1e-8 (the reference gets
        # these via getattr(torch.optim, name))
        return optax.scale_by_rms(decay=0.99, eps=1e-8)
    raise ValueError(f"Unsupported optimizer: {name}")


class Trainer:
    """Owns model/optimizer state and the compiled train/eval steps."""

    def __init__(
        self,
        model,
        variables,
        optimizer: str = "Adam",
        preprocess_spec=None,
        augment_kwargs: dict | None = None,
        mesh: Mesh | None = None,
        seed: int = 0,
    ):
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.labels = label_params(self.params)
        self.tx = make_optimizer(optimizer)
        self.spec = preprocess_spec
        self.augment_kwargs = augment_kwargs or {}
        self.mesh = mesh if mesh is not None else data_mesh()
        self._steps: dict[Any, Any] = {}
        self._data_sharding = NamedSharding(self.mesh, P("data"))
        self._replicated = NamedSharding(self.mesh, P())
        # COMMITTED key: step programs return the advanced key (the
        # scanned epoch) or feed it to jax.random.split whose output is
        # committed — an uncommitted PRNGKey on call 1 vs a committed one
        # on call 2 changes the jit signature and forced a silent FULL
        # recompile of the epoch program (measured 35-45 s per epoch over
        # the tunnel until this line pinned the placement).
        self.key = jax.device_put(jax.random.PRNGKey(seed),
                                  self._replicated)
        # Place state across the mesh once: replicated, except that a mesh
        # with a model axis tensor-shards the wide late-stage kernels (the
        # optimizer state mirrors the parameter placement via init-on-placed)
        self.params = self.place_params(self.params)
        self.opt_state = self.tx.init(self.params)
        self.batch_stats = jax.device_put(self.batch_stats, self._replicated)

    def place_params(self, params):
        """Mesh placement for a parameter tree: tensor-parallel wide-kernel
        sharding when the mesh has a model axis, full replication otherwise.
        Used at construction AND when checkpoint resume swaps the tree in
        (a resumed tree must not silently lose the tp placement)."""
        if has_model_axis(self.mesh):
            return shard_wide_kernels(params, self.mesh)
        return jax.device_put(params, self._replicated)

    # ---------------------------------------------------------- preprocessing
    def _device_preprocess(self, canvas, heights, widths, new_h, new_w,
                           pad_top, pad_left, border, lim_x, lim_y, key,
                           train: bool):
        """Fused resize+pad [-> augment] -> scale -> normalize, on device.

        Rotation-free augmentations fold into the resize einsums
        (separable affines); rotation falls back to the gather warp.
        """
        spec = self.spec
        kw = self.augment_kwargs if (train and self.augment_kwargs) else {}
        if kw and not kw.get("rotate"):
            aff_y, aff_x, bright = augment_ops.separable_params(
                key, canvas.shape[0], lim_x, lim_y,
                spec.target_h, spec.target_w,
                flip=kw.get("flip", False),
                translate=kw.get("translate", False),
                zoom=kw.get("zoom", False),
                brightness=kw.get("brightness", False),
                zoom_range=kw.get("zoom_range", (1.0, 1.0)),
                brightness_range=kw.get("brightness_range", (1.0, 1.0)),
            )
            img = preprocess.resize_pad_batch_mxu(
                canvas, heights, widths, new_h, new_w, pad_top, pad_left,
                border, spec.target_h, spec.target_w, dtype=jnp.float32,
                affine_y=aff_y, affine_x=aff_x,
            )
            img = augment_ops.apply_brightness(img, bright)
        else:
            img = preprocess.resize_pad_batch_mxu(
                canvas, heights, widths, new_h, new_w, pad_top, pad_left,
                border, spec.target_h, spec.target_w, dtype=jnp.float32,
            )
            if kw:
                img = augment_ops.augment_batch(
                    key, img, border, lim_x, lim_y, **kw
                )
        img = img / 255.0
        img = jnp.repeat(img[..., None], spec.num_chans, axis=-1)
        # ImageNet normalization applies to the TRAIN path only: the
        # reference appends Normalize solely to train_transform
        # (config.py:52-56), so its eval/val/test/inference pixels are
        # unnormalized — replicated here (including the train/eval skew)
        # for checkpoint compatibility.
        if train and spec.imagenet_normalization:
            mean = jnp.asarray(preprocess.IMAGENET_MEAN[: spec.num_chans])
            std = jnp.asarray(preprocess.IMAGENET_STD[: spec.num_chans])
            img = (img - mean) / std
        return img

    # ---------------------------------------------------------------- steps
    _STORE_FIELDS = ("canvas", "heights", "widths", "new_h", "new_w",
                     "pad_top", "pad_left", "border", "lim_x", "lim_y",
                     "labels")

    def _core_update(self, stage: int):
        """Shared fwd+bwd+update over preprocessed images ``x``: the single
        definition of the loss, the stage gradient mask, and the metric
        reductions for every train-step variant (host-shipped, gathered,
        mixed-composition). Preprocessing has no trainable parameters, so
        computing ``x`` outside ``value_and_grad`` is exact."""
        model = self.model
        tx = self.tx
        labels = self.labels

        def core(params, batch_stats, opt_state, x, y, wts, lrs, drop_key):
            def loss_fn(p):
                logits, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_key},
                )
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), y
                )
                loss = jnp.sum(losses * wts) / jnp.maximum(jnp.sum(wts), 1.0)
                return loss, (mutated["batch_stats"], logits)

            (loss, (new_bstats, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # Stage mask: zero the gradients of still-frozen groups so their
            # Adam moments stay zero (fresh when the group opens)
            grads = jax.tree_util.tree_map(
                lambda g, lab: g if lab <= stage else jnp.zeros_like(g),
                grads,
                labels,
            )
            updates, new_opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(
                lambda u, lab: -lrs[lab] * u, updates, labels
            )
            new_params = optax.apply_updates(params, updates)
            preds = jnp.argmax(logits, axis=-1)
            correct = jnp.sum((preds == y) * wts)
            loss_sum = jnp.sum(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), y
                )
                * wts
            )
            n = jnp.sum(wts)
            return new_params, new_bstats, new_opt_state, loss_sum, correct, n

        return core

    def _build_train_step(self, stage: int, gather: bool = False):
        core = self._core_update(stage)

        def step(params, batch_stats, opt_state, canvas, heights, widths,
                 new_h, new_w, pad_top, pad_left, border, lim_x, lim_y,
                 y, wts, lrs, key):
            aug_key, drop_key = jax.random.split(key)
            x = self._device_preprocess(
                canvas, heights, widths, new_h, new_w, pad_top, pad_left,
                border, lim_x, lim_y, aug_key, train=True,
            )
            return core(params, batch_stats, opt_state, x, y, wts, lrs,
                        drop_key)

        if not gather:
            return jax.jit(step, donate_argnums=(0, 1, 2))

        # Device-resident variant: the batch is gathered from an uploaded
        # per-bucket store INSIDE the compiled step (a ~0.8 ms HBM gather
        # vs a ~70 ms tunnel upload per 1 MB batch, measured on the v5e;
        # gather+preprocess overlap almost fully with the fwd+bwd — full
        # step 21.6 ms vs 20.8 ms core-only), so epochs 2+ ship only the
        # (B,) index vector per step.
        def gstep(params, batch_stats, opt_state, store, idx, wts, lrs, key):
            g = [jnp.take(store[f], idx, axis=0) for f in self._STORE_FIELDS]
            return step(params, batch_stats, opt_state, *g, wts, lrs, key)

        return jax.jit(gstep, donate_argnums=(0, 1, 2))

    def _mixed_step_fn(self, stage: int, k: int):
        """Raw (un-jitted) stratified mixed-composition gathered step: one
        sub-gather per canvas bucket, each preprocessed to the target
        shape, concatenated into ONE batch for the model. Canvas-pure
        batches are near-CLASS-pure when ROI size correlates with class
        (it does, in plankton data), and per-batch BatchNorm statistics
        then normalize the class signal away — measured as a total
        training collapse on a size-correlated synthetic set
        (tests/test_device_data.py). Mixing inside the compiled step keeps
        the one-upload store design AND the host loader's mixed-batch
        statistics. Shared by the per-step jit
        (:meth:`_build_train_step_mixed`) and the whole-epoch scan
        (:meth:`_build_train_epoch_mixed`)."""
        core = self._core_update(stage)
        fields = self._STORE_FIELDS

        def mstep(params, batch_stats, opt_state, stores, idxs, wts, lrs,
                  key):
            aug_key, drop_key = jax.random.split(key)
            aug_keys = jax.random.split(aug_key, k)
            xs, ys = [], []
            for i in range(k):
                g = {f: jnp.take(stores[i][f], idxs[i], axis=0)
                     for f in fields}
                xs.append(self._device_preprocess(
                    g["canvas"], g["heights"], g["widths"], g["new_h"],
                    g["new_w"], g["pad_top"], g["pad_left"], g["border"],
                    g["lim_x"], g["lim_y"], aug_keys[i], train=True,
                ))
                ys.append(g["labels"])
            x = jnp.concatenate(xs, axis=0)
            y = jnp.concatenate(ys, axis=0)
            # The gathers/preprocess run from replicated indices; constrain
            # the concatenated batch onto the data axis so the model
            # fwd+bwd (the dominant compute) runs data-parallel. GSPMD
            # pads internally, so the batch need not divide the mesh.
            x = jax.lax.with_sharding_constraint(x, self._data_sharding)
            return core(params, batch_stats, opt_state, x, y, wts, lrs,
                        drop_key)

        return mstep

    def _build_train_step_mixed(self, stage: int, k: int):
        return jax.jit(self._mixed_step_fn(stage, k),
                       donate_argnums=(0, 1, 2))

    def _build_train_epoch_mixed(self, stage: int, k: int):
        """One WHOLE stratified epoch as a single compiled program:
        ``lax.scan`` over the per-batch index/weight rows, stores resident.

        Why: the per-step path dispatches one program per batch, so an
        epoch pays per-step upload/launch pacing over the host link —
        measured as a 0.74 s epoch stretching to ~0.95 s under tunnel
        jitter for the SAME device compute. The scan uploads every batch's
        indices once and runs the epoch as one dispatch: wall clock =
        device compute + one round trip, weather-independent. The scan
        body is byte-identical work to :meth:`_build_train_step_mixed`
        (same ``_mixed_step_fn``), the key chain splits exactly like the
        per-step loop, and XLA compiles the body once, so compile time
        matches a single step's.
        """
        mstep = self._mixed_step_fn(stage, k)

        def escan(params, batch_stats, opt_state, stores, idxs_stk,
                  wts_stk, lrs, key):
            def body(carry, xs):
                params, batch_stats, opt_state, key, ls_a, c_a, n_a = carry
                idxs, wts = xs
                key, sub = jax.random.split(key)
                (params, batch_stats, opt_state,
                 loss_sum, correct, n) = mstep(
                    params, batch_stats, opt_state, stores, idxs, wts,
                    lrs, sub,
                )
                return (params, batch_stats, opt_state, key,
                        ls_a + loss_sum, c_a + correct, n_a + n), None

            zero = jnp.zeros((), jnp.float32)
            carry0 = (params, batch_stats, opt_state, key, zero, zero, zero)
            (params, batch_stats, opt_state, key,
             loss_sum, correct, n), _ = jax.lax.scan(
                body, carry0, (idxs_stk, wts_stk)
            )
            return params, batch_stats, opt_state, key, loss_sum, correct, n

        return jax.jit(escan, donate_argnums=(0, 1, 2))

    def _build_eval_step(self, gather: bool = False):
        model = self.model

        def step(params, batch_stats, canvas, heights, widths, new_h, new_w,
                 pad_top, pad_left, border, y, wts):
            x = self._device_preprocess(
                canvas, heights, widths, new_h, new_w, pad_top, pad_left,
                border, None, None, None, train=False,
            )
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            )
            preds = jnp.argmax(logits, axis=-1)
            loss_sum = jnp.sum(losses * wts)
            correct = jnp.sum((preds == y) * wts)
            return loss_sum, correct, jnp.sum(wts), preds

        if not gather:
            return jax.jit(step)

        def gstep(params, batch_stats, store, idx, wts):
            fields = self._STORE_FIELDS[:8]  # eval has no translate limits
            g = [jnp.take(store[f], idx, axis=0) for f in fields]
            y = jnp.take(store["labels"], idx, axis=0)
            return step(params, batch_stats, *g, y, wts)

        return jax.jit(gstep)

    # ----------------------------------------------------------------- API
    def _batch_device_args(self, batch):
        """Geometry + border metadata for a HostBatch, device-sharded."""
        n_data = data_axis_size(self.mesh)
        if len(batch.canvas) % n_data != 0:
            raise ValueError(
                f"batch size {len(batch.canvas)} not divisible by the data "
                f"mesh axis ({n_data}) — pad or drop the tail batch (GSPMD "
                "cannot shard an indivisible leading axis)"
            )
        spec = self.spec
        new_h, new_w, pad_top, pad_left = preprocess.compute_geometry(
            batch.heights, batch.widths, spec.target_h, spec.target_w
        )
        border = preprocess.border_values(
            batch.canvas, batch.heights, batch.widths, spec.border
        )
        lim_x, lim_y = augment_ops.translate_limits(
            batch.heights, batch.widths, new_h, new_w,
            spec.target_h, spec.target_w,
        )
        arrays = (
            batch.canvas, batch.heights, batch.widths, new_h, new_w,
            pad_top, pad_left, border, lim_x, lim_y,
            batch.labels.astype(np.int32), batch.weights,
        )
        return tuple(jax.device_put(a, self._data_sharding) for a in arrays)

    def train_batch(self, batch, stage: int, lrs):
        """Run one optimization step. Returns (loss_sum, correct, n) as
        DEVICE scalars: converting them per step would synchronize the
        pipeline and stall async dispatch — accumulate on device and
        convert once per epoch (``float()`` accepts the scalars directly).

        Accepts a host :class:`~sykepic_tpu.train.input.HostBatch` or a
        device-resident :class:`~sykepic_tpu.train.device_data
        .GatheredBatch` (routed to :meth:`train_batch_gathered`).
        """
        from .device_data import GatheredBatch, MixedGatheredBatch

        if isinstance(batch, MixedGatheredBatch):
            return self.train_batch_mixed(
                batch.stores, batch.idxs, batch.weights, stage, lrs
            )
        if isinstance(batch, GatheredBatch):
            return self.train_batch_gathered(
                batch.store, batch.idx, batch.weights, stage, lrs
            )
        cache_key = ("train", stage)
        if cache_key not in self._steps:
            self._steps[cache_key] = self._build_train_step(stage)
        step = self._steps[cache_key]
        (canvas, heights, widths, new_h, new_w, pad_top, pad_left, border,
         lim_x, lim_y, y, wts) = self._batch_device_args(batch)
        self.key, sub = jax.random.split(self.key)
        lrs = jnp.asarray(lrs, jnp.float32)
        (self.params, self.batch_stats, self.opt_state,
         loss_sum, correct, n) = step(
            self.params, self.batch_stats, self.opt_state,
            canvas, heights, widths, new_h, new_w, pad_top, pad_left, border,
            lim_x, lim_y, y, wts, lrs, sub,
        )
        return loss_sum, correct, n

    def _put_indices(self, idx, weights):
        n_data = data_axis_size(self.mesh)
        if len(idx) % n_data != 0:
            raise ValueError(
                f"batch size {len(idx)} not divisible by the data mesh "
                f"axis ({n_data}) — pad or drop the tail batch"
            )
        return (
            jax.device_put(np.asarray(idx, np.int32), self._data_sharding),
            jax.device_put(np.asarray(weights, np.float32),
                           self._data_sharding),
        )

    def train_batch_gathered(self, store, idx, weights, stage: int, lrs):
        """One optimization step over rows ``idx`` of a device-resident
        store (see :class:`~sykepic_tpu.train.device_data.DeviceDataset`).
        Same contract as :meth:`train_batch`, but only the index vector and
        weights cross the host->device link."""
        cache_key = ("train_gather", stage)
        if cache_key not in self._steps:
            self._steps[cache_key] = self._build_train_step(stage,
                                                            gather=True)
        step = self._steps[cache_key]
        idx, wts = self._put_indices(idx, weights)
        self.key, sub = jax.random.split(self.key)
        lrs = jnp.asarray(lrs, jnp.float32)
        (self.params, self.batch_stats, self.opt_state,
         loss_sum, correct, n) = step(
            self.params, self.batch_stats, self.opt_state,
            store, idx, wts, lrs, sub,
        )
        return loss_sum, correct, n

    def train_batch_mixed(self, stores, idxs, weights, stage: int, lrs):
        """One optimization step over a stratified mixed batch: ``stores``
        and ``idxs`` are parallel tuples (one store + index vector per
        canvas bucket); see :meth:`_build_train_step_mixed` for why train
        batches mix buckets. Index vectors replicate across the mesh (no
        divisibility constraint); the concatenated batch is data-sharded
        inside the step."""
        k = len(stores)
        cache_key = ("train_mixed", stage, k)
        if cache_key not in self._steps:
            self._steps[cache_key] = self._build_train_step_mixed(stage, k)
        step = self._steps[cache_key]
        idxs = tuple(
            jax.device_put(np.asarray(i, np.int32), self._replicated)
            for i in idxs
        )
        wts = jax.device_put(np.asarray(weights, np.float32),
                             self._replicated)
        self.key, sub = jax.random.split(self.key)
        lrs = jnp.asarray(lrs, jnp.float32)
        (self.params, self.batch_stats, self.opt_state,
         loss_sum, correct, n) = step(
            self.params, self.batch_stats, self.opt_state,
            tuple(stores), idxs, wts, lrs, sub,
        )
        return loss_sum, correct, n

    def train_epoch_mixed_scanned(self, stores, idxs_stacked,
                                  weights_stacked, stage: int, lrs):
        """Run one WHOLE stratified epoch as one compiled dispatch.

        ``stores`` is the per-bucket store tuple; ``idxs_stacked`` a
        parallel tuple of ``(n_batches, c_i)`` int32 row matrices;
        ``weights_stacked`` the ``(n_batches, sum c_i)`` float32 weight
        matrix (``DeviceDataset.epoch_mixed_stacked`` builds all three).
        Returns ``(loss_sum, correct, n)`` device scalars summed over the
        epoch — the same totals the per-step loop accumulates, with the
        identical per-batch RNG chain (the key splits once per batch, in
        batch order, exactly like repeated :meth:`train_batch_mixed`
        calls)."""
        k = len(stores)
        cache_key = ("train_epoch_mixed", stage, k)
        if cache_key not in self._steps:
            self._steps[cache_key] = self._build_train_epoch_mixed(stage, k)
        step = self._steps[cache_key]
        idxs = tuple(
            jax.device_put(np.ascontiguousarray(i, np.int32),
                           self._replicated)
            for i in idxs_stacked
        )
        wts = jax.device_put(
            np.ascontiguousarray(weights_stacked, np.float32),
            self._replicated,
        )
        lrs = jnp.asarray(lrs, jnp.float32)
        (self.params, self.batch_stats, self.opt_state, self.key,
         loss_sum, correct, n) = step(
            self.params, self.batch_stats, self.opt_state,
            tuple(stores), idxs, wts, lrs, self.key,
        )
        return loss_sum, correct, n

    def eval_batch_gathered(self, store, idx, weights):
        """Gathered counterpart of :meth:`eval_batch`."""
        if "eval_gather" not in self._steps:
            self._steps["eval_gather"] = self._build_eval_step(gather=True)
        idx, wts = self._put_indices(idx, weights)
        return self._steps["eval_gather"](
            self.params, self.batch_stats, store, idx, wts
        )

    def eval_batch(self, batch):
        """Returns (loss_sum, correct, n, preds ndarray)."""
        from .device_data import GatheredBatch, MixedGatheredBatch

        if isinstance(batch, MixedGatheredBatch):
            # eval has no per-batch statistics, so sub-batches evaluate
            # independently; preds concatenate in bucket order (matching
            # batch.labels). Indices go up REPLICATED: sub-batch sizes
            # c_i = ceil(occ_i/n_batches) are generally not divisible by
            # the data mesh axis, so the data-sharded _put_indices path
            # would raise on any multi-device mesh.
            if "eval_gather" not in self._steps:
                self._steps["eval_gather"] = self._build_eval_step(
                    gather=True)
            step = self._steps["eval_gather"]
            loss_sum = correct = n = 0.0
            preds = []
            for store, idx, w in zip(batch.stores, batch.idxs,
                                     batch.split_weights()):
                ls, c, k, p = step(
                    self.params, self.batch_stats, store,
                    jax.device_put(np.asarray(idx, np.int32),
                                   self._replicated),
                    jax.device_put(np.asarray(w, np.float32),
                                   self._replicated),
                )
                loss_sum += ls
                correct += c
                n += k
                preds.append(np.asarray(p))
            return loss_sum, correct, n, np.concatenate(preds)
        if isinstance(batch, GatheredBatch):
            return self.eval_batch_gathered(
                batch.store, batch.idx, batch.weights
            )
        if "eval" not in self._steps:
            self._steps["eval"] = self._build_eval_step()
        step = self._steps["eval"]
        (canvas, heights, widths, new_h, new_w, pad_top, pad_left, border,
         _lim_x, _lim_y, y, wts) = self._batch_device_args(batch)
        return step(
            self.params, self.batch_stats, canvas, heights, widths,
            new_h, new_w, pad_top, pad_left, border, y, wts,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


class LRSchedule:
    """Host-side LR bookkeeping: warmup stages + plateau reduction.

    ``lrs`` is the 3-vector fed to the jitted step; ``stage`` selects the
    compiled gradient mask. Mirrors ``LRWarmup.__call__``
    (``network.py:98-130``) and ``ReduceLROnPlateau`` defaults
    (``train.py:155-163``: mode=min, rel threshold 1e-4).
    """

    def __init__(self, lr: float, warmup=None, reduction=None):
        self.lrs = [lr, 0.0, 0.0]
        self.stage = 0
        self.warmup = warmup  # dict(factor_1, factor_2, step_1, step_2, step_3)
        self.reduction = reduction  # dict(factor, patience)
        self._best_loss = None
        self._bad_epochs = 0

    def start_epoch(self, epoch: int) -> None:
        w = self.warmup
        if not w:
            return
        if epoch == w["step_1"]:
            self.lrs[0] *= w["factor_1"]
        elif epoch == w["step_2"]:
            self.lrs[1] = self.lrs[0] * w["factor_1"]
            self.lrs[0] *= w["factor_2"]
            self.stage = 1
        elif epoch == w["step_3"]:
            self.lrs[2] = self.lrs[1] * w["factor_1"]
            self.lrs[0] *= w["factor_2"]
            self.stage = 2

    def end_epoch(self, epoch: int, val_loss: float) -> None:
        r = self.reduction
        if not r:
            return
        if self.warmup and epoch <= self.warmup["step_3"]:
            return  # plateau counting starts after warmup (train.py:310-312)
        if self._best_loss is None or val_loss < self._best_loss * (1 - 1e-4):
            self._best_loss = val_loss
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > r["patience"]:
                self.lrs = [lr * r["factor"] for lr in self.lrs]
                self._bad_epochs = 0

    def snapshot(self) -> dict:
        """Serializable state for mid-training resume."""
        return {
            "lrs": list(self.lrs),
            "stage": self.stage,
            "best_loss": self._best_loss,
            "bad_epochs": self._bad_epochs,
        }

    def restore(self, state: dict | None) -> None:
        """Restore a :meth:`snapshot` (no-op on None)."""
        if not state:
            return
        self.lrs = [float(lr) for lr in state["lrs"]]
        self.stage = int(state["stage"])
        best = state.get("best_loss")
        self._best_loss = None if best is None else float(best)
        self._bad_epochs = int(state.get("bad_epochs", 0))
