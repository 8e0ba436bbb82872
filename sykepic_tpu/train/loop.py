"""Training driver: ``sykepic-tpu train config.ini``
(reference ``sykepic/train/train.py``).

Keeps the reference's contracts:

- INI sections ``[dataset] [model] [image] [train] [lr_warmup]
  [lr_reduction]`` with identical keys (``train.ini.example``),
- side modes ``--save-images`` / ``--dist`` / ``--collage`` (reference
  ``train.py:38-93``),
- model-dir artifact: ``config.ini`` copy, ``class_names.txt``,
  ``class_distribution.csv``, best checkpoint, ``train_stats.png`` (+zoomed),
  ``test_report.txt`` (reference ``train.py:107-198``),
- best checkpoint on val-accuracy improvement, early stop on val-loss
  patience, KeyboardInterrupt-tolerant loop that returns the best state
  (reference ``train.py:297-320``).

What changed (TPU-native): the checkpoint is ``best_state.msgpack`` (flax),
the train step is one jit-compiled XLA program per unfreeze stage with
device-side preprocessing/augmentation (:mod:`sykepic_tpu.train.trainer`),
and ``train_state.msgpack`` adds real mid-training resume, which the
reference never had (optimizer state was never saved, SURVEY.md section 5).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
from tqdm import tqdm

from ..models import checkpoint, registry
from ..utils import logger
from . import config as config_mod
from . import data
from .input import BatchLoader
from .trainer import LRSchedule, Trainer

log = logger.get_logger("train")


def main(args):
    config = config_mod.read_config(args.config)

    # [dataset] (reference train.py:22-36)
    dataset = Path(config.get("dataset", "path"))
    split = tuple(float(i) for i in config.get("dataset", "split").split(","))
    if (s := sum(split)) != 1.0:
        raise ValueError(f"Dataset split does not add up to 1.0. Got {s}")
    if len(split) < 2:
        raise ValueError("Dataset split needs to cover at least train and validation")
    test_split = len(split) == 3
    min_N = config.get("dataset", "min_N")
    min_N = int(min_N) if min_N else None
    max_N = config.get("dataset", "max_N")
    max_N = int(max_N) if max_N else None
    exclude = [n.strip() for n in config.get("dataset", "exclude").split(",") if n.strip()]
    random_seed = config.getint("dataset", "random_seed")
    model_data = data.ModelData(dataset, split, min_N, max_N, exclude, random_seed)

    if getattr(args, "save_images", None):
        _save_images(args.save_images, model_data, test_split)

    if getattr(args, "dist", None):
        from ..analyze import plot

        out_file = Path(args.dist)
        if not out_file.suffix:
            out_file = out_file.with_suffix(".png")
        plot.dataset_distribution(model_data, out_file)
        print(f"[INFO] Distribution plot saved to {out_file}")
        return

    if oversample_until := config.get("dataset", "oversample_until", fallback=""):
        model_data.oversample(int(oversample_until), None)
    elif decay := config.get("dataset", "oversample_with_decay", fallback=""):
        model_data.oversample(None, float(decay))

    # [image]
    batch_size = config.getint("image", "batch_size")
    num_workers = config.getint("image", "num_workers")
    spec = config_mod.get_preprocess_spec(config)
    augment_spec = config_mod.get_augment_spec(config)

    if getattr(args, "collage", None):
        return _collage(args.collage, model_data, spec, augment_spec, num_workers)

    num_classes = model_data.num_classes

    external_test = config.get("dataset", "external_test", fallback="")

    # [model] (reference train.py:108-119)
    model_network = config.get("model", "network")
    model_id = config.get("model", "id")
    model_dir = Path(config.get("model", "path"))
    resume_requested = config.getboolean("train", "resume", fallback=False)
    if model_id == "auto":
        next_id = data.auto_id(model_network, model_dir)
        if resume_requested and next_id > 1:
            # resume targets the LATEST existing auto dir when it holds a
            # train state; otherwise `auto` would allocate a fresh empty
            # dir and the resume request would silently do nothing
            latest = model_dir / f"{model_network}_{next_id - 1}"
            if (latest / "train_state.msgpack").is_file():
                model_id = next_id - 1
            else:
                model_id = next_id
        else:
            model_id = next_id
    model_name = model_network
    if model_id:
        model_name += f"_{model_id}"
    model_dir = model_dir / model_name
    model_dir.mkdir(
        parents=True,
        exist_ok=config.getboolean("model", "exist_ok")
        or (resume_requested and model_dir.is_dir()),
    )
    model_data.save(model_dir)
    shutil.copy(args.config, model_dir / "config.ini")

    # [train]
    max_epochs = config.getint("train", "max_epochs")
    early_stop_patience = config.getint("train", "early_stop_patience")
    lr = config.getfloat("train", "learning_rate")
    optimizer = config.get("train", "optimizer")

    # Model + (optionally) pretrained base weights. `[train] dtype` picks
    # the compute dtype (bfloat16 = native MXU throughput; params stay f32).
    import jax.numpy as jnp

    dtype_name = config.get("train", "dtype", fallback="float32")
    compute_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    model, weights_spec = config_mod.get_network(
        config, num_classes, dtype=compute_dtype
    )
    variables = registry.init_variables(
        model, (spec.target_h, spec.target_w, spec.num_chans), seed=random_seed
    )
    allow_random_init = config.getboolean(
        "model", "allow_random_init", fallback=False
    )
    variables = load_pretrained(
        variables, weights_spec, model_network,
        allow_random_init=allow_random_init,
    )

    # [lr_warmup] / [lr_reduction]
    warmup = None
    if config.getboolean("lr_warmup", "use"):
        warmup = dict(
            factor_1=config.getfloat("lr_warmup", "factor_1"),
            factor_2=config.getfloat("lr_warmup", "factor_2"),
            step_1=config.getint("lr_warmup", "step_1"),
            step_2=config.getint("lr_warmup", "step_2"),
            step_3=config.getint("lr_warmup", "step_3"),
        )
    reduction = None
    if config.getboolean("lr_reduction", "use"):
        reduction = dict(
            factor=config.getfloat("lr_reduction", "factor"),
            patience=config.getint("lr_reduction", "patience"),
        )
    schedule = LRSchedule(lr, warmup, reduction)

    trainer = Trainer(
        model,
        variables,
        optimizer=optimizer,
        preprocess_spec=spec,
        augment_kwargs=_augment_kwargs(augment_spec),
        seed=random_seed,
    )

    # Mid-training resume (upgrade over the reference, which never saved
    # optimizer state): `[train] resume = yes` + an existing
    # train_state.msgpack in the model dir continues from the saved epoch
    # with optimizer, LR-schedule and best-metric bookkeeping restored.
    start_epoch = 1
    resume_metrics = None
    if resume_requested:
        resumed = load_train_state(model_dir, trainer)
        if resumed:
            start_epoch = int(resumed["epoch"]) + 1
            schedule.restore(resumed.get("schedule"))
            resume_metrics = resumed.get("metrics")
            print(f"[INFO] Resuming training from epoch {start_epoch}")
        else:
            print("[WARNING] resume requested but no train_state.msgpack "
                  f"in {model_dir}; starting fresh")

    train_x, train_y = model_data.train_set()
    # pre-shrink: oversized source images downsample on the host (the
    # device resize would anyway) — fewer host->device bytes, and
    # size-pooled shuffle keeps batch canvases tight (input.BatchLoader).
    shrink = (spec.target_h, spec.target_w)
    # `[image] device_cache = auto|yes|no` (default auto): when the decoded
    # set fits the HBM budget, upload it ONCE and drive epochs with gathered
    # index batches (train/device_data.py) — epochs 2+ ship ~1 KB/step over
    # the host link instead of every pixel. Falls back to the streaming
    # host loader for sets past the budget. The budget check predicts the
    # EXACT store bytes (PNG headers + the constructor's bucket/row-padding
    # arithmetic) without decoding pixels.
    device_cache = config.get("image", "device_cache", fallback="auto")
    cache_budget = config.getint(
        "image", "device_cache_mb", fallback=2048
    ) * 1024 * 1024
    use_cache = device_cache == "yes"
    if device_cache == "auto":
        from .device_data import estimate_nbytes

        est = (estimate_nbytes(train_x, spec)
               + estimate_nbytes(model_data.val_x, spec))
        use_cache = est <= cache_budget
    if use_cache:
        from ..parallel import data_axis_size
        from .device_data import DeviceDataset

        # stores replicate across the trainer's mesh so data-sharded index
        # gathers stay communication-free; batches stay mesh-divisible
        n_data = data_axis_size(trainer.mesh)
        cache_kw = dict(
            sharding=trainer._replicated, batch_multiple=n_data,
            num_threads=max(num_workers, 1),
        )
        train_loader = DeviceDataset(
            train_x, train_y, spec, batch_size, seed=random_seed,
            shuffle=True, **cache_kw,
        )
        val_loader = DeviceDataset(
            model_data.val_x, model_data.val_y, spec, batch_size, **cache_kw
        )
        print(f"[INFO] Device-resident dataset: "
              f"{(train_loader.nbytes + val_loader.nbytes) / 1e6:.0f} MB "
              "uploaded once; epochs gather on device")
    else:
        # `[image] size_pool` (default 16): class-stratified size batching
        # granularity; 1 = reference-faithful plain global shuffle (pays
        # ~4x canvas padding bytes on mixed-size sets)
        size_pool = config.getint("image", "size_pool", fallback=16)
        train_loader = BatchLoader(
            train_x, train_y, batch_size, shuffle=True, seed=random_seed,
            num_threads=max(num_workers, 1), pre_shrink_to=shrink,
            size_pool=size_pool,
        )
        val_loader = BatchLoader(
            model_data.val_x, model_data.val_y, batch_size,
            num_threads=max(num_workers, 1), pre_shrink_to=shrink,
            size_pool=size_pool,
        )

    best_state = train_net(
        trainer,
        train_loader,
        val_loader,
        schedule,
        max_epochs,
        early_stop_patience,
        model_dir,
        start_epoch=start_epoch,
        resume_metrics=resume_metrics,
    )
    import jax

    best_variables = checkpoint.load_variables(best_state)
    trainer.params = trainer.place_params(best_variables["params"])
    trainer.batch_stats = jax.device_put(
        best_variables.get("batch_stats", {}), trainer._replicated
    )

    classes = list(model_data.le.classes_)
    if test_split:
        test_loader = BatchLoader(
            model_data.test_x, model_data.test_y, batch_size,
            num_threads=max(num_workers, 1), pre_shrink_to=shrink,
        )
        report = test_net(trainer, test_loader, classes)
        print(report)
        (model_dir / "test_report.txt").write_text(report)
    if external_test:
        x, y = data.external_eval_set(external_test, model_data)
        loader = BatchLoader(x, y, batch_size, num_threads=max(num_workers, 1))
        test_name = Path(external_test).name
        report = test_net(trainer, loader, classes, test_name=test_name)
        print(report)
        (model_dir / f"test_report_{test_name}.txt").write_text(report)
    return model_dir


def train_net(
    trainer: Trainer,
    train_loader,
    val_loader,
    schedule: LRSchedule,
    max_epochs: int,
    early_stop_patience: int,
    model_dir,
    progress_bar: bool = True,
    plots: bool = True,
    start_epoch: int = 1,
    resume_metrics: dict | None = None,
):
    """Epoch loop (reference ``train.py:201-320``). Returns the best
    checkpoint path."""
    from ..analyze import plot

    model_dir = Path(model_dir)
    # On resume the best-checkpoint/early-stop bookkeeping continues where
    # it left off; otherwise epoch 1 after a crash would overwrite a better
    # pre-crash best_state.msgpack.
    resume_metrics = resume_metrics or {}
    max_val_acc = float(resume_metrics.get("max_val_acc", 0.0))
    # default to +inf, NOT 0.0: a resumed train_state without the metrics
    # dict would otherwise make every epoch "no improvement" (no real val
    # loss can beat 0.0) and trip early stopping immediately
    min_val_loss = float(resume_metrics.get("min_val_loss", float("inf")))
    no_improvement = int(resume_metrics.get("no_improvement", 0))
    train_accuracies, train_losses = [], []
    val_accuracies, val_losses = [], []
    best_state = model_dir / checkpoint.BEST_STATE

    try:
        if start_epoch > 1 and not resume_metrics:
            # legacy train_state without schedule info: replay warmup
            for epoch in range(1, start_epoch):
                schedule.start_epoch(epoch)
        for epoch in range(start_epoch, max_epochs + 1):
            print(f"\n----- Epoch {epoch} -----")
            schedule.start_epoch(epoch)

            # Training phase. Metrics stay device scalars until the epoch
            # ends so per-step host syncs never stall the async pipeline.
            # A device-resident stratified set runs the WHOLE epoch as one
            # compiled scan dispatch (same batch plan and RNG chain as the
            # per-step loop — tests/test_trainer_scan.py): wall clock is
            # device compute + one round trip instead of per-step pacing
            # over the host link.
            stacked = None
            if getattr(train_loader, "_use_mixed", False):
                stacked = train_loader.epoch_mixed_stacked(shuffle=True)
            if stacked is not None:
                loss_sum, acc_sum, n_sum = trainer.train_epoch_mixed_scanned(
                    *stacked, schedule.stage, schedule.lrs
                )
            else:
                loss_sum = acc_sum = n_sum = 0.0
                batches = (tqdm(train_loader) if progress_bar
                           else train_loader)
                for batch in batches:
                    ls, cs, n = trainer.train_batch(batch, schedule.stage,
                                                    schedule.lrs)
                    loss_sum += ls
                    acc_sum += cs
                    n_sum += n
            train_acc = float(acc_sum) / float(n_sum)
            train_loss = float(loss_sum) / float(n_sum)
            train_accuracies.append(train_acc)
            train_losses.append(train_loss)
            print(f"[STAT] Train Acc: {train_acc:.3f}, Train Loss: {train_loss:.3f}")

            # Validation phase
            loss_sum = acc_sum = n_sum = 0.0
            for batch in val_loader:
                ls, cs, n, _ = trainer.eval_batch(batch)
                loss_sum += ls
                acc_sum += cs
                n_sum += n
            val_acc = float(acc_sum) / float(n_sum)
            val_loss = float(loss_sum) / float(n_sum)
            val_accuracies.append(val_acc)
            val_losses.append(val_loss)
            print(f"[STAT] Val Acc: {val_acc:.3f}, Val Loss: {val_loss:.3f}")

            # Checkpoint + plots (reference train.py:277-300)
            if plots:
                plot.plot_stats(
                    train_accuracies, train_losses, val_accuracies, val_losses,
                    outfile=model_dir / "train_stats.png",
                    first_epoch=1, epoch_step=3,
                )
                if epoch >= 11:
                    plot.plot_stats(
                        train_accuracies[10:], train_losses[10:],
                        val_accuracies[10:], val_losses[10:],
                        outfile=model_dir / "train_stats_zoomed.png",
                        first_epoch=11, epoch_step=2,
                    )
            if val_acc > max_val_acc:
                print("[INFO] Increased accuracy, saving model state")
                max_val_acc = val_acc
                checkpoint.save_variables(best_state, trainer.variables)

            if val_loss < min_val_loss or (epoch == start_epoch
                                           and not resume_metrics):
                no_improvement = 0
                min_val_loss = val_loss
            else:
                no_improvement += 1
                print(f"[INFO] No reduction in loss for {no_improvement} epochs")
            early_stop = no_improvement >= early_stop_patience
            if not early_stop:
                schedule.end_epoch(epoch, val_loss)
            # Mid-training resume state (upgrade over the reference):
            # params + optimizer + LR schedule + best-metric bookkeeping
            save_train_state(
                model_dir, trainer, epoch,
                metrics={
                    "max_val_acc": max_val_acc,
                    "min_val_loss": min_val_loss,
                    "no_improvement": no_improvement,
                },
                schedule=schedule,
            )
            if early_stop:
                print("[INFO] Stopping early")
                break
    except KeyboardInterrupt:
        print("[INFO] Stopping early")
    except Exception as e:  # reference swallows and returns best (train.py:316-320)
        log.exception(f"[ERROR] {e}")
    if not best_state.is_file():
        # No epoch improved (or first epoch crashed): save current state
        checkpoint.save_variables(best_state, trainer.variables)
    return best_state


def test_net(trainer: Trainer, loader, classes, test_name=None) -> str:
    """Accuracy + sklearn classification report (reference ``train.py:323-349``)."""
    from sklearn.metrics import classification_report

    if test_name:
        print(f"\n----- Model Evaluation ({test_name}) -----")
    else:
        print("\n----- Model Evaluation -----")
    true_labels: list[int] = []
    predicted_labels: list[int] = []
    acc_sum = n_sum = 0.0
    for batch in loader:
        ls, cs, n, preds = trainer.eval_batch(batch)
        acc_sum += cs
        n_sum += n
        real = batch.weights > 0
        true_labels.extend(np.asarray(batch.labels)[real].tolist())
        predicted_labels.extend(np.asarray(preds)[real].tolist())
    print(f"[STAT] Test Accuracy: {acc_sum / n_sum:.3f}\n")
    return classification_report(
        true_labels,
        predicted_labels,
        labels=list(range(len(classes))),
        target_names=classes,
        zero_division=0,
    )


def load_train_state(model_dir, trainer: Trainer):
    """Restore params/batch_stats/optimizer state from
    ``train_state.msgpack``. Returns the saved state dict (with ``epoch``,
    ``metrics`` and ``schedule`` entries) or None."""
    import jax
    from flax import serialization

    path = Path(model_dir) / "train_state.msgpack"
    if not path.is_file():
        return None
    state = serialization.msgpack_restore(path.read_bytes())
    # place_params keeps any tensor-parallel sharding the trainer applies on
    # a model-axis mesh (a bare replicated put would silently drop it)
    trainer.params = trainer.place_params(state["params"])
    trainer.batch_stats = jax.device_put(state["batch_stats"], trainer._replicated)
    # restore optimizer moments into a tree whose placement mirrors the
    # (possibly sharded) parameters: from_state_dict substitutes host numpy
    # leaves into the template, so each leaf is re-placed onto the sharding
    # tx.init chose (otherwise step 1 uploads numpy and step 2 recompiles
    # against different input shardings)
    template = trainer.tx.init(trainer.params)
    restored = serialization.from_state_dict(template, state["opt_state"])
    mesh_devices = set(trainer.mesh.devices.flat)

    def _place(t, r):
        if not isinstance(t, jax.Array):
            return r
        # moments inherit the (possibly tp-sharded) param placement from
        # tx.init; leaves optax created fresh (e.g. the step count) sit
        # uncommitted on one device — commit those replicated instead of
        # pinning them against the mesh-committed params
        if set(t.sharding.device_set) == mesh_devices:
            return jax.device_put(r, t.sharding)
        return jax.device_put(r, trainer._replicated)

    trainer.opt_state = jax.tree_util.tree_map(_place, template, restored)
    return state


def save_train_state(model_dir, trainer: Trainer, epoch: int,
                     metrics: dict | None = None, schedule=None) -> None:
    """Persist params + batch_stats + optimizer state + training
    bookkeeping for resume."""
    import jax
    from flax import serialization

    state = {
        "params": jax.device_get(trainer.params),
        "batch_stats": jax.device_get(trainer.batch_stats),
        "opt_state": serialization.to_state_dict(jax.device_get(trainer.opt_state)),
        "epoch": epoch,
        "metrics": dict(metrics or {}),
        "schedule": schedule.snapshot() if schedule is not None else {},
    }
    path = Path(model_dir) / "train_state.msgpack"
    path.write_bytes(serialization.msgpack_serialize(state))


def load_pretrained(variables, weights_spec, network_name: str,
                    allow_random_init: bool = False):
    """Resolve the ``[model] weights`` option (reference ``config.py:63-70``).

    - empty/None: random init (the explicit way to ask for it)
    - a path to ``.msgpack``/``.pth``: load and merge matching leaves
    - a torchvision weights name ("DEFAULT", "IMAGENET1K_V1", ...): load via
      the local torchvision install/cache. The reference ALWAYS trains from
      pretrained weights — transfer learning is its whole recipe — so a
      failed load is a hard error, not a silent quality cliff, unless the
      config opts in with ``[model] allow_random_init = yes``.
    """
    if not weights_spec:
        return variables
    path = Path(str(weights_spec))
    if path.suffix in (".msgpack", ".pth"):
        # a checkpoint path must exist: silently training a multi-hour run
        # from random init because of a typo is unacceptable
        if not path.is_file():
            raise FileNotFoundError(
                f"[model] weights checkpoint not found: {path}"
            )
        if path.suffix == ".msgpack":
            return merge_variables(variables, checkpoint.load_variables(path))
        from ..models import convert_torch

        # the config names the family — no need to rely on key sniffing
        return merge_variables(
            variables, convert_torch.load_pth(path, network_name)
        )
    try:
        from ..models import convert_torch
        import torchvision.models as tvm

        torch_model = getattr(tvm, network_name)(weights=weights_spec)
        loaded = convert_torch.torch_to_flax(
            network_name, torch_model.state_dict()
        )
        return merge_variables(variables, loaded)
    except Exception as e:
        if allow_random_init:
            log.warning(
                f"Could not load pretrained weights '{weights_spec}' "
                f"({e}); training from random init "
                "([model] allow_random_init is set)"
            )
            return variables
        raise RuntimeError(
            f"Could not load pretrained weights '{weights_spec}' ({e}). "
            "Point [model] weights at a .msgpack/.pth checkpoint, install "
            "a torchvision cache, or set [model] allow_random_init = yes "
            "to knowingly train from scratch."
        ) from e


def merge_variables(init_vars, loaded_vars):
    """Copy leaves from ``loaded_vars`` whose path+shape match ``init_vars``
    (the classification head keeps its fresh init when class counts differ)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    init_flat = flatten_dict(init_vars)
    loaded_flat = flatten_dict(loaded_vars)
    merged = {}
    for path, leaf in init_flat.items():
        cand = loaded_flat.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            merged[path] = np.asarray(cand)
        else:
            merged[path] = leaf
    return unflatten_dict(merged)


def _augment_kwargs(augment_spec):
    from ..ops import augment as augment_ops

    if not augment_spec.augmentations:
        return {}
    return augment_ops.spec_kwargs(
        augment_spec.augmentations,
        augment_spec.zoom_range,
        augment_spec.brightness_range,
        augment_spec.max_rotation,
    )


def _save_images(root, model_data, test_split: bool) -> None:
    """Copy the split image sets to disk (reference ``train.py:38-51``)."""
    root = Path(root)
    (root / "train").mkdir(exist_ok=True, parents=True)
    (root / "val").mkdir(exist_ok=True)
    for img_path in model_data.train_x:
        shutil.copy(img_path, root / "train" / img_path.name)
    for img_path in model_data.val_x:
        shutil.copy(img_path, root / "val" / img_path.name)
    if test_split:
        (root / "test").mkdir(exist_ok=True)
        for img_path in model_data.test_x:
            shutil.copy(img_path, root / "test" / img_path.name)


def _collage(collage_args, model_data, spec, augment_spec, num_workers):
    """Save a grid of augmented training images (reference ``train.py:76-93``)."""
    import jax

    from ..analyze import plot
    from ..ops import augment as augment_ops
    from ..ops import preprocess

    height, width, out_file = collage_args
    height, width = int(height), int(width)
    out_file = Path(out_file)
    if not out_file.suffix:
        out_file = out_file.with_suffix(".png")
    batch_size = height * width
    train_x, train_y = model_data.train_set()
    loader = BatchLoader(
        train_x, train_y, batch_size, shuffle=True,
        num_threads=max(num_workers, 1),
    )
    batch = next(iter(loader))
    new_h, new_w, pad_top, pad_left = preprocess.compute_geometry(
        batch.heights, batch.widths, spec.target_h, spec.target_w
    )
    border = preprocess.border_values(
        batch.canvas, batch.heights, batch.widths, spec.border
    )
    img = preprocess.resize_pad_batch(
        batch.canvas, batch.heights, batch.widths, new_h, new_w,
        pad_top, pad_left, border, spec.target_h, spec.target_w,
    )
    kwargs = _augment_kwargs(augment_spec)
    if kwargs:
        lim_x, lim_y = augment_ops.translate_limits(
            batch.heights, batch.widths, new_h, new_w,
            spec.target_h, spec.target_w,
        )
        img = augment_ops.augment_batch(
            jax.random.PRNGKey(0), img, border, lim_x, lim_y, **kwargs
        )
    plot.view_batch(np.asarray(img) / 255.0, h=height, w=width, save=out_file)
    print(f"[INFO] Image collage saved to {out_file}")
    return out_file
