"""Piecewise on-chip attribution of the production train step
(bench.py::train_benchmark config: resnet18 bf16, 256x180x180x3, Adam,
full rotation-free augmentation, device-resident gathered batch).

The full gathered step measured ~20.8 ms (CLAUDE.md breakdown); this tool
splits it: gather+preprocess+augment / forward / forward+backward /
optimizer-only / full core — so the 41%-of-peak MFU figure is attributed
instead of unexamined (VERDICT r04 item 4).
"""
import sys, os, time
sys.path.insert(0, "/root/repo")
import _venvfix; _venvfix.ensure()
import numpy as np
from sykepic_tpu.utils import jaxcache
jaxcache.enable()

import jax
import jax.numpy as jnp
import optax

from sykepic_tpu.models.registry import build_model, init_variables
from sykepic_tpu.train.config import PreprocessSpec
from sykepic_tpu.train.device_data import make_store
from sykepic_tpu.train.trainer import Trainer

B = int(os.environ.get("PROF_B", 256))
n_classes = 8

model = build_model("resnet18", num_classes=n_classes, head=(256, 128),
                    dtype=jnp.bfloat16)
variables = init_variables(model, (180, 180, 3), seed=0)
spec = PreprocessSpec(target_h=180, target_w=180, num_chans=3, border="mode")
trainer = Trainer(
    model, variables, optimizer="Adam", preprocess_spec=spec,
    augment_kwargs=dict(flip=True, translate=True, zoom=True,
                        brightness=True, zoom_range=(0.6, 1.4),
                        brightness_range=(0.95, 1.1)),
)
lrs = jnp.asarray((1e-3, 1e-4, 1e-5), jnp.float32)

# one bucket store of B ragged fake ROIs (the gathered production path)
rng = np.random.default_rng(0)
canvas = np.zeros((B, 128, 160), np.uint8)
heights = np.zeros(B, np.int32)
widths = np.zeros(B, np.int32)
for i in range(B):
    h, w = int(rng.integers(30, 128)), int(rng.integers(40, 160))
    canvas[i, :h, :w] = rng.integers(0, 255, (h, w), np.uint8)
    heights[i], widths[i] = h, w
labels = rng.integers(0, n_classes, B).astype(np.int32)
store = {k: jax.device_put(v, trainer._replicated)
         for k, v in make_store(canvas, heights, widths, labels, spec).items()}
idx = jax.device_put(np.arange(B, dtype=np.int32), trainer._replicated)
wts = jax.device_put(np.ones(B, np.float32), trainer._replicated)
key = trainer.key

params = trainer.params
bstats = trainer.batch_stats
opt_state = trainer.opt_state
FIELDS = Trainer._STORE_FIELDS


def gather_and_preprocess(store, idx, key):
    g = [jnp.take(store[f], idx, axis=0) for f in FIELDS]
    (cv, hh, ww, nh, nw, pt, pl, bd, lx, ly, y) = g
    aug_key, drop_key = jax.random.split(key)
    x = trainer._device_preprocess(cv, hh, ww, nh, nw, pt, pl, bd, lx, ly,
                                   aug_key, train=True)
    return x, y, drop_key


@jax.jit
def pre_only(store, idx, key):
    x, y, _ = gather_and_preprocess(store, idx, key)
    return x.sum()


def loss_fn(p, bstats, x, y, drop_key):
    logits, mutated = model.apply(
        {"params": p, "batch_stats": bstats}, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": drop_key},
    )
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), y)
    loss = jnp.sum(losses * wts) / jnp.maximum(jnp.sum(wts), 1.0)
    return loss, (mutated["batch_stats"], logits)


@jax.jit
def fwd_only(params, bstats, store, idx, key):
    x, y, drop_key = gather_and_preprocess(store, idx, key)
    loss, (nb, logits) = loss_fn(params, bstats, x, y, drop_key)
    return loss


@jax.jit
def fwd_bwd(params, bstats, store, idx, key):
    x, y, drop_key = gather_and_preprocess(store, idx, key)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, bstats, x, y, drop_key)
    # real reduce over every grad leaf: nothing DCE-able, output one scalar
    acc = loss
    for g in jax.tree_util.tree_leaves(grads):
        acc = acc + jnp.sum(g.astype(jnp.float32))
    return acc


@jax.jit
def opt_only(params, opt_state, grads):
    labels_tree = trainer.labels
    updates, new_opt = trainer.tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(
        lambda u, lab: -lrs[lab] * u, updates, labels_tree)
    new_params = optax.apply_updates(params, updates)
    # tiny dependent reduce so the whole update survives DCE without a
    # full-tree output transfer
    acc = jnp.float32(0)
    for p in jax.tree_util.tree_leaves(new_params):
        acc = acc + jnp.sum(p.astype(jnp.float32))
    for m in jax.tree_util.tree_leaves(new_opt):
        if hasattr(m, "astype"):
            acc = acc + jnp.sum(m.astype(jnp.float32))
    return acc


# grads with the params' own structure/dtypes for opt_only
grads_like = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)

core = trainer._core_update(stage=2)


@jax.jit
def full_step(params, bstats, opt_state, store, idx, key):
    g = [jnp.take(store[f], idx, axis=0) for f in FIELDS]
    (cv, hh, ww, nh, nw, pt, pl, bd, lx, ly, y) = g
    aug_key, drop_key = jax.random.split(key)
    x = trainer._device_preprocess(cv, hh, ww, nh, nw, pt, pl, bd, lx, ly,
                                   aug_key, train=True)
    out = core(params, bstats, opt_state, x, y, wts, lrs, drop_key)
    # reduce the WHOLE new state to one scalar: returning only the loss
    # would let XLA dead-code-eliminate backward+optimizer entirely
    # (measured: "full" == forward-only without this)
    new_params, new_bstats, new_opt, loss_sum, _, _ = out
    acc = loss_sum
    for t in (new_params, new_bstats, new_opt):
        for leaf in jax.tree_util.tree_leaves(t):
            if hasattr(leaf, "astype"):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def timeit(label, fn, *args, repeats=20):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / repeats
    print(f"{label:<34s} {dt*1e3:7.2f} ms")
    return dt


print(f"batch {B}, resnet18 bf16 180x180x3, gathered production step")
t_pre = timeit("gather+preprocess+augment", pre_only, store, idx, key)
t_fwd = timeit("  + forward (loss)", fwd_only, params, bstats, store, idx, key)
t_fb = timeit("  + backward", fwd_bwd, params, bstats, store, idx, key)
t_opt = timeit("optimizer-only (Adam 3-group)", opt_only, params, opt_state,
               grads_like)
t_full = timeit("FULL core step", full_step, params, bstats, opt_state,
                store, idx, key)
print(f"\nattribution: preprocess {t_pre*1e3:.2f} | fwd {((t_fwd-t_pre))*1e3:.2f} "
      f"| bwd {(t_fb-t_fwd)*1e3:.2f} | opt {t_opt*1e3:.2f} "
      f"| full {t_full*1e3:.2f} (sum of parts {(t_fb+t_opt)*1e3:.2f})")
