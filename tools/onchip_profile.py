"""Attribute the on-chip per-ROI cost of the shelf inference program:
full program vs model-only vs preprocess-only vs slab-gather-only."""
import sys, os, time, tempfile, itertools
sys.path.insert(0, "/root/repo")
import _venvfix; _venvfix.ensure()
import numpy as np
from pathlib import Path
from sykepic_tpu.utils import jaxcache
jaxcache.enable()
import bench
from sykepic_tpu.compute import probability

root = Path(tempfile.mkdtemp())
model_dir = bench.build_model_dir(root)
samples = bench.build_workload(root, 8000)
clf = probability.prepare_model(model_dir, batch_size=2048, dtype="bfloat16")

import jax, jax.numpy as jnp
import math
from functools import partial
from sykepic_tpu.ingest import ifcb
from sykepic_tpu.ops import preprocess

def roi_stream():
    for idx, p in enumerate(samples[:8]):
        for rid, img in ifcb.read_sample(p).images():
            yield idx, rid, img

# ---- full program (existing probe) ----
n, secs = clf.onchip_rate(roi_stream(), repeats=8)
full_us = secs / n * 1e6
print(f"full shelf program: {n} ROIs, {n/secs:.0f} ROIs/s, {full_us:.2f} us/ROI")

# ---- gather device-resident batches once for piecewise timing ----
args_list = []
nr = 0
for batch, meta in itertools.islice(clf._prepared_shelf_batches(roi_stream()), 32):
    w = jax.device_put(batch.windows)
    m = jax.device_put(meta)
    args_list.append((w, m, batch.n_valid, batch.windows.shape))
    nr += batch.n_valid
print("batches:", len(args_list), "rois:", nr,
      "window shapes:", {a[3] for a in args_list})

spec = clf.spec
model = clf.model
variables = clf.variables
TH, TW = spec.target_h, spec.target_w

@jax.jit
def model_only(x):
    logits = model.apply(variables, x, train=False)
    return jax.nn.softmax(logits.astype(jnp.float32) * math.log(1.3), axis=-1)

@jax.jit
def pre_only(windows, meta):
    (win_idx, y0, x0, heights, widths, new_h, new_w, pad_top, pad_left) = (
        meta[i] for i in range(9))
    border = meta[9].astype(jnp.uint8)
    slabs = jnp.take(windows, win_idx, axis=0)
    x = preprocess.eval_preprocess(
        slabs, heights, widths, new_h, new_w, pad_top, pad_left, border,
        target_h=TH, target_w=TW, num_chans=spec.num_chans,
        imagenet_normalization=False, use_pallas=False,
        y_origin=y0, x_origin=x0)
    return x.sum()  # tiny reduce so the output transfer is negligible

@jax.jit
def gather_only(windows, meta):
    slabs = jnp.take(windows, meta[0], axis=0)
    return slabs.sum()

def timeit(fn, argses, repeats=8, label=""):
    out = None
    for a in argses:
        out = fn(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        for a in argses:
            out = fn(*a)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / repeats
    print(f"{label}: {dt:.4f} s/pass, {nr/dt:.0f} ROIs/s, {dt/nr*1e6:.2f} us/ROI")
    return dt

# model-only: one resident batch per shelf batch at its slot count
xs = []
rng = np.random.default_rng(0)
for w, m, nv, shape in args_list:
    R = int(np.asarray(m).shape[1])
    x = jnp.asarray(rng.uniform(0, 1, (R, TH, TW, spec.num_chans)), jnp.float32)
    xs.append((jax.device_put(x),))
timeit(model_only, xs, label="model-only (conv stack + softmax)")
timeit(pre_only, [(w, m) for w, m, _, _ in args_list], label="preprocess-only (gather+resize einsums)")
timeit(gather_only, [(w, m) for w, m, _, _ in args_list], label="slab-gather-only")
