"""Measure the tunnel's D2H behavior and A/B the fixed-point result rows.

Three questions, answered on the real chip:
1. What does the download direction actually run at (f32 rows vs the
   compact uint16 rows)?
2. Do downloads overlap uploads (full duplex) or share the channel?
3. What does the compaction do to the judged e2e stream? (alternating
   passes, so link weather hits both arms equally)

Run: /opt/venv/bin/python tools/d2h_probe.py [n_rois]
"""
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import _venvfix

_venvfix.ensure()
import numpy as np

from sykepic_tpu.utils import jaxcache

jaxcache.enable()
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)


def timed_download(x, n=5):
    """Median seconds to materialize a FRESH copy of x on the host.
    jax.Array caches its numpy conversion, so each timing must download a
    newly computed array (x + i) or every repeat after the first reads
    host memory and reports absurd GB/s (the first run of this probe did
    exactly that)."""
    add = jax.jit(lambda a, b: a + b)  # one compile per dtype/shape
    fresh = [add(x, np.asarray(i, np.asarray(x).dtype))
             for i in range(n + 1)]
    np.asarray(fresh[0])  # warm + compile
    ts = []
    for f in fresh[1:]:
        t0 = time.perf_counter()
        np.asarray(f)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# --- 1. raw D2H rate at the two row formats -------------------------------
f32_rows = jax.device_put(np.random.default_rng(0)
                          .random((2048, 50), np.float32))
u16_rows = jax.device_put((np.random.default_rng(0)
                           .integers(0, 65535, (2048, 54)))
                          .astype(np.uint16))
big = jax.device_put(np.random.default_rng(1)
                     .integers(0, 255, (8 * 1024 * 1024,), np.uint8))
for name, x in [("f32 rows 409KB", f32_rows), ("u16 rows 221KB", u16_rows),
                ("8MB blob", big)]:
    s = timed_download(x)
    nbytes = np.asarray(x).nbytes
    print(f"D2H {name}: {s*1e3:.1f} ms = {nbytes/s/1e6:.1f} MB/s", flush=True)

# --- 2. duplex: time downloads while uploads saturate the link ------------
payload = np.random.default_rng(7).integers(0, 255, (8 * 1024 * 1024,),
                                            np.uint8)
np.asarray(jax.device_put(payload)[:1])  # warm upload path
stop = threading.Event()


def uploader():
    while not stop.is_set():
        np.asarray(jax.device_put(payload)[:1])


t0 = time.perf_counter()
np.asarray(jax.device_put(payload)[:1])
up_s = time.perf_counter() - t0
print(f"H2D 8MB alone: {up_s*1e3:.0f} ms = {8/up_s:.1f} MB/s", flush=True)

th = threading.Thread(target=uploader, daemon=True)
th.start()
time.sleep(0.5)
s_busy = timed_download(f32_rows, n=8)
stop.set()
th.join(timeout=30)
s_idle = timed_download(f32_rows, n=8)
print(f"D2H f32 rows while uploading: {s_busy*1e3:.1f} ms "
      f"(idle: {s_idle*1e3:.1f} ms) -> "
      f"{'SERIALIZED' if s_busy > 2 * s_idle else 'overlaps'}", flush=True)

# --- 3. alternating e2e passes: compact on vs off -------------------------
n_rois = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
import bench
from sykepic_tpu.compute import probability

root = Path(tempfile.mkdtemp(prefix="d2h_ab_"))
model_dir = bench.build_model_dir(root)
samples = bench.build_workload(root, n_rois)

clfs = {}
for mode in ("on", "off"):
    os.environ["SYKEPIC_D2H_COMPACT"] = mode
    clfs[mode] = probability.prepare_model(model_dir, batch_size=2048,
                                           dtype="bfloat16")
    probability.precompile_for_samples(samples, clfs[mode], budget_s=600.0)
    # warm the pipeline
    probability.process_samples_batched(samples[:8], clfs[mode],
                                        root / f"warm_{mode}")

rates = {"on": [], "off": []}
for rep in range(4):
    for mode in ("on", "off") if rep % 2 == 0 else ("off", "on"):
        out = root / f"ab_{mode}_{rep}"
        t0 = time.perf_counter()
        probability.process_samples_batched(samples, clfs[mode], out)
        dt = time.perf_counter() - t0
        rates[mode].append(n_rois / dt)
        print(f"pass {rep} {mode}: {n_rois/dt:.0f} ROIs/s", flush=True)
for mode in ("on", "off"):
    r = rates[mode]
    print(f"compact={mode}: median {np.median(r):.0f} best {max(r):.0f}")
import shutil

shutil.rmtree(root, ignore_errors=True)
