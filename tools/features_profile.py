"""Piecewise on-chip attribution of ops/features_device.device_features —
the fused classify+features leg's dominant program (engine.py:52-54 says
it dwarfs the CNN; this tool says WHERE).

Phases are cumulative prefixes of the real pipeline (each k runs phases
1..k and reduces to a scalar so D2H is negligible); successive
differences attribute per-phase device time. Inputs mirror the fused
bench workload: the real fixture ROI resized to 48x96, replicated to a
full slot batch (bench.py::fused_benchmark).
"""
import sys, os, time
sys.path.insert(0, "/root/repo")
import _venvfix; _venvfix.ensure()
import numpy as np
from pathlib import Path
from sykepic_tpu.utils import jaxcache
jaxcache.enable()

import jax
import jax.numpy as jnp
import cv2

from sykepic_tpu.ingest import ifcb
from sykepic_tpu.ops import features_device as fd
from sykepic_tpu.compute.features import DARK_OTSU_SCALE, HYST_HIGH, HYST_LOW

REPO = Path("/root/repo")
B = int(os.environ.get("PROF_B", 2048))
H, W = 48, 96

fixture = REPO / "tests/data/raw/valid/D20180712T065600_IFCB114"
src = [img for _, img in ifcb.read_sample(fixture).images()]
tile = cv2.resize(src[0], (W, H), interpolation=cv2.INTER_AREA)
canvas = np.broadcast_to(tile, (B, H, W)).copy()
heights = np.full(B, H, np.int32)
widths = np.full(B, W, np.int32)

canvas_d = jax.device_put(canvas)
heights_d = jax.device_put(heights)
widths_d = jax.device_put(widths)

fill_iters = H * W
edt_iters = H * W


def make_prefix(k):
    @jax.jit
    def prefix(canvas, heights, widths):
        t, valid = fd.batched_otsu(canvas, heights, widths)
        if k == 1:
            return t.sum() + valid.sum()
        xf = canvas.astype(jnp.float32)
        xfill = fd._replicate_fill(xf, valid, max(H, W))
        if k == 2:
            return xfill.sum()
        mm = fd.phasecong_Mm_batched(xfill, valid)
        if k == 3:
            return mm.sum()
        weak = (mm > HYST_LOW) & valid
        strong = (mm > HYST_HIGH) & valid
        edges = fd._flood(strong, weak, fill_iters)
        if k == 4:
            return edges.sum()
        mask = fd.dilate_disk2(edges, valid)
        mask = fd.fill_holes(mask, valid, fill_iters)
        mask = fd.erode_disk2(mask, valid, 2)
        dark = (canvas.astype(jnp.int32)
                <= (t.astype(jnp.float32) * DARK_OTSU_SCALE)[:, None, None]) & valid
        mask = fd.fill_holes(mask | dark, valid, fill_iters)
        if k == 5:
            return mask.sum()
        d_all = fd.chamfer_distance(mask, edt_iters, valid=valid)
        if k == 6:
            return d_all.sum()
        blob = fd._largest_blob(mask, d_all, fill_iters)
        if k == 7:
            return blob.sum()
        d = fd.chamfer_distance(blob, edt_iters, valid=valid)
        if k == 8:
            return d.sum()
        area, major, minor = fd.moments_features(blob)
        biovolume = 4.0 * d.sum(axis=(1, 2)) - 3.0 * area
        return jnp.stack([area, biovolume, major, minor], axis=1).sum()
    return prefix


LABELS = [
    "otsu",
    "replicate_fill",
    "phasecong (FFT bank)",
    "hysteresis flood",
    "morphology (dilate/fill/erode/dark/fill)",
    "chamfer #1 (mask)",
    "largest_blob (4 candidate floods)",
    "chamfer #2 (blob)",
    "moments+biovolume",
]


def timeit(fn, repeats=4):
    out = fn(canvas_d, heights_d, widths_d)
    np.asarray(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(canvas_d, heights_d, widths_d)
    np.asarray(out)
    return (time.perf_counter() - t0) / repeats


print(f"batch {B} x ({H},{W})  -- cumulative prefix timings")
prev = 0.0
rows = []
for k in range(1, 10):
    dt = timeit(make_prefix(k))
    rows.append((LABELS[k - 1], dt, dt - prev))
    print(f"  1..{k} {LABELS[k-1]:<42s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} ms, {(dt-prev)/B*1e6:6.1f} us/ROI)")
    prev = dt
total = prev
print(f"total: {total*1e3:.1f} ms = {total/B*1e6:.1f} us/ROI -> {B/total:.0f} ROIs/s feature-program ceiling")
