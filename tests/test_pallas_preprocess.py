"""The Pallas fused resize kernel (interpret mode on CPU) must match the
XLA einsum formulation exactly — same math, different scheduling."""

import jax.numpy as jnp
import numpy as np

from sykepic_tpu.ops import pallas_preprocess, preprocess


def make_batch(b=5, ch=48, cw=64, seed=0):
    rng = np.random.default_rng(seed)
    canvas = np.zeros((b, ch, cw), np.uint8)
    heights = np.zeros(b, np.int32)
    widths = np.zeros(b, np.int32)
    for i in range(b):
        h, w = int(rng.integers(5, ch)), int(rng.integers(5, cw))
        canvas[i, :h, :w] = rng.integers(0, 255, (h, w), np.uint8)
        heights[i], widths[i] = h, w
    border = rng.integers(0, 255, b).astype(np.uint8)
    return canvas, heights, widths, border


def test_pallas_matches_einsum():
    target = 96
    canvas, heights, widths, border = make_batch()
    new_h, new_w, pt, pl_ = preprocess.compute_geometry(
        heights, widths, target, target
    )
    args = (jnp.asarray(canvas), jnp.asarray(heights), jnp.asarray(widths),
            jnp.asarray(new_h), jnp.asarray(new_w),
            jnp.asarray(pt), jnp.asarray(pl_), jnp.asarray(border))
    ref = np.asarray(preprocess.resize_pad_batch_mxu(*args, target, target))
    out = np.asarray(
        pallas_preprocess.resize_pad_batch_pallas(
            *args, target, target, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_pallas_fixture_rois():
    from sykepic_tpu.ingest import ifcb, pack

    rois = ifcb.read_sample("tests/data/raw/valid/D20180712T065600_IFCB114")
    tagged = [(0, rid, img) for rid, img in rois.images()]
    (batch,) = pack.pack_rois(tagged, batch_size=2, buckets=((64, 128),))
    new_h, new_w, pt, pl_ = preprocess.compute_geometry(
        batch.heights, batch.widths, 180, 180
    )
    border = preprocess.border_values(
        batch.canvas, batch.heights, batch.widths, "mode"
    )
    args = (jnp.asarray(batch.canvas), jnp.asarray(batch.heights),
            jnp.asarray(batch.widths), jnp.asarray(new_h), jnp.asarray(new_w),
            jnp.asarray(pt), jnp.asarray(pl_), jnp.asarray(border))
    ref = np.asarray(preprocess.resize_pad_batch_mxu(*args, 180, 180))
    out = np.asarray(
        pallas_preprocess.resize_pad_batch_pallas(
            *args, 180, 180, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3)
