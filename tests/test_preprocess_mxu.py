"""The MXU (matmul) resize path must match the gather reference path."""

import numpy as np
import jax.numpy as jnp

from sykepic_tpu.ops import preprocess


def test_mxu_matches_gather():
    rng = np.random.default_rng(0)
    b = 6
    canvas = np.zeros((b, 64, 128), np.uint8)
    heights = np.zeros(b, np.int32)
    widths = np.zeros(b, np.int32)
    for i in range(b):
        h, w = int(rng.integers(5, 64)), int(rng.integers(5, 128))
        canvas[i, :h, :w] = rng.integers(0, 255, (h, w), np.uint8)
        heights[i], widths[i] = h, w
    new_h, new_w, pad_top, pad_left = preprocess.compute_geometry(
        heights, widths, 180, 180
    )
    border = rng.integers(0, 255, b).astype(np.uint8)
    args = (
        jnp.asarray(canvas), jnp.asarray(heights), jnp.asarray(widths),
        jnp.asarray(new_h), jnp.asarray(new_w),
        jnp.asarray(pad_top), jnp.asarray(pad_left), jnp.asarray(border),
        180, 180,
    )
    ref = np.asarray(preprocess.resize_pad_batch(*args))
    mxu = np.asarray(preprocess.resize_pad_batch_mxu(*args))
    # same bilinear sum, different float association
    np.testing.assert_allclose(mxu, ref, atol=2e-3)


def test_mxu_upscale_and_downscale():
    # tiny ROI upscaled 180/4 and a full-canvas ROI downscaled
    canvas = np.zeros((2, 256, 256), np.uint8)
    canvas[0, :4, :4] = 200
    canvas[1] = np.tile(np.arange(256, dtype=np.uint8), (256, 1))
    heights = np.array([4, 256], np.int32)
    widths = np.array([4, 256], np.int32)
    new_h, new_w, pad_top, pad_left = preprocess.compute_geometry(
        heights, widths, 180, 180
    )
    border = np.array([10, 10], np.uint8)
    args = (
        jnp.asarray(canvas), jnp.asarray(heights), jnp.asarray(widths),
        jnp.asarray(new_h), jnp.asarray(new_w),
        jnp.asarray(pad_top), jnp.asarray(pad_left), jnp.asarray(border),
        180, 180,
    )
    ref = np.asarray(preprocess.resize_pad_batch(*args))
    mxu = np.asarray(preprocess.resize_pad_batch_mxu(*args))
    np.testing.assert_allclose(mxu, ref, atol=2e-3)
