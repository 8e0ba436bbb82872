"""The separable (matmul-folded) augmentation path must match the gather
warp for flip/translate/zoom, since both implement the same affines."""

import jax
import jax.numpy as jnp
import numpy as np

from sykepic_tpu.ops import augment, preprocess


def make_batch(b=6, seed=0):
    """Smooth gradient images: the two paths resample once vs twice, so
    comparisons need content whose interpolation error is small."""
    rng = np.random.default_rng(seed)
    canvas = np.zeros((b, 48, 64), np.uint8)
    heights = np.zeros(b, np.int32)
    widths = np.zeros(b, np.int32)
    for i in range(b):
        h, w = int(rng.integers(10, 48)), int(rng.integers(10, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        img = 40 + 2.5 * xx + 1.5 * yy + 20 * np.sin(yy / 5.0)
        canvas[i, :h, :w] = np.clip(img, 0, 255).astype(np.uint8)
        heights[i], widths[i] = h, w
    border = rng.integers(0, 255, b).astype(np.uint8)
    return canvas, heights, widths, border


def run_both(kw, seed=3, target=96):
    canvas, heights, widths, border = make_batch()
    new_h, new_w, pt, pl = preprocess.compute_geometry(
        heights, widths, target, target
    )
    lim_x, lim_y = augment.translate_limits(
        heights, widths, new_h, new_w, target, target
    )
    key = jax.random.PRNGKey(seed)
    args = (jnp.asarray(canvas), jnp.asarray(heights), jnp.asarray(widths),
            jnp.asarray(new_h), jnp.asarray(new_w),
            jnp.asarray(pt), jnp.asarray(pl), jnp.asarray(border))

    # gather path: resize then warp (same key -> same drawn params)
    img = preprocess.resize_pad_batch_mxu(*args, target, target)
    gathered = augment.augment_batch(
        key, img, jnp.asarray(border), jnp.asarray(lim_x), jnp.asarray(lim_y),
        **kw,
    )

    # separable path: params folded into the resize
    aff_y, aff_x, bright = augment.separable_params(
        key, canvas.shape[0], jnp.asarray(lim_x), jnp.asarray(lim_y),
        target, target,
        flip=kw.get("flip", False), translate=kw.get("translate", False),
        zoom=kw.get("zoom", False), brightness=kw.get("brightness", False),
        zoom_range=kw.get("zoom_range", (1.0, 1.0)),
        brightness_range=kw.get("brightness_range", (1.0, 1.0)),
    )
    folded = preprocess.resize_pad_batch_mxu(
        *args, target, target, affine_y=aff_y, affine_x=aff_x
    )
    folded = augment.apply_brightness(folded, bright)
    return np.asarray(gathered), np.asarray(folded)


def close_fraction(a, b, tol=1.5):
    return (np.abs(a - b) <= tol).mean()


def test_flip_matches():
    g, f = run_both(dict(flip=True))
    np.testing.assert_allclose(f, np.floor(np.clip(g, 0, 255)), atol=1e-2)


def test_translate_matches():
    g, f = run_both(dict(translate=True))
    # the gather path resamples an already-resampled image at integer
    # offsets, so values match exactly up to float noise
    assert close_fraction(np.floor(g), f) > 0.995


def test_zoom_close():
    # folding zoom into the resize = ONE resampling; the gather path
    # resamples twice. Same geometry, slightly different interpolation: the
    # folded result must track the gather result closely almost everywhere.
    g, f = run_both(dict(zoom=True, zoom_range=(0.7, 1.3)))
    assert close_fraction(g, f, tol=8.0) > 0.97


def test_brightness_matches():
    g, f = run_both(dict(brightness=True, brightness_range=(0.9, 1.1)))
    assert close_fraction(g, f, tol=1.0) > 0.999


def test_all_combined_close():
    g, f = run_both(
        dict(flip=True, translate=True, zoom=True, brightness=True,
             zoom_range=(0.8, 1.2), brightness_range=(0.95, 1.1))
    )
    assert close_fraction(g, f, tol=8.0) > 0.95


def test_identity_when_disabled():
    canvas, heights, widths, border = make_batch()
    new_h, new_w, pt, pl = preprocess.compute_geometry(heights, widths, 96, 96)
    args = (jnp.asarray(canvas), jnp.asarray(heights), jnp.asarray(widths),
            jnp.asarray(new_h), jnp.asarray(new_w),
            jnp.asarray(pt), jnp.asarray(pl), jnp.asarray(border))
    plain = preprocess.resize_pad_batch_mxu(*args, 96, 96)
    b = canvas.shape[0]
    ident = (jnp.ones(b), jnp.zeros(b))
    with_affine = preprocess.resize_pad_batch_mxu(
        *args, 96, 96, affine_y=ident, affine_x=ident
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(with_affine),
                               atol=1e-4)
