"""Tests for the on-device augmentation kernel (sykepic_tpu.ops.augment)."""

import jax
import jax.numpy as jnp
import numpy as np

from sykepic_tpu.ops import augment


def batch_of(img, n=4):
    return jnp.asarray(np.stack([img] * n).astype(np.float32))


def run(key, imgs, border=None, lim_x=None, lim_y=None, **kw):
    b = imgs.shape[0]
    if border is None:
        border = np.zeros(b, np.uint8)
    if lim_x is None:
        lim_x = np.zeros(b, np.int32)
    if lim_y is None:
        lim_y = np.zeros(b, np.int32)
    return np.asarray(
        augment.augment_batch(
            key, imgs, jnp.asarray(border), jnp.asarray(lim_x),
            jnp.asarray(lim_y), **kw
        )
    )


def test_identity_when_no_augs():
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    out = run(jax.random.PRNGKey(0), batch_of(img))
    np.testing.assert_allclose(out, batch_of(img), atol=1e-4)


def test_flip_is_exact_mirror():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16)).astype(np.float32)
    out = run(jax.random.PRNGKey(3), batch_of(img, 64), flip=True)
    # every output must be one of the 4 flip combinations, pixel-exact
    options = [
        img, img[:, ::-1], img[::-1, :], img[::-1, ::-1],
    ]
    seen = set()
    for o in out:
        match = [i for i, c in enumerate(options) if np.allclose(o, c, atol=1e-3)]
        assert match, "output is not a pure flip of the input"
        seen.add(match[0])
    assert len(seen) >= 3  # with 64 draws all combos should appear


def test_translate_shifts_content():
    img = np.zeros((16, 16), np.float32)
    img[6:10, 6:10] = 200.0
    lim_x = np.full(8, 3, np.int32)
    out = run(
        jax.random.PRNGKey(0), batch_of(img, 8),
        border=np.full(8, 7, np.uint8), lim_x=lim_x, translate=True,
    )
    for o in out:
        # mass preserved (moved, not destroyed), modulo border fill
        assert np.isclose((o == 200.0).sum(), 16)
        ys, xs = np.where(o == 200.0)
        assert ys.min() == 6 and ys.max() == 9  # only x moves
        assert abs(int(xs.min()) - 6) <= 3


def test_zoom_out_adds_border():
    img = np.full((20, 20), 100.0, np.float32)
    out = run(
        jax.random.PRNGKey(0), batch_of(img, 4),
        border=np.full(4, 9, np.uint8),
        zoom=True, zoom_range=(0.5, 0.5),
    )
    for o in out:
        # corners become border after zooming out 2x
        assert o[0, 0] == 9.0
        assert o[10, 10] == 100.0


def test_zoom_in_crops():
    img = np.zeros((20, 20), np.float32)
    img[0, :] = 255.0  # top edge stripe
    out = run(
        jax.random.PRNGKey(0), batch_of(img, 4),
        zoom=True, zoom_range=(2.0, 2.0),
    )
    for o in out:
        assert o.max() == 0.0  # stripe cropped away


def test_rotate_90_transposes():
    img = np.zeros((21, 21), np.float32)
    img[10, :] = 255.0  # horizontal line through the center
    out = run(
        jax.random.PRNGKey(0), batch_of(img, 2),
        rotate=True, max_rotation=0,
    )
    np.testing.assert_allclose(out[0], img, atol=1e-3)  # angle forced 0


def test_rotation_preserves_center_line_energy():
    img = np.zeros((31, 31), np.float32)
    img[15, :] = 255.0
    out = run(
        jax.random.PRNGKey(42), batch_of(img, 16),
        rotate=True, max_rotation=45,
    )
    for o in out:
        assert o.sum() > 0.5 * img.sum()  # line still mostly present


def test_brightness_multiplies_and_truncates():
    img = np.full((8, 8), 100.0, np.float32)
    out = run(
        jax.random.PRNGKey(0), batch_of(img, 4),
        brightness=True, brightness_range=(1.5, 1.5),
    )
    np.testing.assert_allclose(out, 150.0)
    out = run(
        jax.random.PRNGKey(0), batch_of(img, 4),
        brightness=True, brightness_range=(3.0, 3.0),
    )
    np.testing.assert_allclose(out, 255.0)  # clipped


def test_translate_limits_padded_axis_only():
    heights = np.array([100, 50])
    widths = np.array([50, 100])
    new_h = np.array([180, 90])
    new_w = np.array([90, 180])
    lim_x, lim_y = augment.translate_limits(heights, widths, new_h, new_w, 180, 180)
    # taller image: width padded -> x moves, y fixed (reference image.py:43-51)
    assert lim_x[0] == int((180 - 90) / 2.5) and lim_y[0] == 0
    assert lim_x[1] == 0 and lim_y[1] == int((180 - 90) / 2.5)


def test_reproducible_given_key():
    img = np.arange(256, dtype=np.float32).reshape(16, 16)
    kw = dict(
        flip=True, translate=True, zoom=True, rotate=True, brightness=True,
        zoom_range=(0.8, 1.2), brightness_range=(0.9, 1.1), max_rotation=10,
    )
    lim = np.full(4, 2, np.int32)
    a = run(jax.random.PRNGKey(5), batch_of(img), lim_x=lim, lim_y=lim, **kw)
    b = run(jax.random.PRNGKey(5), batch_of(img), lim_x=lim, lim_y=lim, **kw)
    np.testing.assert_array_equal(a, b)
