"""On-device training augmentations (reference ``sykepic/train/image.py``).

The reference chains per-image OpenCV ops inside DataLoader workers:
FlipHorizontal/FlipVertical (50% each, ``image.py:80-99``), Translate on the
padded axis within ``(target-new)/2.5`` (``:36-51,102-115``), Zoom = resize
by f then center-pad/crop (``:118-150``), Rotate about the integer center
(``:153-166``), ChangeBrightness multiply + clip to uint8 (``:169-180``).

TPU-native design: flips, translation, zoom and rotation are all affine maps,
so they compose into ONE 3x3 matrix per image; the batch is warped in a
single bilinear gather pass (one resampling instead of up to four, so the
result is *sharper* than the reference chain — intentionally not bit-equal:
augmentation is stochastic, there is no golden output to match). Brightness
is a fused multiply + clip + floor (the uint8-cast truncation the reference
applies). Everything has static shapes; XLA fuses the whole thing.

Random parameters are drawn from a JAX PRNG key per batch, giving
reproducible augmentation streams under ``jax.jit`` — an upgrade over the
reference's global ``random`` module state shared across DataLoader workers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def translate_limits(heights, widths, new_h, new_w, target_h: int, target_w: int):
    """Per-image translate limits: only the padded axis moves, by
    ``int((target - new) / 2.5)`` (reference ``image.py:39-51``).

    ``heights``/``widths`` are the ORIGINAL image dims (pre-resize); taller
    images pad (and translate) width, wider ones pad height.
    """
    heights = np.asarray(heights)
    widths = np.asarray(widths)
    taller = heights > widths
    lim_x = np.where(taller, ((target_w - np.asarray(new_w)) / 2.5).astype(np.int32), 0)
    lim_y = np.where(~taller, ((target_h - np.asarray(new_h)) / 2.5).astype(np.int32), 0)
    return lim_x.astype(np.int32), lim_y.astype(np.int32)


def _affine_params(
    key,
    batch: int,
    *,
    flip: bool,
    translate: bool,
    zoom: bool,
    rotate: bool,
    brightness: bool,
    zoom_range,
    brightness_range,
    max_rotation: int,
    limit_x,
    limit_y,
):
    """Draw per-image augmentation parameters."""
    keys = jax.random.split(key, 6)
    one = jnp.ones((batch,), jnp.float32)
    if flip:
        flip_h = jax.random.bernoulli(keys[0], 0.5, (batch,))
        flip_v = jax.random.bernoulli(keys[1], 0.5, (batch,))
    else:
        flip_h = jnp.zeros((batch,), bool)
        flip_v = jnp.zeros((batch,), bool)
    if translate:
        # randint is high-exclusive; reference randint(-limit, limit) is
        # inclusive both ends (image.py:106-108)
        tx = jax.random.randint(keys[2], (batch,), -limit_x, limit_x + 1)
        ty = jax.random.randint(keys[3], (batch,), -limit_y, limit_y + 1)
    else:
        tx = jnp.zeros((batch,), jnp.int32)
        ty = jnp.zeros((batch,), jnp.int32)
    if zoom:
        f = jax.random.uniform(
            keys[4], (batch,), minval=zoom_range[0], maxval=zoom_range[1]
        )
        f = jnp.round(f * 100.0) / 100.0  # reference rounds to 2 decimals (:127)
    else:
        f = one
    if rotate:
        angle = jax.random.randint(
            keys[5], (batch,), -max_rotation, max_rotation + 1
        ).astype(jnp.float32)
    else:
        angle = jnp.zeros((batch,), jnp.float32)
    if brightness:
        bkey = jax.random.fold_in(key, 7)
        bright = jax.random.uniform(
            bkey, (batch,), minval=brightness_range[0], maxval=brightness_range[1]
        )
    else:
        bright = one
    return flip_h, flip_v, tx.astype(jnp.float32), ty.astype(jnp.float32), f, angle, bright


def _compose_inverse(flip_h, flip_v, tx, ty, f, angle, h: int, w: int):
    """Inverse affine map (output pixel -> source pixel) for the chain
    flipH -> flipV -> translate -> zoom -> rotate, each matching the cv2
    geometry of the reference transform it replaces."""
    cx = jnp.float32((w - 1) / 2.0)
    cy = jnp.float32((h - 1) / 2.0)
    # rotation center is the integer cv2 center (image.py:159)
    rcx = jnp.float32(w // 2)
    rcy = jnp.float32(h // 2)

    def inv(p_x, p_y):
        # R^-1: rotate coords by -angle about (rcx, rcy); cv2 rotates content
        # counterclockwise for positive angles in image coordinates
        rad = -angle * (jnp.pi / 180.0)
        ca, sa = jnp.cos(rad), jnp.sin(rad)
        x = p_x - rcx
        y = p_y - rcy
        x, y = ca * x + sa * y, -sa * x + ca * y
        x = x + rcx
        y = y + rcy
        # Z^-1: cv2 resize-by-f + center crop/pad == scale about the
        # continuous center, so invert by scaling 1/f about (cx, cy)
        x = (x - cx) / f + cx
        y = (y - cy) / f + cy
        # T^-1: content moved by (+tx, +ty) => source is at p - t
        x = x - tx
        y = y - ty
        # V^-1 / H^-1: mirror
        x = jnp.where(flip_h, (w - 1) - x, x)
        y = jnp.where(flip_v, (h - 1) - y, y)
        return x, y

    return inv


def _warp_bilinear(img, src_x, src_y, border):
    """Bilinear sample with constant border (cv2 BORDER_CONSTANT)."""
    h, w = img.shape
    inside = (src_x >= 0) & (src_x <= w - 1) & (src_y >= 0) & (src_y <= h - 1)
    fx = jnp.clip(src_x, 0.0, w - 1)
    fy = jnp.clip(src_y, 0.0, h - 1)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = fx - x0
    wy = fy - y0
    p00 = img[y0, x0]
    p01 = img[y0, x1]
    p10 = img[y1, x0]
    p11 = img[y1, x1]
    top = p00 + (p01 - p00) * wx
    bot = p10 + (p11 - p10) * wx
    val = top + (bot - top) * wy
    return jnp.where(inside, val, border)


def separable_params(
    key,
    batch: int,
    limit_x,
    limit_y,
    target_h: int,
    target_w: int,
    *,
    flip: bool = False,
    translate: bool = False,
    zoom: bool = False,
    brightness: bool = False,
    zoom_range=(1.0, 1.0),
    brightness_range=(1.0, 1.0),
):
    """Per-axis inverse affines for the rotation-free augmentation chain.

    Flip, translate and zoom are all axis-separable, so instead of a gather
    warp they FOLD INTO the matmul resize: sampling coordinate
    ``q = a * p + b`` per axis feeds ``preprocess.resize_pad_batch_mxu``'s
    ``affine_y``/``affine_x`` — augmentation then costs nothing beyond the
    resize einsums (gathers of this shape measured ~0.5 s/batch on TPU v5e;
    the production config has rotation disabled, ``train.ini.example``).

    Returns ``((a_y, b_y), (a_x, b_x), brightness_factors)``.
    """
    flip_h, flip_v, tx, ty, f, _angle, bright = _affine_params(
        key,
        batch,
        flip=flip,
        translate=translate,
        zoom=zoom,
        rotate=False,
        brightness=brightness,
        zoom_range=zoom_range,
        brightness_range=brightness_range,
        max_rotation=0,
        limit_x=limit_x,
        limit_y=limit_y,
    )

    def axis(flipped, t, size):
        # inverse of zoom-about-center then translate; flips invert last
        c = jnp.float32((size - 1) / 2.0)
        a = 1.0 / f
        b = c * (1.0 - 1.0 / f) - t
        a = jnp.where(flipped, -a, a)
        b = jnp.where(flipped, (size - 1) - b, b)
        return a, b

    return axis(flip_v, ty, target_h), axis(flip_h, tx, target_w), bright


def apply_brightness(img, bright):
    """Multiplicative brightness + clip + uint8-cast truncation
    (reference ``image.py:174-176``) on a (B, H, W) float batch."""
    return jnp.floor(jnp.clip(img * bright[:, None, None], 0.0, 255.0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "flip",
        "translate",
        "zoom",
        "rotate",
        "brightness",
        "zoom_range",
        "brightness_range",
        "max_rotation",
    ),
)
def augment_batch(
    key,
    imgs,
    border,
    limit_x,
    limit_y,
    *,
    flip: bool = False,
    translate: bool = False,
    zoom: bool = False,
    rotate: bool = False,
    brightness: bool = False,
    zoom_range: tuple = (1.0, 1.0),
    brightness_range: tuple = (1.0, 1.0),
    max_rotation: int = 0,
):
    """Augment a ``(B, H, W)`` float batch in [0, 255].

    ``border`` is the per-image constant fill (same values used by the
    resize+pad kernel); ``limit_x``/``limit_y`` come from
    :func:`translate_limits`. Returns the same shape/range.
    """
    b, h, w = imgs.shape
    flip_h, flip_v, tx, ty, f, angle, bright = _affine_params(
        key,
        b,
        flip=flip,
        translate=translate,
        zoom=zoom,
        rotate=rotate,
        brightness=brightness,
        zoom_range=zoom_range,
        brightness_range=brightness_range,
        max_rotation=max_rotation,
        limit_x=limit_x,
        limit_y=limit_y,
    )
    out_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    out_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def one(img, fh, fv, tx_i, ty_i, f_i, a_i, bd, br):
        inv = _compose_inverse(fh, fv, tx_i, ty_i, f_i, a_i, h, w)
        sx, sy = inv(out_x, out_y)
        out = _warp_bilinear(img, sx, sy, bd)
        # brightness multiply + clip + uint8-cast truncation (image.py:174-176)
        out = jnp.floor(jnp.clip(out * br, 0.0, 255.0))
        return out

    return jax.vmap(one)(
        imgs, flip_h, flip_v, tx, ty, f, angle,
        border.astype(jnp.float32), bright
    )


def spec_kwargs(augmentations, zoom_range, brightness_range, max_rotation):
    """Static kwargs for :func:`augment_batch` from an AugmentSpec-style
    config (reference ``train/config.py:32-50``: 'flip' enables both flips;
    order in the config is irrelevant here because the affine composition is
    fixed)."""
    augs = set(augmentations)
    return dict(
        flip="flip" in augs,
        translate="translate" in augs,
        zoom="zoom" in augs,
        rotate="rotate" in augs,
        brightness="brightness" in augs,
        zoom_range=tuple(zoom_range),
        brightness_range=tuple(brightness_range),
        max_rotation=int(max_rotation),
    )
