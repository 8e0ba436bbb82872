"""Batched on-device geometry features: the whole (B, ch, cw) ROI canvas
batch goes from pixels to (area, biovolume, major/minor axis) without
leaving the chip.

This is the TPU-native counterpart of :mod:`sykepic_tpu.compute.features`
(the host reference implementation used for CSV outputs). Everything is
fixed-iteration vectorized ops — no data-dependent control flow:

- per-image Otsu threshold: 256-bin histogram via one-hot sums + cumulative
  between-class variance (VPU),
- hole filling: background flood fill from the canvas border as
  ``(ch+cw)`` iterations of 3x3 dilation constrained to non-mask pixels
  (a ``lax.fori_loop`` of cheap max-pools); holes = non-background,
- distance transform: chamfer 3-4 approximation of the Euclidean EDT via
  fixed min-plus sweeps (error <4% on plankton-scale blobs; the host path
  uses the exact EDT),
- area / biovolume (pi * sum D) / MATLAB-style ellipse axes from masked
  moment sums.

Deviation from the host path (documented): no small-blob removal or
largest-blob selection (connected-component labeling is latency-bound
serial work); axes are computed over ALL blob pixels. For typical
single-organism ROIs the results track the host implementation closely
(see tests/test_features_device.py tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def batched_otsu(canvas, heights, widths):
    """Per-image Otsu threshold over the valid region. (B,) int32."""
    b, ch, cw = canvas.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)[None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)[None]
    valid = (rows < heights[:, None, None]) & (cols < widths[:, None, None])
    # histogram: one-hot over 256 bins, padding masked out
    bins = jnp.arange(256, dtype=jnp.int32)
    onehot = (canvas[..., None].astype(jnp.int32) == bins) & valid[..., None]
    hist = onehot.sum(axis=(1, 2)).astype(jnp.float32)  # (B, 256)
    total = hist.sum(axis=1, keepdims=True)
    level = bins.astype(jnp.float32)
    w_b = jnp.cumsum(hist, axis=1)
    sum_b = jnp.cumsum(hist * level, axis=1)
    sum_all = sum_b[:, -1:]
    w_f = total - w_b
    mu_b = jnp.where(w_b > 0, sum_b / w_b, 0.0)
    mu_f = jnp.where(w_f > 0, (sum_all - sum_b) / w_f, 0.0)
    var = jnp.where((w_b > 0) & (w_f > 0), w_b * w_f * (mu_b - mu_f) ** 2, -1.0)
    return jnp.argmax(var, axis=1).astype(jnp.int32), valid


def _dilate3(x):
    """3x3 binary dilation of a (B, H, W) float {0,1} mask."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
    )


def fill_holes(mask, iterations: int):
    """Flood-fill background from the border; anything unreachable is a
    hole and joins the mask. ``mask``: (B, H, W) bool."""
    b, h, w = mask.shape
    free = (~mask).astype(jnp.float32)
    border = jnp.zeros((b, h, w), jnp.float32)
    border = border.at[:, 0, :].set(1.0).at[:, -1, :].set(1.0)
    border = border.at[:, :, 0].set(1.0).at[:, :, -1].set(1.0)
    bg = border * free

    def body(_, bg):
        return jnp.minimum(_dilate3(bg), 1.0) * free

    bg = jax.lax.fori_loop(0, iterations, body, bg)
    return mask | (bg < 0.5)


def chamfer_distance(mask, iterations: int):
    """Chamfer 3-4 distance-to-background (scaled back by 1/3), computed as
    fixed min-plus relaxation sweeps. ``mask``: (B, H, W) bool."""
    big = jnp.float32(1e6)
    d = jnp.where(mask, big, 0.0)
    h, w = mask.shape[1], mask.shape[2]

    def body(_, d):
        # pad with `big` so canvas borders never see phantom background
        # (a wrap-around roll would bleed the opposite edge in)
        padded = jnp.pad(
            d, ((0, 0), (1, 1), (1, 1)), constant_values=big
        )

        def window(dy, dx):
            return jax.lax.dynamic_slice(
                padded, (0, 1 + dy, 1 + dx), d.shape
            )

        # orthogonal cost 3, diagonal cost 4 (Borgefors chamfer 3-4)
        cand = d
        for dy, dx, c in ((1, 0, 3.0), (-1, 0, 3.0), (0, 1, 3.0), (0, -1, 3.0),
                          (1, 1, 4.0), (1, -1, 4.0), (-1, 1, 4.0), (-1, -1, 4.0)):
            cand = jnp.minimum(cand, window(dy, dx) + c)
        return jnp.where(mask, cand, 0.0)

    d = jax.lax.fori_loop(0, iterations, body, d)
    # Safety clamp: pixels the fixed relaxation never reached (degenerate
    # masks, e.g. serpentine cavities needing more sweeps) still hold the
    # sentinel — cap them at each image's largest relaxed distance instead
    # of letting 1e6 values corrupt the biovolume sum.
    relaxed = d < big / 2.0
    per_image_max = jnp.max(jnp.where(relaxed, d, 0.0), axis=(1, 2),
                            keepdims=True)
    d = jnp.where(relaxed, d, per_image_max)
    return d / 3.0


def moments_features(mask):
    """(area, major, minor) from masked moment sums; MATLAB regionprops
    ellipse-of-equal-second-moments with the +1/12 pixel term."""
    b, h, w = mask.shape
    m = mask.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    n = m.sum(axis=(1, 2))
    safe_n = jnp.maximum(n, 1.0)
    xbar = (m * xs).sum(axis=(1, 2)) / safe_n
    ybar = (m * ys).sum(axis=(1, 2)) / safe_n
    dx = xs - xbar[:, None, None]
    dy = ys - ybar[:, None, None]
    uxx = (m * dx * dx).sum(axis=(1, 2)) / safe_n + 1.0 / 12.0
    uyy = (m * dy * dy).sum(axis=(1, 2)) / safe_n + 1.0 / 12.0
    uxy = (m * dx * dy).sum(axis=(1, 2)) / safe_n
    common = jnp.sqrt((uxx - uyy) ** 2 + 4.0 * uxy * uxy)
    major = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(uxx + uyy + common)
    minor = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(jnp.maximum(uxx + uyy - common, 0.0))
    empty = n < 0.5
    return (
        n,
        jnp.where(empty, 0.0, major),
        jnp.where(empty, 0.0, minor),
    )


@functools.partial(jax.jit, static_argnames=("fill_iters", "edt_iters"))
def device_features(canvas, heights, widths, fill_iters: int | None = None,
                    edt_iters: int | None = None):
    """(area, biovolume_px, major, minor) float32 arrays of shape (B,) for a
    packed uint8 canvas batch, entirely on device.

    Iteration counts must cover the worst case for the canvas shape: the
    flood fill can need ``ch + cw`` steps (a serpentine cavity); the chamfer
    relaxation propagates one pixel per sweep, and a blob spanning the full
    valid height of a wide bucket puts background up to ``max(ch, cw) / 2``
    away, so the bound uses the LARGER side (truly degenerate masks are
    additionally handled by the sentinel clamp in
    :func:`chamfer_distance`).
    """
    b, ch, cw = canvas.shape
    if fill_iters is None:
        fill_iters = ch + cw
    if edt_iters is None:
        edt_iters = max(ch, cw) // 2 + 2
    t, valid = batched_otsu(canvas, heights, widths)
    mask = (canvas.astype(jnp.int32) <= t[:, None, None]) & valid
    mask = fill_holes(mask, fill_iters)
    d = chamfer_distance(mask, edt_iters)
    area, major, minor = moments_features(mask)
    biovolume = jnp.pi * d.sum(axis=(1, 2))
    # one stacked array = ONE device->host transfer for the whole batch
    # (four separate transfers cost 4 tunnel round trips per batch)
    return jnp.stack([area, biovolume, major, minor], axis=1)
