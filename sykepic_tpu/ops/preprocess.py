"""Batched on-device preprocessing: resize + pad-to-square + normalize.

This is the TPU-native replacement for the reference's per-image OpenCV
pipeline (``sykepic/train/image.py``), which ran inside PyTorch DataLoader
worker processes on PNG files. Here a whole batch of ragged ROIs -- packed
top-left into one fixed uint8 canvas (:mod:`sykepic_tpu.ingest.pack`) -- is
transformed in a single XLA program:

1. per-image mode-pixel border value via a masked 256-bin histogram
   (reference ``image.py:229-237``: ``cv2.calcHist`` + argmax),
2. aspect-preserving bilinear resize to per-image ``(new_h, new_w)``
   (reference ``image.py:183-198`` / ``cv2.resize`` INTER_LINEAR),
3. constant-border pad to the square target (reference ``image.py:201-226``),
4. scale to [0, 1] (torchvision ``ToTensor``) and optional ImageNet
   normalization (reference ``train/config.py:52-56``).

Everything is output-driven gathers with static shapes, so XLA fuses the
whole thing into one kernel; there is no data-dependent control flow.

Geometry subtlety: the reference computes ``new_h = int(h * (T / float(w)))``
in Python float64 (``image.py:190-197``). 1-ulp differences flip the result
(e.g. ``56 * (180 / 70.0)`` is 143.99999999999997, truncating to 143, not
144). To stay bit-compatible we replicate that exact float64 truncation on
the host in :func:`compute_geometry` and feed the per-image geometry to the
device kernel as metadata -- never recompute it in float32 on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torchvision.transforms.Normalize ImageNet stats (reference config.py:55-56)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def compute_geometry(heights, widths, target_h: int, target_w: int):
    """Per-image resize geometry, bit-compatible with reference
    ``image.py:183-198`` (float64 multiply then truncation) and the pad split
    of ``image.py:209-215`` (top/left get ``pad // 2``).

    Parameters are 1-D integer arrays; returns int32 arrays
    ``(new_h, new_w, pad_top, pad_left)``.
    """
    h = np.asarray(heights, dtype=np.float64)
    w = np.asarray(widths, dtype=np.float64)
    taller = h > w
    # h > w: new_h = target_h, new_w = int(w * (target_h / h))
    r_tall = target_h / h
    r_wide = target_w / w
    new_h = np.where(taller, target_h, np.trunc(h * r_wide)).astype(np.int32)
    new_w = np.where(taller, np.trunc(w * r_tall), target_w).astype(np.int32)
    new_h = np.maximum(new_h, 1)
    new_w = np.maximum(new_w, 1)
    pad_h = np.maximum(target_h - new_h, 0)
    pad_w = np.maximum(target_w - new_w, 0)
    pad_top = (pad_h // 2).astype(np.int32)
    pad_left = (pad_w // 2).astype(np.int32)
    return new_h, new_w, pad_top, pad_left


def mode_pixel(img: np.ndarray) -> int:
    """Most common pixel value of one image (reference ``image.py:229-237``:
    ``cv2.calcHist`` 256 bins + ``np.argmax``, first-max wins).

    Host-side on purpose: a 256-bin histogram is scatter-shaped work that maps
    badly onto the TPU VPU, while on the host it is a single pass fused with
    the packing memcpy. The result rides into the device kernel as per-ROI
    metadata (the ``border`` argument of :func:`eval_preprocess`).
    Delegates to the single definition in :mod:`sykepic_tpu.ingest.pack`
    (ingest stays jax-free, so the helper lives there).
    """
    from ..ingest import pack as _pack

    return _pack.mode_pixel(img)


def mode_pixel_batch(canvas, heights, widths) -> np.ndarray:
    """Per-image mode pixel over the valid (h, w) region of a packed canvas
    (host, NumPy). Padding is excluded so zero-fill doesn't skew bin 0.

    Vectorized: one flat bincount over (image_index * 256 + pixel) keys with
    canvas padding masked out (a per-image Python loop costs ~13 ms per
    512-batch; this runs in ~1 ms).
    """
    canvas = np.asarray(canvas)
    b, ch, cw = canvas.shape
    valid = (np.arange(ch)[None, :, None] < np.asarray(heights)[:, None, None]) & (
        np.arange(cw)[None, None, :] < np.asarray(widths)[:, None, None]
    )
    keys = (
        np.arange(b, dtype=np.int64)[:, None, None] * 256 + canvas
    )[valid]
    hist = np.bincount(keys, minlength=b * 256).reshape(b, 256)
    return hist.argmax(axis=1).astype(np.uint8)


def border_values(canvas, heights, widths, border_mode: str) -> np.ndarray:
    """Per-image border fill values for a packed batch (host metadata).

    ``mode``/``white``/``black`` per reference ``image.py:20-23,26-28``.
    """
    n = np.asarray(canvas).shape[0]
    if border_mode == "mode":
        return mode_pixel_batch(canvas, heights, widths)
    if border_mode == "white":
        return np.full(n, 255, np.uint8)
    if border_mode == "black":
        return np.zeros(n, np.uint8)
    raise ValueError(f"Unknown border mode: {border_mode}")


def resize_pad_batch(
    canvas: jax.Array,
    heights: jax.Array,
    widths: jax.Array,
    new_h: jax.Array,
    new_w: jax.Array,
    pad_top: jax.Array,
    pad_left: jax.Array,
    border: jax.Array,
    target_h: int,
    target_w: int,
    dtype=jnp.float32,
):
    """Aspect-preserving bilinear resize into a constant-border square.

    Per output pixel ``(i, j)``: if inside the resized region, sample the
    source with OpenCV INTER_LINEAR coordinate mapping
    ``src = (dst + 0.5) * (src_size / dst_size) - 0.5`` (clamped); else write
    the border value. Returns ``(B, target_h, target_w)`` in [0, 255] float.
    """

    out_i = jax.lax.broadcasted_iota(jnp.int32, (target_h, target_w), 0)
    out_j = jax.lax.broadcasted_iota(jnp.int32, (target_h, target_w), 1)

    def one(img, h, w, nh, nw, pt, pl, bval):
        inside = (
            (out_i >= pt)
            & (out_i < pt + nh)
            & (out_j >= pl)
            & (out_j < pl + nw)
        )
        fy = (out_i - pt + 0.5) * (h.astype(jnp.float32) / nh) - 0.5
        fx = (out_j - pl + 0.5) * (w.astype(jnp.float32) / nw) - 0.5
        fy = jnp.clip(fy, 0.0, (h - 1).astype(jnp.float32))
        fx = jnp.clip(fx, 0.0, (w - 1).astype(jnp.float32))
        y0 = jnp.floor(fy).astype(jnp.int32)
        x0 = jnp.floor(fx).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = fy - y0
        wx = fx - x0
        p00 = img[y0, x0].astype(jnp.float32)
        p01 = img[y0, x1].astype(jnp.float32)
        p10 = img[y1, x0].astype(jnp.float32)
        p11 = img[y1, x1].astype(jnp.float32)
        top = p00 + (p01 - p00) * wx
        bot = p10 + (p11 - p10) * wx
        val = top + (bot - top) * wy
        return jnp.where(inside, val, bval.astype(jnp.float32))

    out = jax.vmap(one)(
        canvas, heights, widths, new_h, new_w, pad_top, pad_left, border
    )
    return out.astype(dtype)


def _bilinear_weights(q, pad, n_new, src_size, canvas_size: int,
                      origin=None):
    """Per-image bilinear weight matrix ``(B, size_out, canvas_size)``.

    ``q`` is the (B, size_out) output->padded-square coordinate per output
    pixel (plain iota for a pure resize; an affine of it when flip/translate/
    zoom augmentations are folded in). Row ``i`` holds the (at most two)
    source-tap weights under OpenCV INTER_LINEAR mapping with edge clamping;
    rows outside the resized region are garbage and must be masked by the
    caller.

    ``origin`` (per-image int, optional) places the source at rows/cols
    ``[origin, origin + src)`` of the canvas instead of 0 — how the shelf
    packer's ROIs (:mod:`sykepic_tpu.ingest.shelf`) are extracted straight
    out of a shared window without materializing a crop.
    """
    pad = pad.astype(jnp.float32)[:, None]
    n_new = n_new.astype(jnp.float32)[:, None]
    src = src_size.astype(jnp.float32)[:, None]
    f = (q - pad + 0.5) * (src / n_new) - 0.5
    f = jnp.clip(f, 0.0, src - 1.0)  # (B, T) in ROI-local coordinates
    taps = jnp.arange(canvas_size, dtype=jnp.float32)[None, None, :]
    if origin is not None:
        # Shift the TAPS into ROI-local coordinates (exact: both are small
        # ints, so fp32 subtraction is lossless) rather than shifting the
        # fractional coordinate f — weights stay bit-identical to the
        # origin-0 slot path.
        taps = taps - origin.astype(jnp.float32)[:, None, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(f[:, :, None] - taps))  # (B, T, S)
    # Kill taps outside the valid extent so canvas padding (or a shelf
    # neighbour) never leaks in (the weight at the last valid tap already
    # absorbs the clamped coordinate).
    w = jnp.where((taps >= 0.0) & (taps < src[:, :, None]), w, 0.0)
    return w


def _axis_coords(size_out: int, batch: int, affine):
    """(B, size_out) output coordinate per axis: iota, or ``a*i + b`` when an
    augmentation affine ``(a, b)`` is folded in."""
    out_i = jnp.arange(size_out, dtype=jnp.float32)[None, :]
    if affine is None:
        return jnp.broadcast_to(out_i, (batch, size_out))
    a, b = affine
    return a.astype(jnp.float32)[:, None] * out_i + b.astype(jnp.float32)[:, None]


def resize_pad_batch_mxu(
    canvas: jax.Array,
    heights: jax.Array,
    widths: jax.Array,
    new_h: jax.Array,
    new_w: jax.Array,
    pad_top: jax.Array,
    pad_left: jax.Array,
    border: jax.Array,
    target_h: int,
    target_w: int,
    dtype=jnp.float32,
    affine_y=None,
    affine_x=None,
    y_origin=None,
    x_origin=None,
):
    """Same contract as :func:`resize_pad_batch`, computed as two batched
    matmuls instead of gathers.

    Bilinear resize is separable: ``out = A_h @ img @ A_w^T`` with banded
    per-image weight matrices. On TPU this rides the MXU (~6 GFLOP per
    512-batch — sub-millisecond), where the gather formulation lowers to
    scalar-core loads (measured ~0.8 s/batch on v5e). Numerics are the same
    bilinear sum up to float reassociation.

    ``y_origin``/``x_origin`` (per-image ints) read the source at
    ``[origin, origin + size)`` of the canvas instead of the top-left
    corner — the shelf-packed classify path, where many ROIs share one
    window (:mod:`sykepic_tpu.ingest.shelf`).
    """
    b, ch, cw = canvas.shape
    q_y = _axis_coords(target_h, b, affine_y)  # (B, target_h)
    q_x = _axis_coords(target_w, b, affine_x)  # (B, target_w)
    a_h = _bilinear_weights(q_y, pad_top, new_h, heights, ch, y_origin)
    a_w = _bilinear_weights(q_x, pad_left, new_w, widths, cw, x_origin)
    img = canvas.astype(jnp.float32)
    rows = jnp.einsum("bis,bsw->biw", a_h, img,
                      preferred_element_type=jnp.float32)
    out = jnp.einsum("biw,bjw->bij", rows, a_w,
                     preferred_element_type=jnp.float32)
    pt = pad_top[:, None, None].astype(jnp.float32)
    pl = pad_left[:, None, None].astype(jnp.float32)
    qi = q_y[:, :, None]
    qj = q_x[:, None, :]
    inside = (
        (qi >= pt)
        & (qi < pt + new_h[:, None, None])
        & (qj >= pl)
        & (qj < pl + new_w[:, None, None])
    )
    out = jnp.where(inside, out, border[:, None, None].astype(jnp.float32))
    return out.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "target_h",
        "target_w",
        "num_chans",
        "imagenet_normalization",
        "dtype",
        "use_pallas",
    ),
)
def eval_preprocess(
    canvas: jax.Array,
    heights: jax.Array,
    widths: jax.Array,
    new_h: jax.Array,
    new_w: jax.Array,
    pad_top: jax.Array,
    pad_left: jax.Array,
    border: jax.Array,
    *,
    target_h: int,
    target_w: int,
    num_chans: int = 3,
    imagenet_normalization: bool = False,
    dtype=jnp.float32,
    use_pallas: bool = False,
    y_origin=None,
    x_origin=None,
):
    """Fused eval-path preprocessing (reference eval transform = Resize +
    ToTensor, ``train/config.py:31-58``; NOTE the reference appends ImageNet
    Normalize only to the TRAIN transform, so pass
    ``imagenet_normalization=False`` for reference-parity inference).

    ``border`` is the per-image fill value, precomputed on the host by
    :func:`border_values` (mode pixel / white / black).

    Returns ``(B, target_h, target_w, num_chans)`` NHWC in the requested
    dtype -- NHWC because that is the native TPU conv layout (the reference's
    NCHW is a torch convention, not a contract).
    """
    if use_pallas and y_origin is None and x_origin is None:
        # Fused Pallas kernel: same math, compiles ~50x faster than the
        # einsum XLA program on the tunneled TPU and skips the HBM
        # round-trips of the materialized weight tensors. (The shelf path
        # carries per-ROI origins, which only the einsum path supports.)
        from . import pallas_preprocess

        img = pallas_preprocess.resize_pad_batch_pallas(
            canvas, heights, widths, new_h, new_w, pad_top, pad_left,
            border, target_h, target_w, dtype=jnp.float32,
        )
    else:
        img = resize_pad_batch_mxu(
            canvas,
            heights,
            widths,
            new_h,
            new_w,
            pad_top,
            pad_left,
            border,
            target_h,
            target_w,
            dtype=jnp.float32,
            y_origin=y_origin,
            x_origin=x_origin,
        )
    img = img / 255.0
    img = jnp.repeat(img[..., None], num_chans, axis=-1)
    if imagenet_normalization:
        mean = jnp.asarray(IMAGENET_MEAN[:num_chans], jnp.float32)
        std = jnp.asarray(IMAGENET_STD[:num_chans], jnp.float32)
        img = (img - mean) / std
    return img.astype(dtype)
