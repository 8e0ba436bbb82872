"""Pallas TPU kernel: fused aspect-preserving resize + pad-to-square with
per-image constant border.

Same math as :func:`sykepic_tpu.ops.preprocess.resize_pad_batch_mxu` (the
XLA einsum formulation) but fused per image inside one kernel: the banded
bilinear weight matrices are built in VMEM registers and fed straight to the
MXU, so the ``(B, T, S)`` weight tensors and the ``(B, T, cw)`` row
intermediate never round-trip through HBM (~120 MB of traffic per 512-batch
at 180x180 that XLA materializes).

Grid: one program per image. Per-image geometry scalars ride in SMEM.

Use :func:`resize_pad_batch_pallas` as a drop-in for the einsum version;
``interpret=True`` runs the kernel on CPU for hermetic tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, w_ref, nh_ref, nw_ref, pt_ref, pl_ref, border_ref,
            canvas_ref, out_ref, *, target_h: int, target_w: int):
    ch = canvas_ref.shape[1]
    cw = canvas_ref.shape[2]
    i = pl.program_id(0)
    h = h_ref[i].astype(jnp.float32)
    w = w_ref[i].astype(jnp.float32)
    nh = nh_ref[i].astype(jnp.float32)
    nw = nw_ref[i].astype(jnp.float32)
    pt = pt_ref[i].astype(jnp.float32)
    pad_l = pl_ref[i].astype(jnp.float32)
    border = border_ref[i].astype(jnp.float32)

    # uint8 -> f32 is not a supported direct cast in the TPU lowering;
    # hop through int32 (uint8 values are non-negative, so this is lossless)
    img = canvas_ref[0].astype(jnp.int32).astype(jnp.float32)  # (ch, cw)

    # Row weights A_h: (target_h, ch), OpenCV INTER_LINEAR mapping with
    # edge clamping; taps at/after the valid height are zeroed.
    out_i = jax.lax.broadcasted_iota(jnp.int32, (target_h, ch), 0).astype(jnp.float32)
    tap_s = jax.lax.broadcasted_iota(jnp.int32, (target_h, ch), 1).astype(jnp.float32)
    fy = (out_i - pt + 0.5) * (h / nh) - 0.5
    fy = jnp.clip(fy, 0.0, h - 1.0)
    a_h = jnp.maximum(0.0, 1.0 - jnp.abs(fy - tap_s))
    a_h = jnp.where(tap_s < h, a_h, 0.0)

    rows = jnp.dot(a_h, img, preferred_element_type=jnp.float32)  # (T, cw)

    # Column weights A_w: (target_w, cw)
    out_j = jax.lax.broadcasted_iota(jnp.int32, (target_w, cw), 0).astype(jnp.float32)
    tap_t = jax.lax.broadcasted_iota(jnp.int32, (target_w, cw), 1).astype(jnp.float32)
    fx = (out_j - pad_l + 0.5) * (w / nw) - 0.5
    fx = jnp.clip(fx, 0.0, w - 1.0)
    a_w = jnp.maximum(0.0, 1.0 - jnp.abs(fx - tap_t))
    a_w = jnp.where(tap_t < w, a_w, 0.0)

    # out[i, j] = sum_t rows[i, t] * a_w[j, t]
    out = jax.lax.dot_general(
        rows, a_w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (target_h, target_w)

    qi = jax.lax.broadcasted_iota(jnp.int32, (target_h, target_w), 0).astype(jnp.float32)
    qj = jax.lax.broadcasted_iota(jnp.int32, (target_h, target_w), 1).astype(jnp.float32)
    inside = (
        (qi >= pt) & (qi < pt + nh) & (qj >= pad_l) & (qj < pad_l + nw)
    )
    out_ref[0] = jnp.where(inside, out, border)


@functools.partial(
    jax.jit, static_argnames=("target_h", "target_w", "dtype", "interpret")
)
def resize_pad_batch_pallas(
    canvas,
    heights,
    widths,
    new_h,
    new_w,
    pad_top,
    pad_left,
    border,
    target_h: int,
    target_w: int,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Drop-in Pallas version of ``preprocess.resize_pad_batch_mxu``
    (pure resize path; training-time augmentation affines use the einsum
    formulation)."""
    b, ch, cw = canvas.shape

    scalars = [
        jnp.asarray(x, jnp.int32)
        for x in (heights, widths, new_h, new_w, pad_top, pad_left, border)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ch, cw), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, target_h, target_w), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, target_h=target_h, target_w=target_w),
        out_shape=jax.ShapeDtypeStruct((b, target_h, target_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, canvas)
    return out.astype(dtype)
