"""Pallas TPU kernel: convergence-checked constrained flood (8-connected
binary reconstruction) entirely in VMEM.

Same math as :func:`sykepic_tpu.ops.features_device._flood` (the XLA
formulation: while_loop of 3x3 max-dilations masked by ``within``), but
the whole loop runs inside ONE kernel per batch tile, so the ~tens of
iterations cost VMEM-resident VPU passes instead of three HBM-round-trip
kernels each (measured on the v5e at the fused-leg shape, 2048 x 48x96:
two hole-filling floods 51 ms -> ~3 ms; per-iteration launch overhead —
not bandwidth — was the bound, which is why a bf16 state bought nothing).

Grid: one program per tile of ``tile_b`` images; each tile iterates its
own while_loop until ITS images converge. ``interpret=True`` runs the
kernel on CPU for hermetic tests (tests/test_pallas_flood.py pins
equality against the XLA flood).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Largest PADDED per-image pixel count the kernel accepts: at tile_b=1 a
# single f32 image costs hp*wp*4 bytes per buffer and the loop body holds
# ~8 live buffers, so 131072 px (= 512 KB/buffer, ~4 MB live) keeps the
# 16 MB scoped-VMEM limit safe. Callers must route bigger canvases to the
# XLA while_loop flood (features_device._flood does) — without this gate a
# fused --device-features batch holding one large ROI (slot canvases are
# NOT pre-shrunk: features need original pixel units) would fail the
# Mosaic compile outright where the XLA flood works at any shape.
MAX_PADDED_PIXELS = 131072


def padded_pixels(h: int, w: int) -> int:
    """Per-image pixel count after Mosaic's (8, 128) f32 tile padding —
    the quantity the VMEM budget is really spent on."""
    return (-(-h // 8) * 8) * (-(-w // 128) * 128)


def fits_vmem(h: int, w: int) -> bool:
    return padded_pixels(h, w) <= MAX_PADDED_PIXELS


def _kernel(seed_ref, within_ref, out_ref, *, cap: int):
    within = within_ref[:]
    s = seed_ref[:] * within
    tb, h, w = s.shape
    zrow = jnp.zeros((tb, 1, w), s.dtype)
    zcol = jnp.zeros((tb, h, 1), s.dtype)

    def dilate3(x):
        # separable 3x3 max: vertical pass then horizontal pass
        up = jnp.concatenate([x[:, 1:, :], zrow], axis=1)
        dn = jnp.concatenate([zrow, x[:, :-1, :]], axis=1)
        v = jnp.maximum(jnp.maximum(x, up), dn)
        lf = jnp.concatenate([v[:, :, 1:], zcol], axis=2)
        rt = jnp.concatenate([zcol, v[:, :, :-1]], axis=2)
        return jnp.maximum(jnp.maximum(v, lf), rt)

    def cond(carry):
        i, x, changed = carry
        return jnp.logical_and(i < cap, changed)

    def body(carry):
        i, x, _ = carry
        grown = dilate3(x) * within
        return i + 1, grown, jnp.any(grown != x)

    _, s, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), s, jnp.bool_(True))
    )
    out_ref[:] = s


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def flood_pallas(seed, within, cap: int, interpret: bool = False):
    """8-connected flood of ``seed`` through ``within`` (both (B, H, W)
    bool); returns the converged bool mask. ``cap`` bounds pathological
    cases exactly like the XLA flood's ``iterations``."""
    b, h, w = seed.shape
    if not fits_vmem(h, w):
        raise ValueError(
            f"flood_pallas: ({h}, {w}) canvas exceeds the per-image VMEM "
            f"budget ({padded_pixels(h, w)} > {MAX_PADDED_PIXELS} padded "
            "px); route this shape to the XLA flood instead"
        )
    # Tile the batch so the kernel's live VMEM set fits: Mosaic pads the
    # last two dims to (8, 128) f32 tiles, and the loop body holds ~8 live
    # buffers (state, within, 2 shift copies per pass, grown, zeros), so
    # budget ~512 KB per buffer on PADDED bytes (a 113-image tile at 48x96
    # measured 19.2 MB of scoped vmem and OOM'd the 16 MB limit).
    tile_b = max(1, min(b, MAX_PADDED_PIXELS // max(padded_pixels(h, w), 1)))
    pad = (-b) % tile_b
    seed_f = jnp.pad(seed.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    within_f = jnp.pad(within.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    grid = (seed_f.shape[0] // tile_b,)
    out = pl.pallas_call(
        functools.partial(_kernel, cap=cap),
        out_shape=jax.ShapeDtypeStruct(seed_f.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed_f, within_f)
    return out[:b] > 0.5
