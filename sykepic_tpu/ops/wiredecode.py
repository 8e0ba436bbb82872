"""Device-side decoder for :mod:`sykepic_tpu.ingest.wirecodec` payloads.

Three tiny jit programs instead of one monolith so the compiled-program
set stays constant-size no matter how many exceptions a dispatch ships
(compile diversity is the scarce resource on a tunneled TPU — CLAUDE.md):

- :func:`unpack_plane` (one program per window-count rung): packed 4-bit
  plane -> signed int32 delta tensor.
- :func:`scatter_chunk` (ONE program, chained per 64 Ki-entry chunk):
  scatter-adds a fixed-size slice of the exception stream into the delta
  tensor, carrying the running position between calls. Scatter-add runs
  at ~22 M updates/s on the v5e (measured), so a full dispatch's ~0.5 M
  exceptions decode in ~25 ms — noise next to the CNN on ~1600 ROIs.
- :func:`finalize` (one program per window-count rung): cumsum along the
  per-window predictor axis, mod 256, back to uint8 windows.

All arithmetic is int32 with a final ``& 255``; two's-complement AND is
an exact mod-256, so the output is bit-identical to the encoder's input
for any uint8 content (asserted against
:func:`sykepic_tpu.ingest.wirecodec.decode_reference` and round-trip in
``tests/test_wirecodec.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ingest import wirecodec


@jax.jit
def unpack_plane(plane):
    """(Nc, H, W//2) packed nibbles -> (Nc, H, W) int32 signed deltas."""
    lo = (plane & 15).astype(jnp.int32)
    hi = (plane >> 4).astype(jnp.int32)
    nc, h, wh = plane.shape
    d = jnp.stack([lo, hi], axis=-1).reshape(nc, h, wh * 2)
    return d - 16 * (d > 7)


@partial(jax.jit, donate_argnums=(0,))
def scatter_chunk(d, exc, carry):
    """Apply one exception chunk to the flat delta view.

    ``exc`` is (CHUNK,) uint8 — advance<<4 | residual>>4 per entry, where
    a zero low nibble marks a dummy whose advance counts 15x (format:
    :mod:`sykepic_tpu.ingest.wirecodec`). ``carry`` is the last decoded
    position of the previous chunk (int32, -1 before the first). Dummy
    and padding entries carry residual 0 — adding 0 anywhere is a no-op —
    and ``mode="drop"`` discards the pos=-1 writes of an all-padding
    stream. Returns the updated deltas and the new carry.
    """
    adv = (exc >> 4).astype(jnp.int32)
    v = (exc & 15).astype(jnp.int32)
    pos = carry + jnp.cumsum(jnp.where(v > 0, adv, adv * 15))
    shape = d.shape
    flat = d.reshape(-1)
    flat = flat.at[pos].add(v << 4, mode="drop")
    return flat.reshape(shape), pos[-1]


@jax.jit
def finalize(d, flags):
    """Cumsum mod 256 along each window's predictor axis -> uint8.

    Flag 0 = vertical (cumsum rows), 1 = horizontal (cumsum cols),
    2 = gradient (cumsum rows THEN cols — undoes the second difference).
    int32 is safe un-wrapped: |d| <= 255 per px post-scatter, so the
    chained cumsums stay <= npx * 255 < 2^31 for any packer canvas.
    """
    pv = jnp.cumsum(d, axis=1)
    ph = jnp.cumsum(d, axis=2)
    pg = jnp.cumsum(pv, axis=2)
    f = flags[:, None, None]
    out = jnp.where(f == 1, ph, jnp.where(f == 2, pg, pv))
    return (out & 255).astype(jnp.uint8)


def decode(payload: wirecodec.WirePayload, put=None):
    """Decode a payload into device-resident uint8 windows.

    ``put`` optionally places the host arrays (e.g. replicated over a
    mesh) before the programs run; the decoded windows then inherit that
    placement through jit.
    """
    if put is None:
        put = jax.device_put
    d = unpack_plane(put(payload.plane))
    carry = put(jnp.int32(-1))
    n = len(payload.exc)
    chunk = payload.chunk
    for start in range(0, n, chunk):
        d, carry = scatter_chunk(
            d, put(payload.exc[start:start + chunk]), carry)
    return finalize(d, put(payload.flags))
