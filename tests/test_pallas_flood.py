"""The VMEM pallas flood (ops/pallas_flood.py, interpret mode on CPU)
must equal the XLA while_loop flood bit-for-bit — they are the TPU/CPU
formulations of the same constrained reconstruction."""

import numpy as np

from sykepic_tpu.ops import features_device, pallas_flood


def _xla_flood(seed, within, cap):
    # the XLA formulation regardless of backend gating
    import jax.numpy as jnp

    import jax

    within_f = jnp.asarray(within, features_device._MASK_DTYPE)
    state = jnp.asarray(seed, features_device._MASK_DTYPE) * within_f

    def cond(c):
        i, s, changed = c
        return jnp.logical_and(i < cap, changed)

    def body(c):
        i, s, _ = c
        grown = features_device._dilate3(s) * within_f
        return i + 1, grown, jnp.any(grown != s)

    _, state, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, jnp.bool_(True)))
    return np.asarray(state > 0.5)


def test_pallas_flood_equals_xla_on_random_masks():
    rng = np.random.default_rng(0)
    for b, h, w, p in ((4, 48, 96, 0.4), (3, 28, 33, 0.55),
                       (1, 64, 128, 0.3)):
        within = rng.uniform(size=(b, h, w)) < p
        seed = np.zeros_like(within)
        seed[:, h // 2, w // 2] = True
        seed[:, 0, :] = within[:, 0, :]  # border seeds like fill_holes
        got = np.asarray(pallas_flood.flood_pallas(
            seed, within, h * w, interpret=True))
        want = _xla_flood(seed, within, h * w)
        np.testing.assert_array_equal(got, want)


def test_pallas_flood_ring_hole_fill_semantics():
    """Through fill_holes-style seeds: background flood around a ring must
    not leak into the hole (8-connectivity, zero-fill borders)."""
    h = w = 40
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - 20, xx - 20)
    ring = (r < 15) & (r > 8)
    free = ~ring[None]
    seed = np.zeros_like(free)
    seed[:, 0, :] = seed[:, -1, :] = True
    seed[:, :, 0] = seed[:, :, -1] = True
    seed &= free
    got = np.asarray(pallas_flood.flood_pallas(seed, free, h * w,
                                               interpret=True))
    want = _xla_flood(seed, free, h * w)
    np.testing.assert_array_equal(got, want)
    assert not got[0, 20, 20]  # the hole is unreachable from the border


def test_pallas_flood_tiles_and_padding():
    """Batch not divisible by the tile size: padded images must not leak
    into real outputs. (A single tile can never carry padding: tile_b =
    min(b, budget), so padding appears only with >= 2 tiles.)"""
    rng = np.random.default_rng(7)
    # padded dims 120x256 -> tile_b = 131072 // 30720 = 4 < b: two grid
    # tiles, the second carrying 3 padding images
    b, h, w = 5, 120, 140
    within = rng.uniform(size=(b, h, w)) < 0.5
    seed = np.zeros_like(within)
    seed[:, ::17, ::23] = True
    got = np.asarray(pallas_flood.flood_pallas(seed, within, h * w,
                                               interpret=True))
    want = _xla_flood(seed, within, h * w)
    np.testing.assert_array_equal(got, want)
    # and a case that genuinely tiles: tiny images, many of them
    b2, h2, w2 = 700, 24, 32
    within = rng.uniform(size=(b2, h2, w2)) < 0.5
    seed = np.zeros_like(within)
    seed[:, 0, :] = within[:, 0, :]
    got = np.asarray(pallas_flood.flood_pallas(seed, within, h2 * w2,
                                               interpret=True))
    want = _xla_flood(seed, within, h2 * w2)
    np.testing.assert_array_equal(got, want)


def test_oversized_canvas_routes_to_xla_flood(monkeypatch):
    """A canvas past the per-image VMEM budget must refuse the kernel
    (explicit ValueError) and the features_device gate must route it to
    the XLA flood instead of crashing the fused pipeline."""
    import pytest

    h, w = 600, 600  # padded 600x640 = 384000 px > 131072
    assert not pallas_flood.fits_vmem(h, w)
    assert pallas_flood.fits_vmem(48, 96)
    mask = np.zeros((1, h, w), bool)
    mask[0, :50, :50] = True
    with pytest.raises(ValueError):
        pallas_flood.flood_pallas(mask, mask, 10, interpret=True)
    # gate: force the pallas path on; the oversized shape must still run
    # (and match) via the XLA formulation
    monkeypatch.setattr(features_device, "_use_pallas_flood", lambda: True)
    got = np.asarray(features_device._flood(mask, mask, 10))
    np.testing.assert_array_equal(got, mask)
