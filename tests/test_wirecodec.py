"""Exactness and payoff tests for the shelf-window wire codec.

The codec is only allowed into the classify stream because it is
bit-lossless: every test here asserts ``decode(encode(w)) == w``
exactly, for the device decoder and the NumPy reference decoder alike.
"""

from pathlib import Path

import numpy as np

from sykepic_tpu.ingest import ifcb, shelf, wirecodec
from sykepic_tpu.ops import wiredecode

FIXTURE_SAMPLE = Path("tests/data/raw/valid/D20180712T065600_IFCB114")


def _fixture_windows(n_windows=3, seed=0):
    """Shelf windows filled with real IFCB pixel content."""
    imgs = [img for _, img in ifcb.read_sample(FIXTURE_SAMPLE).images()]
    rng = np.random.default_rng(seed)
    rois = []
    for i in range(400):
        src = imgs[i % len(imgs)]
        h = int(rng.integers(20, src.shape[0] + 1))
        w = int(rng.integers(20, src.shape[1] + 1))
        y = int(rng.integers(0, src.shape[0] - h + 1))
        x = int(rng.integers(0, src.shape[1] - w + 1))
        rois.append((0, i + 1, src[y:y + h, x:x + w]))
    batches = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180)))
    wins = np.concatenate([b.windows for b in batches])[:n_windows]
    assert len(wins) == n_windows
    return wins


def _roundtrip(windows, force=False):
    payload = wirecodec.encode(windows, force=force)
    assert payload is not None, "encode unexpectedly fell back to raw"
    if not force:
        assert payload.nbytes < windows.nbytes
    ref = wirecodec.decode_reference(payload)
    np.testing.assert_array_equal(ref, windows)
    dev = np.asarray(wiredecode.decode(payload))
    np.testing.assert_array_equal(dev, windows)
    return payload


def test_roundtrip_fixture_content():
    # real un-resized IFCB pixels are the codec's worst realistic case
    # (~4.4 bit/px delta entropy): exactness is the contract here; the
    # compression-payoff case is the resized mix below
    _roundtrip(_fixture_windows(n_windows=6))


def test_payoff_on_resized_mix():
    """Content shaped like the production stream (ROIs resized toward the
    network input, as archives of mixed-magnification deployments are)
    must compress meaningfully — this is the regime the codec exists for."""
    import cv2

    imgs = [img for _, img in ifcb.read_sample(FIXTURE_SAMPLE).images()]
    rng = np.random.default_rng(3)
    rois = []
    for i in range(600):
        src = imgs[i % len(imgs)]
        h, w = int(rng.integers(40, 129)), int(rng.integers(40, 129))
        rois.append((0, i + 1,
                     cv2.resize(src, (w, h), interpolation=cv2.INTER_AREA)))
    batches = list(shelf.pack_shelves(iter(rois), pre_shrink_to=(180, 180)))
    wins = np.concatenate([b.windows for b in batches])[:8]
    payload = _roundtrip(wins)
    assert payload.nbytes < 0.78 * wins.nbytes


def test_roundtrip_flat_and_extreme():
    h, w = shelf.WIN_H, shelf.WIN_W
    wins = np.stack([
        np.zeros((h, w), np.uint8),
        np.full((h, w), 255, np.uint8),
        np.tile((np.arange(w) % 256).astype(np.uint8), (h, 1)),
        np.tile((np.arange(h) % 256).astype(np.uint8)[:, None], (1, w)),
    ])
    _roundtrip(wins, force=True)


def test_roundtrip_sparse_far_exceptions():
    """Gaps far beyond 255 exercise the dummy-advance entries."""
    wins = np.zeros((2, shelf.WIN_H, shelf.WIN_W), np.uint8)
    wins[0, 0, 0] = 200
    wins[1, shelf.WIN_H - 1, shelf.WIN_W - 1] = 131
    wins[1, 5, 7] = 99
    _roundtrip(wins, force=True)


def test_roundtrip_no_exceptions():
    """Content whose deltas all fit 4 bits -> empty exception stream."""
    h, w = shelf.WIN_H, shelf.WIN_W
    base = (np.add.outer(np.arange(h), np.arange(w)) % 8).astype(np.uint8)
    payload = _roundtrip(base[None])
    assert payload.n_exc == 0
    assert len(payload.exc) == 0  # zero chunks ship for a clean stream


def test_noise_falls_back_to_raw():
    rng = np.random.default_rng(1)
    wins = rng.integers(0, 256, (2, shelf.WIN_H, shelf.WIN_W), np.uint8)
    assert wirecodec.encode(wins) is None


def test_roundtrip_random_smooth_content():
    """Randomized smooth-ish content over many seeds (property test)."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        base = rng.integers(100, 200)
        wins = (base + rng.normal(0, 4, (2, shelf.WIN_H, shelf.WIN_W))
                ).clip(0, 255).astype(np.uint8)
        # sprinkle hard edges (organism silhouettes)
        for _ in range(30):
            y, x = rng.integers(0, shelf.WIN_H - 20), rng.integers(
                0, shelf.WIN_W - 20)
            wins[rng.integers(0, 2), y:y + 20, x:x + 20] //= 3
        _roundtrip(wins, force=True)


def test_chunk_padding_is_exact_multiple():
    payload = wirecodec.encode(_fixture_windows())
    assert payload.chunk == wirecodec.chunk_for(3 * shelf.WIN_H * shelf.WIN_W)
    assert len(payload.exc) % payload.chunk == 0


def test_chunk_scales_with_dispatch_size():
    assert wirecodec.chunk_for(64 * 192 * 512) == wirecodec.CHUNK
    assert wirecodec.chunk_for(64 * 32 * 64) == wirecodec.MIN_CHUNK
    # monotone powers of two within the clamp
    prev = 0
    for npx in (1, 10_000, 100_000, 1_000_000, 10_000_000):
        c = wirecodec.chunk_for(npx)
        assert c >= prev and (c & (c - 1)) == 0
        prev = c


def test_predictor_flags_choose_cheaper_axis():
    h, w = shelf.WIN_H, shelf.WIN_W
    # horizontal stripes: vertical deltas huge, horizontal zero
    stripes_h = np.tile((np.arange(h) % 2 * 200).astype(np.uint8)[:, None],
                        (1, w))
    # vertical stripes: the transpose case
    stripes_v = np.tile((np.arange(w) % 2 * 200).astype(np.uint8), (h, 1))
    payload = _roundtrip(np.stack([stripes_h, stripes_v]), force=True)
    assert payload.flags[0] == 1  # horizontal predictor
    assert payload.flags[1] == 0  # vertical predictor
    assert payload.n_exc <= 2 * h  # only the absolute first row/col escapes


def _smooth_rois(n, rng):
    """Compressible ROIs (smooth gradients + soft blobs): the codec's
    payoff gate must engage on these even for few-window dispatches."""
    out = []
    for i in range(n):
        h = int(rng.integers(30, 90))
        w = int(rng.integers(30, 90))
        yy, xx = np.mgrid[0:h, 0:w]
        img = (160 + 20 * np.sin(yy / 9) + 15 * np.cos(xx / 11)
               ).clip(0, 255).astype(np.uint8)
        out.append((i % 5, i + 1, img))
    return out


def test_engine_codec_on_off_identical(model_dir, monkeypatch):
    """classify_rois with the wire codec ships encoded dispatches and
    yields BIT-IDENTICAL probabilities to the raw-window path."""
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(11)
    rois = _smooth_rois(260, rng)

    def run(codec):
        monkeypatch.setenv("SYKEPIC_WIRE_CODEC", codec)
        clf = probability.prepare_model(model_dir, batch_size=64)
        clf.packing = "shelf"
        out = {(s, r): p for s, r, p in clf.classify_rois(iter(rois))}
        return out, clf.wire_stats

    on, stats_on = run("on")
    off, stats_off = run("off")
    assert stats_on["encoded"] > 0, stats_on  # the codec actually engaged
    assert stats_off == {"encoded": 0, "raw": 0}
    assert set(on) == set(off)
    for k in on:
        np.testing.assert_array_equal(on[k], off[k])


def test_engine_codec_raw_fallback_on_noise(model_dir, monkeypatch):
    """Incompressible content must ship raw (payoff gate) and classify
    identically."""
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(12)
    rois = [(i % 3, i + 1,
             rng.integers(0, 255, (64, 64), np.uint8)) for i in range(80)]
    monkeypatch.setenv("SYKEPIC_WIRE_CODEC", "on")
    clf = probability.prepare_model(model_dir, batch_size=64)
    clf.packing = "shelf"
    out = {(s, r): p for s, r, p in clf.classify_rois(iter(rois))}
    assert len(out) == 80
    assert clf.wire_stats["raw"] > 0
    assert clf.wire_stats["encoded"] == 0


def test_native_encoder_matches_numpy_bytes(monkeypatch):
    """The C++ encoder must be byte-for-byte the NumPy contract."""
    from sykepic_tpu.ingest import native

    if native.lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    cases = [
        _fixture_windows(n_windows=4, seed=5),
        np.zeros((2, shelf.WIN_H, shelf.WIN_W), np.uint8),
        (170 + rng.normal(0, 3, (3, shelf.WIN_H, shelf.WIN_W))
         ).clip(0, 255).astype(np.uint8),
    ]
    # plus a hard-edge case with long gaps
    sparse = np.zeros((2, shelf.WIN_H, shelf.WIN_W), np.uint8)
    sparse[0, 3, 9] = 210
    sparse[1, 100, 400] = 77
    cases.append(sparse)
    for wins in cases:
        nat = wirecodec.encode(wins, force=True)
        monkeypatch.setattr(wirecodec, "USE_NATIVE", False)
        ref = wirecodec.encode(wins, force=True)
        monkeypatch.setattr(wirecodec, "USE_NATIVE", True)
        np.testing.assert_array_equal(nat.plane, ref.plane)
        np.testing.assert_array_equal(nat.flags, ref.flags)
        np.testing.assert_array_equal(nat.exc, ref.exc)
        assert nat.n_exc == ref.n_exc
        assert nat.shape == ref.shape


def test_engine_codec_slot_path_identical(model_dir, monkeypatch):
    """The per-ROI slot path (SYKEPIC_PACKING=slots) also rides the codec
    and must match the raw path bit-for-bit."""
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(13)
    rois = _smooth_rois(180, rng)

    def run(codec):
        monkeypatch.setenv("SYKEPIC_WIRE_CODEC", codec)
        clf = probability.prepare_model(model_dir, batch_size=64)
        clf.packing = "slots"
        out = {(s, r): p for s, r, p in clf.classify_rois(iter(rois))}
        return out, dict(clf.wire_stats)

    on, stats_on = run("on")
    off, _ = run("off")
    assert stats_on["encoded"] > 0, stats_on
    assert set(on) == set(off)
    for k in on:
        np.testing.assert_array_equal(on[k], off[k])


def test_engine_codec_fused_path_identical(model_dir, monkeypatch):
    """The fused classify+features path decodes the canvas once on device
    and shares it: probabilities AND device features must be bit-equal to
    the raw path."""
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(14)
    rois = _smooth_rois(180, rng)

    def run(codec):
        monkeypatch.setenv("SYKEPIC_WIRE_CODEC", codec)
        clf = probability.prepare_model(model_dir, batch_size=64)
        out = {(s, r): (p, f) for s, r, p, f
               in clf.classify_and_feature_rois(iter(rois))}
        return out, dict(clf.wire_stats)

    on, stats_on = run("on")
    off, _ = run("off")
    assert stats_on["encoded"] > 0, stats_on
    assert set(on) == set(off)
    for k in on:
        np.testing.assert_array_equal(on[k][0], off[k][0])
        assert on[k][1] == off[k][1]  # feature 4-tuples exactly equal


def test_payload_pool_recycling_is_lossless():
    """encode -> recycle -> encode different content must reuse buffers
    without any cross-contamination (decode stays bit-exact)."""
    from sykepic_tpu.ingest import wirecodec as wc

    wc._POOL.clear()
    rng = np.random.default_rng(5)
    smooth = (rng.integers(0, 3, (4, 192, 512), np.int16).cumsum(axis=2)
              % 256).astype(np.uint8)
    p1 = wc.encode(smooth, force=True)
    assert p1 is not None
    ref1 = wc.decode_reference(p1)
    np.testing.assert_array_equal(ref1, smooth)
    buf_ids = {id(p1.plane), id(p1.exc)}
    wc.recycle_payload(p1)
    other = (rng.integers(0, 3, (4, 192, 512), np.int16).cumsum(axis=1)
             % 256).astype(np.uint8)
    p2 = wc.encode(other, force=True)
    assert p2 is not None
    reused = {id(p2.plane), id(p2.exc)} & buf_ids
    assert reused, "pool was never used"
    np.testing.assert_array_equal(wc.decode_reference(p2), other)
    wc._POOL.clear()
