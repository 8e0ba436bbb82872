"""Fixed-point D2H result rows (``engine._pack_probs_u16`` /
``engine.unpack_probs_u16``).

The tunneled link's DOWNLOAD direction runs ~5 MB/s against a 30-45 MB/s
upload, so f32 probability rows (200 B/ROI at 50 classes) cost real drain
time the pipeline must hide. The benched configuration therefore ships
``round(p * 1e5)`` as a uint16 low-word plane plus packed overflow bits
(~108 B/ROI) — exactly the information the 5-decimal CSV contract
(reference ``sykepic/compute/probability.py:180-206``) carries. These
tests pin the round trip (including overflow values > 0.65535 and the
16-class word padding) and the production stream's equivalence to the
f32 download path.
"""

import os

import numpy as np
import pytest

from sykepic_tpu.compute import engine


def _pack(p: np.ndarray) -> np.ndarray:
    import jax

    return np.asarray(jax.jit(engine._pack_probs_u16)(p.astype(np.float32)))


@pytest.mark.parametrize("n_classes", [3, 16, 17, 50])
def test_pack_unpack_round_trip_exact(n_classes):
    rng = np.random.default_rng(11)
    # softmax-like rows plus crafted edges: a dominant class above the
    # uint16 boundary (0.65536), the boundary itself, 0 and 1 exactly
    rows = rng.dirichlet(np.full(n_classes, 0.3), size=64)
    edges = np.zeros((4, n_classes))
    edges[0, 0] = 1.0
    edges[1, 0] = 0.65536
    edges[1, 1] = 1.0 - 0.65536
    edges[2, -1] = 0.9
    edges[2, 0] = 0.1
    p = np.vstack([rows, edges]).astype(np.float32)

    packed = _pack(p)
    assert packed.dtype == np.uint16
    assert packed.shape == (len(p), n_classes + -(-n_classes // 16))

    out = engine.unpack_probs_u16(packed, n_classes)
    # the reconstructed value re-rounds to the device's integer exactly
    want = np.rint(p.astype(np.float32) * np.float32(1e5)).astype(np.int64)
    got = np.rint(out * np.float32(1e5)).astype(np.int64)
    np.testing.assert_array_equal(got, want)
    assert np.abs(out - p).max() <= 0.5e-5 + 1e-7
    np.testing.assert_array_equal(np.argmax(out, 1), np.argmax(p, 1))


def test_zero_row_unpack():
    """Zero-valid batches drain too: the unpack must return an empty
    (0, C) array, not crash on a shape-inference corner."""
    out = engine.unpack_probs_u16(np.zeros((0, 54), np.uint16), 50)
    assert out.shape == (0, 50) and out.dtype == np.float32


def test_nonfinite_probs_stay_loud():
    """NaN/Inf device probabilities must reconstruct as NaN (the f32
    download path's behavior), not launder into plausible fixed-point
    values via undefined float->int casts."""
    p = np.array([[np.nan, 0.5, np.inf, -np.inf, 0.25]], np.float32)
    out = engine.unpack_probs_u16(_pack(p), p.shape[1])
    assert np.isnan(out[0, 0]) and np.isnan(out[0, 2]) and np.isnan(out[0, 3])
    assert abs(out[0, 1] - 0.5) < 1e-6 and abs(out[0, 4] - 0.25) < 1e-6


def test_two_overflow_values_in_one_word():
    """Bit packing must keep per-class overflow bits independent (v >
    65535 can hold for several values of an arbitrary row, even though a
    softmax row has at most one)."""
    p = np.array([[0.9, 0.8, 0.7, 0.1, 0.0, 0.66, 0.05, 0.65535] * 4],
                 np.float32)
    out = engine.unpack_probs_u16(_pack(p), p.shape[1])
    np.testing.assert_array_equal(
        np.rint(out * np.float32(1e5)).astype(np.int64),
        np.rint(p * np.float32(1e5)).astype(np.int64),
    )


def test_stream_matches_f32_download_path(model_dir, tmp_path, monkeypatch):
    """The full production stream (pack -> dispatch -> drain -> CSV) with
    compact rows must produce the same predictions and 5-decimal
    probabilities (to the 1e-5 quantum) as the f32 download path."""
    from sykepic_tpu.compute import probability

    sample = os.path.join("tests", "data", "raw", "valid",
                          "D20180712T065600_IFCB114")

    monkeypatch.delenv("SYKEPIC_D2H_COMPACT", raising=False)
    clf = probability.prepare_model(model_dir, batch_size=8)
    assert clf.d2h_compact  # the default IS the benched configuration
    probability.process_sample(sample, clf, tmp_path / "compact")

    monkeypatch.setenv("SYKEPIC_D2H_COMPACT", "off")
    clf32 = probability.prepare_model(model_dir, batch_size=8)
    assert not clf32.d2h_compact
    probability.process_sample(sample, clf32, tmp_path / "f32")

    a = next((tmp_path / "compact").glob("**/*.csv")).read_text().splitlines()
    b = next((tmp_path / "f32").glob("**/*.csv")).read_text().splitlines()
    assert a[0] == b[0]  # identical header (schema untouched)
    assert len(a) == len(b)
    for la, lb in zip(a[1:], b[1:]):
        ca, cb = la.split(","), lb.split(",")
        assert ca[0] == cb[0]  # same roi order
        pa = np.array(ca[1:], np.float64)
        pb = np.array(cb[1:], np.float64)
        # device-f32 rint vs host-double %.5f can disagree by one printed
        # 5th-decimal unit where p*1e5 lands within f32 noise of .5
        assert np.abs(pa - pb).max() <= 1.01e-5
        assert np.argmax(pa) == np.argmax(pb)
