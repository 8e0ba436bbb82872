"""Native C++ helpers must produce byte-identical results to the Python
fallbacks (they are drop-in hot-path replacements, not approximations)."""

import numpy as np
import pytest

from sykepic_tpu.ingest import native

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native library unavailable (no compiler)"
)


def python_adc_parse(raw: bytes):
    lines = raw.splitlines()
    n = len(lines)
    widths = np.zeros(n, np.int64)
    heights = np.zeros(n, np.int64)
    starts = np.zeros(n, np.int64)
    for i, line in enumerate(lines):
        if not line:
            continue
        parts = line.split(b",")
        widths[i] = int(parts[15])
        heights[i] = int(parts[16])
        starts[i] = int(float(parts[17]))
    return widths, heights, starts


def test_adc_parse_fixture():
    raw = open("tests/data/raw/valid/D20180712T065600_IFCB114.adc", "rb").read()
    w, h, s = native.adc_parse(raw)
    pw, ph, ps = python_adc_parse(raw)
    np.testing.assert_array_equal(w, pw)
    np.testing.assert_array_equal(h, ph)
    np.testing.assert_array_equal(s, ps)


def test_adc_parse_synthetic_line_endings():
    def row(w, h, s):
        cols = ["1"] * 24
        cols[15], cols[16], cols[17] = str(w), str(h), str(s)
        return ",".join(cols)

    for sep, trailing in (("\n", True), ("\r\n", True), ("\n", False)):
        raw = sep.join(row(i + 1, 2 * i, 100 * i) for i in range(5))
        if trailing:
            raw += sep
        w, h, s = native.adc_parse(raw.encode())
        assert list(w) == [1, 2, 3, 4, 5]
        assert list(h) == [0, 2, 4, 6, 8]
        assert list(s) == [0, 100, 200, 300, 400]
    # decimal start bytes parse like int(float(x))
    raw = row(3, 4, "123.000")
    w, h, s = native.adc_parse(raw.encode())
    assert (w[0], h[0], s[0]) == (3, 4, 123)


def test_format_probs_matches_python():
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(50), size=200)
    # include formatting edge cases
    probs[0, 0] = 0.0
    probs[0, 1] = 1.0
    probs[1, 0] = 0.000005  # rounding boundary
    probs[1, 1] = 0.999995
    roi_ids = np.arange(1, 201, dtype=np.int64)
    body = native.format_probs(roi_ids, probs).decode()
    expected_lines = [
        f"{r}," + ",".join(f"{p:.5f}" for p in row)
        for r, row in zip(roi_ids, probs)
    ]
    assert body.splitlines() == expected_lines


def test_probabilities_to_csv_native_path(tmp_path):
    """End-to-end CSV writer must be byte-identical whichever path runs."""
    from sykepic_tpu.compute import probability

    rng = np.random.default_rng(2)
    rows = [(i + 1, rng.dirichlet(np.ones(50))) for i in range(20)]
    classes = [f"c{i}" for i in range(50)]
    probability.probabilities_to_csv(rows, classes, tmp_path / "native.csv")
    # force the Python fallback
    import sykepic_tpu.ingest.native as native_mod

    orig = native_mod.format_probs
    native_mod.format_probs = lambda *a, **k: None
    try:
        probability.probabilities_to_csv(rows, classes, tmp_path / "py.csv")
    finally:
        native_mod.format_probs = orig
    assert (tmp_path / "native.csv").read_bytes() == (tmp_path / "py.csv").read_bytes()


def test_stale_so_rebuilt_on_host_change(tmp_path, monkeypatch):
    """A .so built on a different CPU (recorded in .buildhost) must be
    discarded, not loaded: -march=native code from a wider-ISA host
    SIGILLs, which no except clause can catch."""
    import sykepic_tpu.ingest.native as native_mod

    fake_so = tmp_path / "libifcb_native.so"
    fake_so.write_bytes(b"not a real library")
    (tmp_path / ".buildhost").write_text("deadbeefdeadbeef\n")
    monkeypatch.setattr(native_mod, "_SO", fake_so)
    monkeypatch.setattr(native_mod, "_FP", tmp_path / ".buildhost")
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    # lib() runs make with cwd=the REAL native dir; stub it out so the
    # test can't trigger a real build side effect (which would leave a
    # fresh .so without its matching real .buildhost)
    import subprocess as _sp

    def _no_make(*a, **k):
        raise _sp.CalledProcessError(1, a[0])

    monkeypatch.setattr(native_mod.subprocess, "run", _no_make)
    native_mod.lib()  # returns None: the stubbed make "fails"
    assert not fake_so.exists(), "stale cross-host .so was not discarded"

    # matching fingerprint: the (unloadable) .so is trusted and kept
    fake_so.write_bytes(b"not a real library")
    (tmp_path / ".buildhost").write_text(native_mod._host_fingerprint() + "\n")
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    assert native_mod.lib() is None  # CDLL fails on garbage, no crash
    assert fake_so.exists()


def test_host_fingerprint_stable():
    import sykepic_tpu.ingest.native as native_mod

    a = native_mod._host_fingerprint()
    assert a == native_mod._host_fingerprint()
    assert len(a) == 16
