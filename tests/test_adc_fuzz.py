"""Randomized ADC decode fuzz: the native C++ parser and the NumPy fallback
must agree on arbitrary well-formed inputs, and malformed inputs must fail
into the per-sample isolation path (ValueError), never crash."""

import numpy as np
import pytest

from sykepic_tpu.ingest import ifcb, native


def python_parse(raw: bytes):
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


@pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")
def test_fuzz_native_matches_python():
    rng = np.random.default_rng(7)
    for trial in range(50):
        n_rows = int(rng.integers(1, 30))
        lines = []
        for _ in range(n_rows):
            n_cols = int(rng.integers(18, 30))
            cols = [str(rng.integers(0, 10**6)) for _ in range(n_cols)]
            cols[15] = str(int(rng.integers(0, 2000)))
            cols[16] = str(int(rng.integers(0, 2000)))
            start = int(rng.integers(0, 10**9))
            cols[17] = f"{start}.000" if rng.random() < 0.3 else str(start)
            lines.append(",".join(cols))
        sep = "\r\n" if rng.random() < 0.3 else "\n"
        raw = sep.join(lines)
        if rng.random() < 0.5:
            raw += sep
        raw = raw.encode()
        nat = native.adc_parse(raw)
        ref = python_parse(raw)
        assert nat is not None
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(a, b)


def test_fuzz_decode_isolation(tmp_path):
    """Random garbage samples either decode or raise ValueError/OSError —
    the classes the batch pipelines isolate per sample."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        name = f"D20200101T{trial:06d}_IFCB114"
        n_rows = int(rng.integers(1, 6))
        rows = []
        for _ in range(n_rows):
            cols = [str(int(rng.integers(0, 100))) for _ in range(24)]
            cols[15] = str(int(rng.integers(0, 200)))
            cols[16] = str(int(rng.integers(0, 200)))
            cols[17] = str(int(rng.integers(0, 5000)))
            rows.append(",".join(cols))
        (tmp_path / f"{name}.adc").write_text("\n".join(rows) + "\n")
        payload = rng.integers(0, 256, int(rng.integers(0, 3000))).astype(np.uint8)
        payload.tofile(tmp_path / f"{name}.roi")
        try:
            rois = ifcb.read_sample(tmp_path / name)
            for rid, img in rois.images():
                assert img.ndim == 2
        except ValueError:
            pass  # truncated payload: the isolated error path


def test_short_rows_fall_back_to_python_error():
    # rows with < 18 columns: the native parser reports failure and the
    # Python fallback raises IndexError -> surfaced as a decode error
    raw = b"1,2,3\n"
    assert native.lib() is None or native.adc_parse(raw) is None
    with pytest.raises(Exception):
        python_parse(raw)
