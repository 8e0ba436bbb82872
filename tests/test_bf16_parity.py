"""bf16-vs-f32 inference parity: the benchmark runs the classifier with
``dtype="bfloat16"`` (bench.py), while the reference semantics
(``/root/reference/sykepic/compute/probability.py:180-197``) are defined
by the f32 path our oracle tests pin. This test makes the benched
configuration the tested configuration: every ROI's argmax must be
identical between the two dtypes on real IFCB pixel content, and the
probabilities must agree to well under any classification threshold's
granularity. If bf16 ever flips an argmax here, the bench must record
f32 instead."""

from pathlib import Path

import numpy as np
import pytest


def _synthetic_sample(root: Path, n_rois: int = 32) -> Path:
    """A genuine .adc/.roi/.hdr triplet of ``n_rois`` real-pixel ROIs in a
    spread of sizes (fixture ROIs resized), small enough for a double
    (f32 + bf16) CPU run."""
    import cv2

    import bench
    from sykepic_tpu.ingest import ifcb

    fixture = Path(__file__).parent / "data/raw/valid/D20180712T065600_IFCB114"
    images = [img for _, img in ifcb.read_sample(fixture).images()]
    rng = np.random.default_rng(3)
    imgs = [
        cv2.resize(images[i % len(images)],
                   (int(rng.integers(40, 160)), int(rng.integers(24, 120))),
                   interpolation=cv2.INTER_AREA)
        for i in range(n_rois)
    ]
    return bench._write_sample_triplet(root, "D20200101T000000_IFCB114", imgs)


def _read_prob_csv(out_dir: Path):
    csv = next(out_dir.glob("**/*.csv"))
    with open(csv) as fh:
        header = fh.readline().rstrip("\n").split(",")
        rows = [line.rstrip("\n").split(",") for line in fh]
    rois = [int(r[0]) for r in rows]
    probs = np.array([[float(v) for v in r[1:]] for r in rows])
    return header, rois, probs


def test_bfloat16_inference_matches_f32(tmp_path):
    import bench
    from sykepic_tpu.compute import probability

    model_dir = bench.build_model_dir(tmp_path)
    sample = _synthetic_sample(tmp_path, n_rois=32)

    results = {}
    for dtype in ("float32", "bfloat16"):
        clf = probability.prepare_model(model_dir, batch_size=32, dtype=dtype)
        out = tmp_path / f"out_{dtype}"
        done = probability.process_samples_batched([sample], clf, out)
        assert len(done) == 1
        results[dtype] = _read_prob_csv(out)

    (h32, rois32, p32) = results["float32"]
    (h16, rois16, p16) = results["bfloat16"]
    assert h32 == h16 and rois32 == rois16
    # the claim bench.py's number rides on: identical prediction per ROI
    assert np.array_equal(p32.argmax(axis=1), p16.argmax(axis=1)), (
        "bfloat16 flipped an argmax vs float32 — bench must record f32"
    )
    # probabilities agree far below threshold-file granularity (0.01 steps)
    max_dp = float(np.abs(p32 - p16).max())
    assert max_dp < 5e-3, f"bf16 probability drift {max_dp} too large"


def test_bfloat16_fixture_sample_argmax(tmp_path):
    """The real fixture sample (the oracle-parity subject) classifies to
    the same classes under bf16."""
    import bench
    from sykepic_tpu.compute import probability

    model_dir = bench.build_model_dir(tmp_path)
    fixture = (Path(__file__).parent
               / "data/raw/valid/D20180712T065600_IFCB114")
    results = {}
    for dtype in ("float32", "bfloat16"):
        clf = probability.prepare_model(model_dir, batch_size=8, dtype=dtype)
        out = tmp_path / f"fx_{dtype}"
        probability.process_samples_batched([fixture], clf, out)
        results[dtype] = _read_prob_csv(out)
    _, rois32, p32 = results["float32"]
    _, rois16, p16 = results["bfloat16"]
    assert rois32 == rois16 == [2, 3]
    assert np.array_equal(p32.argmax(axis=1), p16.argmax(axis=1))
