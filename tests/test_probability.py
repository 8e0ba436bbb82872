"""End-to-end `prob` pipeline test, mirroring the reference's
tests/test_probability.py:20-44 (raw sample -> CNN -> .prob.csv) with a
deterministic randomly-initialized checkpoint (the reference's real
best_state.pth is not distributed).
"""

import re
from collections import namedtuple
from pathlib import Path

import numpy as np
import pytest

Args = namedtuple(
    "Args", "raw samples image_dir images model out batch_size num_workers force"
)



def test_call(tmp_path, model_dir):
    from sykepic_tpu.compute import probability

    out_dir = tmp_path / "out"
    arguments = Args(
        raw="tests/data/raw/valid/",
        samples=None,
        image_dir=None,
        images=None,
        model=str(model_dir),
        out=out_dir,
        batch_size=4,
        num_workers=2,
        force=False,
    )
    probability.call(arguments)
    out_csvs = list(out_dir.glob("**/*.csv"))
    assert len(out_csvs) == 1
    # date-sharded layout (reference utils/files.py:27-37)
    assert out_csvs[0].as_posix().endswith(
        "2018/07/12/D20180712T065600_IFCB114.prob.csv"
    )
    lines = out_csvs[0].read_text().splitlines()
    assert len(lines) == 3
    header = lines[0].split(",")
    assert len(header) == 51
    assert header[0] == "roi"
    roi_2 = lines[1].split(",")
    roi_3 = lines[2].split(",")
    assert len(roi_2) == len(header)
    assert len(roi_3) == len(header)
    assert int(roi_2[0]) == 2
    assert int(roi_3[0]) == 3
    # 5-decimal formatting and softmax normalization
    for row in (roi_2, roi_3):
        for cell in row[1:]:
            assert re.fullmatch(r"0\.\d{5}|1\.\d{5}", cell)
        assert sum(float(c) for c in row[1:]) == pytest.approx(1.0, abs=2e-3)

    # idempotency: second run skips (file mtime unchanged)
    mtime = out_csvs[0].stat().st_mtime_ns
    probability.call(arguments)
    assert out_csvs[0].stat().st_mtime_ns == mtime


def test_batched_multi_sample_path_matches_per_sample(tmp_path, model_dir):
    """process_samples_batched (cross-sample device batches) produces the
    identical CSV as the per-sample path."""
    from sykepic_tpu.compute import probability

    clf = probability.prepare_model(model_dir, batch_size=4)
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    sample = Path("tests/data/raw/valid/D20180712T065600_IFCB114")
    probability.process_sample(sample, clf, out_a)
    probability.process_samples_batched([sample], clf, out_b)
    csv_a = next(out_a.glob("**/*.csv")).read_text()
    csv_b = next(out_b.glob("**/*.csv")).read_text()
    assert csv_a == csv_b


def test_images_mode_matches_raw_mode(tmp_path, model_dir):
    """Classifying extracted PNGs yields the same probabilities as raw mode
    (the reference's --image-dir path, probability.py:27-36)."""
    from sykepic_tpu.compute import probability
    from sykepic_tpu.ingest import ifcb

    sample = "tests/data/raw/valid/D20180712T065600_IFCB114"
    img_dir = tmp_path / "imgs"
    ifcb.raw_to_png(sample + ".adc", sample + ".roi", out_dir=img_dir)

    arguments = Args(
        raw=None,
        samples=None,
        image_dir=str(img_dir),
        images=None,
        model=str(model_dir),
        out=tmp_path / "out_imgs",
        batch_size=4,
        num_workers=2,
        force=False,
    )
    probability.call(arguments)
    img_csv = next((tmp_path / "out_imgs").glob("*.csv"))

    arguments_raw = arguments._replace(
        image_dir=None, raw="tests/data/raw/valid/", out=tmp_path / "out_raw"
    )
    probability.call(arguments_raw)
    raw_csv = next((tmp_path / "out_raw").glob("**/*.csv"))
    assert img_csv.read_text() == raw_csv.read_text()


def test_faulty_sample_is_isolated(tmp_path, model_dir):
    """A truncated sample logs and continues; good samples still process
    (reference probability.py:106-115)."""
    from sykepic_tpu.compute import probability
    import shutil

    raw = tmp_path / "raw"
    raw.mkdir()
    src = Path("tests/data/raw/valid")
    for f in src.iterdir():
        shutil.copy(f, raw / f.name)
    # fabricate a corrupt sample: adc referencing bytes beyond payload
    bad_adc = raw / "D20190101T000000_IFCB114.adc"
    cols = ["0"] * 18
    cols[15], cols[16], cols[17] = "100", "100", "0"
    bad_adc.write_text(",".join(cols) + "\n")
    (raw / "D20190101T000000_IFCB114.roi").write_bytes(b"\x00" * 10)
    (raw / "D20190101T000000_IFCB114.hdr").write_text("runTime: 60\ninhibitTime: 1\n")

    clf = probability.prepare_model(model_dir, batch_size=4)
    processed = probability.main(
        [raw / "D20190101T000000_IFCB114", raw / "D20180712T065600_IFCB114"],
        model_dir,
        tmp_path / "out",
        batch_size=4,
        progress_bar=False,
        classifier=clf,
    )
    assert processed == {"D20180712T065600_IFCB114"}
    assert len(list((tmp_path / "out").glob("**/*.csv"))) == 1


def test_onchip_rate_counts_and_runs(model_dir):
    """The wire-free ceiling probe packs the stream like classify_rois
    (same pre-shrink/tails), counts every real ROI exactly once, and
    returns a positive per-pass wall clock."""
    from sykepic_tpu.compute import probability
    from sykepic_tpu.ingest import ifcb

    clf = probability.prepare_model(model_dir, batch_size=4)
    sample = Path("tests/data/raw/valid/D20180712T065600_IFCB114")
    rois = ifcb.read_sample(sample)

    def stream():
        for rid, img in rois.images():
            yield 0, rid, img

    n, secs = clf.onchip_rate(stream(), repeats=2)
    assert n == sum(1 for _ in rois.images())
    assert secs > 0.0
