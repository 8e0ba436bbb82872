"""Tests for the continuous monitoring daemon (compute/watch.py)."""

import os
import shutil
import time
from pathlib import Path

import pytest

from sykepic_tpu.compute import probability, watch

SRC = Path("tests/data/raw/valid")
SAMPLE = "D20180712T065600_IFCB114"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from sykepic_tpu.models import checkpoint
    from sykepic_tpu.models.registry import init_variables
    from sykepic_tpu.train import config as tcfg

    src = Path("tests/model/resnet18_ref")
    d = tmp_path_factory.mktemp("model") / "resnet18_tpu"
    d.mkdir()
    shutil.copy(src / "config.ini", d / "config.ini")
    shutil.copy(src / "class_names.txt", d / "class_names.txt")
    config = tcfg.read_config(d / "config.ini")
    model, _ = tcfg.get_network(config, 50)
    shape = tcfg.get_img_shape(config)
    variables = init_variables(model, (shape[1], shape[2], shape[0]), seed=0)
    checkpoint.save_variables(d / "best_state.msgpack", variables)
    return d


def copy_sample(raw_dir, old=True):
    raw_dir.mkdir(parents=True, exist_ok=True)
    for f in SRC.iterdir():
        dst = raw_dir / f.name
        shutil.copy(f, dst)
        if old:  # make the sample look settled
            past = time.time() - 3600
            os.utime(dst, (past, past))


def test_settle_filter(tmp_path):
    raw = tmp_path / "raw"
    copy_sample(raw, old=False)  # just written -> not ready
    assert watch.find_ready_samples(raw, settle_seconds=60) == []
    copy_sample(raw, old=True)
    ready = watch.find_ready_samples(raw, settle_seconds=60)
    assert [p.name for p in ready] == [SAMPLE]


def test_watch_processes_new_samples_once(tmp_path, model_dir):
    raw = tmp_path / "raw"
    copy_sample(raw, old=True)
    clf = probability.prepare_model(model_dir, batch_size=4)

    sleeps = []
    done = watch.run(
        raw, clf, tmp_path / "out", interval=0.0, settle_seconds=1,
        max_cycles=3, sleep=sleeps.append,
    )
    assert done == {SAMPLE}
    prob_csvs = list((tmp_path / "out").glob("**/*.prob.csv"))
    feat_csvs = list((tmp_path / "out").glob("**/*.feat.csv"))
    assert len(prob_csvs) == 1 and len(feat_csvs) == 1
    assert len(sleeps) == 2  # slept between cycles, not after the last
    mtime = prob_csvs[0].stat().st_mtime_ns

    # a second run over the same tree reprocesses nothing
    done2 = watch.run(
        raw, clf, tmp_path / "out", interval=0.0, settle_seconds=1,
        max_cycles=1, sleep=lambda s: None,
    )
    assert prob_csvs[0].stat().st_mtime_ns == mtime
    assert done2 == {SAMPLE}  # seen again, skipped via existing CSVs


def test_watch_retries_failed_feature_extraction(tmp_path, model_dir, monkeypatch):
    """A sample whose feature extraction fails transiently must be retried
    on the next cycle (only prob+feat success marks it done)."""
    from sykepic_tpu.compute import pipeline

    raw = tmp_path / "raw"
    copy_sample(raw, old=True)
    clf = probability.prepare_model(model_dir, batch_size=4)

    calls = {"n": 0}
    real_compute = pipeline.compute_features

    def flaky(img):
        if calls["n"] == 0:
            calls["n"] += 1
            raise OSError("transient")
        return real_compute(img)

    monkeypatch.setattr(pipeline, "compute_features", flaky)
    out = tmp_path / "out"
    done = watch.run(
        raw, clf, out, interval=0.0, settle_seconds=1,
        max_cycles=3, sleep=lambda s: None,
    )
    assert done == {SAMPLE}
    assert list(out.glob("**/*.feat.csv"))
    assert list(out.glob("**/*.prob.csv"))


def test_watch_skips_oversized_roi_for_good(tmp_path, model_dir, monkeypatch):
    from sykepic_tpu.compute import watch as watch_mod

    raw = tmp_path / "raw"
    copy_sample(raw, old=True)
    monkeypatch.setattr(probability, "MAX_ROI_BYTES", 10)  # everything is "big"
    clf = probability.prepare_model(model_dir, batch_size=4)
    out = tmp_path / "out"
    done = watch_mod.run(
        raw, clf, out, interval=0.0, settle_seconds=1,
        max_cycles=2, sleep=lambda s: None,
    )
    assert done == {SAMPLE}  # marked done (skipped), never decoded
    assert not list(out.glob("**/*.csv"))


def test_watch_gives_up_on_permanent_failures(tmp_path, model_dir, monkeypatch):
    """A sample that fails every cycle (corrupt data) is abandoned after
    max_retries instead of being re-decoded for the daemon's lifetime."""
    from sykepic_tpu.compute import pipeline

    raw = tmp_path / "raw"
    copy_sample(raw, old=True)
    clf = probability.prepare_model(model_dir, batch_size=4)

    calls = {"n": 0}

    def always_fails(img):
        calls["n"] += 1
        raise ValueError("corrupt")

    monkeypatch.setattr(pipeline, "compute_features", always_fails)
    out = tmp_path / "out"
    done = watch.run(
        raw, clf, out, interval=0.0, settle_seconds=1,
        max_cycles=6, max_retries=2, sleep=lambda s: None,
    )
    # abandoned (in done) despite never producing a feat CSV...
    assert done == {SAMPLE}
    assert not list(out.glob("**/*.feat.csv"))
    # ...and attempts stopped at max_retries, not max_cycles
    attempts = calls["n"]
    assert attempts > 0
    calls["n"] = 0
    watch.run(raw, clf, out, interval=0.0, settle_seconds=1,
              max_cycles=6, max_retries=6, sleep=lambda s: None)
    assert calls["n"] > attempts  # more retries allowed -> more attempts


def test_watch_systemic_failures_do_not_burn_retries(tmp_path, model_dir,
                                                     monkeypatch):
    """A cycle in which EVERY attempted sample fails looks like an
    infrastructure outage (TPU/link down, disk full), not per-sample
    corruption: it must not count toward retry budgets, and the samples
    must process once the fault clears."""
    from sykepic_tpu.compute import pipeline

    raw = tmp_path / "raw"
    copy_sample(raw, old=True)
    # a second sample (same fixture content under a different timestamp)
    past = time.time() - 3600
    for f in SRC.iterdir():
        dst = raw / f.name.replace("T065600", "T070000")
        shutil.copy(f, dst)
        os.utime(dst, (past, past))
    clf = probability.prepare_model(model_dir, batch_size=4)

    broken = {"on": True}
    real_compute = pipeline.compute_features

    def outage(img):
        if broken["on"]:
            raise OSError("no space left on device")
        return real_compute(img)

    monkeypatch.setattr(pipeline, "compute_features", outage)
    out = tmp_path / "out"
    # far more cycles than max_retries: with the old counting, both
    # samples would be abandoned by cycle 2
    done = watch.run(raw, clf, out, interval=0.0, settle_seconds=1,
                     max_cycles=5, max_retries=2, sleep=lambda s: None)
    assert done == set()  # still pending, NOT abandoned
    broken["on"] = False
    done = watch.run(raw, clf, out, interval=0.0, settle_seconds=1,
                     max_cycles=2, max_retries=2, sleep=lambda s: None)
    assert done == {SAMPLE, SAMPLE.replace("T065600", "T070000")}
    assert len(list(out.glob("**/*.feat.csv"))) == 2
