"""bench.py smoke coverage: the driver runs bench.py unattended at round
end, so its CPU-side pieces must stay importable and functional under CI
— a broken bench means no recorded metric at all."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench():
    import bench as bench_mod

    return bench_mod


def test_roi_shapes_match_mix(bench):
    rng = np.random.default_rng(0)
    shapes = bench._roi_shapes(rng, 2000)
    assert len(shapes) == 2000
    lo_h = min(m[1][0] for m in bench.ROI_SIZE_MIX)
    hi_h = max(m[1][1] for m in bench.ROI_SIZE_MIX)
    lo_w = min(m[2][0] for m in bench.ROI_SIZE_MIX)
    hi_w = max(m[2][1] for m in bench.ROI_SIZE_MIX)
    for h, w in shapes:
        assert lo_h <= h <= hi_h and lo_w <= w <= hi_w
    # the dominant small bucket must dominate
    small = sum(1 for h, w in shapes if h <= 32)
    assert small > 700


def test_host_pack_benchmark_emits_parseable_json(bench, capsys):
    bench.host_pack_benchmark()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "host_pack_rois_per_sec"
    assert payload["value"] > 0
    assert payload["unit"] == "ROIs/s"
    assert payload["bytes_per_roi_wire"] > 0


def test_build_model_dir_loads(bench, tmp_path):
    from sykepic_tpu.compute import probability

    model_dir = bench.build_model_dir(tmp_path)
    clf = probability.prepare_model(model_dir, batch_size=32)
    assert len(clf.classes) == 50


def test_history_lookups_filter_by_metric(bench, tmp_path, monkeypatch):
    """The record lookups behind the health/link gates must pick the right
    metric lines, tolerate garbage, and surface the context fields."""
    hist = tmp_path / "hist.jsonl"
    rows = [
        {"metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
         "value": 20000.0, "best": 21000.0, "link_MBps": [30.0, 35.5],
         "bytes_per_roi": 1991.0, "onchip_rois_per_sec": 36000.0,
         "recorded_at": "2026-08-20T00:00:00Z"},
        {"metric": "train_epoch_wall_clock", "value": 0.7,
         "img_per_sec": 11702.9, "achieved_tflops": 81.0,
         "first_epoch_s": 24.8, "recorded_at": "2026-08-19T00:00:00Z"},
        {"metric": "fused_classify_features_rois_per_sec",
         "value": 11537.2, "best": 11601.2,
         "onchip_fused_rois_per_sec": 17000.0, "link_MBps": [40.1],
         "recorded_at": "2026-08-21T00:00:00Z"},
        {"metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
         "value": 23493.7, "best": 24893.1, "link_MBps": [42.0, 40.5],
         "bytes_per_roi": 1991.1, "onchip_rois_per_sec": 38617.4,
         "recorded_at": "2026-08-20T19:41:04Z"},
    ]
    with open(hist, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write("{truncated mid-append\n")  # must not disable the gates
    monkeypatch.setattr(bench, "HISTORY", hist)

    best = bench._best_recorded()
    assert best["value"] == 23493.7 and max(best["link_MBps"]) == 42.0

    fused = bench._best_fused_recorded()
    assert fused["value"] == 11537.2
    assert fused["onchip_fused_rois_per_sec"] == 17000.0

    assert bench._onchip_record() == 38617.4

    train = bench._best_train_recorded()
    assert train["value"] == 0.7 and train["achieved_tflops"] == 81.0

    last = bench._last_recorded()
    assert last["value"] == 23493.7  # most recent e2e line, train skipped

    # link record: only v2 (streamed) probes count — the 42.0 entry is
    # untagged (v1-era), so it must NOT set the gate threshold
    assert bench._link_record() is None


def test_link_record_uses_v2_probes_only(bench, tmp_path, monkeypatch):
    hist = tmp_path / "hist.jsonl"
    rows = [
        {"metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
         "value": 23000.0, "link_MBps": [19.0, 35.0]},  # v1 single-blob
        {"metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
         "value": 20000.0, "link_MBps": [39.4, 32.9],
         "link_probe_version": 2},
        {"metric": "ifcb_rois_classified_per_sec_per_chip_e2e",
         "value": 15000.0, "link_MBps": [44.1, 12.0],
         "link_probe_version": 2},
    ]
    with open(hist, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    monkeypatch.setattr(bench, "HISTORY", hist)
    # max over v2 entries' probes, regardless of which run had the best
    # throughput; the untagged 35.0 is ignored
    assert bench._link_record() == 44.1


def test_history_lookups_empty_file(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "HISTORY", tmp_path / "missing.jsonl")
    assert bench._best_recorded() is None
    assert bench._best_fused_recorded() is None
    assert bench._onchip_record() is None
    assert bench._best_train_recorded() is None
    assert bench._last_recorded() is None
