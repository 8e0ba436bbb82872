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
