"""Ingest-layer tests against the real IFCB fixture sample.

Golden facts about tests/data/raw/valid/D20180712T065600_IFCB114:
- 3 adc rows; row 1 has ROI width 0 (empty trigger) and is skipped
  (reference behavior: sykepic/utils/ifcb.py:109-110)
- ROI 2 is 42x56 at byte 0, ROI 3 is 53x128 at byte 2352
- .roi payload is 9136 bytes = 42*56 + 53*128
- volume = 0.25 * (238.018835 - 1.500050) / 60 ~= 0.985 ml
  (reference: sykepic/compute/feature_python.py:105-118)
"""

import datetime

import numpy as np
import pytest

from sykepic_tpu.ingest import (
    ifcb,
    pack,
)

VALID = "tests/data/raw/valid/D20180712T065600_IFCB114"


def test_parse_adc():
    widths, heights, starts = ifcb.parse_adc(VALID + ".adc")
    assert len(widths) == 3
    assert widths.tolist() == [0, 56, 128]
    assert heights.tolist() == [0, 42, 53]
    assert starts.tolist() == [0, 0, 2352]


def test_read_sample():
    rois = ifcb.read_sample(VALID)
    assert rois.sample == "D20180712T065600_IFCB114"
    assert rois.roi_ids.tolist() == [2, 3]
    img2 = rois.image(0)
    img3 = rois.image(1)
    assert img2.shape == (42, 56)
    assert img3.shape == (53, 128)
    assert img2.dtype == np.uint8
    # Zero-copy views into the flat payload
    assert img2.base is not None


def test_raw_to_numpy_matches_reference_semantics():
    pairs = list(ifcb.raw_to_numpy(VALID + ".adc", VALID + ".roi"))
    assert [rid for rid, _ in pairs] == [2, 3]
    # Byte-exact content: first ROI starts at payload byte 0
    payload = np.fromfile(VALID + ".roi", dtype=np.uint8)
    np.testing.assert_array_equal(pairs[0][1].ravel(), payload[: 42 * 56])
    np.testing.assert_array_equal(pairs[1][1].ravel(), payload[2352:])


def test_truncated_roi_raises_valueerror(tmp_path):
    # adc referencing bytes beyond the payload must raise ValueError, the
    # error class the per-sample isolation catches (probability.py:111-112)
    adc = tmp_path / "D20990101T000000_IFCB999.adc"
    roi = tmp_path / "D20990101T000000_IFCB999.roi"
    cols = ["0"] * 18
    cols[15], cols[16], cols[17] = "10", "10", "50"
    adc.write_text(",".join(cols) + "\n")
    np.zeros(60, dtype=np.uint8).tofile(roi)
    with pytest.raises(ValueError):
        ifcb.read_sample(tmp_path / "D20990101T000000_IFCB999")


def test_sample_to_datetime():
    dt = ifcb.sample_to_datetime("D20180703T093453_IFCB114")
    assert dt == datetime.datetime(
        2018, 7, 3, 9, 34, 53, tzinfo=datetime.timezone.utc
    )
    iso = ifcb.sample_to_datetime("D20180703T093453_IFCB114", isoformat=True)
    assert iso == "2018-07-03T09:34:53+00:00"


def test_sample_volume():
    vol = ifcb.sample_volume(VALID + ".hdr")
    assert vol == pytest.approx(0.985, rel=1e-3)


def test_raw_to_png(tmp_path):
    out = tmp_path / "imgs"
    ifcb.raw_to_png(VALID + ".adc", VALID + ".roi", out_dir=out)
    pngs = sorted(out.glob("*.png"))
    assert [p.name for p in pngs] == [
        "D20180712T065600_IFCB114_00002.png",
        "D20180712T065600_IFCB114_00003.png",
    ]
    import cv2

    img = cv2.imread(str(pngs[0]), cv2.IMREAD_GRAYSCALE)
    rois = ifcb.read_sample(VALID)
    np.testing.assert_array_equal(img, rois.image(0))


def test_filter_out_quality_flagged_samples(tmp_path):
    exc = tmp_path / "exclude.txt"
    exc.write_text("D20180712T065600\n")
    kept = ifcb.filter_out_quality_flagged_samples(
        [VALID, "tests/data/raw/invalid/D20210523T053149_IFCB114"], exc
    )
    assert len(kept) == 1
    assert "D20210523T053149" in str(kept[0])


def test_pack_rois_buckets_and_padding():
    rois = ifcb.read_sample(VALID)
    tagged = [(0, rid, img) for rid, img in rois.images()]
    batches = list(pack.pack_rois(tagged, batch_size=4))
    # dynamic grid (8-px steps to 64, 16-px to 128):
    # 42x56 -> (48,56); 53x128 -> (56,128)
    assert len(batches) == 2
    by_shape = {b.canvas.shape[1:]: b for b in batches}
    small = by_shape[(48, 56)]
    large = by_shape[(56, 128)]
    assert small.n_valid == 1 and large.n_valid == 1
    # pow2 tail padding: a 1-ROI tail ships a 1-slot batch, not 4 slots
    assert small.roi_ids.tolist() == [2]
    assert large.roi_ids.tolist() == [3]
    np.testing.assert_array_equal(small.canvas[0, :42, :56], rois.image(0))
    np.testing.assert_array_equal(large.canvas[0, :53, :128], rois.image(1))
    assert small.heights.tolist() == [42]
    assert large.widths.tolist() == [128]

    # a single forced bucket keeps both ROIs in one batch
    one = list(pack.pack_rois(tagged, batch_size=4, buckets=((64, 128),)))
    assert len(one) == 1
    assert one[0].n_valid == 2


def test_pack_oversized_roi_shrinks():
    big = np.random.default_rng(0).integers(0, 255, (3000, 3000), np.uint8)
    batches = list(pack.pack_rois([(0, 1, big)], batch_size=1))
    assert batches[0].canvas.shape == (1, 1024, 1024)
    assert batches[0].heights[0] == 1024
    assert batches[0].widths[0] == 1024


def test_sample_csv_path():
    from sykepic_tpu.utils import files

    p = files.sample_csv_path(VALID, "/out", suffix=".prob")
    assert str(p) == "/out/2018/07/12/D20180712T065600_IFCB114.prob.csv"


def test_effective_batch_size_mesh_multiple():
    # canvas-memory halving must stay divisible by a mesh's device count
    # (cap = 32 MB: a (1024, 1024) slot is 1 MB, so b stops at 32)
    assert pack.effective_batch_size(72, (1024, 1024), multiple=8) == 24
    assert pack.effective_batch_size(512, (1024, 1024), multiple=8) == 32
    assert pack.effective_batch_size(4, (1024, 1024), multiple=8) == 8
    assert pack.effective_batch_size(512, (48, 64), multiple=8) == 512


def test_target_resize_dims_fixed_point():
    # the host pre-shrink target must be a fixed point of the geometry
    # formula, so the device resize becomes an identity sampling
    for h, w in ((300, 120), (120, 300), (181, 181), (500, 499), (47, 980)):
        nh, nw = pack.target_resize_dims(h, w, 180, 180)
        assert (nh, nw) == pack.target_resize_dims(nh, nw, 180, 180)
        assert max(nh, nw) == 180


def test_pre_shrink_only_downscales():
    rng = np.random.default_rng(1)
    small = rng.integers(0, 255, (40, 60), np.uint8)
    assert pack.pre_shrink(small, 180, 180) is small
    big = rng.integers(0, 255, (360, 240), np.uint8)
    out = pack.pre_shrink(big, 180, 180)
    assert out.shape == (180, 120)


def test_pre_shrink_classification_equivalent():
    """Pre-shrunk large ROIs classify (nearly) identically: the host does
    the same bilinear downsample the device would have done."""
    import shutil
    from pathlib import Path

    from sykepic_tpu.compute.probability import prepare_model
    from sykepic_tpu.models import checkpoint
    from sykepic_tpu.models.registry import init_variables
    from sykepic_tpu.train import config as tcfg
    import tempfile

    d = Path(tempfile.mkdtemp()) / "m"
    d.mkdir(parents=True)
    src = Path("tests/model/resnet18_ref")
    shutil.copy(src / "config.ini", d / "config.ini")
    shutil.copy(src / "class_names.txt", d / "class_names.txt")
    config = tcfg.read_config(d / "config.ini")
    model, _ = tcfg.get_network(config, 50)
    shape = tcfg.get_img_shape(config)
    variables = init_variables(model, (shape[1], shape[2], shape[0]), seed=0)
    checkpoint.save_variables(d / "best_state.msgpack", variables)
    clf = prepare_model(d, batch_size=4)

    import cv2

    base = ifcb.read_sample(VALID).image(1)
    big = cv2.resize(base, (420, 260), interpolation=cv2.INTER_LINEAR)

    rows_direct = {}
    for batch in pack.pack_rois([(0, 1, big)], batch_size=4,
                                pre_shrink_to=None):
        probs = clf.infer_packed(batch)
        rows_direct[1] = probs[0]
    rows_shrunk = {}
    for batch in pack.pack_rois([(0, 1, big)], batch_size=4,
                                pre_shrink_to=(180, 180)):
        assert batch.canvas.shape[1] <= 192 and batch.canvas.shape[2] <= 192
        probs = clf.infer_packed(batch)
        rows_shrunk[1] = probs[0]
    assert np.argmax(rows_direct[1]) == np.argmax(rows_shrunk[1])
    np.testing.assert_allclose(rows_direct[1], rows_shrunk[1], atol=2e-3)
    shutil.rmtree(d.parent, ignore_errors=True)


def test_target_resize_dims_matches_device_geometry():
    """pack.target_resize_dims must agree EXACTLY with
    ops.preprocess.compute_geometry — the pre-shrink path's correctness
    rests on the two implementations never drifting."""
    from sykepic_tpu.ops.preprocess import compute_geometry

    rng = np.random.default_rng(5)
    hs = np.concatenate([rng.integers(1, 600, 200), [180, 181, 179, 1]])
    ws = np.concatenate([rng.integers(1, 600, 200), [180, 180, 180, 1]])
    gh, gw, _, _ = compute_geometry(hs, ws, 180, 180)
    for h, w, eh, ew in zip(hs, ws, gh, gw):
        assert pack.target_resize_dims(int(h), int(w), 180, 180) == (eh, ew)


def test_snap_dim_ladder():
    assert pack.snap_dim(1) == 8
    assert pack.snap_dim(8) == 8
    assert pack.snap_dim(9) == 16
    assert pack.snap_dim(64) == 64
    assert pack.snap_dim(65) == 80
    assert pack.snap_dim(128) == 128
    assert pack.snap_dim(129) == 160
    assert pack.snap_dim(256) == 256
    assert pack.snap_dim(257) == 320
    assert pack.snap_dim(5000) == pack.GRID_MAX


def test_pack_tail_splits_into_pow2_pieces():
    # 1200 same-shape ROIs with batch_size 2048: one tail, split into
    # descending pow2 pieces 1024 + 128 + 64 (<7% padding, ladder shapes)
    img = np.full((30, 50), 90, np.uint8)
    tagged = [(0, i + 1, img) for i in range(1200)]
    batches = list(pack.pack_rois(tagged, batch_size=2048))
    sizes = [b.canvas.shape[0] for b in batches]
    assert sizes == [1024, 128, 64]
    assert [b.n_valid for b in batches] == [1024, 128, 48]
    # every ROI present exactly once, order preserved
    ids = [rid for b in batches for rid in b.roi_ids[: b.n_valid]]
    assert ids == list(range(1, 1201))


def test_pack_tail_small_pads_to_pow2():
    img = np.full((30, 50), 90, np.uint8)
    tagged = [(0, i + 1, img) for i in range(30)]
    (batch,) = list(pack.pack_rois(tagged, batch_size=2048))
    assert batch.canvas.shape[0] == 32 and batch.n_valid == 30


def test_pack_respects_batch_multiple_in_tail_pieces():
    img = np.full((20, 20), 90, np.uint8)
    tagged = [(0, i + 1, img) for i in range(10)]
    batches = list(pack.pack_rois(tagged, batch_size=64, batch_multiple=8))
    for b in batches:
        assert b.canvas.shape[0] % 8 == 0
    assert sum(b.n_valid for b in batches) == 10


def test_pack_tail_pieces_stay_on_ladder_with_non_pow2_multiple():
    """A 3-device data mesh (batch_multiple=3) must not mint off-ladder
    tail batch sizes (the old pow2//2-minus-remainder split produced e.g.
    126): every emitted size is min_piece * 2**k, keeping the compiled
    (canvas, batch) shape set small."""
    img = np.full((30, 50), 90, np.uint8)
    for n in (700, 1200, 95):
        tagged = [(0, i + 1, img) for i in range(n)]
        batches = list(pack.pack_rois(tagged, batch_size=2048,
                                      batch_multiple=3))
        for b in batches:
            size = b.canvas.shape[0]
            assert size % 3 == 0
            # on the ladder: size / min_piece is a power of two
            k = size // 3
            assert k & (k - 1) == 0, f"off-ladder batch size {size}"
        ids = [rid for b in batches for rid in b.roi_ids[: b.n_valid]]
        assert ids == list(range(1, n + 1))


def test_pack_modes_match_cv2_histogram():
    import cv2

    rng = np.random.default_rng(3)
    tagged = []
    expected = []
    for i in range(5):
        img = rng.integers(0, 255, (25, 40), np.uint8)
        tagged.append((0, i + 1, img))
        hist = cv2.calcHist([img], [0], None, [256], [0, 256])
        expected.append(int(np.argmax(hist)))
    (batch,) = list(pack.pack_rois(tagged, batch_size=8, compute_modes=True))
    assert batch.modes is not None
    assert batch.modes[: batch.n_valid].tolist() == expected
    # without the flag, no mode work is done
    (plain,) = list(pack.pack_rois(tagged, batch_size=8))
    assert plain.modes is None


def test_tail_consolidation_ships_fewer_bytes():
    """Stream-end leftovers across many bucket shapes migrate into larger
    canvases when that ships fewer bytes: every ROI still appears exactly
    once, and total canvas bytes beat per-shape pow2-padded tails."""
    rng = np.random.default_rng(9)
    tagged = []
    rid = 0
    # many shapes, each with a small leftover (the consolidation regime)
    for h, w in [(25, 41), (30, 50), (33, 57), (40, 60), (45, 62)]:
        for _ in range(int(rng.integers(3, 9))):
            rid += 1
            tagged.append((0, rid, np.full((h, w), 90, np.uint8)))
    batches = list(pack.pack_rois(tagged, batch_size=2048))
    ids = [r for b in batches for r in b.roi_ids[: b.n_valid]]
    assert sorted(ids) == list(range(1, rid + 1))
    shipped = sum(b.canvas.nbytes for b in batches)
    # naive per-shape tails: each shape pads to its own pow2
    naive = 0
    groups = {}
    for _, _, img in tagged:
        key = (pack.snap_dim(img.shape[0]), pack.snap_dim(img.shape[1]))
        groups[key] = groups.get(key, 0) + 1
    for (bh, bw), n in groups.items():
        p = 1
        while p < n:
            p *= 2
        naive += p * bh * bw
    assert shipped < naive
    # every slot's ROI still fits its canvas
    for b in batches:
        assert (b.heights[: b.n_valid] <= b.canvas.shape[1]).all()
        assert (b.widths[: b.n_valid] <= b.canvas.shape[2]).all()


def test_pack_random_stream_invariants():
    """Property test over random streams, batch sizes and mesh multiples:
    every ROI ships exactly once, every batch is mesh-divisible, every
    slot's ROI fits its canvas, and padding slots carry benign metadata."""
    rng = np.random.default_rng(17)
    for trial in range(5):
        n = int(rng.integers(50, 400))
        batch_size = int(rng.choice([8, 64, 256, 2048]))
        multiple = int(rng.choice([1, 3, 8]))
        tagged = []
        for i in range(n):
            h = int(rng.integers(5, 300))
            w = int(rng.integers(5, 400))
            tagged.append((int(rng.integers(0, 4)), i + 1,
                           np.full((h, w), 90, np.uint8)))
        seen = []
        for b in pack.pack_rois(tagged, batch_size=batch_size,
                                batch_multiple=multiple):
            B, Hc, Wc = b.canvas.shape
            assert B % multiple == 0, (trial, B, multiple)
            assert (b.heights[: b.n_valid] <= Hc).all()
            assert (b.widths[: b.n_valid] <= Wc).all()
            # padding slots: id 0, 1x1 "ROI" (never selected downstream)
            assert (b.roi_ids[b.n_valid:] == 0).all()
            seen.extend(b.roi_ids[: b.n_valid].tolist())
        assert sorted(seen) == list(range(1, n + 1)), trial
