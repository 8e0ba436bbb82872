"""On-device batched feature extraction vs the host reference
implementation (sykepic_tpu/compute/features.py)."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from sykepic_tpu.compute import features as host_features
from sykepic_tpu.ingest import ifcb, pack
from sykepic_tpu.ops import features_device


def test_otsu_matches_host():
    rng = np.random.default_rng(0)
    b = 4
    canvas = np.zeros((b, 48, 64), np.uint8)
    heights = np.zeros(b, np.int32)
    widths = np.zeros(b, np.int32)
    for i in range(b):
        h, w = int(rng.integers(16, 48)), int(rng.integers(16, 64))
        img = np.where(
            rng.uniform(size=(h, w)) < 0.3,
            rng.integers(20, 80, (h, w)),
            rng.integers(150, 230, (h, w)),
        ).astype(np.uint8)
        canvas[i, :h, :w] = img
        heights[i], widths[i] = h, w
    t_dev, _ = features_device.batched_otsu(canvas, heights, widths)
    for i in range(b):
        region = canvas[i, : heights[i], : widths[i]]
        assert int(t_dev[i]) == host_features.otsu_threshold(region)


def test_fill_holes_and_chamfer_on_ring():
    # ring: a filled disk with a hole; fill_holes must close it
    h = w = 40
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - 20, xx - 20)
    ring = (r < 15) & (r > 8)
    mask = ring[None]
    valid = np.ones_like(mask)
    filled = np.asarray(features_device.fill_holes(mask, valid, iterations=80))
    expected = ndi.binary_fill_holes(ring)
    np.testing.assert_array_equal(filled[0], expected)

    d = np.asarray(features_device.chamfer_distance(filled, iterations=20))[0]
    exact = ndi.distance_transform_edt(expected)
    # chamfer 3-4 approximation: within ~6% of the exact EDT sum
    assert d.sum() == pytest.approx(exact.sum(), rel=0.06)


def test_phasecong_matches_host():
    rois = ifcb.read_sample("tests/data/raw/valid/D20180712T065600_IFCB114")
    for rid, img in rois.images():
        h, w = img.shape
        mm_host = host_features.phasecong_Mm(img)
        valid = np.ones((1, h, w), bool)
        mm_dev = np.asarray(
            features_device.phasecong_Mm_batched(
                np.asarray(img, np.float32)[None], valid
            )
        )[0]
        # same filters on the exact ROI window -> near float-tolerance match
        assert np.abs(mm_dev - mm_host).max() < 5e-3


def test_morphology_matches_host_semantics():
    rng = np.random.default_rng(3)
    m = rng.uniform(size=(28, 33)) < 0.35
    valid = np.ones((1, *m.shape), bool)
    dil_dev = np.asarray(
        features_device.dilate_disk2(m[None], valid)
    )[0]
    import scipy.ndimage as sndi

    from sykepic_tpu.compute.features import DISK2

    np.testing.assert_array_equal(dil_dev, sndi.binary_dilation(m, DISK2))
    ero_dev = np.asarray(
        features_device.erode_disk2(m[None], valid, 2)
    )[0]
    ero_host = m
    for _ in range(2):
        ero_host = sndi.binary_erosion(ero_host, DISK2, border_value=1)
    np.testing.assert_array_equal(ero_dev, ero_host)


def test_device_features_track_host_on_fixture():
    rois = ifcb.read_sample("tests/data/raw/valid/D20180712T065600_IFCB114")
    tagged = [(0, rid, img) for rid, img in rois.images()]
    (batch,) = pack.pack_rois(tagged, batch_size=2, buckets=((64, 128),))
    stacked = np.asarray(
        features_device.device_features(
            batch.canvas, batch.heights, batch.widths
        )
    )
    area, biovol, major, minor = stacked.T
    for i, (rid, img) in enumerate(rois.images()):
        _, host = host_features.compute_features(img)
        host = dict(host)
        # residual deviations: slot-padded FFT window, chamfer-vs-exact EDT,
        # thickest-vs-largest blob (module docstring)
        assert area[i] == pytest.approx(host["Area"], rel=0.10)
        assert biovol[i] == pytest.approx(host["Biovolume"], rel=0.10)
        assert major[i] == pytest.approx(host["MajorAxisLength"], rel=0.05)
        assert minor[i] == pytest.approx(host["MinorAxisLength"], rel=0.05)


def test_moments_on_rectangle():
    mask = np.zeros((1, 30, 30), bool)
    mask[0, 5:25, 10:20] = True
    area, major, minor = (
        np.asarray(a) for a in features_device.moments_features(mask)
    )
    assert area[0] == 200
    ys, xs = np.nonzero(mask[0])
    x = xs - xs.mean()
    y = ys - ys.mean()
    uxx = (x**2).sum() / 200 + 1 / 12
    uyy = (y**2).sum() / 200 + 1 / 12
    exp_major = 2 * np.sqrt(2) * np.sqrt(max(uxx, uyy) * 2)
    # axis-aligned rectangle: uxy = 0
    assert major[0] == pytest.approx(
        2 * np.sqrt(2) * np.sqrt(uxx + uyy + abs(uxx - uyy)), rel=1e-6
    )
    assert minor[0] == pytest.approx(
        2 * np.sqrt(2) * np.sqrt(uxx + uyy - abs(uxx - uyy)), rel=1e-6
    )
    del exp_major
