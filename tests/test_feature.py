"""Feature extraction tests, mirroring reference ``tests/test_feature.py``
(volume ~0.985 ml, 7-column schema) plus deterministic goldens for OUR
reconstructed blob/biovolume algorithm and consistency bounds against the
reference fixture CSV (see ``sykepic_tpu/compute/features.py`` parity note).
"""

from collections import namedtuple
from pathlib import Path

import numpy as np
import pandas as pd
from pytest import approx

from sykepic_tpu.compute import feature, feature_native, features
from sykepic_tpu.ingest import ifcb

SAMPLE = "tests/data/raw/valid/D20180712T065600_IFCB114"

Args = namedtuple("Args", "raw samples out matlab parallel force")


def test_main(tmp_path):
    out_dir = tmp_path / "out"
    arguments = Args(
        raw="tests/data/raw/valid/",
        samples=None,
        out=out_dir,
        matlab=None,
        parallel=False,
        force=False,
    )
    feature.call(arguments)
    csvs = list(out_dir.glob("**/*.feat.csv"))
    assert len(csvs) == 1
    assert csvs[0].as_posix().endswith(
        "2018/07/12/D20180712T065600_IFCB114.feat.csv"
    )
    lines = csvs[0].read_text().splitlines()
    assert lines[0].startswith("# version=")
    key, value = lines[1][1:].strip().split("=")
    assert key == "volume_ml"
    assert float(value) == approx(0.985, rel=1e-3)
    header = lines[2].split(",")
    assert header == [
        "roi",
        "biovolume_px",
        "biovolume_um3",
        "biomass_ugl",
        "area",
        "major_axis_length",
        "minor_axis_length",
    ]
    assert len(lines) == 5  # ROIs 2 and 3 (ROI 1 is an empty trigger)
    assert lines[3].split(",")[0] == "2"
    assert lines[4].split(",")[0] == "3"


def test_sample_volume():
    # 0.25 ml/min * (runTime - inhibitTime)/60 (feature_python.py:105-118)
    vol = ifcb.sample_volume(SAMPLE + ".hdr")
    assert vol == approx(0.9854949375, rel=1e-9)


def test_unit_conversions():
    # px -> um3 (2.8 factor) and biomass (feature_python.py:121-129)
    assert feature_native.pixels_to_um3(2.8**3) == approx(1.0)
    from sykepic_tpu.compute.units import biovolume_to_biomass

    assert biovolume_to_biomass(1000.0, 2.0) == approx(0.5)
    assert biovolume_to_biomass(1000.0, 0.0) == 0


def test_feature_goldens_deterministic():
    """Deterministic values of OUR algorithm on the fixture ROIs (px units:
    biovolume_px is column 1, area column 4, axes columns 5-6)."""
    vol, feats = feature_native.sample_features(SAMPLE)
    rows = {r[0]: r for r in feats}
    assert rows[2][4] == 218
    assert rows[2][1] == approx(1441.7241196448167, rel=1e-9)
    assert rows[2][5] == approx(22.711136414416153, rel=1e-9)
    assert rows[2][6] == approx(13.516578710081625, rel=1e-9)
    assert rows[3][4] == 1816
    assert rows[3][1] == approx(73850.69897573987, rel=1e-9)
    assert rows[3][5] == approx(64.3156081825781, rel=1e-9)
    assert rows[3][6] == approx(38.27352858050683, rel=1e-9)


def test_consistency_with_reference_fixture():
    """Calibrated accuracy vs the reference's golden CSV (not bit-equal:
    upstream ifcb_features source is not distributed; the segmentation +
    Moberg-Sosik distance-map estimator were calibrated against this very
    fixture — see features.py docstring). Bounds: area within 2%, axes
    within 5%, biovolume within 0.5% of BOTH golden rows (the (4, -3)
    distance-map coefficients were solved exactly from this fixture,
    features.py::distmap_volume)."""
    ref = pd.read_csv("tests/data/feat/D20180712T065600_IFCB114.feat.csv",
                      comment="#", index_col=0)
    vol, feats = feature_native.sample_features(SAMPLE)
    ours = {r[0]: r for r in feats}
    for roi in (2, 3):
        ref_row = ref.loc[roi]
        assert ours[roi][4] == approx(ref_row["area"], rel=0.02)
        assert ours[roi][5] == approx(ref_row["major_axis_length"], rel=0.05)
        assert ours[roi][6] == approx(ref_row["minor_axis_length"], rel=0.05)
        assert ours[roi][1] == approx(ref_row["biovolume_px"], rel=0.005)


def test_segmentation_properties():
    # blob mask basics: dark object found, background excluded
    rng = np.random.default_rng(0)
    img = np.full((50, 60), 200, np.uint8)
    img[20:30, 10:40] = 40  # dark rectangle 10x30
    img = np.clip(img.astype(int) + rng.integers(-5, 5, img.shape), 0, 255).astype(np.uint8)
    mask = features.segment_roi(img)
    assert mask[25, 25]
    assert not mask[5, 5]
    # rectangle (300 px) plus at most a thin edge-derived fringe
    # Otsu lands on the plateau low edge here, so the dark branch is
    # empty and the blob is the (eroded) edge-fill alone
    assert 200 <= mask.sum() <= 420


def test_distmap_volume_square_rod_exact():
    # The sum(4D - 3) estimator gives 4 R^2 - 2 R per interior column of a
    # rod of half-width R (see features.distmap_volume docstring).
    mask = np.zeros((21, 200), bool)
    mask[1:20, :] = True  # width 19 -> R = 9.5
    v = features.distmap_volume(mask)
    expected = (4 * 9.5**2 - 2 * 9.5) * 200
    assert v == approx(expected, rel=0.05)


def test_empty_and_blank_roi():
    blank = np.full((20, 20), 200, np.uint8)
    mask, feats = features.compute_features(blank)
    d = dict(feats)
    # no contrast -> no edges, no dark pixels, empty mask
    assert d["Area"] == 0
    assert d["Biovolume"] == 0.0


def test_matlab_backend(matlab, tmp_path):
    """Runs only with --matlab PATH (parity with reference conftest)."""
    if not matlab:
        import pytest

        pytest.skip("no --matlab binary provided")
    out_dir = tmp_path / "out"
    arguments = Args(
        raw="tests/data/raw/valid/", samples=None, out=out_dir,
        matlab=matlab, parallel=False, force=False,
    )
    feature.call(arguments)
    assert list(out_dir.glob("**/*.feat.csv"))


# ---------------------------------------------------------------------------
# Held-out analytic suite: synthetic shapes with ground truth. The fixture
# consistency test above uses the SAME two rows the segmentation constants
# were calibrated on; these tests provide independent accuracy evidence on
# shapes whose true mask (and analytic geometry) is known, across scales,
# contrasts and orientations. Bounds are measured behavior + margin, tiered
# by scale: boundary effects are O(1 px), so relative errors grow as shapes
# shrink, and thin structures carry a documented conservative (negative)
# bias shared with the reference lineage (fixture biovolume agrees with
# upstream to 0.3%).
# ---------------------------------------------------------------------------

from scipy import ndimage as _ndi


def _render(canvas_mask, bg=200, fg=60, blur=1.0, noise=3.0, seed=0):
    import cv2

    img = np.full(canvas_mask.shape, float(bg))
    img[canvas_mask] = fg
    if blur:
        img = cv2.GaussianBlur(img, (0, 0), blur)
    rng = np.random.default_rng(seed)
    img = np.clip(img + rng.normal(0, noise, img.shape), 0, 255)
    return img.astype(np.uint8)


def _ellipse_mask(a, b, angle_deg=0, pad=20):
    import cv2

    H = int(2 * max(a, b)) + 2 * pad
    canvas = np.zeros((H, H), np.uint8)
    cv2.ellipse(canvas, (H // 2, H // 2), (int(a), int(b)), angle_deg,
                0, 360, 255, -1)
    return canvas > 0


def _rod_mask(L, W, angle_deg=0, pad=25):
    import cv2

    H = int(L) + 2 * pad
    canvas = np.zeros((H, H), np.uint8)
    c = H / 2.0
    th = np.deg2rad(angle_deg)
    dx, dy = np.cos(th), np.sin(th)
    px, py = -np.sin(th), np.cos(th)
    pts = [
        (c + sL * L / 2 * dx + sW * W / 2 * px,
         c + sL * L / 2 * dy + sW * W / 2 * py)
        for sL, sW in ((-1, -1), (1, -1), (1, 1), (-1, 1))
    ]
    cv2.fillPoly(canvas, [np.array(pts, np.int32)], 255)
    return canvas > 0


def _largest_props(mask):
    labels, n = _ndi.label(mask, structure=features._EIGHT)
    assert n > 0, "no blob found"
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    largest = labels == int(np.argmax(sizes))
    major, minor, _, _ = features.ellipse_properties(largest)
    return int(largest.sum()), major, minor, features.distmap_volume(largest)


def test_ellipse_estimator_exact_on_ideal_masks():
    """ellipse_properties on a clean rasterized ellipse must recover the
    analytic axes (regionprops ellipse of an ellipse = itself: major 2a,
    minor 2b), independent of segmentation."""
    for a, b, ang in ((40, 24, 0), (30, 18, 30), (15, 9, 60), (25, 25, 0)):
        _, major, minor, _ = _largest_props(_ellipse_mask(a, b, ang))
        # cv2 rasterizes semiaxis a as a+0.5 px of extent per side, so the
        # discrete expectation is 2a+1 (and the match is sub-1% down to
        # a=15 once that half-pixel is accounted for)
        assert major == approx(2 * a + 1, rel=0.01)
        assert minor == approx(2 * b + 1, rel=0.01)


def test_rect_estimator_matches_analytic_second_moments():
    """A rectangle's equal-second-moment ellipse has axes L*2/sqrt(3) and
    W*2/sqrt(3) (uxx = L^2/12). Rasterization adds O(1px) error."""
    k = 2.0 / np.sqrt(3.0)
    for L, W, ang in ((80, 30, 0), (100, 30, 15), (60, 24, 45)):
        _, major, minor, _ = _largest_props(_rod_mask(L, W, ang))
        assert major == approx(k * L, rel=0.03)
        assert minor == approx(k * W, rel=0.05)


def test_distmap_volume_disk_closed_form():
    """On a rasterized disk the distance-map estimator converges to its
    continuum closed form integral of (4D-3): (4pi/3)R^3 - 3pi R^2. The
    half-pixel boundary shell inflates small disks, vanishing as R grows."""
    for R, tol in ((10, 0.15), (20, 0.055), (40, 0.025)):
        H = 2 * R + 10
        yy, xx = np.mgrid[:H, :H]
        disk = (xx - H / 2) ** 2 + (yy - H / 2) ** 2 <= R * R
        v = features.distmap_volume(disk)
        closed = (4 * np.pi / 3) * R**3 - 3 * np.pi * R**2
        assert 0 <= v / closed - 1 <= tol


def test_segmentation_accuracy_medium_and_large_shapes():
    """End-to-end (render -> segment -> features) against the drawn truth
    for shapes whose minor dimension is >= ~18 px, at two contrasts and
    several orientations: area within 4%, major within 2%, minor within
    5%, biovolume within 8%."""
    cases = [
        (_ellipse_mask(30, 18, 0), 60),
        (_ellipse_mask(30, 18, 30), 60),
        (_ellipse_mask(50, 20, 60), 60),
        (_ellipse_mask(12, 12, 0), 60),
        (_ellipse_mask(30, 18, 0), 120),  # faint organism
        (_rod_mask(60, 24, 45), 60),
        (_rod_mask(100, 30, 15), 60),
    ]
    for i, (truth, fg) in enumerate(cases):
        img = _render(truth, fg=fg, seed=i)
        t_area, t_maj, t_min, t_bv = _largest_props(truth)
        s_area, s_maj, s_min, s_bv = _largest_props(features.segment_roi(img))
        assert s_area == approx(t_area, rel=0.04), f"case {i} area"
        assert s_maj == approx(t_maj, rel=0.03), f"case {i} major"
        assert s_min == approx(t_min, rel=0.05), f"case {i} minor"
        assert s_bv == approx(t_bv, rel=0.08), f"case {i} biovolume"


def test_segmentation_small_and_thin_shapes_documented_bias():
    """Small (~15x9) and thin (W <= 16 px) structures lose O(1 px) of
    boundary: the bias is CONSERVATIVE (never inflating) and bounded.
    Locks both the direction and the magnitude so a segmentation change
    that silently fattens or further thins filaments fails here."""
    # small ellipse: fixture ROI 2 scale
    truth = _ellipse_mask(15, 9, 0)
    t = _largest_props(truth)
    s = _largest_props(features.segment_roi(_render(truth, seed=3)))
    assert -0.09 <= s[0] / t[0] - 1 <= 0.02  # area
    assert -0.03 <= s[1] / t[1] - 1 <= 0.06  # major
    assert -0.12 <= s[2] / t[2] - 1 <= 0.02  # minor
    assert -0.16 <= s[3] / t[3] - 1 <= 0.02  # biovolume
    # thin rods: the filamentous-cyanobacteria regime
    for L, W, ang in ((80, 16, 0), (80, 16, 30), (40, 10, 70)):
        truth = _rod_mask(L, W, ang)
        t = _largest_props(truth)
        s = _largest_props(features.segment_roi(_render(truth, seed=L + ang)))
        assert -0.16 <= s[0] / t[0] - 1 <= 0.02, (L, W, ang, "area")
        assert -0.02 <= s[1] / t[1] - 1 <= 0.05, (L, W, ang, "major")
        assert -0.16 <= s[2] / t[2] - 1 <= 0.02, (L, W, ang, "minor")
        assert -0.32 <= s[3] / t[3] - 1 <= 0.02, (L, W, ang, "biovolume")


def test_ring_fills_to_solid_disk():
    """Hole-filling semantics: a ring (cell wall) segments to its FILLED
    disk (the reference lineage computes features on filled blobs)."""
    import cv2

    H = 90
    canvas = np.zeros((H, H), np.uint8)
    cv2.circle(canvas, (H // 2, H // 2), 30, 255, 6)  # annulus, 6px wall
    img = _render(canvas > 0, seed=9)
    s_area, s_maj, s_min, _ = _largest_props(features.segment_roi(img))
    disk_area = np.pi * 33**2  # outer radius = 30 + wall/2
    assert s_area == approx(disk_area, rel=0.06)
    assert s_maj == approx(2 * 33, rel=0.04)
    assert s_min == approx(2 * 33, rel=0.04)
