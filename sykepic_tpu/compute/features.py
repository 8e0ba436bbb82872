"""Blob segmentation and geometry features for IFCB ROIs.

The reference delegates this to the *external* ``ifcb_features`` package (a
SYKE fork of the ifcb-analysis feature code; ``sykepic/compute/
feature_python.py:7``, ``README.md:49-53``) whose exact source is not
distributed with the reference. This module is a from-scratch
reimplementation of the used subset — blob segmentation and the Biovolume /
Area / MajorAxisLength / MinorAxisLength features — built on the published
lineage (MATLAB ifcb-analysis; Sieracki, Reichenbach & Webb 1989; Moberg &
Sosik 2012):

- **Segmentation**: IFCB organisms are dark on a bright background. The
  blob mask is an Otsu threshold (``img <= t``), holes filled, with
  sub-``min_blob_area`` specks dropped. Deterministic, vectorized NumPy.
- **Area** = total pixels over all kept blobs (ifcb-analysis convention).
- **Axis lengths** = MATLAB ``regionprops`` ellipse-of-equal-second-moments
  of the LARGEST blob, including the +1/12 pixel-extent correction.
- **Biovolume** (pixel^3): the SSC distance-map estimator ``V = pi *
  sum(D)`` over all blob pixels (one exact EDT of the whole mask — blobs
  are disjoint, so per-blob sums equal the global sum). Exact for
  tube-like bodies, which dominate plankton morphology.
  :func:`sor_volume` (solid of revolution about the major axis) is
  available for explicitly axisymmetric work but is not in the default
  path.

Numerical parity note: because the upstream algorithm is not available,
values agree with the reference fixtures approximately (areas within ~15%,
biovolume within ~30% on the shipped test sample), not bit-exactly; the
golden tests for this module assert OUR deterministic values plus
consistency bounds against the reference CSV. Unit conversions
(px -> um^3 -> ug/L) and the CSV contract are exact parity.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

MIN_BLOB_AREA = 15


def otsu_threshold(img: np.ndarray) -> int:
    """Otsu's threshold over a uint8 image (maximal between-class variance;
    ties resolve to the lowest level, matching MATLAB ``graythresh``)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    bins = np.arange(256, dtype=np.float64)
    w_b = np.cumsum(hist)
    w_f = total - w_b
    sum_b = np.cumsum(hist * bins)
    sum_all = sum_b[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu_b = sum_b / w_b
        mu_f = (sum_all - sum_b) / w_f
        var = w_b * w_f * (mu_b - mu_f) ** 2
    var[~np.isfinite(var)] = -1.0
    return int(np.argmax(var))


def _segment_labeled(roi: np.ndarray, min_blob_area: int = MIN_BLOB_AREA):
    """One labeling pass: returns ``(mask, labels, kept_sizes_by_label)``
    where ``kept_sizes_by_label[l]`` is 0 for dropped labels."""
    roi = np.asarray(roi, np.uint8)
    mask = roi <= otsu_threshold(roi)
    mask = ndi.binary_fill_holes(mask)
    labels, n = ndi.label(mask)
    if n == 0:
        return mask, labels, np.zeros(1, np.int64)
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    keep = sizes >= min_blob_area
    if not keep.any():  # tiny object: keep the largest speck
        keep[int(np.argmax(sizes))] = True
    mask = keep[labels]
    sizes = np.where(keep, sizes, 0)
    return mask, labels, sizes


def segment_roi(roi: np.ndarray, min_blob_area: int = MIN_BLOB_AREA) -> np.ndarray:
    """Binary blob mask of one ROI (2-D uint8 grayscale)."""
    return _segment_labeled(roi, min_blob_area)[0]


def ellipse_properties(mask: np.ndarray):
    """(major, minor, eccentricity, orientation_rad) of a blob mask via the
    MATLAB ``regionprops`` equal-second-moments ellipse (with the 1/12
    pixel-extent term)."""
    ys, xs = np.nonzero(mask)
    n = len(xs)
    if n == 0:
        return 0.0, 0.0, 0.0, 0.0
    x = xs - xs.mean()
    y = ys - ys.mean()
    uxx = (x * x).sum() / n + 1.0 / 12.0
    uyy = (y * y).sum() / n + 1.0 / 12.0
    uxy = (x * y).sum() / n
    common = np.sqrt((uxx - uyy) ** 2 + 4 * uxy * uxy)
    major = 2.0 * np.sqrt(2.0) * np.sqrt(uxx + uyy + common)
    minor = 2.0 * np.sqrt(2.0) * np.sqrt(max(uxx + uyy - common, 0.0))
    ecc = np.sqrt(1.0 - (minor / major) ** 2) if major > 0 else 0.0
    theta = 0.5 * np.arctan2(2 * uxy, uxx - uyy)
    return float(major), float(minor), float(ecc), float(theta)


def sor_volume(mask: np.ndarray, theta: float) -> float:
    """Solid-of-revolution volume about the blob's major axis:
    ``sum_x pi/4 * w(x)^2`` over transects perpendicular to the axis."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return 0.0
    # project pixel centers onto the major axis, bin to unit transects
    axis = xs * np.cos(theta) + ys * np.sin(theta)
    bins = np.round(axis - axis.min()).astype(np.int64)
    widths = np.bincount(bins)
    return float((np.pi / 4.0) * (widths.astype(np.float64) ** 2).sum())


def distmap_volume(mask: np.ndarray) -> float:
    """Distance-map (SSC) volume ``pi * sum(D)``: the Euclidean distance to
    background is the local half-thickness, each pixel contributes a
    half-disc of radius D above and below the focal plane. Exact for
    tube-like (cylindrical) bodies, which dominate plankton morphology
    (Sieracki, Reichenbach & Webb 1989; Moberg & Sosik 2012 lineage)."""
    d = ndi.distance_transform_edt(mask)
    return float(np.pi * d.sum())


def compute_features(roi: np.ndarray):
    """Feature tuple list for one ROI, mirroring the external
    ``ifcb_features.compute_features`` API used by the reference
    (``feature_python.py:81-101``): returns ``(blob_mask, [(name, value),
    ...])`` with at least Biovolume / Area / MajorAxisLength /
    MinorAxisLength.
    """
    mask, labels, sizes = _segment_labeled(roi)
    if not sizes.any():
        features = [
            ("Area", 0),
            ("Biovolume", 0.0),
            ("MajorAxisLength", 0.0),
            ("MinorAxisLength", 0.0),
            ("Eccentricity", 0.0),
            ("NumBlobs", 0),
        ]
        return mask, features
    area = int(sizes.sum())
    # Blobs are disjoint (separated by background), so the EDT of the whole
    # mask equals each blob's own EDT — one transform gives the summed
    # distance-map volume of every blob at once.
    biovolume = distmap_volume(mask)
    largest_label = int(np.argmax(sizes))
    sl = ndi.find_objects(labels, max_label=largest_label)[largest_label - 1]
    largest = labels[sl] == largest_label
    major, minor, ecc, _ = ellipse_properties(largest)
    n = int((sizes > 0).sum())
    features = [
        ("Area", area),
        ("Biovolume", biovolume),
        ("MajorAxisLength", major),
        ("MinorAxisLength", minor),
        ("Eccentricity", ecc),
        ("NumBlobs", int(n)),
    ]
    return mask, features
