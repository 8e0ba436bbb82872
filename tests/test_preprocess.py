"""Device preprocessing vs an OpenCV oracle replicating the reference's
eval transform (Resize + pad-to-square with mode border + ToTensor), per
sykepic/train/image.py:183-237 and sykepic/train/config.py:31-58.
"""

import cv2
import numpy as np
import pytest

from sykepic_tpu.ingest import ifcb, pack
from sykepic_tpu.ops import preprocess

VALID = "tests/data/raw/valid/D20180712T065600_IFCB114"
T = 180


def reference_eval_transform(img: np.ndarray, target: int) -> np.ndarray:
    """Oracle: the reference's eval path on one grayscale image."""
    # mode pixel (image.py:229-237)
    hist = cv2.calcHist([img], [0], None, [256], [0, 256])
    mode = int(np.argmax(hist))
    # get_new_dims (image.py:183-198)
    h, w = img.shape[:2]
    if h > w:
        r = target / float(h)
        new_h, new_w = target, int(w * r)
    else:
        r = target / float(w)
        new_h, new_w = int(h * r), target
    # resize_with_border (image.py:201-226)
    out = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    pad_h = max(target - new_h, 0)
    pad_w = max(target - new_w, 0)
    out = cv2.copyMakeBorder(
        out,
        pad_h // 2,
        pad_h - pad_h // 2,
        pad_w // 2,
        pad_w - pad_w // 2,
        borderType=cv2.BORDER_CONSTANT,
        value=[mode, mode, mode],
    )
    return out.astype(np.float32) / 255.0  # ToTensor


def packed_fixture():
    rois = ifcb.read_sample(VALID)
    tagged = [(0, rid, img) for rid, img in rois.images()]
    # force one canvas shape so both fixture ROIs share a batch
    (batch,) = pack.pack_rois(tagged, batch_size=4, buckets=((64, 128),))
    return rois, batch


def test_geometry_matches_python_float64_truncation():
    # the 1-ulp trap: 11 * (180 / 33.0) == 59.99999999999999 -> int 59,
    # though the exact rational value is 60. Python float64 truncation is
    # the contract (reference image.py:190-197).
    new_h, new_w, pt, pl = preprocess.compute_geometry([33], [11], T, T)
    assert int(11 * (180 / float(33))) == 59  # documents the trap
    assert new_h[0] == 180 and new_w[0] == 59
    assert pl[0] == (180 - 59) // 2

    # fixture ROI 2: 42x56 -> new_h = int(42 * (180/56.)) = 135
    new_h, new_w, pt, pl = preprocess.compute_geometry([42, 53], [56, 128], T, T)
    assert new_h.tolist() == [135, 74]
    assert new_w.tolist() == [180, 180]
    assert pt.tolist() == [(180 - 135) // 2, (180 - 74) // 2]
    assert pl.tolist() == [0, 0]


def test_mode_pixel_matches_cv2():
    rois, batch = packed_fixture()
    modes = preprocess.mode_pixel_batch(batch.canvas, batch.heights, batch.widths)
    for i in range(2):
        img = rois.image(i)
        hist = cv2.calcHist([img], [0], None, [256], [0, 256])
        assert modes[i] == int(np.argmax(hist))


@pytest.mark.parametrize("imagenet", [False, True])
def test_eval_preprocess_matches_opencv_oracle(imagenet):
    rois, batch = packed_fixture()
    new_h, new_w, pt, pl = preprocess.compute_geometry(
        batch.heights, batch.widths, T, T
    )
    border = preprocess.border_values(
        batch.canvas, batch.heights, batch.widths, "mode"
    )
    out = np.asarray(
        preprocess.eval_preprocess(
            batch.canvas,
            batch.heights,
            batch.widths,
            new_h,
            new_w,
            pt,
            pl,
            border,
            target_h=T,
            target_w=T,
            num_chans=3,
            imagenet_normalization=imagenet,
        )
    )
    # tail batches pad to the next power of two >= n_rois (ingest/pack.py),
    # so the 2-ROI fixture packs into exactly 2 slots
    assert out.shape == (batch.canvas.shape[0], T, T, 3)
    assert out.shape[0] == 2
    for i in range(2):
        oracle = reference_eval_transform(rois.image(i), T)
        if imagenet:
            oracle = (oracle - 0.485) / 0.229  # channel 0 stats
            got = out[i, :, :, 0]
            tol = 3.0 / 255.0 / 0.229
        else:
            got = out[i, :, :, 0]
            tol = 3.0 / 255.0
        # cv2 uses fixed-point bilinear (11-bit); allow a few LSBs
        diff = np.abs(got - oracle)
        assert diff.max() <= tol, f"roi {i}: max diff {diff.max()}"
        # border region must match to float32 rounding (integer mode value)
        pt_i = int(pt[i])
        np.testing.assert_allclose(
            got[: pt_i - 1 if pt_i else 0],
            oracle[: pt_i - 1 if pt_i else 0],
            atol=1e-5,
        )
        if not imagenet:
            # channels identical (grayscale replicated, reference reads PNG
            # as 3-channel: train/data.py:217-219); per-channel ImageNet
            # stats break this on purpose
            np.testing.assert_array_equal(out[i, :, :, 0], out[i, :, :, 1])


def test_border_modes():
    _, batch = packed_fixture()
    new_h, new_w, pt, pl = preprocess.compute_geometry(
        batch.heights, batch.widths, T, T
    )
    for mode, expect in (("white", 1.0), ("black", 0.0)):
        border = preprocess.border_values(
            batch.canvas, batch.heights, batch.widths, mode
        )
        out = np.asarray(
            preprocess.eval_preprocess(
                batch.canvas,
                batch.heights,
                batch.widths,
                new_h,
                new_w,
                pt,
                pl,
                border,
                target_h=T,
                target_w=T,
            )
        )
        assert out[0, 0, 0, 0] == expect  # top row is padding for ROI 2


def test_bilinear_identity_when_no_scaling():
    # upscale factor exactly 1 on a square image: output == input
    img = np.random.default_rng(1).integers(0, 255, (180, 180), np.uint8)
    canvas = img[None]
    h = np.array([180], np.int32)
    w = np.array([180], np.int32)
    new_h, new_w, pt, pl = preprocess.compute_geometry(h, w, T, T)
    border = np.zeros(1, np.uint8)
    out = np.asarray(
        preprocess.eval_preprocess(
            canvas, h, w, new_h, new_w, pt, pl, border,
            target_h=T, target_w=T,
        )
    )
    np.testing.assert_allclose(out[0, :, :, 0], img.astype(np.float32) / 255.0,
                               atol=1e-6)
