"""Dataset image statistics helpers (reference ``sykepic/train/image.py:
240-298``). The augmentation classes that lived alongside these in the
reference are device kernels here (:mod:`sykepic_tpu.ops.augment`)."""

from __future__ import annotations

import numpy as np


def calculate_mean_std(img_paths, grayscale: bool = False):
    """Mean and std per channel over a list of images, scaled to [0, 1]
    (reference ``image.py:240-275``: mean of per-image means/stds)."""
    import cv2

    mean_sum = 0.0
    std_sum = 0.0
    img_paths = list(img_paths)
    for path in img_paths:
        if grayscale:
            img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        else:
            img = cv2.imread(str(path))
        mean, std = cv2.meanStdDev(img)
        mean_sum += mean
        std_sum += std
    mean = np.squeeze(mean_sum / len(img_paths) / 255.0, axis=1)
    std = np.squeeze(std_sum / len(img_paths) / 255.0, axis=1)
    return mean, std


def calculate_mean_dims(img_paths):
    """Rounded mean (height, width) over images (reference ``image.py:
    278-298``)."""
    import cv2

    height = 0.0
    width = 0.0
    i = 0
    for i, path in enumerate(img_paths, start=1):
        img = cv2.imread(str(path))
        h, w = img.shape[:2]
        height += h
        width += w
    if i == 0:
        raise ValueError("No images given")
    return int(height / i), int(width / i)


def mode_pixel_value(img) -> int:
    """Most common pixel value (reference ``image.py:229-237``); the batched
    device-path equivalent is ``ops.preprocess.mode_pixel_batch``."""
    from ..ops.preprocess import mode_pixel

    return mode_pixel(img)
