from .preprocess import (  # noqa: F401
    border_values,
    compute_geometry,
    eval_preprocess,
    mode_pixel,
    mode_pixel_batch,
    resize_pad_batch,
)
