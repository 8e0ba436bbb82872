from .preprocess import (  # noqa: F401
    border_values,
    compute_geometry,
    eval_preprocess,
    mode_pixel,
    mode_pixel_batch,
    resize_pad_batch,
    resize_pad_batch_mxu,
)
from .pallas_preprocess import resize_pad_batch_pallas  # noqa: F401
from .augment import augment_batch, separable_params, translate_limits  # noqa: F401
