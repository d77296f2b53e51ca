from .preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    make_preprocess,
    normalize,
    patchify,
    resize_bilinear,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "make_preprocess",
    "normalize",
    "patchify",
    "resize_bilinear",
]
