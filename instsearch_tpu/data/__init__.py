from . import frontend
from .frontend import (
    IMAGENET_MEAN, IMAGENET_STD, batch_paths, center_crop, decode_image,
    load_square, normalize, rescale, resize_shorter_side,
)

__all__ = [
    "frontend", "IMAGENET_MEAN", "IMAGENET_STD", "batch_paths", "center_crop",
    "decode_image", "load_square", "normalize", "rescale", "resize_shorter_side",
]
