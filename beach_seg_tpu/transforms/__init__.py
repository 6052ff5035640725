from beach_seg_tpu.transforms.palette import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    apply_palette,
    build_palette,
    decode_by_palette,
    normalize_palette,
    random_palette,
)
from beach_seg_tpu.transforms.augment import (
    AugmentParams,
    center_crop,
    denormalize_imagenet,
    eval_augment,
    normalize_imagenet,
    train_augment,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "apply_palette",
    "build_palette",
    "decode_by_palette",
    "normalize_palette",
    "random_palette",
    "AugmentParams",
    "center_crop",
    "denormalize_imagenet",
    "eval_augment",
    "normalize_imagenet",
    "train_augment",
]
