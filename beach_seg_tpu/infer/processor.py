"""SegGPT image-processor equivalents (HF image_processing_seggpt.py parity).

``preprocess_image``/``preprocess_mask`` reproduce SegGptImageProcessor
.preprocess: PIL-BICUBIC resize to the model size + rescale + ImageNet
normalize for images; painter-palette colorize + PIL-NEAREST resize +
normalize for prompt masks. ``post_process_semantic`` reproduces
post_process_semantic_segmentation: bottom half → denormalize →
torch-nearest resize to target → palette distance argmin.

All resizes go through the matrix-resize kernels (ops.resize) so the same
code runs host-side (numpy) and device-side (jit).
"""

from __future__ import annotations

import numpy as np

from beach_seg_tpu.ops.resize import resize_matrix, resize_pil_uint8
from beach_seg_tpu.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    build_palette,
)


def _resize_hwc(img: np.ndarray, out_size: int, method: str) -> np.ndarray:
    h, w = img.shape[:2]
    mh = resize_matrix(h, out_size, method)
    mw = resize_matrix(w, out_size, method)
    out = np.einsum("oh,hwc->owc", mh, img.astype(np.float32), optimize=True)
    return np.einsum("pw,hwc->hpc", mw, out, optimize=True)


def preprocess_image(img: np.ndarray, size: int = 448) -> np.ndarray:
    """(H, W, 3) uint8 → (size, size, 3) float32 normalized (HF preprocess:
    PIL-BICUBIC resize — with PIL's uint8 intermediate — rescale 1/255,
    ImageNet normalize)."""
    if img.dtype == np.uint8:
        out = resize_pil_uint8(img, (size, size)).astype(np.float64) / 255.0
    else:
        out = _resize_hwc(img, size, "bicubic_pil") / 255.0
    return ((out - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def preprocess_mask(mask: np.ndarray, num_labels: int, size: int = 448) -> np.ndarray:
    """(H, W) ids → (size, size, 3) normalized painter-palette colors (HF
    mask_to_rgb + NEAREST resize + rescale + normalize)."""
    palette = build_palette(num_labels)  # (num_labels+1, 3) uint8
    rgb = palette[mask.astype(np.int64)]  # (H, W, 3)
    out = _resize_hwc(rgb, size, "nearest_pil") / 255.0
    return ((out - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def post_process_semantic(
    pred_masks: np.ndarray, target_size: tuple[int, int], num_labels: int
) -> np.ndarray:
    """(B, 2H, W, 3) painted canvases → (B, th, tw) class ids (HF
    post_process_semantic_segmentation:550-612)."""
    h2 = pred_masks.shape[1]
    h = h2 // 2
    masks = np.asarray(pred_masks[:, h:], np.float32)
    # de-normalize back to [0,1] color space
    masks = masks * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    th, tw = target_size
    if (th, tw) != masks.shape[1:3]:
        mh = resize_matrix(masks.shape[1], th, "nearest_torch")
        mw = resize_matrix(masks.shape[2], tw, "nearest_torch")
        masks = np.einsum("oh,bhwc->bowc", mh, masks, optimize=True)
        masks = np.einsum("pw,bhwc->bhpc", mw, masks, optimize=True)
    palette = build_palette(num_labels).astype(np.float32)  # raw 0..255 colors
    dist = ((masks[..., None, :] * 255.0 - palette) ** 2).sum(-1)  # (B,th,tw,N)
    return dist.argmin(-1).astype(np.int32)
