"""Palette build / colorize / distance-decode — the class↔RGB codec.

SegGPT paints segmentation as RGB images, so class ids round-trip through a
color palette:

  - ``build_palette``: deterministic Painter-paper cube palette
    (ref /root/reference/src/util/ml_util.py:72-89; duplicated in HF
    image_processing_seggpt.build_palette).
  - ``random_palette``: per-sample random LUT with class-0 black, used during
    prompt tuning (ref src/util/ml_util.py:99-111).
  - ``apply_palette``: batched LUT gather, ids → float RGB in [0,1]
    (ref src/util/ml_util.py:114-132; NHWC here, not NCHW).
  - ``decode_by_palette``: squared-distance argmin of painted RGB against the
    (normalized) palette (ref src/model.py:155-175; HF
    image_processing_seggpt.post_process_semantic_segmentation:598-604).

All functions are jit/vmap-safe with static class counts. The distance decode
is expressed as ``argmin(|p|² - 2·x·pᵀ)`` — one small MXU matmul over pixels
instead of a (B,H,W,N,3) broadcast, which is the TPU-friendly formulation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import random

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def build_palette(num_labels: int) -> np.ndarray:
    """Deterministic Painter palette: (num_labels + 1, 3) uint8, row 0 black.

    Exact integer recipe of ref src/util/ml_util.py:72-89.
    """
    base = int(num_labels ** (1 / 3)) + 1
    margin = 256 // base
    colors = [(0, 0, 0)]
    for location in range(num_labels):
        num_seq_r = location // base**2
        num_seq_g = (location % base**2) // base
        num_seq_b = location % base
        colors.append(
            (255 - num_seq_r * margin, 255 - num_seq_g * margin, 255 - num_seq_b * margin)
        )
    return np.array(colors, dtype=np.uint8)


def random_palette(key, num_labels: int, batch_size: int) -> jnp.ndarray:
    """(B, num_labels, 3) uint8 random LUT, class 0 forced black
    (ref src/util/ml_util.py:99-111: randint [0, 256))."""
    lut = random.randint(key, (batch_size, num_labels, 3), 0, 256, dtype=jnp.int32)
    return lut.at[:, 0].set(0).astype(jnp.uint8)


def apply_palette(palette: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Colorize class ids with a per-sample LUT.

    palette: (B, N, 3) uint8/int; mask: (B, H, W) integer ids.
    Returns (B, H, W, 3) float32 in [0, 1] (NHWC; ref torch_apply_mask_rgb
    returns NCHW — layout is the only divergence).
    """
    ids = mask.astype(jnp.int32)
    # select-accumulate over the (small, static) class count instead of a
    # take_along_axis gather: per-pixel dynamic gathers run at ~1.6 GB/s on
    # TPU (25 ms/step at B=8 in the train-step device trace); N multiply-adds
    # of (B, H, W, 1)×(B, 1, 1, 3) are plain VPU broadcasting. Values are
    # exact — each output pixel is one palette entry, no arithmetic mixing.
    pal = palette.astype(jnp.float32)  # (B, N, 3)
    n = pal.shape[1]
    sel = ids[..., None]  # (B, H, W, 1)
    rgb = jnp.zeros((*ids.shape, 3), jnp.float32)
    for cls in range(n):
        color = pal[:, cls].reshape(pal.shape[0], *([1] * (ids.ndim - 1)), 3)
        rgb = jnp.where(sel == cls, color, rgb)
    return rgb / 255.0


def normalize_palette(
    palette: jnp.ndarray,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
) -> jnp.ndarray:
    """Palette colors through the same normalize as images: ([0,1] - mean)/std.

    The model paints in normalized space, so the decode palette must live
    there too (ref src/model.py:225-230).
    """
    p = palette.astype(jnp.float32) / 255.0
    return (p - jnp.asarray(mean)) / jnp.asarray(std)


def decode_by_palette(pred_rgb: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """Painted RGB → class ids by squared-distance argmin.

    pred_rgb: (B, H, W, 3) float (same color space as ``palette``).
    palette: (B, N, 3) or (N, 3) float.
    Returns (B, H, W) int32 ids (ref src/model.py:155-175).

    argmin_c |x - p_c|² == argmin_c (|p_c|² - 2 x·p_c): the |x|² term is
    constant in c, leaving one (H·W, 3)×(3, N) matmul per sample.
    """
    if palette.ndim == 2:
        palette = jnp.broadcast_to(palette[None], (pred_rgb.shape[0],) + palette.shape)
    b, h, w, _ = pred_rgb.shape
    x = pred_rgb.reshape(b, h * w, 3).astype(jnp.float32)
    p = palette.astype(jnp.float32)  # (B, N, 3)
    scores = jnp.einsum("bqc,bnc->bqn", x, p) * 2.0 - jnp.sum(p * p, axis=-1)[:, None, :]
    return jnp.argmax(scores, axis=-1).reshape(b, h, w).astype(jnp.int32)
