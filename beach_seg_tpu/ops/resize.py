"""Separable matrix resizes with exact PIL / cv2 / torch kernel parity.

The reference pipeline mixes three resize implementations (SURVEY.md §7):
PIL BICUBIC/NEAREST in the dataset (ref src/data.py:93-112), cv2
INTER_CUBIC/INTER_NEAREST in predict (ref src/predict.py:258-259), and torch
``F.interpolate`` bicubic/linear inside the model (HF modeling_seggpt.py:153,
255). Pixel-level parity requires matching each convention at its call site.

TPU-native design: for static input/output sizes a separable resize is two
small dense matmuls ``W_h @ img @ W_w.T`` — the weight matrices are computed
once on host (numpy) and constant-folded into the jitted graph, so resizes run
on the MXU instead of as gather soup.

Kernel conventions implemented:
  - ``cubic`` with parameter ``a``: torch/cv2 use a=-0.75, PIL/GDAL a=-0.5.
  - ``linear``/``triangle``: torch F.interpolate(mode="linear").
  - ``lanczos3``: GDAL-style (unused by default, available for mosaics).
  - antialias: PIL *always* widens the kernel when downscaling; torch/cv2
    do not (unless antialias=True).
  - nearest: "pil" convention floor((i+0.5)*scale); "floor" convention
    floor(i*scale) (cv2/torch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _linear(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax < 1.0, 1.0 - ax, 0.0)


def _lanczos(x: np.ndarray, taps: int = 3) -> np.ndarray:
    ax = np.abs(x)
    w = np.sinc(x) * np.sinc(x / taps)
    return np.where(ax < taps, w, 0.0)


_KERNELS = {
    "bicubic_torch": (functools.partial(_cubic, a=-0.75), 2.0),
    "bicubic_cv2": (functools.partial(_cubic, a=-0.75), 2.0),
    "bicubic_pil": (functools.partial(_cubic, a=-0.5), 2.0),
    "bicubic_gdal": (functools.partial(_cubic, a=-0.5), 2.0),
    "linear_torch": (_linear, 1.0),
    "bilinear_pil": (_linear, 1.0),
    "lanczos3": (functools.partial(_lanczos, taps=3), 3.0),
}


@functools.lru_cache(maxsize=256)
def resize_matrix(
    in_size: int,
    out_size: int,
    method: str = "bicubic_torch",
    antialias: bool | None = None,
    align_corners: bool = False,
) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix for one axis.

    ``antialias=None`` picks the library default for the method: PIL methods
    antialias on downscale; torch/cv2 methods do not.
    """
    if method == "nearest_pil":
        m = _nearest_matrix(in_size, out_size, half_pixel=True)
        m.setflags(write=False)  # cached — guard against caller mutation
        return m
    if method == "nearest_torch":
        m = _nearest_matrix(in_size, out_size, half_pixel=False, fp32_scale=True)
        m.setflags(write=False)
        return m
    if method in ("nearest_floor", "nearest_cv2"):
        m = _nearest_matrix(in_size, out_size, half_pixel=False)
        m.setflags(write=False)
        return m
    kernel, support = _KERNELS[method]
    if antialias is None:
        antialias = method.endswith("_pil") or method.endswith("_gdal")

    scale = in_size / out_size
    filt_scale = max(scale, 1.0) if antialias else 1.0
    sup = support * filt_scale

    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        centers = out_idx * (in_size - 1) / (out_size - 1)
    else:
        centers = (out_idx + 0.5) * scale - 0.5

    lo = np.floor(centers - sup + 0.5).astype(np.int64)
    n_taps = int(np.ceil(sup * 2.0)) + 1
    taps = lo[:, None] + np.arange(n_taps)[None, :]
    dist = (centers[:, None] - taps) / filt_scale
    weights = kernel(dist)

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if method.endswith("_pil") or method.endswith("_gdal"):
        # PIL border handling: clip the window to the valid range and
        # renormalize over in-range taps only.
        valid = (taps >= 0) & (taps < in_size)
        weights = np.where(valid, weights, 0.0)
        weights = weights / np.maximum(weights.sum(axis=1, keepdims=True), 1e-12)
        taps_c = np.clip(taps, 0, in_size - 1)
    else:
        # torch/cv2 border handling: normalize the full window, then clamp
        # out-of-range taps to the edge (replicate), folding their weights.
        weights = weights / np.maximum(weights.sum(axis=1, keepdims=True), 1e-12)
        taps_c = np.clip(taps, 0, in_size - 1)
    np.add.at(mat, (np.repeat(np.arange(out_size), n_taps), taps_c.ravel()), weights.ravel())
    out = mat.astype(np.float32)
    out.setflags(write=False)  # cached — guard against caller mutation
    return out


def _nearest_matrix(
    in_size: int, out_size: int, half_pixel: bool, fp32_scale: bool = False
) -> np.ndarray:
    scale = in_size / out_size
    if half_pixel:
        # PIL's ImagingScaleAffine accumulates the source coordinate in a
        # running double (xo = a2 + a0*0.5; xo += a0 per pixel), so exact-
        # integer ties depend on accumulated fp error. Reproduce bit-for-bit.
        src = np.empty(out_size, dtype=np.int64)
        xo = scale * 0.5
        for i in range(out_size):
            src[i] = int(xo)
            xo += scale
    elif fp32_scale:
        # torch F.interpolate(mode="nearest") computes floorf(dst * scale)
        # with a FLOAT scale (aten nearest_neighbor_compute_source_index):
        # e.g. 448→48 at dst=27 gives 27·9.3333330f = 251.9999… → 251, where
        # the f64 product is exactly 252. Reproduce in fp32.
        src = np.floor(
            np.arange(out_size, dtype=np.float32) * np.float32(np.float32(in_size) / np.float32(out_size))
        ).astype(np.int64)
    else:
        src = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def resize_2d(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bicubic_torch", **kw) -> jnp.ndarray:
    """Resize the last two axes of ``x`` (any leading batch/channel dims).

    Runs as two matmuls; for nearest methods the matmul degenerates to a
    permutation (XLA folds it into a gather).
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    wh = jnp.asarray(resize_matrix(h_in, h_out, method, **kw))
    ww = jnp.asarray(resize_matrix(w_in, w_out, method, **kw))
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # HIGHEST precision: TPU fp32 matmuls otherwise run on the MXU in bf16
    # passes, breaking pixel-level parity with PIL/cv2/torch.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", wh, xf, precision=hi)
    y = jnp.einsum("pw,...hw->...hp", ww, y, precision=hi)
    if jnp.issubdtype(orig_dtype, jnp.integer) or orig_dtype == jnp.uint8:
        y = jnp.round(y)
    return y.astype(orig_dtype) if method.startswith("nearest") else y


def resize_pil_uint8(
    img: np.ndarray, out_hw: tuple[int, int], method: str = "bicubic_pil"
) -> np.ndarray:
    """Emulates PIL's uint8 resize pipeline bit-for-bit at the pass level:
    horizontal pass → round/clip to uint8 → vertical pass → round/clip.

    PIL resamples into an 8-bit intermediate image between the two separable
    passes (Pillow ImagingResample); a single full-precision float chain
    diverges by up to ~18/255 on noise-like content. Residual difference vs
    PIL after this emulation is ≤1/255 (PIL's fixed-point coefficients).
    Host-side NumPy — these are data-prep call sites.

    When Pillow itself is importable and the method is its default BICUBIC,
    delegate to it: bit-exact by definition (the reference resizes through
    PIL, data.py:95) and ~50× faster than the f64 einsum emulation — host
    crop prep feeds a TPU that consumes tiles at tens per second.
    """
    if method == "bicubic_pil" and img.dtype == np.uint8 and img.ndim in (2, 3):
        try:
            from PIL import Image

            pil = Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BICUBIC)
            return np.asarray(pil)
        except ImportError:
            pass
    h_in, w_in = img.shape[:2]
    h_out, w_out = out_hw
    mw = resize_matrix(w_in, w_out, method)
    mh = resize_matrix(h_in, h_out, method)
    x = img.astype(np.float64)
    x = np.einsum("pw,hw...->hp...", mw, x)
    x = np.clip(np.round(x), 0, 255)
    x = np.einsum("oh,hw...->ow...", mh, x)
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def resize_pil_uint8_device(
    img: jnp.ndarray, out_hw: tuple[int, int], method: str = "bicubic_pil"
) -> jnp.ndarray:
    """Device-side (jit) twin of :func:`resize_pil_uint8`: fp32 einsums at
    HIGHEST precision with PIL's uint8 rounding between the two passes.
    ≲5e-5 of output pixels differ by ±1 from the f64 host path (fp32 sums
    landing the other side of a .5 boundary). (…, H, W, C) → (…, h, w, C),
    float32 in [0, 255]."""
    h_in, w_in = img.shape[-3], img.shape[-2]
    mh = jnp.asarray(resize_matrix(h_in, out_hw[0], method), jnp.float32)
    mw = jnp.asarray(resize_matrix(w_in, out_hw[1], method), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    x = img.astype(jnp.float32)
    x = jnp.einsum("pw,...hwc->...hpc", mw, x, precision=hi)
    x = jnp.clip(jnp.round(x), 0, 255)
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=hi)
    return jnp.clip(jnp.round(x), 0, 255)


def nearest_indices(in_size: int, out_size: int, method: str = "nearest_pil") -> np.ndarray:
    """Source-index vector of a nearest resize — device resizes become exact
    ``jnp.take`` gathers (the matrices are one-hot row selectors)."""
    return resize_matrix(in_size, out_size, method).argmax(1)


def resize_1d(x: jnp.ndarray, out_size: int, method: str = "linear_torch", **kw) -> jnp.ndarray:
    """Resize the second-to-last axis (used for rel-pos table interpolation,
    matching torch F.interpolate(mode='linear') at HF modeling_seggpt.py:255)."""
    mat = jnp.asarray(resize_matrix(x.shape[-2], out_size, method, **kw))
    return jnp.einsum("ol,...lc->...oc", mat, x.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
