"""Pixel-parity tests for ops.resize against the real PIL / cv2 / torch.

The reference mixes all three conventions (SURVEY.md §7 "Resize semantics");
IoU-level parity depends on matching each at its call site.
"""

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax.numpy as jnp

from beach_seg_tpu.ops.resize import resize_1d, resize_2d


@pytest.fixture
def img(rng):
    return rng.standard_normal((14, 14)).astype(np.float32)


def test_torch_bicubic_upsample_parity(img):
    ref = F.interpolate(torch.from_numpy(img[None, None]), size=(56, 28), mode="bicubic").numpy()[0, 0]
    got = np.asarray(resize_2d(jnp.asarray(img), (56, 28), "bicubic_torch"))
    assert np.abs(ref - got).max() < 1e-5


def test_torch_bicubic_downsample_parity(img):
    ref = F.interpolate(torch.from_numpy(img[None, None]), size=(7, 5), mode="bicubic").numpy()[0, 0]
    got = np.asarray(resize_2d(jnp.asarray(img), (7, 5), "bicubic_torch"))
    assert np.abs(ref - got).max() < 1e-5


def test_torch_linear_1d_parity(rng):
    r = rng.standard_normal((27, 64)).astype(np.float32)
    ref = (
        F.interpolate(torch.from_numpy(r)[None].permute(0, 2, 1), size=111, mode="linear")
        .permute(0, 2, 1)
        .numpy()[0]
    )
    got = np.asarray(resize_1d(jnp.asarray(r), 111, "linear_torch"))
    assert np.abs(ref - got).max() < 1e-5


def test_pil_bicubic_up_and_down(rng):
    img = (rng.random((112, 112)) * 255).astype(np.float32)
    for out in (448, 56):
        ref = np.asarray(Image.fromarray(img).resize((out, out), Image.BICUBIC))
        got = np.asarray(resize_2d(jnp.asarray(img), (out, out), "bicubic_pil"))
        assert np.abs(ref - got).max() < 2e-3, out


def test_pil_nearest_exact(rng):
    lab = rng.integers(0, 4, (112, 112)).astype(np.uint8)
    for out in (448, 37):
        ref = np.asarray(Image.fromarray(lab).resize((out, out), Image.NEAREST))
        got = np.asarray(resize_2d(jnp.asarray(lab), (out, out), "nearest_pil"))
        assert (ref == got).all(), out


def test_cv2_nearest_exact(rng):
    lab = rng.integers(0, 4, (448, 448)).astype(np.uint8)
    ref = cv2.resize(lab, (112, 112), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_2d(jnp.asarray(lab), (112, 112), "nearest_cv2"))
    assert (ref == got).all()


def test_cv2_cubic_parity(rng):
    img = rng.random((112, 112)).astype(np.float32)
    ref = cv2.resize(img, (448, 448), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_2d(jnp.asarray(img), (448, 448), "bicubic_cv2"))
    # cv2 uses fixed-point arithmetic internally; tolerance reflects that.
    assert np.abs(ref - got).max() < 1e-4


def test_batched_channels(rng):
    x = rng.standard_normal((2, 3, 20, 30)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(40, 15), mode="bicubic").numpy()
    got = np.asarray(resize_2d(jnp.asarray(x), (40, 15), "bicubic_torch"))
    assert np.abs(ref - got).max() < 1e-5
