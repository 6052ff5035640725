"""Resize matrices vs the REAL libraries installed in this image (torch, cv2).

The reference chains cv2.resize (predict.py:258-259) and torch
F.interpolate nearest (HF post-process); these tests pin our sampling
matrices to the genuine implementations, including torch's fp32-scale
nearest quirk (floorf(dst·(in/out as float)) — e.g. 448→48 at dst=27 picks
source 251, not the f64 answer 252).
"""

import cv2
import numpy as np
import pytest
import torch

from beach_seg_tpu.ops.resize import resize_matrix

SIZES = [(448, 48), (448, 336), (448, 112), (64, 48), (100, 37), (448, 447), (336, 448), (113, 448)]


@pytest.mark.parametrize("i,o", SIZES)
def test_nearest_torch_matches_torch(i, o):
    src = torch.arange(i, dtype=torch.float32)[None, None, :, None].expand(1, 1, i, 2)
    ref = torch.nn.functional.interpolate(src, size=(o, 2), mode="nearest")[0, 0, :, 0].numpy().astype(int)
    mine = resize_matrix(i, o, "nearest_torch").argmax(1)
    np.testing.assert_array_equal(ref, mine)


@pytest.mark.parametrize("i,o", SIZES)
def test_nearest_cv2_matches_cv2(i, o):
    arr = np.arange(i, dtype=np.float32)[:, None].repeat(2, 1)
    ref = cv2.resize(arr, (2, o), interpolation=cv2.INTER_NEAREST)[:, 0].astype(int)
    mine = resize_matrix(i, o, "nearest_cv2").argmax(1)
    np.testing.assert_array_equal(ref, mine)


@pytest.mark.parametrize("i,o", [(448, 112), (112, 448), (64, 48)])
def test_bicubic_cv2_matches_cv2(i, o):
    rng = np.random.default_rng(0)
    img = rng.random((i, i)).astype(np.float32)
    ref = cv2.resize(img, (o, o), interpolation=cv2.INTER_CUBIC)
    m = resize_matrix(i, o, "bicubic_cv2")
    mine = m @ img @ m.T
    assert np.abs(ref - mine).max() < 1e-5
