"""Semantic correctness of the geometric augmentations (VERDICT r1 weak #9).

kornia (the reference's augmentation engine) is not installed in this image,
so the oracles are analytic: jigsaw must be an exact joint tile permutation,
mosaic quadrants must be verbatim donor quadrants, and a resized-crop of a
linear ramp must stay the analytically-predicted linear ramp.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.transforms.augment import (
    AugmentParams,
    batch_mosaic,
    random_jigsaw,
    random_resized_crop,
)


def params(**kw) -> AugmentParams:
    p = AugmentParams.from_config(BeachSegConfig())
    return dataclasses.replace(p, **kw)


def test_jigsaw_is_joint_tile_permutation():
    p = params(jigsaw_p=1.0, jigsaw_grid=(2, 2))
    h = w = 8
    # each tile filled with a distinct value; mask mirrors image ×10
    img = np.zeros((h, w, 3), np.float32)
    mask = np.zeros((h, w), np.int32)
    for t, (r, c) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        img[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] = (t + 1) / 10
        mask[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] = (t + 1) * 10
    nod = mask % 20 == 0
    for seed in range(4):
        oi, om, on = random_jigsaw(jax.random.PRNGKey(seed), jnp.asarray(img), jnp.asarray(mask), jnp.asarray(nod), p)
        oi, om, on = np.asarray(oi), np.asarray(om), np.asarray(on)
        # each output tile is constant and drawn from the input tile multiset
        got_img, got_mask = [], []
        for r in range(2):
            for c in range(2):
                ti = oi[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                tm = om[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                tn = on[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                assert np.ptp(ti) == 0 and np.ptp(tm) == 0 and np.ptp(tn.astype(int)) == 0
                got_img.append(float(ti.flat[0]) * 10)
                got_mask.append(int(tm.flat[0]) / 10)
                assert tn.flat[0] == (int(tm.flat[0]) % 20 == 0)  # nodata rides along
        # joint: image and mask moved with the SAME permutation
        np.testing.assert_allclose(got_img, got_mask, atol=1e-6)
        assert sorted(np.round(got_img).astype(int)) == [1, 2, 3, 4]


def test_jigsaw_p0_identity():
    p = params(jigsaw_p=0.0, jigsaw_grid=(2, 2))
    img = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)), jnp.float32)
    mask = jnp.zeros((8, 8), jnp.int32)
    oi, om, _ = random_jigsaw(jax.random.PRNGKey(0), img, mask, mask.astype(bool), p)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(img))


def test_mosaic_quadrants_are_verbatim_donors():
    p = params(mosaic_p=1.0)
    b, h, w = 4, 8, 8
    img = np.broadcast_to(
        np.arange(1, b + 1, dtype=np.float32)[:, None, None, None] / 10, (b, h, w, 3)
    ).copy()
    mask = np.broadcast_to(np.arange(1, b + 1, dtype=np.int32)[:, None, None] * 10, (b, h, w)).copy()
    nod = mask % 20 == 0
    oi, om, on = batch_mosaic(
        jax.random.PRNGKey(3), jnp.asarray(img), jnp.asarray(mask), jnp.asarray(nod), p
    )
    oi, om, on = np.asarray(oi), np.asarray(om), np.asarray(on)
    for i in range(b):
        for sl in [
            (slice(0, 4), slice(0, 4)), (slice(0, 4), slice(4, 8)),
            (slice(4, 8), slice(0, 4)), (slice(4, 8), slice(4, 8)),
        ]:
            qi, qm, qn = oi[i][sl], om[i][sl], on[i][sl]
            assert np.ptp(qi) == 0 and np.ptp(qm) == 0
            donor_from_img = round(float(qi.flat[0]) * 10)
            donor_from_mask = int(qm.flat[0]) // 10
            assert donor_from_img == donor_from_mask  # joint donor selection
            assert 1 <= donor_from_img <= b
            assert qn.flat[0] == (int(qm.flat[0]) % 20 == 0)


def test_mosaic_p0_identity():
    p = params(mosaic_p=0.0)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((3, 8, 8, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 4, (3, 8, 8)), jnp.int32)
    oi, om, _ = batch_mosaic(jax.random.PRNGKey(0), img, mask, mask == 0, p)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(img))


def test_resized_crop_linear_ramp_analytic():
    """Bilinear resample of a linear ramp is exactly the analytically mapped
    ramp: out(i) = ramp(top + (i+0.5)·side - 0.5) away from the border."""
    p = params(resized_crop_p=1.0, scale=(0.49, 0.49))  # fixed area → side=0.7
    h = w = 32
    ramp = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None, None] / h, (h, w, 3)).copy() * 0.5
    mask = (np.arange(h)[:, None] >= h // 2).astype(np.int32) * np.ones((h, w), np.int32)
    key = jax.random.PRNGKey(11)
    oi, om, _ = random_resized_crop(
        key, jnp.asarray(ramp), jnp.asarray(mask), jnp.zeros((h, w), bool), p
    )
    oi = np.asarray(oi)
    # recover the crop geometry from the same keys the aug drew
    ka, ky, kx, kp_ = jax.random.split(key, 4)
    area = float(jax.random.uniform(ka, (), minval=0.49, maxval=0.49))
    side = np.sqrt(area)
    top = float(jax.random.uniform(ky, ())) * (h - side * h)
    expected_rows = top + (np.arange(h) + 0.5) * side - 0.5
    expected = (expected_rows / h * 0.5).astype(np.float32)
    interior = slice(2, h - 2)
    np.testing.assert_allclose(oi[interior, 16, 0], expected[interior], atol=1e-4)
    # mask edge: nearest-resampled step must sit where the crop maps h/2
    om = np.asarray(om)
    edge_row = np.argmax(om[:, 16] > 0)
    analytic_edge = (h / 2 - 0.5 - top) / side + 0.5 - 0.5
    assert abs(edge_row - analytic_edge) <= 1.0


def test_resized_crop_p0_identity():
    p = params(resized_crop_p=0.0)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 4, (16, 16)), jnp.int32)
    oi, om, _ = random_resized_crop(jax.random.PRNGKey(0), img, mask, mask == 0, p)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(om), np.asarray(mask))
