"""Transforms layer: palette codec round-trips and augmentation invariants
(SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.transforms import (
    AugmentParams,
    apply_palette,
    build_palette,
    center_crop,
    decode_by_palette,
    denormalize_imagenet,
    eval_augment,
    normalize_imagenet,
    normalize_palette,
    random_palette,
    train_augment,
)


def test_build_palette_matches_painter_recipe():
    # literal values from the Painter recipe for num_labels=4 (base=2, margin=128)
    pal = build_palette(4)
    assert pal.shape == (5, 3)
    assert tuple(pal[0]) == (0, 0, 0)
    assert tuple(pal[1]) == (255, 255, 255)
    assert tuple(pal[2]) == (255, 255, 127)
    assert tuple(pal[3]) == (255, 127, 255)
    assert tuple(pal[4]) == (255, 127, 127)


def test_palette_colorize_decode_round_trip_deterministic():
    pal = jnp.asarray(build_palette(4))  # (5, 3)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 5, (2, 16, 16)))
    rgb = apply_palette(jnp.broadcast_to(pal[None], (2, 5, 3)), ids)
    assert rgb.shape == (2, 16, 16, 3)
    decoded = decode_by_palette(rgb, pal.astype(jnp.float32) / 255.0)
    assert np.array_equal(np.asarray(decoded), np.asarray(ids))


def test_palette_round_trip_in_normalized_space():
    pal = jnp.asarray(build_palette(4))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 5, (1, 8, 8)))
    rgb = apply_palette(pal[None], ids)
    rgb_n = normalize_imagenet(rgb)
    decoded = decode_by_palette(rgb_n, normalize_palette(pal))
    assert np.array_equal(np.asarray(decoded), np.asarray(ids))


def test_random_palette_class0_black_and_round_trip():
    key = jax.random.PRNGKey(0)
    pal = random_palette(key, 4, 3)
    assert pal.shape == (3, 4, 3)
    assert np.all(np.asarray(pal)[:, 0] == 0)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 4, (3, 12, 12)))
    rgb = apply_palette(pal, ids)
    decoded = decode_by_palette(rgb, pal.astype(jnp.float32) / 255.0)
    assert np.array_equal(np.asarray(decoded), np.asarray(ids))


def test_decode_noise_robustness():
    """Decode must survive small painting error (the model paints approximately)."""
    pal = jnp.asarray(build_palette(4))
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 5, (1, 32, 32)))
    rgb = apply_palette(pal[None], ids)
    rgb = rgb + 0.05 * jax.random.normal(jax.random.PRNGKey(1), rgb.shape)
    decoded = decode_by_palette(rgb, pal.astype(jnp.float32) / 255.0)
    assert np.mean(np.asarray(decoded) == np.asarray(ids)) > 0.99


def test_normalize_denormalize_round_trip():
    x = jnp.asarray(np.random.default_rng(4).random((2, 8, 8, 3)), jnp.float32)
    assert np.allclose(np.asarray(denormalize_imagenet(normalize_imagenet(x))), np.asarray(x), atol=1e-6)


def test_center_crop():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = center_crop(x, 4)
    assert y.shape == (2, 4, 4, 3)
    assert np.array_equal(np.asarray(y), np.asarray(x[:, 2:6, 2:6]))
    m = jnp.arange(2 * 8 * 8).reshape(2, 8, 8)
    ym = center_crop(m, 4, spatial_axes=(-2, -1))
    assert np.array_equal(np.asarray(ym), np.asarray(m[:, 2:6, 2:6]))


@pytest.fixture()
def batch():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 4, (2, 32, 32)), jnp.int32)
    nodata = jnp.asarray(rng.random((2, 32, 32)) > 0.5)
    return img, mask, nodata


def test_train_augment_deterministic_given_key(batch):
    img, mask, nodata = batch
    p = AugmentParams()
    key = jax.random.PRNGKey(7)
    a1 = train_augment(key, img, mask, nodata, p)
    a2 = train_augment(key, img, mask, nodata, p)
    for x, y in zip(a1, a2):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    a3 = train_augment(jax.random.PRNGKey(8), img, mask, nodata, p)
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(a3[0]))


def test_train_augment_geometric_alignment(batch):
    """Flips must move image and mask together: augmented mask pixels must be a
    flip of the original mask (only flips touch geometry)."""
    img, mask, nodata = batch
    p = AugmentParams(vertical_flip=1.0, horizontal_flip=0.0, hue=0, saturation=0,
                      contrast=0, brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0)
    out_img, out_mask, out_nodata = train_augment(jax.random.PRNGKey(0), img, mask, nodata, p)
    assert np.array_equal(np.asarray(out_mask), np.asarray(mask[:, ::-1]))
    assert np.array_equal(np.asarray(out_nodata), np.asarray(nodata[:, ::-1]))
    assert np.allclose(np.asarray(denormalize_imagenet(out_img)), np.asarray(img[:, ::-1]), atol=1e-6)


def test_train_augment_identity_when_all_off(batch):
    img, mask, nodata = batch
    p = AugmentParams(vertical_flip=0, horizontal_flip=0, hue=0, saturation=0,
                      contrast=0, brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0)
    out_img, out_mask, _ = train_augment(jax.random.PRNGKey(0), img, mask, nodata, p)
    assert np.allclose(np.asarray(denormalize_imagenet(out_img)), np.asarray(img), atol=1e-6)
    assert np.array_equal(np.asarray(out_mask), np.asarray(mask))


def test_train_augment_jits(batch):
    img, mask, nodata = batch
    p = AugmentParams()
    f = jax.jit(lambda k, i, m, n: train_augment(k, i, m, n, p))
    out = f(jax.random.PRNGKey(0), img, mask, nodata)
    assert out[0].shape == img.shape


def test_eval_augment(batch):
    img, mask, nodata = batch
    out_img, out_mask, out_nodata = eval_augment(img, mask, nodata, 16)
    assert out_img.shape == (2, 16, 16, 3)
    assert out_mask.shape == (2, 16, 16)
    assert np.allclose(
        np.asarray(denormalize_imagenet(out_img)), np.asarray(img[:, 8:24, 8:24]), atol=1e-6
    )


def test_erasing_always_on_zeroes_region(batch):
    img, mask, nodata = batch
    p = AugmentParams(vertical_flip=0, horizontal_flip=0, hue=0, saturation=0,
                      contrast=0, brightness=0, sharpness_p=0, erasing_p=1.0,
                      erasing_scale=(0.1, 0.2), gauss_p=0)
    out_img, _, _ = train_augment(jax.random.PRNGKey(3), img, mask, nodata, p)
    raw = np.asarray(denormalize_imagenet(out_img))
    n_zero = (np.abs(raw) < 1e-6).all(axis=-1).sum(axis=(1, 2))
    assert (n_zero >= 0.05 * 32 * 32).all()


def test_dormant_augmentations(batch):
    """Channel shift, jigsaw, mosaic — the reference's commented-out augs
    (ref data.py:198-216), implemented and default-off."""
    img, mask, nodata = batch
    # jigsaw: mask and image tiles move together
    p = AugmentParams(vertical_flip=0, horizontal_flip=0, hue=0, saturation=0,
                      contrast=0, brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0,
                      jigsaw_p=1.0, jigsaw_grid=(2, 2))
    out_img, out_mask, out_nodata = train_augment(jax.random.PRNGKey(1), img, mask, nodata, p)
    raw = np.asarray(denormalize_imagenet(out_img))
    assert sorted(np.asarray(out_mask).ravel().tolist()) == sorted(np.asarray(mask).ravel().tolist())
    # pixel multiset preserved per sample
    assert np.allclose(sorted(raw[0].ravel()), sorted(np.asarray(img)[0].ravel()), atol=1e-5)

    # channel shift: bounded additive change
    p2 = AugmentParams(vertical_flip=0, horizontal_flip=0, hue=0, saturation=0,
                       contrast=0, brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0,
                       channel_shift_p=1.0, channel_shift_limit=0.05)
    out2, m2, _ = train_augment(jax.random.PRNGKey(2), img, mask, nodata, p2)
    raw2 = np.asarray(denormalize_imagenet(out2))
    assert np.abs(raw2 - np.asarray(img)).max() <= 0.05 + 1e-5
    assert np.array_equal(np.asarray(m2), np.asarray(mask))

    # mosaic: quadrants may come from other samples; shapes preserved
    p3 = AugmentParams(vertical_flip=0, horizontal_flip=0, hue=0, saturation=0,
                       contrast=0, brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0,
                       mosaic_p=1.0)
    out3, m3, n3 = train_augment(jax.random.PRNGKey(3), img, mask, nodata, p3)
    assert out3.shape == img.shape and m3.shape == mask.shape and n3.shape == nodata.shape


def test_random_resized_crop(batch):
    img, mask, nodata = batch
    p = AugmentParams(vertical_flip=0, horizontal_flip=0, hue=0, saturation=0,
                      contrast=0, brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0,
                      resized_crop_p=1.0, scale=(0.25, 0.25))
    out_img, out_mask, out_nodata = train_augment(jax.random.PRNGKey(4), img, mask, nodata, p)
    assert out_img.shape == img.shape and out_mask.shape == mask.shape
    raw = np.asarray(denormalize_imagenet(out_img))
    # a 25%-area crop zoomed 2x: output differs from input but stays in range
    assert not np.allclose(raw, np.asarray(img), atol=1e-3)
    assert raw.min() >= -1e-5 and raw.max() <= 1 + 1e-5
    assert set(np.unique(np.asarray(out_mask))) <= set(np.unique(np.asarray(mask)))
    # jit-compatible (dynamic scale/translation are traced values)
    f = jax.jit(lambda k, i, m, n: train_augment(k, i, m, n, p))
    f(jax.random.PRNGKey(5), img, mask, nodata)
