"""Dice+BCE training objective and the backbone presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.train.loop import model_for_config
from beach_seg_tpu.train.prompt_tuner import PromptTuner, dice_bce_loss, soft_class_probs
from beach_seg_tpu.transforms import apply_palette, build_palette, normalize_imagenet, normalize_palette


def test_soft_class_probs_recovers_exact_paint():
    """A perfectly painted canvas gives ~one-hot probabilities."""
    pal = jnp.asarray(build_palette(3))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 4, (2, 8, 8)))
    painted = normalize_imagenet(apply_palette(jnp.broadcast_to(pal[None], (2, 4, 3)), ids))
    canvas = jnp.concatenate([jnp.zeros_like(painted), painted], axis=1)
    probs = soft_class_probs(canvas, normalize_palette(jnp.broadcast_to(pal[None], (2, 4, 3))))
    assert probs.shape == (2, 8, 8, 4)
    assert np.array_equal(np.asarray(probs.argmax(-1)), np.asarray(ids))
    assert float(probs.max(-1).mean()) > 0.99


def test_dice_bce_perfect_vs_wrong():
    pal = jnp.asarray(build_palette(3))
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 4, (1, 8, 8)))
    pal_b = jnp.broadcast_to(pal[None], (1, 4, 3))
    painted = normalize_imagenet(apply_palette(pal_b, ids))
    canvas = jnp.concatenate([jnp.zeros_like(painted), painted], axis=1)
    yes = jnp.ones((1, 8, 8), bool)
    good = float(dice_bce_loss(canvas, normalize_palette(pal_b), ids, yes, 4))
    wrong_ids = (ids % 3) + 1
    painted_w = normalize_imagenet(apply_palette(pal_b, wrong_ids))
    canvas_w = jnp.concatenate([jnp.zeros_like(painted_w), painted_w], axis=1)
    bad = float(dice_bce_loss(canvas_w, normalize_palette(pal_b), ids, yes, 4))
    assert good < 0.1 and bad > 1.0


def test_train_step_dice_bce_runs():
    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(
        epochs=1, crop_size=h, inpt_size=h, batch_size=2, loss_variant="dice_bce",
        vertical_flip=0.0, horizontal_flip=0.0, hue=0.0, saturation=0.0,
        contrast=0.0, brightness=0.0, sharpness_p=0.0, erasing_p=0.0, gauss_p=0.0,
    )
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
    )["params"]
    tuner = PromptTuner(model=model, conf=conf, num_prompts=2, steps_per_epoch=1)
    state = tuner.init_state(jnp.asarray(rng.random((2, h, w, 3)), jnp.float32))
    batch = {
        "image": jnp.asarray(rng.random((2, h, w, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32),
        "nodata": jnp.zeros((2, h, w), bool),
        "crop_idx": jnp.zeros((2,), jnp.int32),
    }
    pm = jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32)
    state2, metrics = tuner.train_step(state, params, pm, jnp.zeros((2, h, w), bool), batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(state2.prompt_pixels)[0], rng.random((h, w, 3)), atol=0)  # sanity


def test_backbone_presets():
    large, lcfg = model_for_config(BeachSegConfig(backbone="large"))
    assert lcfg.hidden_size == 1024 and lcfg.num_hidden_layers == 24
    huge, hcfg = model_for_config(BeachSegConfig(backbone="huge"))
    assert hcfg.hidden_size == 1280 and hcfg.num_hidden_layers == 32
    assert max(hcfg.intermediate_hidden_state_indices) == 31
