"""Gradient accumulation (optax.MultiSteps) and EMA semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.config import BeachSegConfig, num_workers
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.train.prompt_tuner import PromptTuner, make_optimizer


def _setup(conf):
    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
    )["params"]
    tuner = PromptTuner(model=model, conf=conf, num_prompts=2, steps_per_epoch=2)
    pixels = jnp.asarray(rng.random((2, h, w, 3)), jnp.float32)
    batch = {
        "image": jnp.asarray(rng.random((2, h, w, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32),
        "nodata": jnp.zeros((2, h, w), bool),
        "crop_idx": jnp.zeros((2,), jnp.int32),
    }
    pm = jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32)
    pn = jnp.zeros((2, h, w), bool)
    return tuner, params, pixels, pm, pn, batch


def test_grad_accumulation_delays_update():
    conf = BeachSegConfig(
        epochs=1, crop_size=32, inpt_size=32, batch_size=2, grad_accum_steps=2,
        vertical_flip=0, horizontal_flip=0, hue=0, saturation=0, contrast=0,
        brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0,
    )
    tuner, params, pixels, pm, pn, batch = _setup(conf)
    state = tuner.init_state(pixels)
    pixels0 = np.asarray(pixels)
    # first micro-step: MultiSteps accumulates, no parameter change
    state, _ = tuner.train_step(state, params, pm, pn, batch, jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(state.prompt_pixels), pixels0)
    # second micro-step completes the accumulation window → update applies
    state, _ = tuner.train_step(state, params, pm, pn, batch, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(state.prompt_pixels), pixels0)


def test_ema_tracks_pixels():
    conf = BeachSegConfig(
        epochs=1, crop_size=32, inpt_size=32, batch_size=2, ema_alpha=0.5,
        vertical_flip=0, horizontal_flip=0, hue=0, saturation=0, contrast=0,
        brightness=0, sharpness_p=0, erasing_p=0, gauss_p=0,
    )
    tuner, params, pixels, pm, pn, batch = _setup(conf)
    state = tuner.init_state(pixels)
    state, _ = tuner.train_step(state, params, pm, pn, batch, jax.random.PRNGKey(0))
    expect = 0.5 * np.asarray(pixels) + 0.5 * np.asarray(state.prompt_pixels)
    assert np.allclose(np.asarray(state.ema_pixels), expect, atol=1e-6)


def test_make_optimizer_validates():
    import pytest

    with pytest.raises(ValueError):
        make_optimizer(BeachSegConfig(optimizer="sgd"), 1)
    with pytest.raises(ValueError):
        make_optimizer(BeachSegConfig(scheduler="linear"), 1)


def test_num_workers_division():
    import os

    cpus = os.cpu_count()
    assert num_workers(BeachSegConfig(world_size=2, workers=-1)) == cpus // 2
    assert num_workers(BeachSegConfig(world_size=1, workers=3)) == min(cpus, 3)
