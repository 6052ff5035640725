"""Padded batch rows must not pollute gradients or metrics.

``iterate_batches`` pads ragged tails (repeating the last item) and marks real
rows in ``valid``; the fused train/eval steps zero invalid rows out of the
loss numerator+denominator and the confusion update. The property tested here
is content-invariance: two batches identical in their valid rows but with
different garbage in the padding rows must produce bit-identical state updates
and metrics (per-sample semantics, ref /root/reference/src/model.py:233-308).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.train.prompt_tuner import PromptTuner


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(epochs=1, crop_size=h, inpt_size=h, batch_size=4, warmup_epochs=0)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
    )["params"]
    n_prompts = 3
    pixels = jnp.asarray(rng.random((n_prompts, h, w, 3)), jnp.float32)
    pmasks = jnp.asarray(rng.integers(0, 4, (n_prompts, h, w)), jnp.int32)
    pnodata = jnp.zeros((n_prompts, h, w), bool)
    return model, conf, params, pixels, pmasks, pnodata, (h, w), n_prompts


def _batch(rng, b, h, w, n_prompts, n_valid, garbage_seed):
    """Batch whose first n_valid rows are fixed (seeded) and whose padding
    rows are garbage drawn from ``garbage_seed``."""
    fix = np.random.default_rng(123)
    img = fix.random((b, h, w, 3)).astype(np.float32)
    mask = fix.integers(1, 4, (b, h, w)).astype(np.int32)
    idx = fix.integers(0, n_prompts, (b,)).astype(np.int32)
    g = np.random.default_rng(garbage_seed)
    img[n_valid:] = g.random((b - n_valid, h, w, 3))
    mask[n_valid:] = g.integers(0, 4, (b - n_valid, h, w))
    idx[n_valid:] = g.integers(0, n_prompts, (b - n_valid,))
    return {
        "image": jnp.asarray(img),
        "mask": jnp.asarray(mask),
        "nodata": jnp.zeros((b, h, w), bool),
        "crop_idx": jnp.asarray(idx),
        "valid": jnp.asarray(np.arange(b) < n_valid),
    }


@pytest.mark.parametrize("loss_variant", ["nodata", "hf", "dice_bce"])
def test_train_step_invariant_to_padding_content(setup, loss_variant):
    model, conf, params, pixels, pmasks, pnodata, (h, w), n_prompts = setup
    conf = dataclasses.replace(conf, loss_variant=loss_variant)
    tuner = PromptTuner(model=model, conf=conf, num_prompts=n_prompts, steps_per_epoch=2)
    key = jax.random.PRNGKey(7)

    outs = []
    for seed in (1, 2):
        batch = _batch(None, 4, h, w, n_prompts, n_valid=2, garbage_seed=seed)
        state = tuner.init_state(pixels)
        state, metrics = tuner.train_step(state, params, pmasks, pnodata, batch, key)
        outs.append((jax.device_get(state), jax.device_get(metrics)))

    (s1, m1), (s2, m2) = outs
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(np.asarray(m1["confusion"]), np.asarray(m2["confusion"]))
    jax.tree.map(np.testing.assert_array_equal, s1, s2)
    assert np.isfinite(float(m1["loss"]))
    # the step actually trained on the valid rows
    assert not np.allclose(np.asarray(s1.prompt_pixels), np.asarray(pixels))


def test_eval_step_invariant_to_padding_content(setup):
    model, conf, params, pixels, pmasks, pnodata, (h, w), n_prompts = setup
    tuner = PromptTuner(model=model, conf=conf, num_prompts=n_prompts, steps_per_epoch=2)
    key = jax.random.PRNGKey(3)
    outs = []
    for seed in (1, 2):
        batch = _batch(None, 4, h, w, n_prompts, n_valid=3, garbage_seed=seed)
        outs.append(jax.device_get(
            tuner.eval_step(pixels, params, pmasks, pnodata, batch, key)
        ))
    assert float(outs[0]["loss"]) == float(outs[1]["loss"])
    np.testing.assert_array_equal(outs[0]["confusion"], outs[1]["confusion"])


def test_confusion_counts_only_valid_rows(setup):
    """With augment-free eval, the confusion total must equal the number of
    non-nodata pixels in the VALID rows only."""
    model, conf, params, pixels, pmasks, pnodata, (h, w), n_prompts = setup
    tuner = PromptTuner(model=model, conf=conf, num_prompts=n_prompts, steps_per_epoch=2)
    batch = _batch(None, 4, h, w, n_prompts, n_valid=2, garbage_seed=0)
    out = tuner.eval_step(pixels, params, pmasks, pnodata, batch, jax.random.PRNGKey(0))
    valid_pixels = int((np.asarray(batch["mask"][:2]) != 0).sum())
    assert int(np.asarray(out["confusion"]).sum()) == valid_pixels


def test_batch_without_valid_still_works(setup):
    model, conf, params, pixels, pmasks, pnodata, (h, w), n_prompts = setup
    tuner = PromptTuner(model=model, conf=conf, num_prompts=n_prompts, steps_per_epoch=2)
    batch = _batch(None, 4, h, w, n_prompts, n_valid=4, garbage_seed=0)
    full = dict(batch)
    del batch["valid"]
    state = tuner.init_state(pixels)
    _, m_no = tuner.train_step(state, params, pmasks, pnodata, batch, jax.random.PRNGKey(5))
    state = tuner.init_state(pixels)
    _, m_all = tuner.train_step(state, params, pmasks, pnodata, full, jax.random.PRNGKey(5))
    # an all-valid mask is semantically identical to no mask
    assert float(m_no["loss"]) == pytest.approx(float(m_all["loss"]), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(m_no["confusion"]), np.asarray(m_all["confusion"]))
