"""Tensor-parallel correctness: a model=2 mesh must produce the SAME numbers
as model=1, not merely finite ones (VERDICT r1 weak #5). Covers predict_step,
train_step (new prompt pixels + metrics), and both attention implementations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.parallel.mesh import batch_sharding, make_mesh, param_sharding, replicated
from beach_seg_tpu.train.prompt_tuner import PromptTuner


@pytest.fixture(scope="module")
def problem():
    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(epochs=1, crop_size=h, inpt_size=h, batch_size=8, warmup_epochs=0)
    rng = np.random.default_rng(0)
    n_prompts = 4
    pixels = jnp.asarray(rng.random((n_prompts, h, w, 3)), jnp.float32)
    pmasks = jnp.asarray(rng.integers(0, 4, (n_prompts, h, w)), jnp.int32)
    pnodata = jnp.zeros((n_prompts, h, w), bool)
    batch = {
        "image": jnp.asarray(rng.random((8, h, w, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 4, (8, h, w)), jnp.int32),
        "nodata": jnp.zeros((8, h, w), bool),
        "crop_idx": jnp.asarray(rng.integers(0, n_prompts, (8,)), jnp.int32),
    }
    return cfg, conf, pixels, pmasks, pnodata, batch


def _run(problem, attn_impl, data, model_axis, what):
    cfg, conf, pixels, pmasks, pnodata, batch = problem
    model = SegGPT(cfg, attn_impl=attn_impl)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, conf.inpt_size, conf.inpt_size, 3)),
        jnp.zeros((1, conf.inpt_size, conf.inpt_size, 3)),
        jnp.zeros((1, conf.inpt_size, conf.inpt_size, 3)),
    )["params"]
    tuner = PromptTuner(model=model, conf=conf, num_prompts=4, steps_per_epoch=2)
    mesh = make_mesh(data=data, model=model_axis)
    params = jax.device_put(params, param_sharding(mesh, params))
    b = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    pm = jax.device_put(pmasks, replicated(mesh))
    pn = jax.device_put(pnodata, replicated(mesh))
    with jax.sharding.set_mesh(mesh):
        if what == "predict":
            return np.asarray(tuner.predict_step(
                jax.device_put(pixels, replicated(mesh)), params, pm, pn, b
            ))
        state = jax.device_put(tuner.init_state(pixels), replicated(mesh))
        state2, metrics = tuner.train_step(state, params, pm, pn, b, jax.random.PRNGKey(7))
        return (
            np.asarray(state2.prompt_pixels),
            float(metrics["loss"]),
            np.asarray(metrics["confusion"]),
        )


@pytest.mark.parametrize("attn_impl", ["reference", "fused"])
def test_predict_step_tp_equals_dp(problem, attn_impl):
    base = _run(problem, attn_impl, data=8, model_axis=1, what="predict")
    tp = _run(problem, attn_impl, data=4, model_axis=2, what="predict")
    # predict decodes to int class ids — sharding must not flip any pixel
    mismatch = (base != tp).mean()
    assert mismatch == 0.0, f"{mismatch:.2%} of decoded pixels differ under TP"


@pytest.mark.parametrize("attn_impl", ["reference", "fused"])
def test_train_step_tp_equals_dp(problem, attn_impl):
    px_base, loss_base, cm_base = _run(problem, attn_impl, data=8, model_axis=1, what="train")
    px_tp, loss_tp, cm_tp = _run(problem, attn_impl, data=4, model_axis=2, what="train")
    assert loss_tp == pytest.approx(loss_base, rel=1e-5)
    np.testing.assert_array_equal(cm_base, cm_tp)
    np.testing.assert_allclose(px_tp, px_base, rtol=1e-5, atol=1e-6)
