"""Training core: metrics semantics, optimizer schedule, and the fused
prompt-tuning step (loss ↓ on a tiny problem; runs sharded on the 8-device
virtual mesh) — SURVEY.md §4.1/§4.4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.parallel.mesh import batch_sharding, make_mesh, param_sharding, replicated
from beach_seg_tpu.train.metrics import confusion_update, f1_from_confusion, iou_from_confusion
from beach_seg_tpu.train.prompt_tuner import PromptTuner, lr_schedule, prompt_tune_loss


# ------------------------------------------------------------------ metrics


def test_confusion_ignore_index():
    pred = jnp.asarray([[0, 1, 2, 3]])
    target = jnp.asarray([[0, 1, 2, 2]])
    cm = confusion_update(pred, target, 4, ignore_index=0)
    # target==0 pixel dropped
    assert int(cm.sum()) == 3
    assert int(cm[1, 1]) == 1 and int(cm[2, 2]) == 1 and int(cm[2, 3]) == 1


def test_f1_macro_hand_computed():
    # targets (non-ignored): [1,1,2,3], preds: [1,2,2,3]
    pred = jnp.asarray([1, 2, 2, 3])
    target = jnp.asarray([1, 1, 2, 3])
    cm = confusion_update(pred, target, 4, ignore_index=0)
    # class1: tp=1 fp=0 fn=1 → f1=2/3; class2: tp=1 fp=1 fn=0 → 2/3; class3: 1
    # class0: no support, no preds → excluded from macro
    f1 = float(f1_from_confusion(cm))
    assert abs(f1 - (2 / 3 + 2 / 3 + 1.0) / 3) < 1e-6


def test_f1_perfect_and_iou():
    pred = jnp.asarray([1, 2, 3, 1])
    cm = confusion_update(pred, pred, 4, ignore_index=0)
    assert float(f1_from_confusion(cm)) == pytest.approx(1.0)
    iou = np.asarray(iou_from_confusion(cm))
    assert iou[1] == 1.0 and iou[2] == 1.0 and iou[3] == 1.0


# ----------------------------------------------------------------- schedule


def test_lr_schedule_warmup_and_cosine():
    conf = BeachSegConfig(epochs=10, warmup_epochs=2, lr=1e-3, init_lr=5e-4, min_lr=1e-4)
    sched = lr_schedule(conf, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(5e-4)  # epoch 0 → init_lr
    assert float(sched(5)) == pytest.approx(5e-4 + (1e-3 - 5e-4) / 2)  # epoch 1
    assert float(sched(10)) == pytest.approx(1e-3)  # first post-warmup epoch: cos(0)
    # far into the schedule the lr approaches min_lr
    assert float(sched(5 * 12)) == pytest.approx(1e-4, abs=1e-5)


def test_lr_sqrt_batch_scaling():
    conf = BeachSegConfig(epochs=1, warmup_epochs=0, batch_size=4, base_lr_batch_size=1)
    sched = lr_schedule(conf, steps_per_epoch=1)
    assert float(sched(0)) == pytest.approx(conf.lr * 2.0)


# --------------------------------------------------------------------- loss


def test_prompt_tune_loss_masks_nodata():
    pred = jnp.ones((2, 8, 4, 3))
    labels = jnp.zeros((2, 4, 4, 3))
    yes = jnp.zeros((2, 4, 4), bool).at[0, 0, 0].set(True)
    loss = prompt_tune_loss(pred, labels, yes, beta=0.01)
    # |1-0| smooth-l1 with beta=0.01 → 1 - 0.005 per element
    assert float(loss) == pytest.approx(0.995, rel=1e-5)
    assert float(prompt_tune_loss(pred, labels, jnp.zeros((2, 4, 4), bool), 0.01)) == 0.0


# ------------------------------------------------------------ fused step


@pytest.fixture(scope="module")
def tiny_setup():
    # initializer_range=0.2: at the default 0.02 a random-init tiny ViT is
    # nearly input-independent (signal attenuates through the small matmuls),
    # making the loss flat wrt the prompt pixels; the real checkpoint has no
    # such problem. Larger init keeps the optimization check meaningful.
    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(
        epochs=2, crop_size=h, inpt_size=h, batch_size=8, warmup_epochs=0,
        lr=1e-2, init_lr=1e-2, min_lr=1e-3,
        # keep augs deterministic-ish for the loss-decrease check
        vertical_flip=0.0, horizontal_flip=0.0, hue=0.0, saturation=0.0,
        contrast=0.0, brightness=0.0, sharpness_p=0.0, erasing_p=0.0, gauss_p=0.0,
    )
    # NOTE: inpt_size must equal the model's query height AND width for the
    # center-crop to be identity; tiny config is rectangular (64, 32) → the
    # canvas half is 32×32, so inpt_size=32 works.
    assert h == w
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
    )["params"]
    n_prompts = 4
    prompt_pixels = jnp.asarray(rng.random((n_prompts, h, w, 3)), jnp.float32)
    prompt_masks = jnp.asarray(rng.integers(0, 4, (n_prompts, h, w)), jnp.int32)
    prompt_nodata = jnp.zeros((n_prompts, h, w), bool)
    batch = {
        "image": jnp.asarray(rng.random((8, h, w, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 4, (8, h, w)), jnp.int32),
        "nodata": jnp.zeros((8, h, w), bool),
        "crop_idx": jnp.asarray(rng.integers(0, n_prompts, (8,)), jnp.int32),
    }
    tuner = PromptTuner(model=model, conf=conf, num_prompts=n_prompts, steps_per_epoch=4)
    return tuner, params, prompt_pixels, prompt_masks, prompt_nodata, batch


def test_train_step_runs_and_loss_decreases(tiny_setup):
    tuner, params, pixels, pmasks, pnodata, batch = tiny_setup
    state = tuner.init_state(pixels)
    losses = []
    # fixed key → fixed palette/prompt choice: stationary objective, so the
    # optimizer must make progress (with fresh keys the target recolorizes
    # every step and the loss is legitimately noisy)
    sub = jax.random.PRNGKey(0)
    for i in range(6):
        state, metrics = tuner.train_step(state, params, pmasks, pnodata, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    # only prompt pixels changed; ema tracks them
    assert not np.allclose(np.asarray(state.prompt_pixels), np.asarray(pixels))
    assert np.isfinite(np.asarray(state.ema_pixels)).all()


def test_eval_and_predict_steps(tiny_setup):
    tuner, params, pixels, pmasks, pnodata, batch = tiny_setup
    out = tuner.eval_step(pixels, params, pmasks, pnodata, batch, jax.random.PRNGKey(1))
    assert out["pred"].shape == batch["mask"].shape
    assert np.isfinite(float(out["loss"]))
    pred = tuner.predict_step(pixels, params, pmasks, pnodata, batch)
    assert pred.shape == batch["mask"].shape
    assert set(np.unique(np.asarray(pred))) <= {0, 1, 2, 3}


def test_train_step_sharded_on_mesh(tiny_setup):
    """Full train step under a (4, 2) mesh: batch on data axis, TP params."""
    tuner, params, pixels, pmasks, pnodata, batch = tiny_setup
    mesh = make_mesh(data=4, model=2)
    params_sh = jax.device_put(params, param_sharding(mesh, params))
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    state = jax.device_put(tuner.init_state(pixels), replicated(mesh))
    pm = jax.device_put(pmasks, replicated(mesh))
    pn = jax.device_put(pnodata, replicated(mesh))
    with jax.sharding.set_mesh(mesh):
        state2, metrics = tuner.train_step(state, params_sh, pm, pn, batch_sh, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["confusion"].shape == (4, 4)
    assert not np.allclose(np.asarray(state2.prompt_pixels), np.asarray(pixels))


def test_predict_step_random_palette_path(tiny_setup):
    """painter_palette=False mimics the reference's random palette at predict
    time (src/model.py:134 quirk); decode is self-consistent either way."""
    tuner, params, pixels, pmasks, pnodata, batch = tiny_setup
    pred_painter = tuner.predict_step(pixels, params, pmasks, pnodata, batch)
    pred_random = tuner.predict_step(
        pixels, params, pmasks, pnodata, batch, jax.random.PRNGKey(9), False
    )
    assert pred_random.shape == pred_painter.shape
    assert set(np.unique(np.asarray(pred_random))) <= {0, 1, 2, 3}
