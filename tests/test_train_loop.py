"""End-to-end training on the synthetic scene (SURVEY.md §4.3 integration):
train CLI path → run-dir artifacts → checkpoint restore round trip."""

import numpy as np
import pytest

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.train.checkpoint import (
    latest_checkpoint,
    load_prompt_batch,
    restore_state,
)
from beach_seg_tpu.train.loop import run_training
from beach_seg_tpu.utils.confix import load_yaml
from tests.synthetic_scene import build_scene


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    scene_dir = build_scene(tmp_path_factory.mktemp("scene"))
    out_root = tmp_path_factory.mktemp("runs")
    conf = BeachSegConfig(
        data=scene_dir,
        model_training_root=out_root,
        crop_size=32,
        inpt_size=64,
        batch_size=2,
        epochs=1,
        debug=True,
        checkpoint="random",
        num_viz_images=2,
        log_every_n_steps=1,
        warmup_epochs=0,
        mesh_data=2,
        mesh_model=1,
    )
    return run_training(conf), conf


def test_run_dir_artifacts(run_dir):
    rd, conf = run_dir
    assert (rd / "conf.yaml").exists()
    assert (rd / "classes.txt").read_text().splitlines() == list(conf.classes)
    assert (rd / "prompt_batch.npz").exists()
    assert (rd / "prompt_batch_tuned.npz").exists()
    assert (rd / "metrics.csv").exists()
    assert (rd / "log.log").exists()
    assert any((rd / "tb").iterdir())
    # conf round-trips through yaml
    conf2 = load_yaml(BeachSegConfig, rd / "conf.yaml")
    assert conf2.crop_size == conf.crop_size and conf2.epochs == conf.epochs


def test_metrics_recorded(run_dir):
    rd, _ = run_dir
    text = (rd / "metrics.csv").read_text()
    assert "train/loss" in text and "val/f1" in text and "lr" in text


def test_prompts_were_tuned(run_dir):
    rd, _ = run_dir
    pre = load_prompt_batch(rd / "prompt_batch.npz")
    post = load_prompt_batch(rd / "prompt_batch_tuned.npz")
    assert pre["image"].shape == post["image"].shape
    assert not np.allclose(pre["image"], post["image"])  # pixels moved
    assert np.array_equal(pre["mask"], post["mask"])  # labels untouched


def test_ema_export(run_dir):
    """EMA prompts are exported post-fit and track (but differ from) the raw
    tuned pixels (ref src/old/train.py:168,255-258)."""
    rd, _ = run_dir
    pre = load_prompt_batch(rd / "prompt_batch.npz")
    ema = load_prompt_batch(rd / "prompt_batch_ema.npz")
    tuned = load_prompt_batch(rd / "prompt_batch_tuned.npz")
    assert ema["image"].shape == tuned["image"].shape
    assert np.isfinite(ema["image"]).all()
    # ema lags the tuned pixels toward the init (alpha=0.99 per step)
    assert not np.allclose(ema["image"], tuned["image"])
    d_ema = np.abs(ema["image"] - pre["image"]).mean()
    d_tuned = np.abs(tuned["image"] - pre["image"]).mean()
    assert d_ema < d_tuned
    assert np.array_equal(ema["mask"], tuned["mask"])


def test_epochs_compat_trains_5x(tmp_path_factory):
    """epochs_compat=true reproduces the reference's max_epochs = epochs × 5
    (len() of the prompt_batch dict, ref src/train.py:98): one configured
    epoch yields five training epochs (one checkpoint each)."""
    import dataclasses

    scene_dir = build_scene(tmp_path_factory.mktemp("scene_ec"))
    out_root = tmp_path_factory.mktemp("runs_ec")
    conf = BeachSegConfig(
        data=scene_dir, model_training_root=out_root, crop_size=32, inpt_size=64,
        batch_size=2, epochs=1, debug=True, checkpoint="random", num_viz_images=0,
        warmup_epochs=0, mesh_data=1, mesh_model=1, epochs_compat=True,
    )
    rd = run_training(conf)
    ckpts = [p for p in (rd / "checkpoints").iterdir() if p.name.startswith("step_")]
    steps = sorted(int(p.name.split("_")[1]) for p in ckpts)
    assert len(steps) == 5  # one per epoch, 5 epochs from 1 configured


def test_predict_from_ema_export(run_dir, tmp_path_factory):
    """use_ema=true predicts from prompt_batch_ema.npz end-to-end."""
    rd, conf = run_dir
    from beach_seg_tpu.config import PredictionConfig
    from beach_seg_tpu.infer.predict import run_predict

    pred_conf = PredictionConfig(
        data=conf.data, train_run_dir=rd, use_ema=True, batch_size=2,
        debug=True, checkpoint="random", mesh_data=2, mesh_model=1,
        prediction_root=tmp_path_factory.mktemp("pred_ema"),
    )
    out_dir = run_predict(pred_conf)
    assert any((out_dir / "tif").iterdir())


def test_checkpoint_restore(run_dir):
    rd, conf = run_dir
    from beach_seg_tpu.data.dataset import create_scene, materialize_prompts
    from beach_seg_tpu.train.loop import model_for_config
    from beach_seg_tpu.train.prompt_tuner import PromptTuner

    path = latest_checkpoint(rd)
    assert path is not None
    scene = create_scene(conf, train=True)
    prompts = materialize_prompts(scene, conf)
    model, _ = model_for_config(conf)
    tuner = PromptTuner(model=model, conf=conf, num_prompts=len(scene.crops), steps_per_epoch=1)
    template = tuner.init_state(prompts["pixels"])
    state = restore_state(path, template)
    assert int(state.step) > 0
    post = load_prompt_batch(rd / "prompt_batch_tuned.npz")
    assert np.allclose(np.asarray(state.prompt_pixels), post["image"], atol=1e-6)
