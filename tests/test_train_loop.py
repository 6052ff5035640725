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
