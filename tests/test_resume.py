"""Preemption-tolerant resume: a second run continues from the first run's
Orbax checkpoint (SURVEY.md §5 checkpoint/resume)."""

import numpy as np

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.train.checkpoint import load_prompt_batch
from beach_seg_tpu.train.loop import run_training
from tests.synthetic_scene import build_scene


def test_resume_continues_training(tmp_path_factory):
    scene_dir = build_scene(tmp_path_factory.mktemp("scene"))
    out_root = tmp_path_factory.mktemp("runs")
    base = dict(
        data=scene_dir,
        model_training_root=out_root,
        crop_size=32,
        inpt_size=64,
        batch_size=2,
        debug=True,
        checkpoint="random",
        num_viz_images=0,
        mesh_data=1,
        mesh_model=1,
    )
    rd1 = run_training(BeachSegConfig(epochs=1, **base))
    pixels_e1 = load_prompt_batch(rd1 / "prompt_batch_tuned.npz")["image"]

    # resume for a second epoch in a fresh run dir
    rd2 = run_training(BeachSegConfig(epochs=2, resume_from=rd1, **base))
    assert rd2 != rd1
    pixels_e2 = load_prompt_batch(rd2 / "prompt_batch_tuned.npz")["image"]
    assert not np.allclose(pixels_e1, pixels_e2)  # trained further
    # metrics.csv of the resumed run starts past epoch 0
    text = (rd2 / "metrics.csv").read_text()
    assert "val/f1" in text  # resumed run logs from epoch 1 on
