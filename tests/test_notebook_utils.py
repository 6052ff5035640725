"""Notebook helpers, .env loader, legacy training options."""

import os

import jax
import numpy as np
import pytest

from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.geometry import Polygon
from beach_seg_tpu.geo.notebook_utils import crop_with_mask, equalize_adapthist, polygon_to_mask
from beach_seg_tpu.geo.tiff import write
from beach_seg_tpu.utils.env import find_dotenv, load_dotenv


def test_polygon_to_mask():
    poly = Polygon([(2, 2), (8, 2), (8, 8), (2, 8)])
    m = polygon_to_mask((12, 12), poly)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.shape == (12, 12)


def test_equalize_adapthist_range():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    out = equalize_adapthist(img)
    assert out.shape == img.shape
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_crop_with_mask(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(100, 4000, (4, 40, 40)).astype(np.uint16)
    t = Affine.from_origin(0, 120, 3, 3)
    p = tmp_path / "scene.tif"
    write(p, data, t, crs=32611, nodata=0)
    img, mask = crop_with_mask(p, (5, 5, 25, 25), 32)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert mask.shape == (32, 32)
    assert not mask.all()
    # fully out-of-bounds window → all-masked early return
    img2, mask2 = crop_with_mask(p, (100, 100, 120, 120), 16)
    assert mask2.all() and (img2 == 0).all()


def test_dotenv(tmp_path, monkeypatch):
    env = tmp_path / ".env"
    env.write_text("# comment\nBST_TEST_KEY=hello\nQUOTED='v a l'\n")
    monkeypatch.chdir(tmp_path)
    assert find_dotenv() == env
    assert load_dotenv()
    assert os.environ["BST_TEST_KEY"] == "hello"
    assert os.environ["QUOTED"] == "v a l"
    os.environ.pop("BST_TEST_KEY"), os.environ.pop("QUOTED")


def test_legacy_training_options():
    """prompt_dropout and hf loss variant run through the fused step."""
    import jax.numpy as jnp

    from beach_seg_tpu.config import BeachSegConfig
    from beach_seg_tpu.models.seggpt.config import tiny_config
    from beach_seg_tpu.models.seggpt.model import SegGPT
    from beach_seg_tpu.train.prompt_tuner import PromptTuner

    cfg = tiny_config(drop_path_rate=0.0)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(
        epochs=1, crop_size=h, inpt_size=h, batch_size=2,
        prompt_dropout=0.5, loss_variant="hf", ema_alpha=0.9,
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
    pn = jnp.zeros((2, h, w), bool)
    state2, metrics = tuner.train_step(state, params, pm, pn, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
