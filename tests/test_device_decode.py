"""Device-side decode/back-resize must match the host reference paths.

The axon tunnel downloads at ~6 MB/s, so inference decodes on device and
ships uint8 ids; these tests pin the device twins to the host originals.
"""

import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.infer.processor import post_process_semantic, post_process_semantic_device
from beach_seg_tpu.ops.resize import resize_matrix


def test_post_process_device_matches_host():
    rng = np.random.default_rng(0)
    canvas = rng.standard_normal((3, 64, 32, 3)).astype(np.float32)
    host = post_process_semantic(canvas, (24, 24), num_labels=3)
    dev = np.asarray(post_process_semantic_device(jnp.asarray(canvas), (24, 24), 3))
    np.testing.assert_array_equal(host, dev.astype(host.dtype))


def test_post_process_device_same_size():
    rng = np.random.default_rng(1)
    canvas = rng.standard_normal((2, 64, 32, 3)).astype(np.float32)
    host = post_process_semantic(canvas, (32, 32), num_labels=3)
    dev = np.asarray(post_process_semantic_device(jnp.asarray(canvas), (32, 32), 3))
    np.testing.assert_array_equal(host, dev.astype(host.dtype))


def test_nearest_gather_matches_matrix_resize():
    """The take-based nearest back-resize in predict_step equals the host
    matrix version used previously."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 4, (2, 64, 64)).astype(np.int32)
    m = resize_matrix(64, 24, "nearest_cv2")
    host = np.round(
        np.einsum("pw,bhw->bhp", m, np.einsum("oh,bhw->bow", m, ids.astype(np.float32)))
    ).astype(np.int32)
    idx = jnp.asarray(m.argmax(1))
    dev = np.asarray(jnp.take(jnp.take(jnp.asarray(ids), idx, axis=1), idx, axis=2))
    np.testing.assert_array_equal(host, dev)


def test_raw_upload_path_matches_classic(tmp_path):
    """predict_step on raw uint8 crops (device-side PIL-parity resize) agrees
    with the classic host-resized float path: exact when no resize is needed,
    ≥99.5% of pixels when the device fp32 two-pass rounds ±1 differently."""
    import jax

    from beach_seg_tpu.config import BeachSegConfig
    from beach_seg_tpu.data.dataset import resize_image_bicubic
    from beach_seg_tpu.models.seggpt.config import tiny_config
    from beach_seg_tpu.models.seggpt.model import SegGPT
    from beach_seg_tpu.train.prompt_tuner import PromptTuner

    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
    )["params"]
    pixels = jnp.asarray(rng.random((2, h, w, 3)), jnp.float32)
    pm = jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32)
    pn = jnp.zeros((2, h, w), bool)

    for crop in (h, h // 2):  # no-resize and upsample flavors
        conf = BeachSegConfig(epochs=1, crop_size=crop, inpt_size=h, batch_size=2)
        tuner = PromptTuner(model=model, conf=conf, num_prompts=2, steps_per_epoch=1)
        raw = rng.integers(0, 256, (2, crop, crop, 3)).astype(np.uint8)
        classic_img = np.stack([
            np.clip(resize_image_bicubic(r, h), 0, 255) / 255.0 for r in raw
        ]).astype(np.float32)
        classic = {
            "image": jnp.asarray(classic_img),
            "mask": jnp.zeros((2, h, w), jnp.int32),
            "nodata": jnp.zeros((2, h, w), bool),
            "crop_idx": jnp.zeros((2,), jnp.int32),
        }
        rawb = {"image_u8": jnp.asarray(raw), "crop_idx": jnp.zeros((2,), jnp.int32)}
        a = np.asarray(tuner.predict_step(pixels, params, pm, pn, classic, out_size=crop))
        b = np.asarray(tuner.predict_step(pixels, params, pm, pn, rawb, out_size=crop))
        agree = (a == b).mean()
        if crop == h:
            assert agree == 1.0, f"no-resize raw path must be exact, got {agree}"
        else:
            assert agree > 0.995, f"raw path agreement {agree}"


def test_predict_step_out_size(tmp_path):
    """predict_step(out_size=k) equals host-back-resizing its full output."""
    import jax

    from beach_seg_tpu.config import BeachSegConfig
    from beach_seg_tpu.models.seggpt.config import tiny_config
    from beach_seg_tpu.models.seggpt.model import SegGPT
    from beach_seg_tpu.train.prompt_tuner import PromptTuner

    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(epochs=1, crop_size=16, inpt_size=h, batch_size=2)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
    )["params"]
    tuner = PromptTuner(model=model, conf=conf, num_prompts=2, steps_per_epoch=1)
    pixels = jnp.asarray(rng.random((2, h, w, 3)), jnp.float32)
    pm = jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32)
    pn = jnp.zeros((2, h, w), bool)
    batch = {
        "image": jnp.asarray(rng.random((2, h, w, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 4, (2, h, w)), jnp.int32),
        "nodata": jnp.zeros((2, h, w), bool),
        "crop_idx": jnp.zeros((2,), jnp.int32),
    }
    full = np.asarray(tuner.predict_step(pixels, params, pm, pn, batch))
    small = np.asarray(tuner.predict_step(pixels, params, pm, pn, batch, out_size=16))
    m = resize_matrix(h, 16, "nearest_cv2")
    idx = m.argmax(1)
    np.testing.assert_array_equal(full[:, idx][:, :, idx].astype(np.uint8), small)
    assert small.dtype == np.uint8
