"""End-to-end zero-shot pipeline parity vs HF torch (SURVEY.md §4.2/§4.3):
same random weights, same uint8 crop → HF processor.preprocess + torch SegGpt
+ post_process_semantic_segmentation vs our preprocess/model/post_process.

Resize-internal differences (PIL's fixed-point uint8 path vs our float matrix
resizes) make bit-exactness impossible; the assertion is pixel-agreement on
the decoded class ids, which is what the masks are made of.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from beach_seg_tpu.infer.processor import post_process_semantic, preprocess_image, preprocess_mask
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.convert import config_from_hf, convert_torch_state_dict
from beach_seg_tpu.models.seggpt.model import SegGPT
from tests.test_seggpt_parity import make_torch_model

HI = jax.lax.Precision.HIGHEST


@pytest.fixture(scope="module")
def e2e_setup():
    # tiny topology but the REAL 448 canvas so the HF processor's resize paths
    # are exercised exactly as in production
    tcfg = tiny_config(
        image_size=(896, 448), patch_size=16, pretrain_image_size=448, drop_path_rate=0.0
    )
    tmodel, hf_cfg = make_torch_model(tcfg)
    cfg = config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(tmodel.state_dict(), cfg))
    jmodel = SegGPT(cfg, precision=HI)
    return tmodel, jmodel, params


def test_zero_shot_pipeline_parity(e2e_setup):
    from transformers.models.seggpt.image_processing_seggpt import SegGptImageProcessor

    tmodel, jmodel, params = e2e_setup
    rng = np.random.default_rng(0)
    crop_size, num_labels = 336, 3
    query = rng.integers(0, 255, (crop_size, crop_size, 3)).astype(np.uint8)
    prompt = rng.integers(0, 255, (crop_size, crop_size, 3)).astype(np.uint8)
    mask = rng.integers(0, 4, (crop_size, crop_size)).astype(np.uint8)

    # ---- HF torch path (exactly predict_no_prompt.py:283-302)
    processor = SegGptImageProcessor()
    p_in = processor.preprocess(
        prompt_images=[prompt], prompt_masks=[mask], num_labels=num_labels,
        return_tensors="pt", data_format="channels_first",
    )
    q_in = processor.preprocess(
        images=[query], num_labels=num_labels, return_tensors="pt", data_format="channels_first"
    )
    with torch.no_grad():
        out = tmodel(
            pixel_values=q_in["pixel_values"],
            prompt_pixel_values=p_in["prompt_pixel_values"],
            prompt_masks=p_in["prompt_masks"],
            embedding_type="instance",
        )
    ref_ids = processor.post_process_semantic_segmentation(
        out, [(crop_size, crop_size)], num_labels=num_labels
    )[0].numpy()

    # ---- our path (infer/processor.py + Flax model)
    q = preprocess_image(query, 448)
    p = preprocess_image(prompt, 448)
    pm = preprocess_mask(mask, num_labels, 448)
    jout = jmodel.apply({"params": params}, q[None], p[None], pm[None])
    got_ids = post_process_semantic(
        np.asarray(jout["pred_masks"], np.float32), (crop_size, crop_size), num_labels
    )[0]

    # preprocess parity: inputs agree to within the uint8 quantization of
    # PIL's fixed-point resample
    hf_q = q_in["pixel_values"][0].numpy().transpose(1, 2, 0)
    assert np.abs(hf_q - np.asarray(q)).max() < 0.1
    hf_pm = p_in["prompt_masks"][0].numpy().transpose(1, 2, 0)
    assert np.abs(hf_pm - np.asarray(pm)).max() < 0.1

    agreement = float(np.mean(ref_ids == got_ids))
    assert agreement > 0.99, f"class-id agreement {agreement}"
