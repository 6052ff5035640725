"""Numerical parity: Flax SegGPT vs the installed torch reference (random
weights, tiny config) — SURVEY.md §4.2 test strategy.

The real BAAI checkpoint is unavailable offline, but parity on randomly
initialized weights over the identical architecture is an equally strong
equivalence check (it exercises every op and every weight layout).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.convert import config_from_hf, convert_torch_state_dict, load_params, save_params
from beach_seg_tpu.models.seggpt.model import SegGPT, default_bool_masked_pos, seggpt_loss

HI = jax.lax.Precision.HIGHEST


def make_torch_model(tcfg):
    from transformers.models.seggpt.configuration_seggpt import SegGptConfig
    from transformers.models.seggpt.modeling_seggpt import SegGptForImageSegmentation

    hf_cfg = SegGptConfig(
        hidden_size=tcfg.hidden_size,
        num_hidden_layers=tcfg.num_hidden_layers,
        num_attention_heads=tcfg.num_attention_heads,
        mlp_dim=tcfg.mlp_dim,
        image_size=list(tcfg.image_size),
        patch_size=tcfg.patch_size,
        pretrain_image_size=tcfg.pretrain_image_size,
        decoder_hidden_size=tcfg.decoder_hidden_size,
        merge_index=tcfg.merge_index,
        intermediate_hidden_state_indices=list(tcfg.intermediate_hidden_state_indices),
        drop_path_rate=tcfg.drop_path_rate,
        beta=tcfg.beta,
        initializer_range=tcfg.initializer_range,
    )
    torch.manual_seed(0)
    model = SegGptForImageSegmentation(hf_cfg).eval()
    return model, hf_cfg


@pytest.fixture(scope="module")
def setup():
    tcfg = tiny_config()
    tmodel, hf_cfg = make_torch_model(tcfg)
    cfg = config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(tmodel.state_dict(), cfg))
    jmodel = SegGPT(cfg, precision=HI)
    rng = np.random.default_rng(1)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    batch = 2
    inputs = {
        "pixel_values": rng.standard_normal((batch, 3, h, w)).astype(np.float32),
        "prompt_pixel_values": rng.standard_normal((batch, 3, h, w)).astype(np.float32),
        "prompt_masks": rng.standard_normal((batch, 3, h, w)).astype(np.float32),
    }
    labels = rng.standard_normal((batch, 3, h, w)).astype(np.float32)
    return tcfg, cfg, tmodel, jmodel, params, inputs, labels


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_forward_parity_inference(setup):
    _, cfg, tmodel, jmodel, params, inputs, _ = setup
    with torch.no_grad():
        ref = tmodel(**{k: torch.from_numpy(v) for k, v in inputs.items()}).pred_masks.numpy()
    out = jmodel.apply({"params": params}, *(to_nhwc(inputs[k]) for k in
                        ("pixel_values", "prompt_pixel_values", "prompt_masks")))
    got = np.transpose(np.asarray(out["pred_masks"]), (0, 3, 1, 2))
    assert np.abs(ref - got).max() < 2e-4, np.abs(ref - got).max()


def test_forward_parity_with_labels_and_loss(setup):
    _, cfg, tmodel, jmodel, params, inputs, labels = setup
    bmp = np.asarray(default_bool_masked_pos(cfg, 2))
    with torch.no_grad():
        ref = tmodel(
            **{k: torch.from_numpy(v) for k, v in inputs.items()},
            labels=torch.from_numpy(labels),
            bool_masked_pos=torch.from_numpy(bmp),
        )
    out = jmodel.apply(
        {"params": params},
        *(to_nhwc(inputs[k]) for k in ("pixel_values", "prompt_pixel_values", "prompt_masks")),
        labels=to_nhwc(labels),
        bool_masked_pos=jnp.asarray(bmp),
    )
    got = np.transpose(np.asarray(out["pred_masks"]), (0, 3, 1, 2))
    assert np.abs(ref.pred_masks.numpy() - got).max() < 2e-4
    assert abs(float(ref.loss) - float(out["loss"])) < 1e-5


def test_forward_parity_feature_ensemble(setup):
    _, cfg, tmodel, jmodel, params, inputs, _ = setup
    with torch.no_grad():
        ref = tmodel(
            **{k: torch.from_numpy(v) for k, v in inputs.items()}, feature_ensemble=True
        ).pred_masks.numpy()
    out = jmodel.apply(
        {"params": params},
        *(to_nhwc(inputs[k]) for k in ("pixel_values", "prompt_pixel_values", "prompt_masks")),
        feature_ensemble=True,
    )
    got = np.transpose(np.asarray(out["pred_masks"]), (0, 3, 1, 2))
    assert np.abs(ref - got).max() < 2e-4


def test_grouped_feature_ensemble_matches_per_group_torch(setup):
    """``ensemble_groups=G`` on one fused G·P batch must equal G independent
    HF feature-ensemble calls (the zero-shot engine's fused formulation —
    infer/zero_shot.py ``batched``)."""
    _, cfg, tmodel, jmodel, params, _, _ = setup
    rng = np.random.default_rng(7)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    g, p = 2, 2
    q = rng.standard_normal((g, 3, h, w)).astype(np.float32)
    pi = rng.standard_normal((g, p, 3, h, w)).astype(np.float32)
    pm = rng.standard_normal((g, p, 3, h, w)).astype(np.float32)
    refs = []
    with torch.no_grad():
        for i in range(g):
            refs.append(
                tmodel(
                    pixel_values=torch.from_numpy(np.repeat(q[i : i + 1], p, 0)),
                    prompt_pixel_values=torch.from_numpy(pi[i]),
                    prompt_masks=torch.from_numpy(pm[i]),
                    feature_ensemble=True,
                ).pred_masks.numpy()
            )
    ref = np.concatenate(refs, 0)
    out = jmodel.apply(
        {"params": params},
        to_nhwc(np.repeat(q, p, axis=0)),
        to_nhwc(pi.reshape(g * p, 3, h, w)),
        to_nhwc(pm.reshape(g * p, 3, h, w)),
        feature_ensemble=True,
        ensemble_groups=g,
    )
    got = np.transpose(np.asarray(out["pred_masks"]), (0, 3, 1, 2))
    assert np.abs(ref - got).max() < 2e-4, np.abs(ref - got).max()


def test_forward_parity_semantic_embedding(setup):
    _, cfg, tmodel, jmodel, params, inputs, _ = setup
    with torch.no_grad():
        ref = tmodel(
            **{k: torch.from_numpy(v) for k, v in inputs.items()}, embedding_type="semantic"
        ).pred_masks.numpy()
    out = jmodel.apply(
        {"params": params},
        *(to_nhwc(inputs[k]) for k in ("pixel_values", "prompt_pixel_values", "prompt_masks")),
        embedding_type="semantic",
    )
    got = np.transpose(np.asarray(out["pred_masks"]), (0, 3, 1, 2))
    assert np.abs(ref - got).max() < 2e-4


def test_params_npz_round_trip(setup, tmp_path):
    _, cfg, _, jmodel, params, inputs, _ = setup
    save_params(jax.tree.map(np.asarray, params), tmp_path / "p.npz")
    params2 = load_params(tmp_path / "p.npz")
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(jax.tree.map(jnp.asarray, params2))
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_params_npz_legacy_qkv_layout(setup, tmp_path):
    """Checkpoints written before the TP-shardable (C, 3, C) qkv layout stored
    qkv_kernel as (C, 3C) and qkv_bias as (3C,) — load_params must reshape
    them (values identical)."""
    _, cfg, _, _, params, _, _ = setup
    legacy = jax.tree.map(np.asarray, params)

    def flatten_qkv(node):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten_qkv(v)
            elif k == "qkv_kernel":
                node[k] = v.reshape(v.shape[0], -1)
            elif k == "qkv_bias":
                node[k] = v.reshape(-1)

    flatten_qkv(legacy)
    save_params(legacy, tmp_path / "legacy.npz")
    loaded = load_params(tmp_path / "legacy.npz")
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(jax.tree.map(jnp.asarray, loaded))
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_droppath_stochastic_train_mode(setup):
    """Drop-path must be active (stochastic) in train mode, identity in eval."""
    tcfg, cfg, _, _, params, inputs, _ = setup
    jmodel = SegGPT(cfg, precision=HI)
    args = tuple(to_nhwc(inputs[k]) for k in ("pixel_values", "prompt_pixel_values", "prompt_masks"))
    o1 = jmodel.apply({"params": params}, *args, deterministic=False,
                      rngs={"droppath": jax.random.PRNGKey(0)})
    o2 = jmodel.apply({"params": params}, *args, deterministic=False,
                      rngs={"droppath": jax.random.PRNGKey(1)})
    o3 = jmodel.apply({"params": params}, *args)
    assert not np.allclose(np.asarray(o1["pred_masks"]), np.asarray(o2["pred_masks"]))
    assert np.isfinite(np.asarray(o3["pred_masks"])).all()


def test_forward_parity_head_dim_64():
    """Flagship head geometry (head_dim=64): exercises the transpose-free
    qkv-direct Pallas path (ops/pallas_attn.fused_attention_qkv), which only
    engages when 2*head_dim == 128 — tiny_config (head_dim=8) can't reach it."""
    tcfg = tiny_config(hidden_size=128, num_attention_heads=2)
    tmodel, hf_cfg = make_torch_model(tcfg)
    cfg = config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(tmodel.state_dict(), cfg))
    jmodel = SegGPT(cfg, precision=HI)
    rng = np.random.default_rng(7)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    inputs = {
        k: rng.standard_normal((2, 3, h, w)).astype(np.float32)
        for k in ("pixel_values", "prompt_pixel_values", "prompt_masks")
    }
    with torch.no_grad():
        ref = tmodel(**{k: torch.from_numpy(v) for k, v in inputs.items()}).pred_masks.numpy()
    out = jmodel.apply(
        {"params": params},
        *(jnp.asarray(np.transpose(inputs[k], (0, 2, 3, 1)))
          for k in ("pixel_values", "prompt_pixel_values", "prompt_masks")),
    )
    got = np.transpose(np.asarray(out["pred_masks"]), (0, 3, 1, 2))
    assert np.abs(got - ref).max() < 2e-4
