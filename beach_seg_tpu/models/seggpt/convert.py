"""Torch→Flax weight conversion for SegGPT.

Maps the HF ``SegGptForImageSegmentation`` state dict onto the parameter tree
of :class:`beach_seg_tpu.models.seggpt.model.SegGPT`. Linear weights are
transposed (torch stores (out, in)); convs go OIHW→HWIO; the patch-embed conv
becomes a flattened matmul kernel matching PatchEmbed's (p·p·C, hidden) layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from beach_seg_tpu.models.seggpt.config import SegGPTConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _qkv3(a: np.ndarray) -> np.ndarray:
    """(…, 3C) qkv weight/bias → (…, 3, C) (the TP-shardable layout)."""
    return a.reshape(a.shape[:-1] + (3, a.shape[-1] // 3))


def convert_torch_state_dict(sd: Mapping[str, Any], config: SegGPTConfig) -> dict:
    """HF torch state dict → flax params (plain nested dict of np arrays)."""
    g = lambda k: _np(sd[k])

    def ln(prefix: str) -> dict:
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    proj_w = g("model.embeddings.patch_embeddings.projection.weight")  # (H, C, p, p)
    hidden = proj_w.shape[0]
    patch_kernel = proj_w.transpose(2, 3, 1, 0).reshape(-1, hidden)  # (p·p·C, H)

    embeddings = {
        "mask_token": g("model.embeddings.mask_token"),
        "segment_token_input": g("model.embeddings.segment_token_input"),
        "segment_token_prompt": g("model.embeddings.segment_token_prompt"),
        "type_token_semantic": g("model.embeddings.type_token_semantic"),
        "type_token_instance": g("model.embeddings.type_token_instance"),
        "position_embeddings": g("model.embeddings.position_embeddings"),
        "patch_embeddings": {
            "kernel": patch_kernel,
            "bias": g("model.embeddings.patch_embeddings.projection.bias"),
        },
    }

    encoder: dict[str, Any] = {"layernorm": ln("model.encoder.layernorm")}
    for i in range(config.num_hidden_layers):
        p = f"model.encoder.layers.{i}"
        layer = {
            "layernorm_before": ln(f"{p}.layernorm_before"),
            "layernorm_after": ln(f"{p}.layernorm_after"),
            "attention": {
                # stored (C, 3, C) — the last (head-major) dim is the TP
                # shard dim (parallel/mesh._TP_RULES, model.py Attention)
                "qkv_kernel": _qkv3(g(f"{p}.attention.qkv.weight").T),
                "proj_kernel": g(f"{p}.attention.proj.weight").T,
                "proj_bias": g(f"{p}.attention.proj.bias"),
            },
            "mlp": {
                "lin1_kernel": g(f"{p}.mlp.lin1.weight").T,
                "lin1_bias": g(f"{p}.mlp.lin1.bias"),
                "lin2_kernel": g(f"{p}.mlp.lin2.weight").T,
                "lin2_bias": g(f"{p}.mlp.lin2.bias"),
            },
        }
        if config.qkv_bias:
            layer["attention"]["qkv_bias"] = _qkv3(g(f"{p}.attention.qkv.bias"))
        if config.use_relative_position_embeddings:
            layer["attention"]["rel_pos_h"] = g(f"{p}.attention.rel_pos_h")
            layer["attention"]["rel_pos_w"] = g(f"{p}.attention.rel_pos_w")
        encoder[f"layers_{i}"] = layer

    head_w = g("decoder.decoder_pred.head.weight")  # (3, dh, 1, 1)
    decoder = {
        "embed_kernel": g("decoder.decoder_embed.weight").T,
        "embed_bias": g("decoder.decoder_embed.bias"),
        "conv_kernel": g("decoder.decoder_pred.conv.weight").transpose(2, 3, 1, 0),
        "conv_bias": g("decoder.decoder_pred.conv.bias"),
        "layernorm": ln("decoder.decoder_pred.layernorm"),
        "head_kernel": head_w.reshape(head_w.shape[0], head_w.shape[1]).T,
        "head_bias": g("decoder.decoder_pred.head.bias"),
    }

    return {"embeddings": embeddings, "encoder": encoder, "decoder": decoder}


def config_from_hf(hf_config) -> SegGPTConfig:
    """Build our config from a transformers SegGptConfig instance."""
    return SegGPTConfig(
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        mlp_dim=hf_config.mlp_dim,
        layer_norm_eps=hf_config.layer_norm_eps,
        image_size=tuple(hf_config.image_size),
        patch_size=hf_config.patch_size,
        num_channels=hf_config.num_channels,
        qkv_bias=hf_config.qkv_bias,
        drop_path_rate=hf_config.drop_path_rate,
        pretrain_image_size=hf_config.pretrain_image_size,
        decoder_hidden_size=hf_config.decoder_hidden_size,
        use_relative_position_embeddings=hf_config.use_relative_position_embeddings,
        merge_index=hf_config.merge_index,
        intermediate_hidden_state_indices=tuple(hf_config.intermediate_hidden_state_indices),
        beta=hf_config.beta,
    )


_CONFIG_KEY = "__config_json__"


def save_params(params: dict, path: Path | str, config: SegGPTConfig | None = None) -> None:
    """Serialize a params tree to a compressed npz (no pickle). When
    ``config`` is given the topology rides along as a JSON entry, so loaders
    can rebuild the exact model without out-of-band knowledge."""
    import dataclasses
    import json

    flat: dict[str, np.ndarray] = {}

    def walk(node: dict, prefix: str):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    if config is not None:
        flat[_CONFIG_KEY] = np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), dtype=np.uint8
        )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params(path: Path | str) -> dict:
    data = np.load(path)
    params: dict = {}
    for key in data.files:
        if key == _CONFIG_KEY:
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        # older checkpoints stored qkv as (C, 3C)/(3C,) — reshape to the
        # current TP-shardable (C, 3, C)/(3, C) layout (values identical)
        if parts[-1] == "qkv_kernel" and arr.ndim == 2:
            arr = _qkv3(arr)
        elif parts[-1] == "qkv_bias" and arr.ndim == 1:
            arr = _qkv3(arr)
        node[parts[-1]] = arr
    return params


def load_config(path: Path | str) -> SegGPTConfig | None:
    """Topology embedded by :func:`save_params`, or None for older files."""
    import json

    data = np.load(path)
    if _CONFIG_KEY not in data.files:
        return None
    raw = json.loads(bytes(data[_CONFIG_KEY]).decode())
    for k in ("image_size", "intermediate_hidden_state_indices"):
        if k in raw and isinstance(raw[k], list):
            raw[k] = tuple(raw[k])
    return SegGPTConfig(**raw)
