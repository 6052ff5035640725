"""Flax SegGPT — in-context "image painting" segmentation ViT.

A from-scratch TPU-native reimplementation of the architecture consumed by the
reference as ``BAAI/seggpt-vit-large`` (HF transformers seggpt; behavioral
spec: modeling_seggpt.py — see SURVEY.md §2.9/§3.4). Design departures from
the torch original, chosen for XLA/TPU:

  - NHWC layout end-to-end; patch-embed is a reshape + single MXU matmul
    rather than a strided conv.
  - The absolute-position-embedding bicubic interpolation and the rel-pos
    table linear interpolation are static-shape matrix resizes
    (ops.resize) — constant-folded by XLA at trace time.
  - Softmax always fp32; all other compute follows the ``dtype`` policy
    (bf16 on TPU by default for inference, params stay fp32).
  - ``intermediate`` features, stream-merge@merge_index and feature-ensemble
    reproduce the HF control flow exactly (parity-tested vs torch).

Input convention (matches HF semantics, axes transposed to NHWC):
  pixel_values        (B, H, W, 3)  query image, H=W/2·2 canvas half
  prompt_pixel_values (B, H, W, 3)  prompt image
  prompt_masks        (B, H, W, 3)  colorized prompt mask
  labels              (B, H, W, 3)  colorized target (training only)
The model stacks prompt‖query along height into a (B, 2H, W, 3) canvas
internally, exactly like HF modeling_seggpt.py:737-742.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.models.seggpt.config import SegGPTConfig
from beach_seg_tpu.ops.attention import attention_reference, rel_pos_terms, rel_tables_padded
from beach_seg_tpu.ops.resize import resize_2d
from beach_seg_tpu.utils.env import env_flag


def _trunc_normal(std: float):
    return nn.initializers.truncated_normal(stddev=std, lower=-2 * std, upper=2 * std)


class PatchEmbed(nn.Module):
    """16×16/stride-16 patch embedding as reshape + matmul (MXU-friendly)."""

    config: SegGPTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        p = cfg.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", _trunc_normal(cfg.initializer_range), (p * p * c, cfg.hidden_size), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (cfg.hidden_size,), jnp.float32)
        # (B, gh, p, gw, p, C) → (B, gh, gw, p, p, C) → (B, gh, gw, p*p*C)
        patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, p * p * c)
        y = jnp.dot(patches.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class Embeddings(nn.Module):
    """Patch embed + mask-token substitution + interpolated abs-pos +
    segment/type tokens; concatenates the pixel and mask streams on batch
    (HF modeling_seggpt.py:125-207)."""

    config: SegGPTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pixel_canvas: jnp.ndarray,
        mask_canvas: jnp.ndarray,
        bool_masked_pos: jnp.ndarray,
        embedding_type: str = "instance",
    ) -> jnp.ndarray:
        cfg = self.config
        std = cfg.initializer_range
        hs = cfg.hidden_size
        mask_token = self.param("mask_token", nn.initializers.normal(std), (1, 1, 1, hs), jnp.float32)
        seg_input = self.param("segment_token_input", nn.initializers.normal(std), (1, 1, 1, hs), jnp.float32)
        seg_prompt = self.param("segment_token_prompt", nn.initializers.normal(std), (1, 1, 1, hs), jnp.float32)
        type_semantic = self.param("type_token_semantic", nn.initializers.normal(std), (1, 1, 1, hs), jnp.float32)
        type_instance = self.param("type_token_instance", nn.initializers.normal(std), (1, 1, 1, hs), jnp.float32)
        n_pos = (cfg.pretrain_image_size // cfg.patch_size) ** 2 + 1
        pos_embed = self.param("position_embeddings", _trunc_normal(std), (1, n_pos, hs), jnp.float32)

        patch_embed = PatchEmbed(cfg, dtype=self.dtype, name="patch_embeddings")
        input_embeddings = patch_embed(pixel_canvas)
        prompt_embeddings = patch_embed(mask_canvas)
        b, gh, gw, _ = input_embeddings.shape

        # replace masked mask-stream tokens with the learned mask token
        w = bool_masked_pos.astype(self.dtype).reshape(-1, gh, gw, 1)
        prompt_embeddings = prompt_embeddings * (1.0 - w) + mask_token.astype(self.dtype) * w

        # interpolate pretrained abs-pos grid (bicubic, torch parity)
        pre = cfg.pretrain_image_size // cfg.patch_size
        if (pre, pre) != (gh, gw):
            grid = pos_embed[:, 1:].reshape(1, pre, pre, hs).transpose(0, 3, 1, 2)
            grid = resize_2d(grid, (gh, gw), "bicubic_torch").transpose(0, 2, 3, 1)
        else:
            grid = pos_embed[:, 1:].reshape(1, gh, gw, hs)
        grid = grid.astype(self.dtype)

        type_token = type_semantic if embedding_type == "semantic" else type_instance
        input_embeddings = input_embeddings + seg_input.astype(self.dtype) + grid + type_token.astype(self.dtype)
        prompt_embeddings = prompt_embeddings + seg_prompt.astype(self.dtype) + grid + type_token.astype(self.dtype)
        return jnp.concatenate([input_embeddings, prompt_embeddings], axis=0)


class Attention(nn.Module):
    """Global MHA with decomposed relative position bias (HF :210-349).

    ``impl``: "reference" = pure-XLA oracle; "fused" = Pallas kernel that keeps
    the (S, S) scores in VMEM (ops/pallas_attn.py). "auto" picks fused whenever
    rel-pos is enabled (the kernel's layout requires the decomposed terms)."""

    config: SegGPTConfig
    dtype: Any = jnp.float32
    precision: Any = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ln_eps = cfg.layer_norm_eps  # single source of truth (ADVICE r3)
        b, gh, gw, c = x.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        s = gh * gw

        # (C, 3, C) rather than (C, 3C): under tensor parallelism the LAST dim
        # (head-major channels) shards over the mesh model axis, giving each
        # shard whole head blocks of q, k and v — a (C, 3C) layout would put
        # shard boundaries across the q/k/v split (contiguous 3C/mp blocks mix
        # streams) and force a reshard at every kernel island
        from beach_seg_tpu.ops.sharding import model_axis_size

        qkv_kernel = self.param("qkv_kernel", _trunc_normal(cfg.initializer_range), (c, 3, c), jnp.float32)
        qkv_bias = None
        if cfg.qkv_bias:
            qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3, c), jnp.float32)

        use_fused = self.impl in ("fused", "auto") and cfg.use_relative_position_embeddings
        use_qkv_rel_kernel = (
            use_fused and 2 * hd == 128 and c % 128 == 0 and gh <= 64 and gw <= 64
        )
        flat_path = use_qkv_rel_kernel and model_axis_size() == 1
        if flat_path:
            # single-model-shard fast path: a flat (C, 3C) contraction lets XLA
            # pick the natural row-major (B, S, 3C) output layout the kernel
            # reads — the "bstd" form below makes XLA relayout-copy the whole
            # (B, S, 3, C) tensor at the kernel boundary (~2.7 ms/layer at
            # B=32, measured). The reshape to (B, S, 3, C) is a free bitcast.
            qkv4 = jnp.einsum(
                "bsc,cd->bsd", x.reshape(b, s, c).astype(self.dtype),
                qkv_kernel.reshape(c, 3 * c).astype(self.dtype), precision=self.precision,
            ).reshape(b, s, 3, c)
        else:
            qkv4 = jnp.einsum(
                "bsc,ctd->bstd", x.reshape(b, s, c).astype(self.dtype),
                qkv_kernel.astype(self.dtype), precision=self.precision,
            )
        if qkv_bias is not None and not use_qkv_rel_kernel:
            # the kernel path adds the bias in VMEM (a standalone (B, S, 3C)
            # HBM bias pass costs ~0.5 ms/layer at B=32); fallbacks add it here
            qkv4 = qkv4 + qkv_bias.astype(self.dtype)

        rel_params = None
        if cfg.use_relative_position_embeddings:
            rel_pos_h = self.param("rel_pos_h", _trunc_normal(cfg.initializer_range), (2 * gh - 1, hd), jnp.float32)
            rel_pos_w = self.param("rel_pos_w", _trunc_normal(cfg.initializer_range), (2 * gw - 1, hd), jnp.float32)
            rel_params = (rel_pos_h.astype(self.dtype), rel_pos_w.astype(self.dtype))

        if use_qkv_rel_kernel:
            # transpose-free path: the kernel reads q/k/v as 128-lane slices
            # of the fused qkv output and writes the merged (B, S, C) layout
            # directly — the (3, B·nH, S, hd) head split below costs ~3 ms of
            # HBM copies per layer at B=32 and exists only for the fallbacks.
            # The rel-pos bias TERMS are produced inside the kernel from the
            # (tiny, jit-constant) interpolated tables: producing them outside
            # cost ~3 ms/layer of batch-major einsum transposes at B=32.
            from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv_rel

            bias_arr = (
                qkv_bias.astype(self.dtype)
                if qkv_bias is not None
                else jnp.zeros((3, c), self.dtype)
            )
            rh_tab, rw_tab = rel_tables_padded(*rel_params, (gh, gw), (gh, gw))
            out = fused_attention_qkv_rel(qkv4, bias_arr, rh_tab, rw_tab, hd**-0.5, gw, nh).reshape(b, gh, gw, c)
        else:
            # (B, S, 3, nH, hd) → (3, B·nH, S, hd)
            qkv = qkv4.reshape(b, s, 3, nh, hd).transpose(2, 0, 3, 1, 4).reshape(3, b * nh, s, hd)
            q, k, v = qkv[0], qkv[1], qkv[2]
            rel_h = rel_w = None
            if rel_params is not None:
                rel_h, rel_w = rel_pos_terms(q, *rel_params, (gh, gw), (gh, gw), self.precision)
            if use_fused and rel_h is not None:
                from beach_seg_tpu.ops.pallas_attn import fused_attention_merged

                out = fused_attention_merged(
                    q,
                    k,
                    v,
                    rel_h.reshape(b * nh, s, gh),
                    rel_w.reshape(b * nh, s, gw),
                    hd**-0.5,
                    gh,
                    gw,
                    nh,
                ).reshape(b, gh, gw, c)
            else:
                out = attention_reference(q, k, v, rel_h, rel_w, hd**-0.5, self.precision)
                out = out.reshape(b, nh, gh, gw, hd).transpose(0, 2, 3, 1, 4).reshape(b, gh, gw, c)

        proj_kernel = self.param("proj_kernel", _trunc_normal(cfg.initializer_range), (c, c), jnp.float32)
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (c,), jnp.float32)
        return jnp.dot(out, proj_kernel.astype(self.dtype), precision=self.precision) + proj_bias.astype(self.dtype)


def _gelu(h: jnp.ndarray, dtype: Any) -> jnp.ndarray:
    """GELU matched to the compute-dtype policy.

    fp32 compute keeps the exact erf form (HF modeling_seggpt.py uses
    ACT2FN["gelu"] = erf), preserving the <=2e-4 torch parity target. Under
    bf16 compute the erf pass costs ~3.1 ms/layer of fp32 VPU time on v5e
    (measured) while the tanh approximation costs ~0.24 ms; its <=1.5e-3
    absolute deviation is far below the bf16 rounding floor already accepted
    on that path, so bf16 uses the tanh form."""
    exact = dtype != jnp.bfloat16
    return jax.nn.gelu(h.astype(jnp.float32), approximate=not exact).astype(dtype)


class Mlp(nn.Module):
    config: SegGPTConfig
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln_params=None) -> jnp.ndarray:
        cfg = self.config
        ln_eps = cfg.layer_norm_eps  # single source of truth (ADVICE r3)
        k1 = self.param("lin1_kernel", _trunc_normal(cfg.initializer_range), (cfg.hidden_size, cfg.mlp_dim), jnp.float32)
        b1 = self.param("lin1_bias", nn.initializers.zeros, (cfg.mlp_dim,), jnp.float32)
        k2 = self.param("lin2_kernel", _trunc_normal(cfg.initializer_range), (cfg.mlp_dim, cfg.hidden_size), jnp.float32)
        b2 = self.param("lin2_bias", nn.initializers.zeros, (cfg.hidden_size,), jnp.float32)
        if ln_params is not None:
            # bf16 fast path: LN+Lin1+GELU+Lin2 in one Pallas launch with
            # VMEM-resident weights — XLA's mega-fusion of the same ops runs
            # at ~116 TF/s (7.3 ms/layer at B=32); see ops/pallas_mlp.py
            from beach_seg_tpu.ops.pallas_mlp import fused_ln_mlp

            ln_scale, ln_bias = ln_params
            return fused_ln_mlp(
                x,
                ln_scale,
                ln_bias,
                k1.astype(self.dtype),
                b1.astype(self.dtype),
                k2.astype(self.dtype),
                b2.astype(self.dtype),
                ln_eps,
                self.dtype == jnp.bfloat16,
            )
        h = jnp.dot(x, k1.astype(self.dtype), precision=self.precision) + b1.astype(self.dtype)
        h = _gelu(h, self.dtype)
        return jnp.dot(h, k2.astype(self.dtype), precision=self.precision) + b2.astype(self.dtype)


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray | None = None, return_params: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if return_params:
            # expose the params for a caller-side fusion (Block's fused
            # LN+MLP kernel) without disturbing the parameter tree
            return scale, bias
        return _layer_norm(x, scale, bias, self.eps)


def _drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth per sample (HF modeling_seggpt.py:368-385)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class Block(nn.Module):
    """Pre-LN transformer block with optional feature-ensemble averaging
    (HF SegGptLayer, modeling_seggpt.py:403-447)."""

    config: SegGPTConfig
    drop_path_rate: float
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ensemble_cond: int,
        feature_ensemble: bool = False,
        deterministic: bool = True,
        ensemble_groups: int = 1,
        streams: int = 2,
    ) -> jnp.ndarray:
        cfg = self.config
        ln_before = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, name="layernorm_before")
        attn = Attention(cfg, self.dtype, self.precision, self.attn_impl, name="attention")
        # (a fused LN→qkv-projection variant mirroring the LN+MLP hand-off
        # below was measured a dead tie at the headline — 62.31 vs 62.32
        # tiles/s, BENCHMARKS.md round 3 — and retired in round 5: XLA
        # already hides the LN pass behind the projection at this geometry)
        attn_out = attn(ln_before(x))

        # ``streams`` is the PHYSICAL stream count of the batch (2 until the
        # pixel/mask merge at merge_index has been applied — the merge happens
        # after the block at merge_index, whose ensemble_cond is already 1).
        per_group = x.shape[0] // (streams * ensemble_groups)
        if feature_ensemble and streams * per_group // 2 >= ensemble_cond:
            # Average the query (bottom) half of the canvas across the prompt
            # ensemble. ``ensemble_groups`` generalizes the HF semantics
            # (modeling_seggpt.py:426-436, = one group): the batch holds G
            # independent ensembles of P prompts each, rows group-major, and
            # the mean stays within each group — this keeps the batch axis
            # data-shardable for multi-query zero-shot inference (one fused
            # program instead of a vmap over the kernels' shard_map islands).
            half_h = attn_out.shape[1] // 2
            prompt_part, query_part = attn_out[:, :half_h], attn_out[:, half_h:]
            if ensemble_cond == 2:
                # pre-merge: pixel / mask streams ensembled independently
                qp = query_part.reshape(2 * ensemble_groups, per_group, -1)
                qp = jnp.broadcast_to(qp.mean(axis=1, keepdims=True), qp.shape)
            elif streams == 2:
                # HF quirk parity: AT merge_index the cond-1 average runs
                # while the batch still carries both streams, so the mean
                # spans the pixel AND mask rows of each ensemble
                # (modeling_seggpt.py else-branch: mean(dim=0) over the full
                # 2P batch at G=1)
                qp = query_part.reshape(2, ensemble_groups, per_group, -1)
                qp = jnp.broadcast_to(qp.mean(axis=(0, 2), keepdims=True), qp.shape)
            else:
                qp = query_part.reshape(ensemble_groups, per_group, -1)
                qp = jnp.broadcast_to(qp.mean(axis=1, keepdims=True), qp.shape)
            query_part = qp.reshape(query_part.shape)
            attn_out = jnp.concatenate([prompt_part, query_part], axis=1)

        rng1 = rng2 = None
        if not deterministic and self.drop_path_rate > 0.0:
            rng1 = self.make_rng("droppath")
            rng2 = self.make_rng("droppath")
        x = x + _drop_path(attn_out, self.drop_path_rate, deterministic, rng1)
        ln_after = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, name="layernorm_after")
        mlp = Mlp(cfg, self.dtype, self.precision, name="mlp")
        if self.dtype == jnp.bfloat16:
            mlp_out = mlp(x, ln_params=ln_after(return_params=True))
        else:
            mlp_out = mlp(ln_after(x))
        return x + _drop_path(mlp_out, self.drop_path_rate, deterministic, rng2)


class Encoder(nn.Module):
    """24-layer ViT with pixel/mask stream merge at ``merge_index`` and
    LayerNormed intermediate collection (HF SegGptEncoder :450-507)."""

    config: SegGPTConfig
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        feature_ensemble: bool = False,
        deterministic: bool = True,
        ensemble_groups: int = 1,
    ) -> list[jnp.ndarray]:
        cfg = self.config
        # torch.linspace in fp32 — match elementwise for drop-path parity.
        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.num_hidden_layers, dtype=np.float32)
        final_ln = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, name="layernorm")
        intermediates = []
        # remat: recompute each block in backward — peak activation memory for
        # prompt-tuning backprop drops from 24 layers to 1 (trade FLOPs for HBM)
        block_cls = nn.remat(Block, static_argnums=(2, 3, 4, 5, 6)) if self.remat else Block
        for i in range(cfg.num_hidden_layers):
            ensemble_cond = 2 if cfg.merge_index > i else 1
            streams = 2 if cfg.merge_index >= i else 1
            x = block_cls(cfg, float(dpr[i]), self.dtype, self.precision, self.attn_impl, name=f"layers_{i}")(
                x, ensemble_cond, feature_ensemble, deterministic, ensemble_groups, streams
            )
            if i == cfg.merge_index:
                half = x.shape[0] // 2
                x = (x[:half] + x[half:]) * 0.5
            if i in cfg.intermediate_hidden_state_indices:
                intermediates.append(final_ln(x))
        return intermediates


class Decoder(nn.Module):
    """Intermediate-concat → Linear → pixel-shuffle → Conv3×3+LN+GELU+Conv1×1
    (HF SegGptDecoder :537-591). NHWC throughout."""

    config: SegGPTConfig
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        p, dh = cfg.patch_size, cfg.decoder_hidden_size
        b, gh, gw, cin = feats.shape
        embed_kernel = self.param("embed_kernel", _trunc_normal(cfg.initializer_range), (cin, p * p * dh), jnp.float32)
        embed_bias = self.param("embed_bias", nn.initializers.zeros, (p * p * dh,), jnp.float32)
        h = jnp.dot(feats, embed_kernel.astype(self.dtype), precision=self.precision) + embed_bias.astype(self.dtype)

        conv_kernel = self.param("conv_kernel", _trunc_normal(cfg.initializer_range), (3, 3, dh, dh), jnp.float32)
        conv_bias = self.param("conv_bias", nn.initializers.zeros, (dh,), jnp.float32)
        # A fused pixel-shuffle+Conv3×3+LN+GELU+head Pallas kernel was
        # benchmarked here across three rounds (in-kernel shuffle and XLA
        # pre-shuffle variants) and retired: final A/B on v5e at B=32 was
        # 39.2 ms fused vs 39.0 ms for this XLA chain — Mosaic relayout
        # costs eat the fusion win. See BENCHMARKS.md "decoder tail".
        # pixel shuffle: (B, gh, gw, p, p, dh) → (B, gh·p, gw·p, dh)
        h = h.reshape(b, gh, gw, p, p, dh).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, dh)

        h = jax.lax.conv_general_dilated(
            h.astype(self.dtype),
            conv_kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        ) + conv_bias.astype(self.dtype)
        h = LayerNorm(dh, cfg.layer_norm_eps, name="layernorm")(h)
        h = _gelu(h, self.dtype)

        head_kernel = self.param("head_kernel", _trunc_normal(cfg.initializer_range), (dh, 3), jnp.float32)
        head_bias = self.param("head_bias", nn.initializers.zeros, (3,), jnp.float32)
        return jnp.dot(h, head_kernel.astype(self.dtype), precision=self.precision) + head_bias.astype(self.dtype)


def default_bool_masked_pos(config: SegGPTConfig, batch: int) -> jnp.ndarray:
    """Mask the bottom (query) half of the canvas (HF :926-934)."""
    n = config.num_patches
    m = jnp.concatenate([jnp.zeros((n // 2,), jnp.bool_), jnp.ones((n - n // 2,), jnp.bool_)])
    return jnp.broadcast_to(m[None, :], (batch, n))


def seggpt_loss(
    config: SegGPTConfig,
    prompt_masks: jnp.ndarray,
    pred_masks: jnp.ndarray,
    labels: jnp.ndarray,
    bool_masked_pos: jnp.ndarray,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Smooth-L1 on masked patches (HF SegGptLoss :804-843). NHWC.

    ``sample_weight`` (B,) optionally down-weights rows — used by the trainer
    to zero padded batch rows so they contribute nothing to loss/gradients.
    """
    ground_truth = jnp.concatenate([prompt_masks, labels], axis=1)
    b, h2, w, c = ground_truth.shape
    p = config.patch_size
    gh, gw = h2 // p, w // p
    mask = bool_masked_pos.reshape(b, gh, gw, 1, 1, 1).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (b, gh, gw, p, p, c)).transpose(0, 1, 3, 2, 4, 5).reshape(b, h2, w, c)
    if sample_weight is not None:
        mask = mask * sample_weight.astype(jnp.float32).reshape(b, 1, 1, 1)
    diff = (pred_masks - ground_truth).astype(jnp.float32)
    beta = config.beta
    l1 = jnp.abs(diff)
    loss = jnp.where(l1 < beta, 0.5 * diff * diff / beta, l1 - 0.5 * beta)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class SegGPT(nn.Module):
    """Full model: canvas assembly → embeddings → encoder → decoder.

    Returns ``pred_masks`` (B, 2H, W, 3) NHWC painted canvas, plus the loss
    when ``labels`` is given.
    """

    config: SegGPTConfig
    dtype: Any = jnp.float32
    precision: Any = None
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        prompt_pixel_values: jnp.ndarray,
        prompt_masks: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        bool_masked_pos: Optional[jnp.ndarray] = None,
        feature_ensemble: bool = False,
        embedding_type: str = "instance",
        deterministic: bool = True,
        decode_query_only: bool = False,
        ensemble_groups: int = 1,
    ):
        cfg = self.config
        pixel_canvas = jnp.concatenate([prompt_pixel_values, pixel_values], axis=1)
        mask_canvas = jnp.concatenate([prompt_masks, labels if labels is not None else prompt_masks], axis=1)
        if bool_masked_pos is None:
            bool_masked_pos = default_bool_masked_pos(cfg, pixel_canvas.shape[0])

        x = Embeddings(cfg, self.dtype, name="embeddings")(
            pixel_canvas.astype(self.dtype), mask_canvas.astype(self.dtype), bool_masked_pos, embedding_type
        )
        intermediates = Encoder(cfg, self.dtype, self.precision, self.attn_impl, self.remat, name="encoder")(
            x, feature_ensemble, deterministic, ensemble_groups
        )
        feats = jnp.concatenate(intermediates, axis=-1)
        decoder = Decoder(cfg, self.dtype, self.precision, name="decoder")
        if decode_query_only:
            # The prompt (top) half of the painted canvas is discarded by every
            # consumer (loss masks it, post-process takes the bottom half), so
            # skip decoding it: run the decoder on the query patch rows plus a
            # one-row halo for the 3×3 conv, then drop the halo — bitwise equal
            # to the bottom half of a full decode. ~45% less decoder compute.
            gh = feats.shape[1]
            half = gh // 2
            out = decoder(feats[:, half - 1 :]).astype(jnp.float32)  # (B, H+p, W, 3)
            p = cfg.patch_size
            top = jnp.zeros_like(out, shape=(out.shape[0], (half) * p, out.shape[2], 3))
            pred_masks = jnp.concatenate([top, out[:, p:]], axis=1)
        else:
            pred_masks = decoder(feats).astype(jnp.float32)

        loss = None
        if labels is not None:
            loss = seggpt_loss(cfg, prompt_masks, pred_masks, labels, bool_masked_pos)
        return {"pred_masks": pred_masks, "loss": loss}
