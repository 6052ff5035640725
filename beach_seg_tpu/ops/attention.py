"""Global self-attention with MViTv2 decomposed relative position bias.

This is the hot kernel of the framework: 24 layers × global attention over the
56×28=1568-token prompt‖query canvas (ref: HF modeling_seggpt.py:210-351, the
device-side graph SURVEY.md §3.4). Two implementations:

  - ``attention_reference``: pure-XLA einsum formulation. XLA fuses the bias
    add + fp32 softmax well; this is also the numerics oracle.
  - ``attention_pallas``: fused flash-style Pallas kernel (see pallas_attn.py)
    that streams K/V blocks through VMEM and applies the decomposed rel-pos
    bias inside the kernel, avoiding the (B·heads, S, S) bias materialization
    in HBM.

Decomposition: ``bias[q, k] = q_vec·Rh[qh, kh] + q_vec·Rw[qw, kw]`` — we
precompute the two small terms (B*, Hq, Wq, Hk) and (B*, Hq, Wq, Wk) with
einsums (MXU work, tiny) and form the full bias lazily.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beach_seg_tpu.ops.resize import resize_1d


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """(L, head_dim) table → (q_size, k_size, head_dim) lookup.

    Matches HF modeling_seggpt.py:237-267: linear-interpolate the table to
    2*max(q,k)-1 entries, then index by scaled relative coordinates.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = resize_1d(rel_pos, max_rel_dist, "linear_torch")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def rel_pos_terms(
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: tuple[int, int],
    k_hw: tuple[int, int],
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decomposed rel-pos bias terms.

    q: (B*, S_q, head_dim) → returns rel_h (B*, Hq, Wq, Hk), rel_w (B*, Hq, Wq, Wk).
    """
    hq, wq = q_hw
    hk, wk = k_hw
    rh = get_rel_pos(hq, hk, rel_pos_h)
    rw = get_rel_pos(wq, wk, rel_pos_w)
    qr = q.reshape(q.shape[0], hq, wq, q.shape[-1])
    rel_h = jnp.einsum("bhwc,hkc->bhwk", qr, rh, precision=precision)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", qr, rw, precision=precision)
    return rel_h, rel_w


def rel_pos_terms_heads(
    q4: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: tuple[int, int],
    k_hw: tuple[int, int],
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decomposed rel-pos terms straight from the fused qkv layout.

    q4: (B, Hq, Wq, nH, head_dim) — a free reshape of the qkv matmul's q
    columns, NO head transpose. Returns rel_h (B, nH, S, Hk) and rel_w
    (B, nH, S, Wk), the per-head-pair block layout the qkv-direct Pallas
    kernel consumes (pallas_attn._pallas_attention_qkv)."""
    hq, wq = q_hw
    hk, wk = k_hw
    b, _, _, nh, _ = q4.shape
    rh = get_rel_pos(hq, hk, rel_pos_h)
    rw = get_rel_pos(wq, wk, rel_pos_w)
    rel_h = jnp.einsum("byxnc,ykc->bnyxk", q4, rh, precision=precision)
    rel_w = jnp.einsum("byxnc,xkc->bnyxk", q4, rw, precision=precision)
    return rel_h.reshape(b, nh, hq * wq, hk), rel_w.reshape(b, nh, hq * wq, wk)


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray | None,
    rel_w: jnp.ndarray | None,
    scale: float,
    precision=None,
) -> jnp.ndarray:
    """XLA attention. q/k/v: (B*, S, head_dim); rel terms from rel_pos_terms.

    Softmax is computed in fp32 regardless of input dtype (parity with HF
    modeling_seggpt.py:332).
    """
    b, s_q, _ = q.shape
    s_k = k.shape[1]
    attn = jnp.einsum("bqc,bkc->bqk", q * scale, k, precision=precision)
    if rel_h is not None:
        hq, wq, hk = rel_h.shape[1], rel_h.shape[2], rel_h.shape[3]
        wk = rel_w.shape[3]
        attn = attn.reshape(b, hq, wq, hk, wk)
        attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
        attn = attn.reshape(b, s_q, s_k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkc->bqc", attn, v, precision=precision)
