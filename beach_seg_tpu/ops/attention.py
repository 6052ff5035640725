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


def rel_pos_terms_split(
    q4: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: tuple[int, int],
    k_hw: tuple[int, int],
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decomposed rel-pos terms in the qkv kernel's per-head 64-lane layout.

    q4: (B, Hq, Wq, nH, head_dim) — a free reshape of the qkv matmul's q
    columns. Returns ``rel_h64`` and ``rel_w64``, each (B, S, nH·64): head
    n's 64-lane slot holds its Hk (resp. Wk) bias values zero-padded to 64.

    Why this layout: the einsums keep the output in (b, y, x, n, k) order, so
    no n↔s relayout is needed (the previous (B, nH, S, K) layout cost
    ~3.3 ms/layer of pure transposes at B=32 on v5e), and the zero-padding
    rides the STATIONARY rel tables (hq, 64, hd) — padded once, before the
    einsum — so each einsum's (b, y, x, n, 64) output is stored exactly once:
    no pad copy, no concat materialization (a fused single (B, S, nH·128)
    output measured +2 ms/layer of XLA copies over the sum of its parts).
    The Pallas kernel reads head-pair 128-lane blocks of each array directly
    (pallas_attn._pallas_attention_qkv)."""
    hq, wq = q_hw
    hk, wk = k_hw
    assert hk <= 64 and wk <= 64, (hk, wk)
    b, _, _, nh, _ = q4.shape
    rh = get_rel_pos(hq, hk, rel_pos_h)  # (hq, hk, hd)
    rw = get_rel_pos(wq, wk, rel_pos_w)  # (wq, wk, hd)
    rh = jnp.pad(rh, ((0, 0), (0, 64 - hk), (0, 0)))
    rw = jnp.pad(rw, ((0, 0), (0, 64 - wk), (0, 0)))
    rel_h = jnp.einsum("byxnc,ykc->byxnk", q4, rh, precision=precision)
    rel_w = jnp.einsum("byxnc,xkc->byxnk", q4, rw, precision=precision)
    return rel_h.reshape(b, hq * wq, nh * 64), rel_w.reshape(b, hq * wq, nh * 64)


def rel_tables_padded(
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: tuple[int, int],
    k_hw: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interpolated rel-pos lookup tables, zero-padded to 64 key slots —
    the operands of the rel-in-kernel attention path
    (pallas_attn.fused_attention_qkv_rel). Returns (Hq, 64, hd), (Wq, 64, hd).

    Tiny (≤1 MB) and input-independent: under jit these fold to constants,
    so the whole per-layer rel-term production happens inside the kernel."""
    hq, wq = q_hw
    hk, wk = k_hw
    assert hk <= 64 and wk <= 64, (hk, wk)
    rh = get_rel_pos(hq, hk, rel_pos_h)  # (hq, hk, hd)
    rw = get_rel_pos(wq, wk, rel_pos_w)  # (wq, wk, hd)
    return (
        jnp.pad(rh, ((0, 0), (0, 64 - hk), (0, 0))),
        jnp.pad(rw, ((0, 0), (0, 64 - wk), (0, 0))),
    )


def pack_rel_terms(rel_h: jnp.ndarray, rel_w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, nH, S, Hk) + (B, nH, S, Wk) → the two (B, S, nH·64) padded arrays
    (test/compat helper; the model produces the layout directly via
    ``rel_pos_terms_split``)."""
    b, nh, s, hk = rel_h.shape
    wk = rel_w.shape[-1]
    rh = jnp.pad(rel_h, ((0, 0), (0, 0), (0, 0), (0, 64 - hk))).transpose(0, 2, 1, 3)
    rw = jnp.pad(rel_w, ((0, 0), (0, 0), (0, 0), (0, 64 - wk))).transpose(0, 2, 1, 3)
    return rh.reshape(b, s, nh * 64), rw.reshape(b, s, nh * 64)


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
