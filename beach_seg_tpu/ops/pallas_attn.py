"""Fused attention-with-rel-pos Pallas kernel — the framework's hot op.

SegGPT runs 24 layers of GLOBAL attention over the 56×28=1568-token canvas
with MViTv2 decomposed relative-position bias (HF modeling_seggpt.py:210-351).
The XLA formulation materializes the (B·heads, S, S) score/probability tensors
in HBM between the bias add, the fp32 softmax and the PV matmul — at S=1568
that's ~10 MB per (batch, head) slice round-tripped several times per layer,
and the op is HBM-bound.

This kernel streams each q-block through VMEM and never writes scores to HBM:

    scores = (q·Kᵀ)·scale + rel_h[q, kh] + rel_w[q, kw]   (fp32, in VMEM)
    out    = softmax(scores) · V

The decomposed bias terms rel_h (BH, S, Hk) and rel_w (BH, S, Wk) are tiny
(~100 KB) and are computed outside with einsums (MXU work). Inside the kernel
the (BQ, S) score block is reshaped to (BQ, Hk, Wk) for the broadcast add —
a VMEM relayout, no HBM traffic.

Training uses ``jax.custom_vjp``: forward = this kernel, backward = XLA
recompute (attention is recomputed from the residuals; prompt-tuning backprop
touches attention only through activations, and the recompute keeps peak HBM
flat — the same trade ``jax.checkpoint`` makes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beach_seg_tpu.ops.attention import attention_reference
from beach_seg_tpu.ops.sharding import data_sharded_call


def _pick_block(s: int, target: int = 784) -> int:
    """Largest divisor of ``s`` that is ≤ target and a multiple of 8 (sublane),
    falling back to ``s`` itself."""
    best = s
    for d in range(1, s + 1):
        if s % d:
            continue
        blk = s // d
        if blk <= target and blk % 8 == 0:
            return blk
    return best


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, out_ref, *, scale: float):
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]  # (S, D)
    scores = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    # decomposed rel-pos bias: scores[q, kh·Wk + kw] += rh[q, kh] + rw[q, kw].
    # Mosaic can't lane-split (BQ, S) → (BQ, Hk, Wk), so the broadcast-add is
    # expressed as two 0/1 expansion matmuls (tiny MXU work, exact in fp32):
    #   bias = rh @ Eh + rw @ Ew,  Eh[h, k] = [k // Wk == h], Ew[w, k] = [k % Wk == w]
    scores = scores + jax.lax.dot_general(
        rh_ref[0], eh_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + jax.lax.dot_general(
        rw_ref[0], ew_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (BH, S, D); rel_h: (BH, S, Hk); rel_w: (BH, S, Wk)."""
    bh, s, d = q.shape
    hk = rel_h.shape[-1]
    wk = rel_w.shape[-1]
    assert hk * wk == s, (hk, wk, s)
    bq = _pick_block(s)
    grid = (bh, s // bq)
    kernel = functools.partial(_kernel, scale=scale)
    # 0/1 expansion matrices for the decomposed bias (constant-folded by XLA).
    # Same dtype as q: a mixed bf16×f32 dot would fall back to the fp32 MXU
    # rate; 0/1 values are exact in bf16.
    ks = jnp.arange(s)
    eh = (ks[None, :] // wk == jnp.arange(hk)[:, None]).astype(q.dtype)  # (Hk, S)
    ew = (ks[None, :] % wk == jnp.arange(wk)[:, None]).astype(q.dtype)  # (Wk, S)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, wk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, s), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wk, s), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * s * s * d * 2,
            bytes_accessed=bh * s * d * 4 * 4,
            transcendentals=bh * s * s,
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, eh, ew)


def _kernel_packed(q_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, *, scale: float, wk: int, dp: int):
    """Packed-contraction attention, fully assembled in VMEM.

    qh = [q·scale ‖ rel_h ‖ 0] against kh = [k ‖ onehot(j//Wk) ‖ 0] — one MXU
    matmul yields q·kᵀ·scale + rel_h[q, j//Wk]: the extra Hk=56 contraction
    lanes ride the 64→128 padding the MXU applies to head_dim=64 anyway, so
    the rel_h bias is FREE. The onehot matrix is iota-generated here and the
    concatenation happens in VMEM — packing in HBM (the previous revision)
    round-trips 2×(BH,S,128) arrays through HBM per layer, ~1.3 ms at B=32.
    rel_w enters through a second 0/1 expansion matmul rw @ Ew with
    Ew[w, j] = [j % Wk == w]: a 28(→128)-lane contraction is one extra MXU
    pass, 2.1× cheaper than the lane-tiled VPU repeat it replaces (measured
    10.5 → 7.3 ms per layer-call end-to-end at B=32, S=1568)."""
    qb = q_ref[0]  # (BQ, D)
    kb = k_ref[0]  # (S, D)
    vb = v_ref[0]  # (S, D)
    s, d = kb.shape
    rhb = rh_ref[0].astype(qb.dtype)  # (BQ, Hk)
    hk = rhb.shape[-1]
    bq = qb.shape[0]
    pad = [jnp.zeros((bq, dp - d - hk), qb.dtype)] if dp > d + hk else []
    qh = jnp.concatenate([qb * jnp.asarray(scale, qb.dtype), rhb] + pad, axis=-1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, hk), 0) // wk
    ci = jax.lax.broadcasted_iota(jnp.int32, (s, hk), 1)
    eh = (ri == ci).astype(kb.dtype)
    padk = [jnp.zeros((s, dp - d - hk), kb.dtype)] if dp > d + hk else []
    kh = jnp.concatenate([kb, eh] + padk, axis=-1)
    scores = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rj = jax.lax.broadcasted_iota(jnp.int32, (wk, s), 1) % wk
    cj = jax.lax.broadcasted_iota(jnp.int32, (wk, s), 0)
    ew = (rj == cj).astype(qb.dtype)
    rwb = rw_ref[0].astype(qb.dtype)
    scores = scores + jax.lax.dot_general(
        rwb, ew, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # softmax with the normalization deferred past the PV matmul: dividing the
    # (BQ, D) output instead of the (BQ, S) probabilities saves a full
    # S-wide VPU pass (exact same fp32 math — flash-attention trick)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    r = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = (out / r).astype(out_ref.dtype)


def _pallas_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    scale: float,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: (B·H, S, D); rel_h: (B·H, S, Hk); rel_w: (B·H, S, Wk).

    Returns (B, S, H·D) merged-head layout — the caller needs no transpose
    before the proj matmul (XLA folds the trailing reshape into the fusion)."""
    bh, s, d = q.shape
    hk = rel_h.shape[-1]
    wk = rel_w.shape[-1]
    assert hk * wk == s, (hk, wk, s)
    b = bh // num_heads
    dp = -(-(d + hk) // 128) * 128  # packed contraction dim, lane-aligned
    bq = _pick_block(s)
    grid = (bh, s // bq)
    kernel = functools.partial(_kernel_packed, scale=scale, wk=wk, dp=dp)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hk), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, wk), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * s * s * (dp + d),
            bytes_accessed=bh * s * 4 * d * 2,
            transcendentals=bh * s * s,
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)
    # merge heads back into channels; XLA folds this relayout into the
    # surrounding fusion (a (1,784,64) output block into a 1024-channel
    # array is below the Mosaic 128-lane store granularity, so the kernel
    # cannot scatter heads into the merged layout itself)
    return out.reshape(b, num_heads, s, d).transpose(0, 2, 1, 3).reshape(b, s, num_heads * d)


def _kernel_qkv(q_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, *, scale: float, wk: int, dp: int, hd: int):
    """Two-heads-per-block packed attention reading the fused qkv layout.

    Mosaic requires output blocks whose last dim is a multiple of 128 lanes,
    so one grid step processes a PAIR of 64-wide heads: the q/k/v blocks are
    128-lane slices of the (B, S, 3C) qkv matmul output (no HBM transpose
    anywhere), split into per-head halves in VMEM, and the two attention
    outputs concatenate back into a 128-lane store at the head pair's channel
    offset — the (B, S, C) merged layout falls out directly. Per-head math is
    identical to _kernel_packed."""
    qb2 = q_ref[0]  # (BQ, 2·hd)
    kb2 = k_ref[0]  # (S, 2·hd)
    vb2 = v_ref[0]  # (S, 2·hd)
    s = kb2.shape[0]
    bq = qb2.shape[0]
    hk = rh_ref.shape[-1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, hk), 0) // wk
    ci = jax.lax.broadcasted_iota(jnp.int32, (s, hk), 1)
    eh = (ri == ci).astype(kb2.dtype)
    rj = jax.lax.broadcasted_iota(jnp.int32, (wk, s), 1) % wk
    cj = jax.lax.broadcasted_iota(jnp.int32, (wk, s), 0)
    ew = (rj == cj).astype(qb2.dtype)
    halves = []
    for j in (0, 1):
        qb = qb2[:, j * hd : (j + 1) * hd]
        kb = kb2[:, j * hd : (j + 1) * hd]
        vb = vb2[:, j * hd : (j + 1) * hd]
        rhb = rh_ref[0, j].astype(qb.dtype)
        rwb = rw_ref[0, j].astype(qb.dtype)
        pad = [jnp.zeros((bq, dp - hd - hk), qb.dtype)] if dp > hd + hk else []
        qh = jnp.concatenate([qb * jnp.asarray(scale, qb.dtype), rhb] + pad, axis=-1)
        padk = [jnp.zeros((s, dp - hd - hk), kb.dtype)] if dp > hd + hk else []
        kh = jnp.concatenate([kb, eh] + padk, axis=-1)
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = scores + jax.lax.dot_general(
            rwb, ew, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        r = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        halves.append(out / r)
    out_ref[0] = jnp.concatenate(halves, axis=-1).astype(out_ref.dtype)


def _pallas_attention_qkv(
    qkv: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    scale: float,
    num_heads: int,
    interpret: bool = False,
    block_q: int = 784,
) -> jnp.ndarray:
    """qkv: (B, S, 3C) fused matmul output; rel_h: (B, nH, S, Hk); rel_w:
    (B, nH, S, Wk). Returns (B, S, C) merged-head attention output.

    Requires head_dim·2 == 128 (the ViT-L flagship: C=1024, 16 heads of 64).
    No transposes touch HBM on this path — the previous layout round-tripped
    (3, B·H, S, D) + the merge, ~3 ms/layer of pure copies at B=32."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    assert 2 * hd == 128 and c % 128 == 0, (c, num_heads)
    hk = rel_h.shape[-1]
    wk = rel_w.shape[-1]
    assert hk * wk == s, (hk, wk, s)
    dp = -(-(hd + hk) // 128) * 128
    bq = _pick_block(s, block_q)
    hp = num_heads // 2
    qblk = c // 128
    grid = (b, hp, s // bq)
    kernel = functools.partial(_kernel_qkv, scale=scale, wk=wk, dp=dp, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda g, h, i: (g, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda g, h, i: (g, 0, qblk + h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda g, h, i: (g, 0, 2 * qblk + h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bq, hk), lambda g, h, i: (g, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bq, wk), lambda g, h, i: (g, h, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda g, h, i: (g, i, h), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * s * s * (dp + hd),
            bytes_accessed=qkv.size * 2 + b * s * c * 2,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_attention_qkv(qkv, rel_h, rel_w, scale: float, hk: int, wk: int, num_heads: int):
    """Transpose-free fused attention on the (B, S, 3C) qkv layout.

    Forward = _pallas_attention_qkv. Backward unpacks to the per-head layout
    once (training path only) and reuses the flash-style backward kernel."""
    interpret = jax.default_backend() != "tpu"
    fn = lambda qkv, rh, rw: _pallas_attention_qkv(qkv, rh, rw, scale, num_heads, interpret=interpret)
    return data_sharded_call(fn, (qkv, rel_h, rel_w), (True, True, True))


def _qkv_fwd(qkv, rel_h, rel_w, scale, hk, wk, num_heads):
    out = fused_attention_qkv(qkv, rel_h, rel_w, scale, hk, wk, num_heads)
    return out, (qkv, rel_h, rel_w)


def _qkv_bwd(scale, hk, wk, num_heads, res, g):
    qkv, rel_h, rel_w = res
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    bh = b * num_heads
    split = qkv.reshape(b, s, 3, num_heads, hd).transpose(2, 0, 3, 1, 4).reshape(3, bh, s, hd)
    q, k, v = split[0], split[1], split[2]
    g = g.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3).reshape(bh, s, hd)
    interpret = jax.default_backend() != "tpu"
    bwd = lambda *a: _pallas_attention_bwd(*a, scale, interpret=interpret)
    dq, dk, dv, drh, drw = data_sharded_call(
        bwd, (q, k, v, rel_h.reshape(bh, s, hk), rel_w.reshape(bh, s, wk), g), (True,) * 6,
        batch_unit=num_heads,
    )
    dqkv = (
        jnp.stack([dq.astype(qkv.dtype), dk.astype(qkv.dtype), dv.astype(qkv.dtype)])
        .reshape(3, b, num_heads, s, hd)
        .transpose(1, 3, 0, 2, 4)
        .reshape(b, s, c3)
    )
    return (
        dqkv,
        drh.astype(rel_h.dtype).reshape(b, num_heads, s, hk),
        drw.astype(rel_w.dtype).reshape(b, num_heads, s, wk),
    )


fused_attention_qkv.defvjp(_qkv_fwd, _qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention_merged(q, k, v, rel_h, rel_w, scale: float, hk: int, wk: int, num_heads: int):
    """Packed-contraction fused attention returning merged (B, S, H·D).

    Forward = _pallas_attention_packed; backward = the flash-style kernel
    (_pallas_attention_bwd) on the (B·H, S, D) layout — the incoming
    cotangent is un-merged with one transpose (training path only)."""
    interpret = jax.default_backend() != "tpu"
    fn = lambda q, k, v, rh, rw: _pallas_attention_packed(q, k, v, rh, rw, scale, num_heads, interpret=interpret)
    return data_sharded_call(fn, (q, k, v, rel_h, rel_w), (True,) * 5, batch_unit=num_heads)


def _merged_fwd(q, k, v, rel_h, rel_w, scale, hk, wk, num_heads):
    out = fused_attention_merged(q, k, v, rel_h, rel_w, scale, hk, wk, num_heads)
    return out, (q, k, v, rel_h, rel_w)


def _merged_bwd(scale, hk, wk, num_heads, res, g):
    q, k, v, rel_h, rel_w = res
    bh, s, d = q.shape
    b = bh // num_heads
    g = g.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3).reshape(bh, s, d)
    interpret = jax.default_backend() != "tpu"
    bwd = lambda *a: _pallas_attention_bwd(*a, scale, interpret=interpret)
    dq, dk, dv, drh, drw = data_sharded_call(
        bwd, (q, k, v, rel_h, rel_w, g), (True,) * 6, batch_unit=num_heads
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), drh, drw


fused_attention_merged.defvjp(_merged_fwd, _merged_bwd)


def _reference_flat(q, k, v, rel_h, rel_w, scale, hk, wk):
    """attention_reference with the kernel's flattened rel-term layout."""
    bh, s, _ = q.shape
    hq = hk
    wq = wk
    rh = rel_h.reshape(bh, hq, wq, hk)
    rw = rel_w.reshape(bh, hq, wq, wk)
    return attention_reference(q, k, v, rh, rw, scale)


def _bwd_kernel(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, g_ref, eh_ref, ew_ref,
    dq_ref, dk_ref, dv_ref, drh_ref, drw_ref,
    *, scale: float,
):
    """Flash-style backward: recompute P per q-block in VMEM, accumulate
    dK/dV across q-blocks via output-block revisiting (index_map constant in
    the q dimension, init at i==0)."""
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)

    # recompute probabilities (same math as the forward kernel)
    scores = (
        jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )
    scores = scores + jax.lax.dot_general(
        rh_ref[0], eh_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + jax.lax.dot_general(
        rw_ref[0], ew_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(scores, axis=-1)  # (BQ, S) f32

    # dV += Pᵀ g
    dv_blk = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dP = g Vᵀ ; dS = P ∘ (dP - rowsum(dP ∘ P))
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (BQ, S) f32

    dq_ref[0] = (
        jax.lax.dot_general(ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    ).astype(dq_ref.dtype)
    dk_blk = (
        jax.lax.dot_general(ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )
    drh_ref[0] = jax.lax.dot_general(
        ds, eh_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(drh_ref.dtype)
    drw_ref[0] = jax.lax.dot_general(
        ds, ew_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(drw_ref.dtype)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(i > 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_blk.astype(dv_ref.dtype)


def _pallas_attention_bwd(q, k, v, rel_h, rel_w, g, scale: float, interpret: bool = False):
    bh, s, d = q.shape
    hk = rel_h.shape[-1]
    wk = rel_w.shape[-1]
    # smaller q-blocks than forward: backward keeps three (BQ, S) f32 buffers
    # (p, dp, ds) live at once and 784 blows the 16 MB VMEM budget
    bq = _pick_block(s, target=392)
    grid = (bh, s // bq)
    ks = jnp.arange(s)
    eh = (ks[None, :] // wk == jnp.arange(hk)[:, None]).astype(q.dtype)
    ew = (ks[None, :] % wk == jnp.arange(wk)[:, None]).astype(q.dtype)
    kernel = functools.partial(_bwd_kernel, scale=scale)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, wk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, s), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wk, s), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, wk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, d), f32),  # dK accumulates across blocks
            jax.ShapeDtypeStruct((bh, s, d), f32),  # dV accumulates across blocks
            jax.ShapeDtypeStruct((bh, s, hk), rel_h.dtype),
            jax.ShapeDtypeStruct((bh, s, wk), rel_w.dtype),
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, g, eh, ew)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention(q, k, v, rel_h, rel_w, scale: float, hk: int, wk: int):
    """Fused forward + flash-style backward. Shapes as _pallas_attention."""
    interpret = jax.default_backend() != "tpu"
    return _pallas_attention(q, k, v, rel_h, rel_w, scale, interpret=interpret)


def _fwd(q, k, v, rel_h, rel_w, scale, hk, wk):
    return fused_attention(q, k, v, rel_h, rel_w, scale, hk, wk), (q, k, v, rel_h, rel_w)


def _bwd(scale, hk, wk, res, g):
    q, k, v, rel_h, rel_w = res
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv, drh, drw = _pallas_attention_bwd(
        q, k, v, rel_h, rel_w, g, scale, interpret=interpret
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), drh, drw


fused_attention.defvjp(_fwd, _bwd)
