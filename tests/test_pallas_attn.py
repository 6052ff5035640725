"""Fused attention kernel vs the XLA oracle: forward + gradients
(interpret mode on CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.ops.attention import attention_reference, rel_pos_terms
from beach_seg_tpu.ops.pallas_attn import _pick_block, fused_attention


@pytest.fixture(scope="module")
def attn_inputs():
    rng = np.random.default_rng(0)
    bh, gh, gw, d = 4, 8, 4, 32
    s = gh * gw
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    rel_pos_h = jnp.asarray(rng.standard_normal((2 * gh - 1, d)), jnp.float32)
    rel_pos_w = jnp.asarray(rng.standard_normal((2 * gw - 1, d)), jnp.float32)
    rel_h, rel_w = rel_pos_terms(q, rel_pos_h, rel_pos_w, (gh, gw), (gh, gw))
    return q, k, v, rel_h, rel_w, gh, gw, d


def test_fused_matches_reference(attn_inputs):
    q, k, v, rel_h, rel_w, gh, gw, d = attn_inputs
    s = gh * gw
    scale = d**-0.5
    ref = attention_reference(q, k, v, rel_h, rel_w, scale)
    got = fused_attention(
        q, k, v, rel_h.reshape(-1, s, gh), rel_w.reshape(-1, s, gw), scale, gh, gw
    )
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


def test_fused_gradients_match(attn_inputs):
    q, k, v, rel_h, rel_w, gh, gw, d = attn_inputs
    s = gh * gw
    scale = d**-0.5
    rh = rel_h.reshape(-1, s, gh)
    rw = rel_w.reshape(-1, s, gw)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, rh, rw, scale, gh, gw) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, rel_h, rel_w, scale) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_fused_no_relpos_fallback(attn_inputs):
    """Without rel-pos the model must use the XLA path (kernel needs the terms)."""
    q, k, v, *_ , d = attn_inputs
    out = attention_reference(q, k, v, None, None, d**-0.5)
    assert out.shape == q.shape


def test_pick_block():
    assert _pick_block(1568) == 784
    assert 1568 % _pick_block(1568) == 0
    assert _pick_block(32) == 32
    assert _pick_block(8) == 8
    assert _pick_block(1024) == 512 or _pick_block(1024) == 256


def test_packed_merged_matches_reference(attn_inputs):
    """fused_attention_merged: packed-contraction forward, merged (B,S,H·D) out."""
    from beach_seg_tpu.ops.pallas_attn import fused_attention_merged

    q, k, v, rel_h, rel_w, gh, gw, d = attn_inputs
    s = gh * gw
    bh = q.shape[0]
    nh = 2
    b = bh // nh
    scale = d**-0.5
    ref = attention_reference(q, k, v, rel_h, rel_w, scale)  # (BH, S, D)
    ref_merged = ref.reshape(b, nh, s, d).transpose(0, 2, 1, 3).reshape(b, s, nh * d)
    got = fused_attention_merged(
        q, k, v, rel_h.reshape(-1, s, gh), rel_w.reshape(-1, s, gw), scale, gh, gw, nh
    )
    assert got.shape == (b, s, nh * d)
    assert np.abs(np.asarray(ref_merged) - np.asarray(got)).max() < 1e-5


def test_packed_merged_gradients_match(attn_inputs):
    from beach_seg_tpu.ops.pallas_attn import fused_attention_merged

    q, k, v, rel_h, rel_w, gh, gw, d = attn_inputs
    s = gh * gw
    nh = 2
    scale = d**-0.5
    rh = rel_h.reshape(-1, s, gh)
    rw = rel_w.reshape(-1, s, gw)

    def loss_packed(q, k, v, rh, rw):
        return jnp.sum(fused_attention_merged(q, k, v, rh, rw, scale, gh, gw, nh) ** 2)

    def loss_ref(q, k, v, rh, rw):
        return jnp.sum(
            attention_reference(q, k, v, rh.reshape(rel_h.shape), rw.reshape(rel_w.shape), scale) ** 2
        )

    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for a, b in zip(g_packed, g_ref):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


@pytest.fixture(scope="module")
def qkv_inputs():
    """Flagship head geometry (head_dim=64, two heads) on a tiny grid."""
    rng = np.random.default_rng(1)
    b, nh, hd, gh, gw = 2, 2, 64, 8, 4
    c = nh * hd
    s = gh * gw
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)
    rel_pos_h = jnp.asarray(rng.standard_normal((2 * gh - 1, hd)), jnp.float32)
    rel_pos_w = jnp.asarray(rng.standard_normal((2 * gw - 1, hd)), jnp.float32)
    return qkv, rel_pos_h, rel_pos_w, b, nh, hd, gh, gw


def _qkv_reference(qkv, rel_pos_h, rel_pos_w, b, nh, hd, gh, gw):
    """Oracle: unpack heads the explicit way, run attention_reference, merge."""
    s = gh * gw
    c = nh * hd
    split = qkv.reshape(b, s, 3, nh, hd).transpose(2, 0, 3, 1, 4).reshape(3, b * nh, s, hd)
    q, k, v = split[0], split[1], split[2]
    rel_h, rel_w = rel_pos_terms(q, rel_pos_h, rel_pos_w, (gh, gw), (gh, gw))
    out = attention_reference(q, k, v, rel_h, rel_w, hd**-0.5)
    return out.reshape(b, nh, s, hd).transpose(0, 2, 1, 3).reshape(b, s, c)


def test_qkv_kernel_matches_reference(qkv_inputs):
    from beach_seg_tpu.ops.attention import rel_pos_terms_split
    from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv

    qkv, rph, rpw, b, nh, hd, gh, gw = qkv_inputs
    s = gh * gw
    c = nh * hd
    ref = _qkv_reference(qkv, rph, rpw, b, nh, hd, gh, gw)
    q4 = qkv[..., :c].reshape(b, gh, gw, nh, hd)
    rel_h64, rel_w64 = rel_pos_terms_split(q4, rph, rpw, (gh, gw), (gh, gw))
    got = fused_attention_qkv(qkv, rel_h64, rel_w64, hd**-0.5, gh, gw, nh)
    assert got.shape == (b, s, c)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


def test_rel_pos_terms_split_layout(qkv_inputs):
    """The 64-lane-slot layout must equal the head-major terms repacked."""
    from beach_seg_tpu.ops.attention import (
        pack_rel_terms,
        rel_pos_terms_heads,
        rel_pos_terms_split,
    )

    qkv, rph, rpw, b, nh, hd, gh, gw = qkv_inputs
    c = nh * hd
    q4 = qkv[..., :c].reshape(b, gh, gw, nh, hd)
    rel_h4, rel_w4 = rel_pos_terms_heads(q4, rph, rpw, (gh, gw), (gh, gw))
    want_h, want_w = pack_rel_terms(rel_h4, rel_w4)
    got_h, got_w = rel_pos_terms_split(q4, rph, rpw, (gh, gw), (gh, gw))
    assert got_h.shape == (b, gh * gw, nh * 64)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=1e-5)


def test_qkv_kernel_gradients_match(qkv_inputs):
    from beach_seg_tpu.ops.attention import rel_pos_terms_split
    from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv

    qkv, rph, rpw, b, nh, hd, gh, gw = qkv_inputs
    c = nh * hd

    def loss_fused(qkv):
        q4 = qkv[..., :c].reshape(b, gh, gw, nh, hd)
        rel_h64, rel_w64 = rel_pos_terms_split(q4, rph, rpw, (gh, gw), (gh, gw))
        return jnp.sum(fused_attention_qkv(qkv, rel_h64, rel_w64, hd**-0.5, gh, gw, nh) ** 2)

    def loss_ref(qkv):
        return jnp.sum(_qkv_reference(qkv, rph, rpw, b, nh, hd, gh, gw) ** 2)

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    err = np.abs(np.asarray(g_fused) - np.asarray(g_ref)).max()
    assert err / np.abs(np.asarray(g_ref)).max() < 1e-5


def test_qkv_rel_kernel_matches_reference(qkv_inputs):
    """The rel-in-kernel path (tables in, terms produced inside the kernel),
    including the in-kernel (3, C) qkv-bias add: the oracle adds the bias to
    the flat qkv before head unpacking, the kernel adds it in VMEM."""
    from beach_seg_tpu.ops.attention import rel_tables_padded
    from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv_rel

    qkv, rph, rpw, b, nh, hd, gh, gw = qkv_inputs
    s = gh * gw
    c = nh * hd
    bias = jnp.asarray(np.random.default_rng(7).standard_normal((3, c)), jnp.float32)
    ref = _qkv_reference(qkv + bias.reshape(3 * c), rph, rpw, b, nh, hd, gh, gw)
    rh_tab, rw_tab = rel_tables_padded(rph, rpw, (gh, gw), (gh, gw))
    qkv4 = qkv.reshape(b, s, 3, c)
    got = fused_attention_qkv_rel(qkv4, bias, rh_tab, rw_tab, hd**-0.5, gw, nh)
    assert got.shape == (b, s, c)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


def test_qkv_rel_kernel_gradients_match(qkv_inputs):
    """Gradients w.r.t. qkv, the in-kernel bias AND the rel tables through
    the rel-in-kernel custom_vjp must match the reference formulation."""
    from beach_seg_tpu.ops.attention import rel_tables_padded
    from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv_rel

    qkv, rph, rpw, b, nh, hd, gh, gw = qkv_inputs
    c = nh * hd
    bias = jnp.asarray(np.random.default_rng(8).standard_normal((3, c)), jnp.float32)

    def loss_fused(qkv, bias, rph, rpw):
        rh_tab, rw_tab = rel_tables_padded(rph, rpw, (gh, gw), (gh, gw))
        qkv4 = qkv.reshape(qkv.shape[0], qkv.shape[1], 3, c)
        return jnp.sum(fused_attention_qkv_rel(qkv4, bias, rh_tab, rw_tab, hd**-0.5, gw, nh) ** 2)

    def loss_ref(qkv, bias, rph, rpw):
        return jnp.sum(_qkv_reference(qkv + bias.reshape(3 * c), rph, rpw, b, nh, hd, gh, gw) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(qkv, bias, rph, rpw)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qkv, bias, rph, rpw)
    for a, r in zip(g_fused, g_ref):
        err = np.abs(np.asarray(a) - np.asarray(r)).max()
        assert err / max(np.abs(np.asarray(r)).max(), 1e-9) < 1e-5


def test_qkv_rel_softmax_mode_resolution(monkeypatch):
    """_resolve_softmax: env override wins; otherwise bf16→clamp, f32→stable."""
    from beach_seg_tpu.ops.pallas_attn import _resolve_softmax

    monkeypatch.delenv("BEACH_SEG_TPU_ATTN_SOFTMAX", raising=False)
    monkeypatch.delenv("BEACH_SEG_TPU_ATTN_NO_MAX", raising=False)
    assert _resolve_softmax(jnp.bfloat16) == "clamp"
    assert _resolve_softmax(jnp.float32) == "stable"
    monkeypatch.setenv("BEACH_SEG_TPU_ATTN_NO_MAX", "1")
    assert _resolve_softmax(jnp.float32) == "fast"
    monkeypatch.setenv("BEACH_SEG_TPU_ATTN_SOFTMAX", "stable")
    assert _resolve_softmax(jnp.bfloat16) == "stable"


@pytest.mark.parametrize("softmax", ["stable", "clamp", "fast"])
def test_qkv_rel_softmax_variants_match(qkv_inputs, softmax):
    """The clamp/fast stability variants must agree with the reference up to
    rounding (exact while row-max logits stay below the clamp threshold)."""
    from beach_seg_tpu.ops.attention import rel_tables_padded
    from beach_seg_tpu.ops.pallas_attn import _pallas_attention_qkv_rel

    qkv, rph, rpw, b, nh, hd, gh, gw = qkv_inputs
    s = gh * gw
    c = nh * hd
    ref = _qkv_reference(qkv, rph, rpw, b, nh, hd, gh, gw)
    rh_tab, rw_tab = rel_tables_padded(rph, rpw, (gh, gw), (gh, gw))
    got = _pallas_attention_qkv_rel(
        qkv.reshape(b, s, 3 * c), rh_tab, rw_tab, hd**-0.5, nh,
        interpret=True, softmax=softmax,
    )
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4

