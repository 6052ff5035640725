"""Fused LN+MLP kernel vs its XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.ops.pallas_mlp import _mlp_reference, fused_ln_mlp


@pytest.fixture(scope="module")
def mlp_inputs():
    rng = np.random.default_rng(3)
    n, c, m = 64, 128, 512
    x = jnp.asarray(rng.standard_normal((2, n // 2, c)), jnp.float32)
    ls = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    lb = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((m,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)
    return x, ls, lb, w1, b1, w2, b2


@pytest.mark.parametrize("approx", [False, True])
def test_fused_mlp_matches_reference(mlp_inputs, approx):
    x, ls, lb, w1, b1, w2, b2 = mlp_inputs
    ref = _mlp_reference(x.reshape(-1, x.shape[-1]), ls, lb, w1, b1, w2, b2, 1e-6, approx)
    got = fused_ln_mlp(x, ls, lb, w1, b1, w2, b2, 1e-6, approx)
    assert got.shape == x.shape
    assert np.abs(np.asarray(got).reshape(ref.shape) - np.asarray(ref)).max() < 1e-5


@pytest.mark.parametrize("approx", [False, True])
def test_fused_mlp_gradients(mlp_inputs, approx):
    """Covers the Pallas dx backward kernel (argnum 0 — the prompt-tuning
    hot path, incl. both GELU-derivative formulations) and the XLA weight
    cotangents (argnums 1, 2)."""
    x, ls, lb, w1, b1, w2, b2 = mlp_inputs

    def loss_fused(x, w1, w2):
        return jnp.sum(fused_ln_mlp(x, ls, lb, w1, b1, w2, b2, 1e-6, approx) ** 2)

    def loss_ref(x, w1, w2):
        return jnp.sum(_mlp_reference(x.reshape(-1, x.shape[-1]), ls, lb, w1, b1, w2, b2, 1e-6, approx) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(gf, gr):
        b = np.asarray(b).reshape(np.asarray(a).shape)
        denom = max(np.abs(b).max(), 1e-6)
        assert np.abs(np.asarray(a) - b).max() / denom < 1e-5


def test_bf16_block_uses_fused_path():
    """A bf16 tiny model forward agrees with the fp32 module path in class
    space (the fused kernel engages on every bf16 Block)."""
    from beach_seg_tpu.models.seggpt import SegGPT, init_random, tiny_config

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    x = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    model32 = SegGPT(cfg)
    model16 = SegGPT(cfg, dtype=jnp.bfloat16)
    params = init_random(model32, cfg)
    out32 = model32.apply({"params": params}, x, x, x)["pred_masks"]
    out16 = model16.apply({"params": params}, x, x, x)["pred_masks"]
    # bf16 noise floor, not exactness — the paths share params and math
    assert np.abs(np.asarray(out32) - np.asarray(out16, np.float32)).max() < 0.15
