"""Fused decoder-tail kernel vs its XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beach_seg_tpu.ops.pallas_decoder import _reference, decoder_tail


@pytest.fixture(scope="module")
def dec_inputs():
    rng = np.random.default_rng(5)
    b, r, gw, p, dh = 2, 4, 4, 8, 16
    h = jnp.asarray(rng.standard_normal((b, r, gw, p * p * dh)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((3, 3, dh, dh)) * 0.1, jnp.float32)
    bc = jnp.asarray(rng.standard_normal((dh,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.standard_normal((dh,)), jnp.float32)
    lb = jnp.asarray(rng.standard_normal((dh,)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((dh, 3)) * 0.1, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((3,)) * 0.1, jnp.float32)
    return h, wc, bc, ls, lb, wh, bh


@pytest.mark.parametrize("approx", [False, True])
def test_decoder_tail_matches_reference(dec_inputs, approx):
    h, wc, bc, ls, lb, wh, bh = dec_inputs
    ref = _reference(h, wc, bc, ls, lb, wh, bh, 1e-6, approx)
    got = decoder_tail(h, wc, bc, ls, lb, wh, bh, 1e-6, approx)
    assert got.shape == ref.shape
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5


@pytest.mark.parametrize("force_substeps", [False, True])
def test_decoder_tail_pre_shuffled_matches_reference(dec_inputs, force_substeps):
    """The XLA-pre-shuffled variant (kernel receives (B, R, py, GW, px, dh),
    no in-kernel transpose) must match the oracle, including when a tiny
    scratch limit forces the patch row to split into sub-steps (js > 1)."""
    from beach_seg_tpu.ops.pallas_decoder import _pallas_decoder_tail

    h, wc, bc, ls, lb, wh, bh = dec_inputs
    limit = 1 if force_substeps else 4 * 2**20
    ref = _reference(h, wc, bc, ls, lb, wh, bh, 1e-6, False)
    got = _pallas_decoder_tail(
        h, wc, bc, ls, lb, wh, bh, 1e-6, False,
        interpret=True, pre_shuffle=True, scratch_limit=limit,
    )
    assert got.shape == ref.shape
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5


def test_decoder_tail_gradients(dec_inputs):
    h, wc, bc, ls, lb, wh, bh = dec_inputs

    def loss_fused(h, wc):
        return jnp.sum(decoder_tail(h, wc, bc, ls, lb, wh, bh, 1e-6, False) ** 2)

    def loss_ref(h, wc):
        return jnp.sum(_reference(h, wc, bc, ls, lb, wh, bh, 1e-6, False) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(h, wc)
    gr = jax.grad(loss_ref, argnums=(0, 1))(h, wc)
    for a, b in zip(gf, gr):
        denom = max(np.abs(np.asarray(b)).max(), 1e-6)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / denom < 1e-5


def test_decoder_tail_edge_rows_zero_padded():
    """Top/bottom canvas rows must see zero halo (SAME conv), not the clamped
    neighbour re-read."""
    rng = np.random.default_rng(6)
    b, r, gw, p, dh = 1, 2, 2, 8, 16
    h = jnp.asarray(rng.standard_normal((b, r, gw, p * p * dh)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((3, 3, dh, dh)) * 0.1, jnp.float32)
    z = jnp.zeros((dh,), jnp.float32)
    ones = jnp.ones((dh,), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((dh, 3)) * 0.1, jnp.float32)
    ref = _reference(h, wc, z, ones, z, wh, jnp.zeros(3), 1e-6, False)
    got = decoder_tail(h, wc, z, ones, z, wh, jnp.zeros(3), 1e-6, False)
    # the first and last pixel rows are exactly where the halo logic can go wrong
    assert np.abs(np.asarray(got[:, 0]) - np.asarray(ref[:, 0])).max() < 1e-5
    assert np.abs(np.asarray(got[:, -1]) - np.asarray(ref[:, -1])).max() < 1e-5
