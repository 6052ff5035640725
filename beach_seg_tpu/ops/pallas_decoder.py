"""Fused SegGPT decoder tail: pixel-shuffle → Conv3×3 → LN → GELU → head.

XLA lowers this chain (HF SegGptDecoder, modeling_seggpt.py:537-591) into a
~42 ms/forward sequence at B=32: the pixel-shuffle is a genuine 850 MB
transpose, the 3×3 conv at C=64 runs at ~37 TF/s (64 channels is half a lane
register), and the conv input/output each get relayout copies. This kernel
consumes the decoder-embed matmul output in its NATIVE patch layout
(B, R, GW, p·p·dh), performs the pixel shuffle as a VMEM reshape, builds a
9-tap im2col block (contraction 9·dh=576 — full MXU tiling), and fuses the
channels-first LayerNorm + GELU + 3-channel head into the same pass. The only
HBM traffic is one read of the embed output (+ 1/p of it again for the
vertical halo rows) and one write of the (B, R·p, W, 3) painted canvas.

The 3×3 halo: horizontally SAME-padded in VMEM; vertically each grid step
reads the adjacent patch-rows' edge pixel rows from two pre-sliced side
inputs (a contiguous lane slice of the embed output — no relayout).

Backward (training) recomputes via ``jax.vjp`` on the XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beach_seg_tpu.ops.sharding import data_sharded_call
from beach_seg_tpu.utils.env import env_flag


def _kernel(cur_ref, top_ref, bot_ref, wc_ref, bc_ref, ls_ref, lb_ref, wh_ref, bh_ref, out_ref,
            col_ref, *, p: int, dh: int, js: int, eps: float, approx: bool,
            pre_shuffled: bool = False):
    j = pl.program_id(2)
    gw = cur_ref.shape[3] if pre_shuffled else cur_ref.shape[2]
    w = gw * p
    psub = p // js
    cur = cur_ref[0, 0]
    if pre_shuffled:
        # (py, GW, px, dh): the GW↔py swap already happened in XLA (where it
        # fuses into the embed matmul's output epilogue) — the shuffle here is
        # a pure dim merge, no VMEM relayout
        px = cur.reshape(p, w, dh)
    else:
        # (GW, py, px, dh) — pre-split outside (free XLA reshape);
        # Mosaic cannot lane-split (GW, p·p·dh) in VMEM, but a tile-level
        # transpose + sublane merge it can do. Pixel shuffle: → (py, GW·px, dh)
        px = cur.transpose(1, 0, 2, 3).reshape(p, w, dh)
    top = top_ref[0, 0].reshape(1, w, dh)  # last pixel row of the patch-row above
    bot = bot_ref[0, 0].reshape(1, w, dh)  # first pixel row of the patch-row below
    rows = jnp.concatenate([top, px, bot], axis=0)  # (p+2, W, dh)
    zc = jnp.zeros((p + 2, 1, dh), rows.dtype)
    rows = jnp.concatenate([zc, rows, zc], axis=1)  # (p+2, W+2, dh)
    # the p pixel rows are processed in js sub-steps to bound VMEM (im2col is
    # the big temporary); select this step's (psub+2)-row window statically
    rows_j = rows[0 : psub + 2]
    for jj in range(1, js):
        rows_j = jnp.where(j == jj, rows[jj * psub : jj * psub + psub + 2], rows_j)
    # 9-tap im2col through the scratch buffer: the shifted slices carry
    # mismatched vreg offsets that Mosaic cannot concatenate directly, but
    # stores realign — each tap lands at its 64-lane slot in col_ref
    for idx, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
        col_ref[:, :, idx * dh : (idx + 1) * dh] = rows_j[dy : dy + psub, dx : dx + w]
    im2col = col_ref[...].reshape(psub * w, 9 * dh)
    y = jax.lax.dot_general(
        im2col, wc_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bc_ref[...]
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps) * ls_ref[...] + lb_ref[...]
    y = jax.nn.gelu(y, approximate=approx)
    out = jax.lax.dot_general(
        y.astype(wh_ref.dtype), wh_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bh_ref[...]
    out_ref[0] = out.reshape(psub, w, 3).astype(out_ref.dtype)


def _reference(h, wc, bc, ls, lb, wh, bh, eps, approx):
    """Pure-XLA oracle with the kernel's semantics (fp32 conv accumulation)."""
    b, r, gw, pp = h.shape
    dh = wc.shape[-1]
    p = int(round((pp // dh) ** 0.5))
    x = h.reshape(b, r, gw, p, p, dh).transpose(0, 1, 3, 2, 4, 5).reshape(b, r * p, gw * p, dh)
    y = jax.lax.conv_general_dilated(
        x, wc.reshape(3, 3, dh, dh), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bc
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps) * ls + lb
    y = jax.nn.gelu(y, approximate=approx)
    return (jnp.dot(y.astype(wh.dtype), wh, preferred_element_type=jnp.float32) + bh).astype(jnp.float32)


def _pallas_decoder_tail(h, wc, bc, ls, lb, wh, bh, eps, approx, interpret=False,
                         pre_shuffle=False, scratch_limit=4 * 2**20):
    b, r, gw, pp = h.shape
    dh = wh.shape[0]
    p = int(round((pp // dh) ** 0.5))
    assert p * p * dh == pp, (p, dh, pp)
    w = gw * p
    edge = p * dh
    # neighbour edge pixel rows, PRE-SHIFTED in XLA so every BlockSpec index
    # map stays the identity — clamped index maps defeat Mosaic's block
    # prefetch pipeline and stall each grid step on DMA latency. Zero rows at
    # the canvas edges double as the conv's SAME padding.
    top_all = jax.lax.slice_in_dim(h, pp - edge, pp, axis=3).reshape(b, r, gw, p, dh)
    bot_all = jax.lax.slice_in_dim(h, 0, edge, axis=3).reshape(b, r, gw, p, dh)
    zrow = jnp.zeros((b, 1, gw, p, dh), h.dtype)
    top_edges = jnp.concatenate([zrow, top_all[:, : r - 1]], axis=1)
    bot_edges = jnp.concatenate([bot_all[:, 1:], zrow], axis=1)
    h6 = h.reshape(b, r, gw, p, p, dh)
    if pre_shuffle:
        # do the GW↔py swap in XLA (fuses into the embed matmul epilogue /
        # costs at most one HBM round-trip) so the kernel never transposes
        h6 = h6.transpose(0, 1, 3, 2, 4, 5)  # (B, R, py, GW, px, dh)
    wc2 = wc.reshape(9 * dh, dh)
    # split each patch-row into sub-steps so the im2col scratch stays ~<=4MB
    js = 1
    while p % (js * 2) == 0 and (p // js) * w * 9 * dh * h.dtype.itemsize > scratch_limit:
        js *= 2
    psub = p // js
    kernel = functools.partial(
        _kernel, p=p, dh=dh, js=js, eps=eps, approx=approx, pre_shuffled=pre_shuffle
    )
    cur_block = (1, 1, p, gw, p, dh) if pre_shuffle else (1, 1, gw, p, p, dh)
    return pl.pallas_call(
        kernel,
        grid=(b, r, js),
        in_specs=[
            pl.BlockSpec(cur_block, lambda g, i, j: (g, i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, p, dh), lambda g, i, j: (g, i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, p, dh), lambda g, i, j: (g, i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * dh, dh), lambda g, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh,), lambda g, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh,), lambda g, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh,), lambda g, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 3), lambda g, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3,), lambda g, i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, psub, w, 3), lambda g, i, j: (g, i * js + j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r * p, w, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * p * w * 9 * dh * dh,
            bytes_accessed=h.size * 2 + b * r * p * w * 3 * 4,
            transcendentals=b * r * p * w * dh,
        ),
        scratch_shapes=[pltpu.VMEM((psub, w, 9 * dh), h.dtype)],
        interpret=interpret,
    )(h6, top_edges, bot_edges, wc2, bc, ls, lb, wh, bh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def decoder_tail(h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b, eps: float, approx: bool):
    """h: (B, R, GW, p·p·dh) decoder-embed output (pre pixel shuffle);
    conv_w: (3, 3, dh, dh). Returns the painted canvas (B, R·p, GW·p, 3) f32."""
    interpret = jax.default_backend() != "tpu"
    pre = env_flag("BEACH_SEG_TPU_DECODER_PRESHUFFLE")
    fn = lambda *a: _pallas_decoder_tail(*a, eps, approx, interpret=interpret, pre_shuffle=pre)
    return data_sharded_call(
        fn, (h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b),
        (True, False, False, False, False, False, False),
    )


def _fwd(h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b, eps, approx):
    out = decoder_tail(h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b, eps, approx)
    return out, (h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b)


def _bwd(eps, approx, res, g):
    h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b = res
    ref = lambda *args: _reference(*args, eps, approx)
    _, vjp = jax.vjp(ref, h, conv_w, conv_b, ln_scale, ln_bias, head_w, head_b)
    return vjp(g)


decoder_tail.defvjp(_fwd, _bwd)
