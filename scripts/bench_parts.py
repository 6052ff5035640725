"""Component-level microbenchmark of the ViT-L forward at bench shapes.

Times each piece of the per-layer graph (qkv, rel-pos terms, fused attention,
proj, MLP, LayerNorm) plus candidate variants, at B=32, S=1568, bf16, on the
real chip.

Measurement technique for this environment: the remote runtime memoizes
repeated identical dispatches AND charges tens of ms of fixed overhead per
dispatch, so host-side loops lie in both directions. Each op is instead run
N times inside ONE jitted ``lax.scan`` whose per-step salt comes from the
loop carry — one dispatch, N distinct on-device executions, elision-proof
(every step feeds the carry, the final carry is reduced and fetched).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.models.seggpt.config import SegGPTConfig
from beach_seg_tpu.ops.attention import attention_reference, rel_pos_terms
from beach_seg_tpu.ops.pallas_attn import fused_attention

B = 32
cfg = SegGPTConfig()
S = cfg.num_patches  # 1568
GH, GW = 56, 28
C = cfg.hidden_size
NH, HD = cfg.num_attention_heads, cfg.head_dim
DT = jnp.bfloat16
STEPS = 24

_salt_base = [0.0]


def timeit(name, fn, *args, flops: float | None = None, steps: int = STEPS):
    """fn(salt, *args) -> array. Returns ms per execution (scan-amortized)."""

    def scanned(base, args):
        def step(carry, i):
            out = fn((base + i.astype(jnp.float32)).astype(DT), *args)
            # fold the full output into the carry so no step can be elided
            return carry + jax.tree.leaves(out)[0].sum(dtype=jnp.float32), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(steps))
        return acc

    scanned_j = jax.jit(scanned)
    # distinct base every call -> no cross-call memoization, compile excluded
    _salt_base[0] += 1000.0
    jax.block_until_ready(scanned_j(jnp.float32(_salt_base[0]), args))
    _salt_base[0] += 1000.0
    t0 = time.perf_counter()
    jax.block_until_ready(scanned_j(jnp.float32(_salt_base[0]), args))
    dt = (time.perf_counter() - t0) / steps * 1000
    eff = f"  {flops / (dt / 1000) / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:36s} {dt:8.3f} ms{eff}")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, C)), DT)
    qkv_k = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, DT)
    proj_k = jnp.asarray(rng.standard_normal((C, C)) * 0.02, DT)
    mlp_k1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, DT)
    mlp_k2 = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, DT)
    q = jnp.asarray(rng.standard_normal((B * NH, S, HD)), DT)
    k = jnp.asarray(rng.standard_normal((B * NH, S, HD)), DT)
    v = jnp.asarray(rng.standard_normal((B * NH, S, HD)), DT)
    rph = jnp.asarray(rng.standard_normal((2 * GH - 1, HD)) * 0.02, DT)
    rpw = jnp.asarray(rng.standard_normal((2 * GW - 1, HD)) * 0.02, DT)
    rh, rw = rel_pos_terms(q, rph, rpw, (GH, GW), (GH, GW))
    rh_f = rh.reshape(B * NH, S, GH)
    rw_f = rw.reshape(B * NH, S, GW)

    fl_qkv = 2 * B * S * C * 3 * C
    fl_attn = 2 * B * NH * S * S * HD * 2
    fl_proj = 2 * B * S * C * C
    fl_mlp = 2 * B * S * C * 4 * C * 2
    fl_rel = 2 * B * NH * S * HD * (GH + GW)

    t_qkv = timeit("qkv matmul (S,C)x(C,3C)", lambda s, x, w: jnp.dot(x + s * 1e-6, w), x, qkv_k, flops=fl_qkv)
    t_rel = timeit(
        "rel_pos_terms (einsums)",
        lambda s, q, a, b: rel_pos_terms(q + s * 1e-6, a, b, (GH, GW), (GH, GW))[0],
        q, rph, rpw, flops=fl_rel,
    )
    t_att = timeit(
        "fused attention kernel",
        lambda s, q, k, v, rh, rw: fused_attention(q + s * 1e-6, k, v, rh, rw, HD**-0.5, GH, GW),
        q, k, v, rh_f, rw_f, flops=fl_attn,
    )
    timeit(
        "XLA reference attention",
        lambda s, q, k, v, rh, rw: attention_reference(q + s * 1e-6, k, v, rh, rw, HD**-0.5),
        q, k, v, rh, rw, flops=fl_attn, steps=6,
    )
    t_proj = timeit("proj matmul (S,C)x(C,C)", lambda s, x, w: jnp.dot(x + s * 1e-6, w), x, proj_k, flops=fl_proj)

    def mlp(s, x, k1, k2):
        h = jnp.dot(x + s * 1e-6, k1)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(DT)
        return jnp.dot(h, k2)

    t_mlp = timeit("mlp (fp32 exact gelu)", mlp, x, mlp_k1, mlp_k2, flops=fl_mlp)

    def mlp_bf16gelu(s, x, k1, k2):
        h = jnp.dot(x + s * 1e-6, k1)
        return jnp.dot(jax.nn.gelu(h, approximate=False), k2)

    timeit("mlp (bf16 exact gelu)", mlp_bf16gelu, x, mlp_k1, mlp_k2, flops=fl_mlp)

    def mlp_tanhgelu(s, x, k1, k2):
        h = jnp.dot(x + s * 1e-6, k1)
        return jnp.dot(jax.nn.gelu(h, approximate=True), k2)

    timeit("mlp (bf16 tanh gelu)", mlp_tanhgelu, x, mlp_k1, mlp_k2, flops=fl_mlp)

    def ln(s, x):
        xf = (x + s * 1e-6).astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        var = ((xf - m) ** 2).mean(-1, keepdims=True)
        return ((xf - m) * jax.lax.rsqrt(var + 1e-6)).astype(DT)

    t_ln = timeit("layernorm fp32", ln, x)

    def attn_floor(s, q, k, v):
        qs = q + s * 1e-6
        sc = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        return jax.lax.dot_general(sc.astype(DT), v, (((2,), (1,)), ((0,), (0,))))

    timeit("attn qk+pv matmuls only (XLA)", attn_floor, q, k, v, flops=fl_attn, steps=6)

    layer = t_qkv + t_rel + t_att + t_proj + t_mlp + 2 * t_ln
    total = layer * (21 + 3 * 2)  # layers 0-2 run at 2B before merge@2
    print(f"\nper-layer sum                      {layer:8.3f} ms")
    print(f"27 layer-equivalents               {total:8.1f} ms -> {B / (total / 1000):6.1f} tiles/s (encoder only)")


if __name__ == "__main__":
    main()
