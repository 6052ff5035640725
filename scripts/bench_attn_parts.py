"""Micro-bench the attention layer's pieces at flagship geometry (B=32,
ViT-L, bf16) with the differential method: one jit executes M salted copies
of the op (each copy's input scaled by a distinct salt — defeats CSE and the
runtime execution memoizer), another executes 1; per-op = (T_M − T_1)/(M − 1),
so fixed dispatch/runtime overheads cancel. min over trials. One TPU process
at a time.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from beach_seg_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.ops.attention import rel_pos_terms_split, rel_tables_padded
from beach_seg_tpu.ops.pallas_attn import fused_attention_qkv, fused_attention_qkv_rel

B, NH, HD, GH, GW = 32, 16, 64, 56, 28
C = NH * HD
S = GH * GW
DT = jnp.bfloat16
_uid = [100]


def _run(op, m, x, args, trials=3):
    def fn(salts, x, *args):
        acc = jnp.float32(0)
        for i in range(m):
            xi = x * (1.0 + salts[i].astype(x.dtype) * 0.01)
            out = op(xi, *args)
            for leaf in jax.tree.leaves(out):
                acc = acc + jnp.abs(leaf.astype(jnp.float32)).sum()
        return acc

    f = jax.jit(fn)
    _uid[0] += 1
    float(f(jnp.asarray(np.arange(m) * 0.01 + _uid[0], jnp.float32), x, *args))
    ts = []
    for _ in range(trials):
        _uid[0] += 1
        s = jnp.asarray(np.arange(m) * 0.01 + _uid[0], jnp.float32)
        t0 = time.perf_counter()
        f(s, x, *args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(name, op, x, args=(), flops=None, m=9, trials=3):
    t1 = _run(op, 1, x, args, trials)
    tm = _run(op, m, x, args, trials)
    dt = (tm - t1) / (m - 1) * 1000
    eff = f"  {flops/(dt/1000)/1e12:7.1f} TF/s" if flops else ""
    print(f"{name:40s} {dt:8.3f} ms{eff}   (1x={t1*1000:7.1f}ms {m}x={tm*1000:7.1f}ms)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * C)) * 0.05, DT)
    rph = jnp.asarray(rng.standard_normal((2 * GH - 1, HD)) * 0.05, DT)
    rpw = jnp.asarray(rng.standard_normal((2 * GW - 1, HD)) * 0.05, DT)
    rel_h64, rel_w64 = rel_pos_terms_split(
        qkv[..., :C].reshape(B, GH, GW, NH, HD), rph, rpw, (GH, GW), (GH, GW)
    )
    rel_h64 = jax.block_until_ready(jnp.asarray(rel_h64, DT))
    rel_w64 = jax.block_until_ready(jnp.asarray(rel_w64, DT))

    def kernel_only(qkv, rh, rw):
        return fused_attention_qkv(qkv, rh, rw, HD**-0.5, GH, GW, NH)

    def producer_only(qkv, rph, rpw):
        q4 = qkv[..., :C].reshape(B, GH, GW, NH, HD)
        return rel_pos_terms_split(q4, rph, rpw, (GH, GW), (GH, GW))

    def fused(qkv, rph, rpw):
        q4 = qkv[..., :C].reshape(B, GH, GW, NH, HD)
        rh, rw = rel_pos_terms_split(q4, rph, rpw, (GH, GW), (GH, GW))
        return fused_attention_qkv(qkv, rh, rw, HD**-0.5, GH, GW, NH)

    zbias = jnp.zeros((3, C), DT)

    def rel_in_kernel(qkv, rph, rpw):
        rh_tab, rw_tab = rel_tables_padded(rph, rpw, (GH, GW), (GH, GW))
        return fused_attention_qkv_rel(
            qkv.reshape(B, S, 3, C), zbias, rh_tab, rw_tab, HD**-0.5, GW, NH
        )

    def rel_in_kernel_variant(softmax="stable", block_q=784):
        from beach_seg_tpu.ops.pallas_attn import _pallas_attention_qkv_rel

        def fn(qkv, rph, rpw):
            rh_tab, rw_tab = rel_tables_padded(rph, rpw, (GH, GW), (GH, GW))
            return _pallas_attention_qkv_rel(
                qkv, rh_tab, rw_tab, HD**-0.5, NH, softmax=softmax, block_q=block_q,
            )

        return fn

    attn_flops = 2 * B * NH * S * S * (128 + 64 + HD)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "relk"):
        timeit("rel-in-kernel (tables in)", rel_in_kernel, qkv, (rph, rpw), flops=attn_flops, m=4)
    if which in ("all", "softmax"):
        # the surviving schedule knob (see BENCHMARKS.md round-5 prune: the
        # exp2 / pack-rw / interleave / fused-sum / joint-rel / ksplit
        # variants all recorded ties or losses and were retired)
        timeit("rel-in-kernel stable", rel_in_kernel_variant("stable"), qkv, (rph, rpw), flops=attn_flops, m=4)
        timeit("rel-in-kernel clamp", rel_in_kernel_variant("clamp"), qkv, (rph, rpw), flops=attn_flops, m=4)
        timeit("rel-in-kernel fast", rel_in_kernel_variant("fast"), qkv, (rph, rpw), flops=attn_flops, m=4)
    if which in ("all", "blockq"):
        timeit("rel-in-kernel bq=S (one q-block)", rel_in_kernel_variant("stable", S), qkv, (rph, rpw), flops=attn_flops, m=4)
        timeit("rel-in-kernel bq=392", rel_in_kernel_variant("stable", 392), qkv, (rph, rpw), flops=attn_flops, m=4)
    if which in ("all", "kernel"):
        timeit("kernel_only (split rel)", kernel_only, qkv, (rel_h64, rel_w64), flops=attn_flops, m=4)
    if which in ("all", "producer"):
        timeit("rel_pos_terms_split", producer_only, qkv, (rph, rpw), flops=2 * B * NH * S * HD * (GH + GW), m=4)
    if which in ("all", "fused"):
        timeit("producer+kernel", fused, qkv, (rph, rpw), flops=attn_flops, m=4)


if __name__ == "__main__":
    main()
# (sweep entry used by `python scripts/bench_attn_parts.py ilvsweep`)
