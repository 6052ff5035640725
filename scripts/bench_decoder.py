"""Decoder-tail microbenchmark at flagship geometry: XLA chain vs the fused
Pallas kernel (in-kernel shuffle vs XLA-pre-shuffled input).

B=32, query-only decode rows (R=28 of 56), GW=28, p=16, dh=64, bf16 — the
same shapes the headline forward runs. Scan-amortized, elision-proof (same
technique as bench_parts.py).

Usage: python scripts/bench_decoder.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.ops.pallas_decoder import _pallas_decoder_tail, _reference
from beach_seg_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B, R, GW, P, DH = 32, 28, 28, 16, 64
DT = jnp.bfloat16
STEPS = 8


def timeit(name, fn, args, m=4, trials=3, flops=None):
    def scanned(base, args):
        def step(carry, i):
            salt = (base + i.astype(jnp.float32)).astype(DT)
            out = fn(args[0] + salt * 1e-6, *args[1:])
            return carry + out.sum(dtype=jnp.float32), None

        carry, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(STEPS))
        return carry

    def run(mcopies):
        # m distinct scans chained in one jit via the carry
        def many(base, args):
            c = jnp.float32(0)
            for i in range(mcopies):
                c = c + scanned(base + c * 0 + i, args)
            return c

        f = jax.jit(many)
        f(jnp.float32(-1), args).block_until_ready()
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            f(jnp.float32(0), args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tm = run(m)
    dt = (tm - t1) / (m - 1) / STEPS * 1000
    eff = f"  {flops/(dt/1000)/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:42s} {dt:8.3f} ms{eff}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((B, R, GW, P * P * DH)) * 0.05, DT)
    wc = jnp.asarray(rng.standard_normal((3, 3, DH, DH)) * 0.05, DT)
    bc = jnp.asarray(rng.standard_normal((DH,)) * 0.05, DT)
    ls = jnp.asarray(rng.standard_normal((DH,)), DT)
    lb = jnp.asarray(rng.standard_normal((DH,)), DT)
    wh = jnp.asarray(rng.standard_normal((DH, 3)) * 0.05, DT)
    bh = jnp.asarray(rng.standard_normal((3,)) * 0.05, jnp.float32)
    flops = 2 * B * R * P * GW * P * 9 * DH * DH

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "xla"):
        timeit("XLA chain (shuffle+conv+LN+GELU+head)",
               lambda h: _reference(h, wc, bc, ls, lb, wh, bh, 1e-6, True).astype(DT),
               (h,), flops=flops)
    if which in ("all", "kernel"):
        timeit("fused kernel (in-kernel shuffle)",
               lambda h: _pallas_decoder_tail(h, wc, bc, ls, lb, wh, bh, 1e-6, True).astype(DT),
               (h,), flops=flops)
    if which in ("all", "preshuffle"):
        timeit("fused kernel (XLA pre-shuffle)",
               lambda h: _pallas_decoder_tail(
                   h, wc, bc, ls, lb, wh, bh, 1e-6, True, pre_shuffle=True
               ).astype(DT),
               (h,), flops=flops)


if __name__ == "__main__":
    main()
