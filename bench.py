"""Headline benchmark: Dove tiles/sec/chip, sliding-window SegGPT inference.

Runs the flagship forward path (SegGPT ViT-L, 448×448 query tile + prompt,
bf16 compute) batched on one chip, steady-state, and prints ONE JSON line:

    {"metric": "tiles_per_sec_per_chip", "value": N, "unit": "tiles/s",
     "vs_baseline": N}

``vs_baseline`` compares against the measured reference CPU path (the
reference publishes no numbers — BASELINE.md): HF SegGpt ViT-L eager fp32
forward per 448×448 tile, stored in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.models.seggpt.config import SegGPTConfig
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.transforms import build_palette, decode_by_palette, normalize_palette
from beach_seg_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import os

BATCH = int(os.environ.get("BEACH_SEG_TPU_BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BEACH_SEG_TPU_BENCH_ITERS", "8"))


def main() -> None:
    cfg = SegGPTConfig()
    model = SegGPT(cfg, dtype=jnp.bfloat16)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]

    zeros = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros, zeros)["params"]

    palette = jnp.asarray(build_palette(3))
    palette_norm = normalize_palette(palette)

    @jax.jit
    def forward(params, query, prompt_img, prompt_mask, salt):
        # `salt` makes every iteration a DISTINCT computation on distinct
        # inputs (device-side perturbation — no extra host→device traffic):
        # the remote runtime may memoize repeated identical executions, so
        # unique inputs + the per-iteration checksum are both required for an
        # honest number
        query = query + salt * 1e-6
        out = model.apply({"params": params}, query, prompt_img, prompt_mask, decode_query_only=True)
        pred = out["pred_masks"]
        return decode_by_palette(pred[:, h:], palette_norm)

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((BATCH, h, w, 3)), np.float32)
    query, prompt_img, prompt_mask = mk(), mk(), mk()

    if os.environ.get("BEACH_SEG_TPU_BENCH_SCAN", "1") not in ("", "0"):
        # scan mode (DEFAULT): all ITERS executions inside ONE dispatch (a
        # lax.scan whose carry chains every iteration's checksum — still
        # elision-proof, still ITERS distinct salted computations), removing
        # the per-dispatch tunnel round-trip from the measurement. Measured
        # back-to-back vs the dispatch-per-iteration mode on the same day:
        # 62.3 vs 58.7 tiles/s — ~6% of the old number was host/tunnel
        # dispatch overhead, not device time. BEACH_SEG_TPU_BENCH_SCAN=0
        # restores the multi-dispatch measurement.
        @jax.jit
        def scanned(params, query, prompt_img, prompt_mask):
            def step(carry, i):
                ids = forward(params, query, prompt_img, prompt_mask, i.astype(jnp.float32))
                return carry + ids.sum(dtype=jnp.int32), None

            return jax.lax.scan(step, jnp.int32(0), jnp.arange(ITERS))[0]

        scanned(params, query, prompt_img, prompt_mask).block_until_ready()  # compile
        t0 = time.perf_counter()
        scanned(params, query, prompt_img, prompt_mask).block_until_ready()
        dt = time.perf_counter() - t0
    else:
        forward(params, query, prompt_img, prompt_mask, jnp.float32(-1)).block_until_ready()  # compile
        t0 = time.perf_counter()
        # accumulate a checksum over every iteration's output so a lazy runtime
        # cannot elide intermediate executions (each forward feeds the total)
        checksum = jnp.zeros((), jnp.int32)
        for i in range(ITERS):
            ids = forward(params, query, prompt_img, prompt_mask, jnp.float32(i))
            checksum = checksum + ids.sum(dtype=jnp.int32)
        checksum.block_until_ready()
        dt = time.perf_counter() - t0
    tiles_per_sec = BATCH * ITERS / dt

    baseline_path = Path(__file__).parent / "BASELINE_MEASURED.json"
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text()).get("reference_cpu_tiles_per_sec")
        if base:
            vs = tiles_per_sec / base
    print(
        json.dumps(
            {
                "metric": "tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 3),
                "unit": "tiles/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
