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
import os
import time
from pathlib import Path

BATCH = int(os.environ.get("BEACH_SEG_TPU_BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BEACH_SEG_TPU_BENCH_ITERS", "8"))


def main() -> None:
    # heavy imports live here so the retry supervisor below never touches
    # jax or the TPU client in the parent process
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beach_seg_tpu.models.seggpt.config import SegGPTConfig
    from beach_seg_tpu.models.seggpt.model import SegGPT
    from beach_seg_tpu.transforms import build_palette, decode_by_palette, normalize_palette
    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    if os.environ.get("BEACH_SEG_TPU_BENCH_BACKBONE", "large") == "huge":
        from beach_seg_tpu.models.seggpt.config import huge_config

        cfg = huge_config()  # BASELINE config #5 scale-up preset
    else:
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

    # FLOPs-accounted MFU (VERDICT r04 item 8). Analytic per-tile model of the
    # backbone transformer (the decoder/embedding chain is ~3% and excluded —
    # the number is therefore a slight UNDERcount): per layer, counting one
    # multiply-accumulate as 2 flops at S tokens, width C, NH heads of hd=64,
    #   qkv proj     2·S·C·3C
    #   attention    2·NH·S·(S·(2·hd + 128) + 128·hd)   (score+PV at 128 fused
    #                lanes/head-pair + in-kernel rel-term dots — matches the
    #                kernel's own pl.CostEstimate in ops/pallas_attn.py)
    #   out proj     2·S·C·C
    #   MLP          16·S·C²
    # Peak: v5e bf16 = 197 TFLOP/s (override BEACH_SEG_TPU_PEAK_TFLOPS on
    # other generations).
    S = (h * 2 // cfg.patch_size) * (w // cfg.patch_size)
    C = cfg.hidden_size
    NH = cfg.num_attention_heads
    hd = C // NH
    per_layer = (
        2 * S * C * 3 * C
        + 2 * NH * S * (S * (2 * hd + 128) + 128 * hd)
        + 2 * S * C * C
        + 16 * S * C * C
    )
    flops_per_tile = cfg.num_hidden_layers * per_layer
    peak = float(os.environ.get("BEACH_SEG_TPU_PEAK_TFLOPS", "197")) * 1e12
    mfu = tiles_per_sec * flops_per_tile / peak

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
                "mfu": round(mfu, 4),
                "tflops_per_sec": round(tiles_per_sec * flops_per_tile / 1e12, 1),
            }
        )
    )


def supervise() -> int:
    """Run the measurement in fresh subprocesses with bounded retries.

    A single transient ``INTERNAL: TPU backend error`` through the tunnel
    zeroed the round-3 scored artifact (BENCH_r03.json rc=1, parsed null).
    Each attempt gets a fresh interpreter (a wedged TPU client does not
    survive into the retry) and a hard timeout; on final failure a
    structured ``{"error": ...}`` JSON line is still printed so the driver
    artifact is parseable either way.
    """
    import subprocess
    import sys

    attempts = int(os.environ.get("BEACH_SEG_TPU_BENCH_ATTEMPTS", "3"))
    per_attempt = float(os.environ.get("BEACH_SEG_TPU_BENCH_TIMEOUT", "900"))
    # TOTAL wall-clock budget across all attempts: a HARD-DOWN backend (every
    # attempt hangs until its per-attempt timeout) must still leave this
    # process time to print the structured error line itself — an outside
    # kill produces an unparseable artifact (the MULTICHIP_r03 failure
    # shape). Default: one full attempt plus a shorter second try.
    total_budget = float(os.environ.get("BEACH_SEG_TPU_BENCH_BUDGET", "1500"))
    t_start = time.monotonic()
    env = dict(os.environ, BEACH_SEG_TPU_BENCH_CHILD="1")
    last_err = ""
    for i in range(attempts):
        if i:
            time.sleep(10 * i)  # short backoff: transient backend errors clear in seconds
        slice_left = total_budget - (time.monotonic() - t_start) - 15.0
        if slice_left < 60.0:
            last_err = last_err or "budget exhausted before any attempt"
            print(
                f"attempt {i + 1}: skipped — {max(0.0, slice_left):.0f}s of the "
                f"{total_budget:.0f}s total budget left",
                file=sys.stderr, flush=True,
            )
            break
        try:
            proc = subprocess.run(
                [sys.executable, __file__], env=env, cwd=str(Path(__file__).parent),
                capture_output=True, text=True, timeout=min(per_attempt, slice_left),
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i + 1}: timed out after {min(per_attempt, slice_left):.0f}s"
            print(last_err, file=sys.stderr, flush=True)
            continue
        # the child prints exactly one JSON result line; find it from the tail
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    json.loads(line)
                except ValueError:
                    break
                print(line, flush=True)
                return 0
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        last_err = f"attempt {i + 1} (rc={proc.returncode}): " + " | ".join(tail[-3:])[:500]
        print(last_err, file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "tiles_per_sec_per_chip",
                "value": None,
                "unit": "tiles/s",
                "vs_baseline": None,
                "error": last_err or "all attempts failed",
            }
        ),
        flush=True,
    )
    return 1


if __name__ == "__main__":
    if os.environ.get("BEACH_SEG_TPU_BENCH_CHILD"):
        main()
    else:
        raise SystemExit(supervise())
