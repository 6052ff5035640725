"""Capture a device trace of the headline forward and attribute time per op.

Runs the exact `bench.py` program under ``jax.profiler.trace``, then parses
the resulting ``*.trace.json.gz`` directly (the tensorboard profile plugin's
converter breaks on this environment's protobuf) and prints two tables:

  1. device time grouped by op name prefix (fusion/custom-call buckets)
  2. device time grouped by the ``args.source`` file:line attribution XLA
     records on each event — the fastest way to find which PYTHON line owns
     a hot fusion.

Usage:  python scripts/trace_summary.py [--batch 32]

The summary is the ground truth for BENCHMARKS.md accounting; bench.py's
wall-clock includes dispatch gaps that this per-op view excludes.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(batch: int, iters: int = 2) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beach_seg_tpu.models.seggpt.config import SegGPTConfig
    from beach_seg_tpu.models.seggpt.model import SegGPT
    from beach_seg_tpu.transforms import build_palette, decode_by_palette, normalize_palette
    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = SegGPTConfig()
    model = SegGPT(cfg, dtype=jnp.bfloat16)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    zeros = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros, zeros)["params"]
    palette_norm = normalize_palette(jnp.asarray(build_palette(3)))

    @jax.jit
    def forward(params, query, prompt_img, prompt_mask, salt):
        query = query + salt * 1e-6
        out = model.apply({"params": params}, query, prompt_img, prompt_mask, decode_query_only=True)
        return decode_by_palette(out["pred_masks"][:, h:], palette_norm)

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((batch, h, w, 3)), np.float32)
    query, prompt_img, prompt_mask = mk(), mk(), mk()
    forward(params, query, prompt_img, prompt_mask, jnp.float32(-1)).block_until_ready()

    out_dir = tempfile.mkdtemp(prefix="trace_fwd_")
    with jax.profiler.trace(out_dir):
        acc = jnp.zeros((), jnp.int32)
        for i in range(iters):
            ids = forward(params, query, prompt_img, prompt_mask, jnp.float32(i))
            acc = acc + ids.sum(dtype=jnp.int32)
        acc.block_until_ready()
    return out_dir


def summarize(trace_dir: str, top: int = 40) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device-lane events only: pick pids whose process name mentions TPU/device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "tpu" in name or "/device" in name.lower()
    }

    by_name = collections.Counter()
    by_source = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():  # step markers lane, not ops
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        name = e.get("name", "?")
        # strip trailing .N fusion indices for grouping
        base = name.split(".")[0]
        by_name[base] += dur
        calls[base] += 1
        src = (e.get("args") or {}).get("source", "")
        if src:
            by_source[src] += dur
        total += dur

    print(f"\n== {path}")
    print(f"total device op time: {total:.1f} ms (over the traced iterations)\n")
    print(f"{'op bucket':<44} {'ms':>9} {'calls':>6} {'%':>6}")
    for name, ms in by_name.most_common(top):
        print(f"{name:<44} {ms:9.2f} {calls[name]:6d} {100*ms/total:6.1f}")
    if by_source:
        print(f"\n{'source (args.source)':<64} {'ms':>9} {'%':>6}")
        for src, ms in by_source.most_common(top):
            print(f"{src:<64} {ms:9.2f} {100*ms/total:6.1f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", help="summarize an existing trace dir instead of capturing")
    args = ap.parse_args()
    d = args.dir or capture(args.batch, args.iters)
    summarize(d, args.top)
