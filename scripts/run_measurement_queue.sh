#!/bin/bash
# Round-4 measurement queue: wait for the TPU backend to recover from the
# 2026-08-20 compile-service outage, then run the pending VERDICT r03
# measurements in priority order, appending everything to ROUND4_RESULTS.log
# (repo root) so results survive a session cutoff. Each step is individually
# bounded; a step failure does not stop the queue.
set -u
cd "$(dirname "$0")/.."
LOG=ROUND4_RESULTS.log
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "=== measurement queue start ==="

# 1. probe until the backend answers (max ~40 min)
for i in $(seq 1 40); do
  if timeout 55 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x*x).sum())(jnp.ones((128,128)))))" >/dev/null 2>&1; then
    say "TPU recovered (probe $i)"
    break
  fi
  say "probe $i: backend still down"
  sleep 5
done

run() {  # run <timeout> <label> <cmd...>
  local t=$1 label=$2; shift 2
  say "--- $label: $*"
  timeout "$t" "$@" >> "$LOG" 2>&1
  say "--- $label rc=$?"
}

run 900  "ksplit-microbench"  python scripts/bench_attn_parts.py ksplit
run 600  "jointrel-microbench" python scripts/bench_attn_parts.py jointrel
run 2400 "train-ms-step"      python scripts/bench_train.py --steps 20 --batch 8
run 600  "headline-base-1"    env BEACH_SEG_TPU_BENCH_CHILD=1 python bench.py
run 1200 "headline-ksplit2"   env BEACH_SEG_TPU_BENCH_CHILD=1 BEACH_SEG_TPU_ATTN_KSPLIT=2 python bench.py
run 600  "headline-base-2"    env BEACH_SEG_TPU_BENCH_CHILD=1 python bench.py
run 1200 "e2e-zero-shot"      python scripts/bench_e2e.py --engine zero_shot
run 1200 "e2e-legacy"         python scripts/bench_e2e.py --engine legacy
run 1500 "aot-huge"           python scripts/check_multichip_compile.py --huge
run 1800 "headline-huge"      env BEACH_SEG_TPU_BENCH_CHILD=1 BEACH_SEG_TPU_BENCH_BACKBONE=huge python bench.py
run 2400 "aot-full"           python scripts/check_multichip_compile.py --full
say "=== measurement queue done ==="
