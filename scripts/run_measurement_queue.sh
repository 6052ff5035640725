#!/bin/bash
# Measurement queue: probe for a healthy TPU backend, then run the standing
# benchmark set in priority order. Output goes to an UNTRACKED timestamped
# log (re-runs must not mutate a tracked artifact; ANSI escapes stripped).
# Each step is individually bounded; a step failure does not stop the queue.
# bench.py steps run under their fresh-subprocess retry supervisor with a
# per-step budget that fits the outer timeout. (The round-5 pass that
# cleared the historical pending table — ksplit/joint_rel A/Bs, ViT-H,
# zero-shot/legacy streams, full-depth AOT — is recorded in BENCHMARKS.md;
# the retired-variant steps are gone with their code.)
set -u
cd "$(dirname "$0")/.."
LOG=${MEASUREMENT_LOG:-ROUND5_RESULTS.$(date -u +%Y%m%dT%H%M%S).log}
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "=== measurement queue start (log: $LOG) ==="

# 1. probe until the backend answers (max ~40 min). If it never recovers,
#    say so explicitly and exit — running hours of queue against a dead
#    backend burns every step's full timeout.
recovered=0
for i in $(seq 1 40); do
  if timeout 55 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: (x*x).sum())(jnp.ones((128,128)))))" >/dev/null 2>&1; then
    say "TPU recovered (probe $i)"
    recovered=1
    break
  fi
  say "probe $i: backend still down"
  sleep 5
done
if [ "$recovered" != 1 ]; then
  say "=== backend never recovered after 40 probes — queue SKIPPED ==="
  exit 1
fi

run() {  # run <timeout> <label> <cmd...>
  local t=$1 label=$2; shift 2
  say "--- $label: $*"
  timeout "$t" "$@" 2>&1 | sed -e 's/\x1b\[[0-9;]*m//g' >> "$LOG"
  say "--- $label rc=${PIPESTATUS[0]}"
}

bench() {  # bench <timeout> <label> [ENV=V ...] — supervisor budget fits inside
  local t=$1 label=$2; shift 2
  run "$t" "$label" env "$@" BEACH_SEG_TPU_BENCH_BUDGET=$((t - 60)) python bench.py
}

run 900  "knob-aot-sweep"     python scripts/aot_knob_sweep.py
run 600  "attn-microbench"    python scripts/bench_attn_parts.py all
bench 700  "headline-vitl"
run 2400 "train-ms-step"      python scripts/bench_train.py --steps 20 --batch 8 --no-scan
run 1200 "e2e-tuned"          python scripts/bench_e2e.py
run 1200 "e2e-zero-shot"      python scripts/bench_e2e.py --engine zero_shot
run 1200 "e2e-legacy"         python scripts/bench_e2e.py --engine legacy
bench 1800 "headline-huge"      BEACH_SEG_TPU_BENCH_BACKBONE=huge
# default-flags pass keeps AOT_FINGERPRINTS.json warm for exactly the
# programs the driver's dryrun AOT leg compiles — dryruns then report 6/6
# from the fingerprint cache even on a degraded compile service
run 2400 "aot-default-warm"   python scripts/check_multichip_compile.py
run 1500 "aot-huge"           python scripts/check_multichip_compile.py --huge
run 2400 "aot-full"           python scripts/check_multichip_compile.py --full
say "=== measurement queue done ==="
