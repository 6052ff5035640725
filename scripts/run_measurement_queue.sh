#!/bin/bash
# Round-5 measurement queue: probe for a healthy TPU backend, then run the
# pending VERDICT r04 measurements in priority order. Output goes to an
# UNTRACKED timestamped log (ADVICE r04: re-runs must not mutate a tracked
# artifact; ANSI escapes are stripped from everything appended). Each step is
# individually bounded; a step failure does not stop the queue. bench.py
# steps run under their own fresh-subprocess retry supervisor (ADVICE r04:
# BENCH_CHILD=1 bypassed the retries the supervisor exists for) with a
# per-step budget that fits the outer timeout.
set -u
cd "$(dirname "$0")/.."
LOG=${MEASUREMENT_LOG:-ROUND5_RESULTS.$(date -u +%Y%m%dT%H%M%S).log}
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "=== measurement queue start (log: $LOG) ==="

# 1. probe until the backend answers (max ~40 min). If it never recovers,
#    say so explicitly and exit — running a 3.6h queue against a dead
#    backend burns every step's full timeout (ADVICE r04 medium #1).
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
run 900  "ksplit-microbench"  python scripts/bench_attn_parts.py ksplit
run 600  "jointrel-microbench" python scripts/bench_attn_parts.py jointrel
run 2400 "train-ms-step"      python scripts/bench_train.py --steps 20 --batch 8
bench 700  "headline-base-1"
bench 1300 "headline-ksplit2"   BEACH_SEG_TPU_ATTN_KSPLIT=2
bench 1300 "headline-jointrel"  BEACH_SEG_TPU_ATTN_JOINT_REL=1
bench 700  "headline-base-2"
run 1200 "e2e-tuned-1"        python scripts/bench_e2e.py
run 1200 "e2e-tuned-procs"    env BEACH_SEG_TPU_MOSAIC_PROCS=1 python scripts/bench_e2e.py
run 1200 "e2e-tuned-2"        python scripts/bench_e2e.py
run 1200 "e2e-zero-shot"      python scripts/bench_e2e.py --engine zero_shot
run 1200 "e2e-legacy"         python scripts/bench_e2e.py --engine legacy
run 1500 "aot-huge"           python scripts/check_multichip_compile.py --huge
bench 1800 "headline-huge"      BEACH_SEG_TPU_BENCH_BACKBONE=huge
# default-flags pass records AOT_FINGERPRINTS.json entries for exactly the
# programs the driver's dryrun AOT leg compiles — later dryruns report 6/6
# from the fingerprint cache even on a degraded compile service
run 2400 "aot-default-warm"   python scripts/check_multichip_compile.py
run 2400 "aot-full"           python scripts/check_multichip_compile.py --full
say "=== measurement queue done ==="
