#!/bin/bash
# Round-3 TPU measurement queue (see TPU_STATUS_r03.md / VERDICT.md item 1).
#
# Runs the deferred TPU jobs IN ORDER, serialized, `python -u`, each under a
# generous timeout (fresh compiles on axon can take 12+ min; see CLAUDE.md).
# Everything is appended to tpu_queue_r03.log and per-job artifacts land in
# artifacts_r03/.  Safe to re-run: jobs that already produced their artifact
# are skipped (delete the artifact to re-measure).
#
# Usage:  bash scripts/tpu_queue.sh            # probe, then run the queue
#         PVT_QUEUE_SKIP_PROBE=1 bash ...      # skip the availability probe
#
# Do NOT run anything CPU-heavy concurrently (a CPU-bound pytest starves the
# TPU job's host-side compile — observed 20 min of zero bench output).
set -u
cd "$(dirname "$0")/.."
LOG=tpu_queue_r03.log
ART=artifacts_r03
mkdir -p "$ART"
say() { echo "[tpu_queue $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ "${PVT_QUEUE_SKIP_PROBE:-0}" != "1" ]; then
  say "probing TPU backend (280s budget)..."
  if ! timeout 280 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >> "$LOG" 2>&1; then
    say "TPU still unavailable — aborting queue"
    exit 7
  fi
  say "TPU is UP"
fi

run_job() {  # run_job <artifact> <budget_s> <cmd...>
  local art="$1" budget="$2"; shift 2
  if [ -s "$art" ]; then say "SKIP (exists): $art"; return 0; fi
  say "START: $* (budget ${budget}s) -> $art"
  local t0=$SECONDS
  timeout "$budget" "$@" > "$art.tmp" 2>> "$LOG"
  local rc=$?
  if [ $rc -eq 0 ]; then
    mv "$art.tmp" "$art"
    say "DONE rc=0 in $((SECONDS - t0))s: $art"
  else
    mv "$art.tmp" "$art.failed" 2>/dev/null
    say "FAILED rc=$rc in $((SECONDS - t0))s (output in $art.failed)"
  fi
  return $rc
}

# 1. Headline bench (probe already done above; skip bench's own subprocess
#    probe so an intermittent tunnel doesn't double-charge the budget).
PVT_BENCH_SKIP_PROBE=1 run_job "$ART/bench.json" 3000 python -u bench.py

# 2. North-star: 200 configs x 1e6 points, arm then drill (27-pt tiles,
#    adaptive chunk fallback).
run_job "$ART/northstar_arm.json" 3000 python -u benchmarks/northstar.py
run_job "$ART/northstar_drill.json" 3000 python -u benchmarks/northstar.py --robot drill

# 3. Narrow-band big-mesh sweep + neural rows.
run_job "$ART/bigmesh.json" 3000 python -u benchmarks/bigmesh.py
run_job "$ART/neural.json" 3600 python -u benchmarks/neural.py

# 4. Full test suite on the real TPU — LAST: measured ~44 tests/32 min on
#    axon (fresh compiles per test over the tunnel), so the full 216-test
#    suite needs ~3 h.  Record the tail into TPU_STATUS_r03.md afterwards.
run_job "$ART/pytest_tpu.txt" 12000 env PVT_TEST_TPU=1 python -u -m pytest tests/ -q

say "queue complete; artifacts in $ART/ — refresh PERF.md/README next"
