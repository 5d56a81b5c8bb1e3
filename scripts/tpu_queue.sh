#!/bin/bash
# Round-4 TPU measurement queue (see TPU_STATUS_r04.md / VERDICT r3 items 1-3).
#
# ORDER MATTERS: the full test suite runs FIRST this round (VERDICT r3 item
# 2) — the perf rows were captured in r3, the complete-on-silicon suite
# record is the missing artifact, and Pallas-lowering/FMA-contraction bugs
# are exactly the class interpret-mode CPU tests miss.  Budget 12000s
# (measured rate: ~44 tests / 32 min over the tunnel).
#
# Runs the jobs IN ORDER, serialized, `python -u`, each under a generous
# timeout (fresh compiles on axon can take 12+ min; see CLAUDE.md).
# Everything is appended to tpu_queue_r04.log and per-job artifacts land in
# artifacts_r04/.  Safe to re-run: jobs that already produced their artifact
# are skipped (delete the artifact to re-measure).
#
# Usage:  bash scripts/tpu_queue.sh            # probe, then run the queue
#         PVT_QUEUE_SKIP_PROBE=1 bash ...      # skip the availability probe
#
# Do NOT run anything CPU-heavy concurrently (a CPU-bound pytest starves the
# TPU job's host-side compile — observed 20 min of zero bench output).
set -u
cd "$(dirname "$0")/.."
LOG=tpu_queue_r04.log
ART=artifacts_r04
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

# 1. FULL TEST SUITE FIRST — the one artifact r3 could not complete.
run_job "$ART/pytest_tpu.txt" 12000 env PVT_TEST_TPU=1 python -u -m pytest tests/ -q

# 2. Headline bench (probe already done above; skip bench's own subprocess
#    probe so an intermittent tunnel doesn't double-charge the budget).
PVT_BENCH_SKIP_PROBE=1 run_job "$ART/bench.json" 3000 python -u bench.py

# 3. North-star: 200 configs x 1e6 points — arm, drill, mesh-real arm.
run_job "$ART/northstar_arm.json" 3000 python -u benchmarks/northstar.py
run_job "$ART/northstar_drill.json" 3000 python -u benchmarks/northstar.py --robot drill
run_job "$ART/northstar_mesh_arm.json" 3600 python -u benchmarks/northstar.py --robot mesh_arm

# 4. Narrow-band big-mesh sweep + neural rows (neural now prints its JSON
#    line to stdout — VERDICT r3 item 3).  The relu run re-measures the
#    README table's 329M-q/s headline row (r1 provenance) under the
#    current code: relu 128x4, bf16 matmuls, r1 training config.
run_job "$ART/bigmesh.json" 3000 python -u benchmarks/bigmesh.py
run_job "$ART/neural.json" 3600 python -u benchmarks/neural.py
run_job "$ART/neural_relu.json" 5400 python -u benchmarks/neural.py \
  --act relu --bf16 --configs 1024 --steps 12000

say "queue complete; artifacts in $ART/ — refresh PERF.md/README next"

# 5. r4 extras: Pallas sweep MFU A/B (VERDICT item 7) and the trilinear
#    cliff row (item 8).
run_job "$ART/pallas_mfu.json" 2400 python -u benchmarks/pallas_mfu.py
run_job "$ART/trilinear.json" 2400 python -u benchmarks/trilinear.py
say "r4 extras complete"
