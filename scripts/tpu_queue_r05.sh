#!/bin/bash
# Round-5 post-suite TPU queue (serialized; see CLAUDE.md on job overlap).
# Run AFTER the full PVT_TEST_TPU=1 suite finishes.
set -x
cd /root/repo
mkdir -p artifacts_r05

# 1. headline bench with the new engine + median-of-3 spreads
timeout 3000 python -u bench.py > artifacts_r05/bench.log 2>&1
grep -a '^{' artifacts_r05/bench.log | tail -1 > artifacts_r05/bench.json

# 2. MXU vs VPU sweep formulation A/B (VERDICT item 6)
timeout 1800 python -u benchmarks/pallas_mxu_ab.py \
    --out artifacts_r05/pallas_mxu_ab.json \
    > artifacts_r05/pallas_mxu_ab.log 2>&1

# 3. neural sine 256x5 re-measure (VERDICT item 7)
timeout 3000 python -u benchmarks/neural.py --width 256 --depth 5 \
    > artifacts_r05/neural_sine256.log 2>&1
grep -a '^{' artifacts_r05/neural_sine256.log | tail -1 \
    > artifacts_r05/neural_sine256.json

# 4. north-star arm BACKWARD chunk trace (VERDICT item 8)
timeout 1800 python -u benchmarks/trace_chunk.py artifacts_r05/trace_bwd \
    --bwd > artifacts_r05/trace_bwd.log 2>&1

# 5. mesh-real north-star (regression check for the new engine)
timeout 2400 python -u benchmarks/northstar.py --robot mesh_arm \
    > artifacts_r05/northstar_mesh_arm.log 2>&1
grep -a '^{' artifacts_r05/northstar_mesh_arm.log | tail -1 \
    > artifacts_r05/northstar_mesh_arm.json

echo QUEUE_DONE
