#!/bin/bash
# Slow-suite in 4 named chunks with per-chunk junitxml records
# (VERDICT r4 #4: one complete slow pass on record, sharded into
# driver-sized chunks, green logs committed under bench_artifacts/r05/).
# Usage: tools/run_slow_chunks.sh [chunk#]   (no arg = all, serially)
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/r05
declare -A CHUNKS=(
  [1]="tests/test_engine.py tests/test_rect_val.py"
  [2]="tests/test_head_variants.py tests/test_fsdp.py tests/test_dp_sp_compose.py"
  [3]="tests/test_multihost.py tests/test_callbacks_integration.py tests/test_autobackend.py tests/test_matcher_soak.py"
  [4]="tests/test_sam.py tests/test_yolo.py tests/test_rtdetr.py tests/test_classify.py"
)
run_one() {
  local n=$1
  echo "=== slow chunk $n: ${CHUNKS[$n]}"
  timeout 4500 python -m pytest ${CHUNKS[$n]} -m "slow or not slow" -q \
    --junitxml="bench_artifacts/r05/slow_chunk${n}.xml" \
    2>&1 | tail -3 | tee "bench_artifacts/r05/slow_chunk${n}.tail"
}
if [ $# -ge 1 ]; then
  run_one "$1"
else
  for n in 1 2 3 4; do run_one "$n"; done
fi
