#!/bin/bash
# After the OOD-regeneration shepherd (pid $1) frees its claim slot, run the
# bench matmul-precision A/B that rounds 3-4 planned but never recorded:
# the same guided-CLIP train step at the platform-default precision (bf16
# matmul inputs on TPU) vs the explicit f32 "highest" operating point the
# headline bench pins.  Output goes to logs_r4b_bench_ab.json-lines for
# PARITY/README to cite.
cd "$(dirname "$0")/.."
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
  echo "=== bench_ab: waiting for pid $WAIT_PID ($(date -u +%H:%M:%S)) ==="
  tail --pid="$WAIT_PID" -f /dev/null
  sleep 30
fi
echo "=== bench_ab: BENCH_PRECISION=default ($(date -u +%H:%M:%S)) ==="
timeout 1200 env BENCH_PRECISION=default python bench.py
sleep 10
echo "=== bench_ab: BENCH_PRECISION=highest ($(date -u +%H:%M:%S)) ==="
timeout 1200 env BENCH_PRECISION=highest python bench.py
echo "=== bench_ab: done ($(date -u +%H:%M:%S)) ==="
