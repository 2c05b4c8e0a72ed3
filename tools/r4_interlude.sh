#!/bin/bash
# Round-4 interlude: when the S3 sweep chain (pid $1) exits, take over its
# TPU claim slot and run, serially in ONE slot:
#   1. the scan-chunk amortization study + jax.profiler trace (VERDICT r3 #2b)
#   2. bench.py matmul-precision A/B (pins what operating point the headline
#      bench actually measures: platform default vs explicit highest)
#   3. regeneration of the non-VLM OOD/numsamples eval artifacts on the TPU
#      (VERDICT r3 #3; the round-3 CPU regeneration outputs were lost)
cd "$(dirname "$0")/.."
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
  echo "=== interlude: waiting for pid $WAIT_PID to exit ($(date -u +%H:%M:%S)) ==="
  tail --pid="$WAIT_PID" -f /dev/null
  sleep 30   # let the relay release the claim
fi
echo "=== interlude: chunk study + trace ($(date -u +%H:%M:%S)) ==="
timeout 2400 python tools/profile_sweep_step.py --task cdm_jt --n 5 \
  --chunks 1,10,50,100 --trace logs/profile/cdm_jt > logs_r4_chunkstudy.log 2>&1
sleep 10
echo "=== interlude: bench precision A/B ($(date -u +%H:%M:%S)) ==="
{ echo "--- BENCH_PRECISION=highest";
  timeout 1200 env BENCH_PRECISION=highest python bench.py;
  sleep 10;
  echo "--- BENCH_PRECISION=default";
  timeout 1200 env BENCH_PRECISION=default python bench.py;
  sleep 10;
  echo "--- unset (headline operating point)";
  timeout 1200 python bench.py; } > logs_r4_bench_ab.log 2>&1
sleep 10
echo "=== interlude: OOD/numsamples eval regeneration on TPU ($(date -u +%H:%M:%S)) ==="
timeout 7200 python tools/run_evals.py --only clip-ood,zsc-ood,cdm-ood,zsc-numsamples \
  > logs_r4_evals1.log 2>&1
echo "=== interlude done ($(date -u +%H:%M:%S)) ==="
