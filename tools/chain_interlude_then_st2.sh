#!/bin/bash
# Round-3 chain A: when the vlm_sh sweep process exits (freeing its TPU-relay
# claim slot), run the two pending hardware measurements in that slot —
# the Pallas tree-sampler A/B (VERDICT #4) and the scan-chunk dispatch-
# amortization study + profiler trace (VERDICT #5) — then start the final
# sequential-VLM shard (vlm_st p22-40).  One slot, strictly serialized;
# each python process releases its claim on exit before the next starts.
set -u
WAIT_PID="$1"
cd "$(dirname "$0")/.."

echo "chainA: waiting for pid ${WAIT_PID} (vlm_sh) to exit"
while kill -0 "${WAIT_PID}" 2>/dev/null; do sleep 60; done
echo "chainA: slot free; 90s claim-release grace"
sleep 90
echo "chainA: pallas A/B"
timeout 1200 python tools/phase2_interlude.py --skip-rates --skip-30k
sleep 60
echo "chainA: chunk study + trace"
timeout 1800 python tools/profile_sweep_step.py --task cdm_jt --n 5 \
    --chunks 1,20,100 --trace logs/profile/cdm_jt
sleep 60
echo "chainA: starting vlm_st p22-40"
exec python tools/run_grid_slice.py vlm_st --p_list=0.22:0.40:0.02
