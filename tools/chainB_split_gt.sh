#!/bin/bash
# Round-4 chain B: when vlm_jt s1 (pid $1) exits (freeing a TPU-relay claim
# slot), stop the running 10-model vlm_gt s1 remat program (pid $2), split
# its resume blob into two 5-model slice blobs (tools/split_resume_blob.py),
# and run both slices as concurrent processes.  Round-3 measurements: step
# time grows superlinearly with model count under remat (cdm 10-model
# 142 ms/iter vs 20-model 634), while concurrent sweep processes scale
# near-linearly — so this roughly halves GT's remaining wall-clock, the
# round-4 critical path (GT s1 was at 9.1k/30000 at ~1.25 s/iter).
#
# Claim math: jt-s1 exit frees one claim, killing gt-s1 frees another;
# the two slice processes take both back -> total stays at 4.
set -u
JT_PID="$1"; GT_PID="$2"
cd "$(dirname "$0")/.."

ID_JT="$(ps -p "${JT_PID}" -o args= 2>/dev/null || true)"
echo "chainB: waiting for pid ${JT_PID} (${ID_JT}) to exit"
while kill -0 "${JT_PID}" 2>/dev/null; do
  CUR="$(ps -p "${JT_PID}" -o args= 2>/dev/null || true)"
  [ "${CUR}" = "${ID_JT}" ] || break   # pid recycled: target is gone
  sleep 60
done
echo "chainB: jt s1 exited; stopping gt s1 pid ${GT_PID}"
kill "${GT_PID}" 2>/dev/null || true
sleep 120   # claim-release grace for both freed claims
BLOB=logs/VLM/.sweep_resume/nwp_GT_L9H4D256_p2-20_T30000.pkl
python tools/split_resume_blob.py "${BLOB}" || exit 1
# keep the parent blob aside until the children prove resumable; cleaned up
# manually once both slices are past their first blob write
mv "${BLOB}" "${BLOB}.presplit"
setsid nohup python tools/run_grid_slice.py vlm_gt --p_list=0.12:0.20:0.02 \
    --remat=True >> logs_vlm_gt_s1b.log 2>&1 < /dev/null &
echo "$!" > /tmp/gt_s1b.pid
echo "chainB: launched gt s1b pid $(cat /tmp/gt_s1b.pid)"
sleep 30
echo "chainB: exec gt s1a"
exec python tools/run_grid_slice.py vlm_gt --p_list=0.02:0.10:0.02 --remat=True
