#!/bin/bash
# Watch for all 8 VLM shard done-markers (tiny resume blobs), then run the
# VLM-dependent evals + figures in the freed claim window and commit the
# results.  Survives session death (launch with setsid nohup).
#
# Done-marker heuristic: a finished shard's resume blob is rewritten as a
# <100 KB marker ({'done': True}); a live shard's blob is ~790 MB.
cd "$(dirname "$0")/.."
D=logs/VLM/.sweep_resume
BLOBS=(
  "$D/nwp_GT_L9H4D256_p2-20_T30000.pkl"  "$D/nwp_GT_L9H4D256_p22-40_T30000.pkl"
  "$D/nwp_JT_L9H4D256_p2-20_T30000.pkl"  "$D/nwp_JT_L9H4D256_p22-40_T30000.pkl"
  "$D/snwp_ShT_L1H4D256_p2-20_T30000.pkl" "$D/snwp_ShT_L1H4D256_p22-40_T30000.pkl"
  "$D/snwp_StT_L9H4D256_p2-20_T30000.pkl" "$D/snwp_StT_L9H4D256_p22-40_T30000.pkl"
)
while true; do
  alldone=1
  for b in "${BLOBS[@]}"; do
    sz=$(stat -c%s "$b" 2>/dev/null || echo 999999999)
    [ "$sz" -ge 100000 ] && { alldone=0; break; }
  done
  [ "$alldone" = 1 ] && break
  sleep 300
done
echo "=== r4_vlm_finish: all shards done at $(date -u +%H:%M:%S); persisting ==="
python scripts/persist_artifacts.py --commit --message "Persist completed VLM grids"
# Wait for sweep processes to release their claims before taking one.
sleep 90
echo "=== r4_vlm_finish: running VLM evals ==="
timeout 7200 python tools/run_evals.py eval-vlm-risk eval-vlm-ood --figures \
  && echo "=== evals OK ===" || echo "=== evals FAILED rc=$? ==="
git add -f figures/data/ghm-data/vlm-risk.json figures/data/ghm-data/vlm-ood.json \
  figures/data/ghm-data/vlm-ood-pi20.json 2>/dev/null
git add figures/output 2>/dev/null
git add -A figures 2>/dev/null
git diff --cached --quiet || git commit -q -m "vlm-risk + vlm-ood regenerated from completed VLM grids; figures rendered"
echo "=== r4_vlm_finish: done at $(date -u +%H:%M:%S) ==="
