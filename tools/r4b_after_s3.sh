#!/bin/bash
# Round-4 (relaunched session) shepherd: when the S3 slot chain (pid $1,
# vlm_sh s2 -> vlm_st s1) exits, take over its TPU claim slot and
# regenerate the non-VLM OOD/numsamples eval artifacts from the CURRENT
# trained checkpoints (VERDICT r3 Missing #4 / Next #3: the committed
# JSONs still carry round-1 provenance; two prior regeneration runs were
# lost to session/round boundaries before their outputs were committed).
# This time the script commits the refreshed artifacts itself.
cd "$(dirname "$0")/.."
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
  echo "=== after_s3: waiting for pid $WAIT_PID ($(date -u +%H:%M:%S)) ==="
  tail --pid="$WAIT_PID" -f /dev/null
  sleep 30   # let the relay release the claim
fi
echo "=== after_s3: OOD/numsamples regeneration ($(date -u +%H:%M:%S)) ==="
timeout 7200 python tools/run_evals.py --only clip-ood,zsc-ood,cdm-ood,zsc-numsamples
rc=$?
echo "=== after_s3: run_evals rc=$rc ($(date -u +%H:%M:%S)) ==="
if [ $rc -eq 0 ]; then
  git add figures/data/ghm-data/clip-ood.json figures/data/ghm-data/zsc-ood.json \
          figures/data/ghm-data/cdm-ood.json figures/data/ghm-data/cdm-ood-pt20.json \
          figures/data/ghm-data/zsc-numsamples.json 2>/dev/null
  git commit -q -m "Regenerate OOD/numsamples eval artifacts from current checkpoints" \
    && echo "=== after_s3: committed refreshed artifacts ==="
fi
echo "=== after_s3: done ($(date -u +%H:%M:%S)) ==="
