#!/bin/bash
# Regenerate the paper's risk JSONs from checkpoints/ (reference
# scripts/reproduce_eval.sh).  DRY_RUN=1 prints the plan.
set -e
cd "$(dirname "$0")/.."

EVALS=(
  figures/eval-clip-risk.py
  figures/eval-cdm-risk.py
  figures/eval-vlm-risk.py
  figures/eval-zsc-risk.py
  figures/eval-zsc-numsamples.py
  figures/eval-clip-ood.py
  figures/eval-zsc-ood.py
  figures/eval-cdm-ood.py
  figures/eval-vlm-ood.py
)
EXPECTED_JSONS=(
  clip-risk.json cdm-risk.json vlm-risk.json zsc-risk.json
  zsc-numsamples.json clip-ood.json zsc-ood.json
  cdm-ood.json cdm-ood-pt20.json vlm-ood.json vlm-ood-pi20.json
)

if [ "${DRY_RUN:-0}" = "1" ]; then
  echo "Plan (in order):"
  printf '  python %s\n' "${EVALS[@]}"
  exit 0
fi

# Preflight: checkpoints must exist.
for fam in CLIP CDM VLM; do
  if [ ! -d "checkpoints/$fam" ]; then
    echo "ERROR: checkpoints/$fam missing — run scripts/reproduce_train.sh" >&2
    exit 1
  fi
done

for ev in "${EVALS[@]}"; do
  echo "=== $ev ==="
  python "$ev"
done

echo "=== asserting output JSONs ==="
fail=0
for j in "${EXPECTED_JSONS[@]}"; do
  f="figures/data/ghm-data/$j"
  if [ ! -s "$f" ]; then
    echo "MISSING/EMPTY: $f" >&2
    fail=1
  fi
done
[ "$fail" = 0 ] && echo "all ${#EXPECTED_JSONS[@]} JSONs present"
exit $fail
