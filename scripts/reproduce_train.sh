#!/bin/bash
# Reproduce all training runs behind the paper figures on one TPU chip.
#
# Order matters: the CLIP sweeps run first because the sequential CDM/VLM
# variants load frozen CLIP encoders from logs/CLIP (reference
# scripts/reproduce_train.sh runs in the same order).  The joint sweeps each
# train their 20 p-points as ONE vmapped program; the sequential sweeps loop
# over p because each p needs its own frozen CLIP checkpoint.
#
# DRY_RUN=1 prints the plan without training.
set -e
cd "$(dirname "$0")/.."

EXPERIMENTS=(
  scripts/experiments/exp_clip_standardTF.sh
  scripts/experiments/exp_clip_guidedTF.sh
  scripts/experiments/exp_clip_shallowTF.sh
  scripts/experiments/exp_cdm_guidedTF.sh
  scripts/experiments/exp_cdm_jointtrain.sh
  scripts/experiments/exp_cdm_standardTF.sh
  scripts/experiments/exp_cdm_shallowTF.sh
  scripts/experiments/exp_vlm_guidedTF.sh
  scripts/experiments/exp_vlm_jointtrain.sh
  scripts/experiments/exp_vlm_standardTF.sh
  scripts/experiments/exp_vlm_shallowTF.sh
)

if [ "${DRY_RUN:-0}" = "1" ]; then
  echo "Plan (in order):"
  printf '  %s\n' "${EXPERIMENTS[@]}"
  echo "Then stage logs/{CLIP,CDM,VLM} -> checkpoints/"
  exit 0
fi

for exp in "${EXPERIMENTS[@]}"; do
  echo "=== $exp ==="
  bash "$exp"
done

echo "=== staging logs -> checkpoints ==="
mkdir -p checkpoints
for fam in CLIP CDM VLM; do
  [ -d "logs/$fam" ] && cp -r "logs/$fam" checkpoints/
done
echo "reproduce_train complete"
