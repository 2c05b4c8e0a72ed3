#!/bin/bash
# Render all paper figures from figures/data/ghm-data/*.json (reference
# scripts/reproduce_figures.sh, with a matplotlib script replacing notebook
# execution).  DRY_RUN=1 prints the plan.
set -e
cd "$(dirname "$0")/.."

EXPECTED_PDFS=(
  "Fig2-a-CLIP-risk.pdf" "Fig2-b-ZSC-risk.pdf" "Fig2-c-CDM-risk.pdf"
  "Fig2-d-VLM-risk.pdf" "Fig5-ZSC-vs-M.pdf"
  "Fig6-a-ZSC-Fit-Standard TF.pdf" "Fig6-b-ZSC-Fit-Guided TF.pdf"
  "Fig6-c-ZSC-Fit-Shallow TF.pdf"
  "Fig8-a-CLIP-ood.pdf" "Fig8-b-ZSC-ood.pdf" "Fig8-c-CDM-ood.pdf"
  "Fig8-d-VLM-ood.pdf" "Fig9-a-CDM-ood.pdf" "Fig9-b-VLM-ood.pdf"
)

if [ "${DRY_RUN:-0}" = "1" ]; then
  echo "Plan: python figures/plot_figures.py"
  exit 0
fi

python figures/plot_figures.py

echo "=== asserting output PDFs ==="
fail=0
for p in "${EXPECTED_PDFS[@]}"; do
  f="figures/output/$p"
  if [ ! -s "$f" ]; then
    echo "MISSING/EMPTY: $f" >&2
    fail=1
  fi
done
# Fig7 PDFs additionally require the external ImageNet tensor.
if [ -f "figures/data/imagenet-data/similarities_targets.pt" ]; then
  for p in Fig7-a-imagenet-loss.pdf Fig7-b-imagenet-acc1.pdf Fig7-c-imagenet-acc5.pdf; do
    [ -s "figures/output/$p" ] || { echo "MISSING: figures/output/$p" >&2; fail=1; }
  done
fi
[ "$fail" = 0 ] && echo "figure PDFs present"
exit $fail
