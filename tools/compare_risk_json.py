"""Diff generated risk JSONs against the reference's published artifacts.

For each ``figures/data/ghm-data/*.json`` that also exists in the reference
repo, prints per-variant max/mean absolute deltas and the curve-shape
correlation — the parity evidence PARITY.md's scorecard records.

Usage: python tools/compare_risk_json.py [names...]
"""

import json
import os
import sys

import numpy as np

OURS = "/root/repo/figures/data/ghm-data"
REF = "/root/reference/figures/data/ghm-data"

DEFAULT = ["clip-risk.json", "zsc-risk.json", "cdm-risk.json",
           "vlm-risk.json", "zsc-numsamples.json", "clip-ood.json",
           "zsc-ood.json", "cdm-ood.json", "cdm-ood-pt20.json",
           "vlm-ood.json", "vlm-ood-pi20.json"]


def main():
    names = sys.argv[1:] or DEFAULT
    for name in names:
        ours_p, ref_p = os.path.join(OURS, name), os.path.join(REF, name)
        if not os.path.exists(ours_p):
            print(f"{name}: (not generated)")
            continue
        if not os.path.exists(ref_p):
            print(f"{name}: (no published counterpart)")
            continue
        ours, ref = json.load(open(ours_p)), json.load(open(ref_p))
        print(f"== {name} ==")
        for key in ref:
            if key not in ours:
                print(f"  {key:15s}: MISSING in ours")
                continue
            a, b = np.asarray(ours[key], float), np.asarray(ref[key], float)
            if a.shape != b.shape:
                print(f"  {key:15s}: shape {a.shape} vs {b.shape}")
                continue
            d = np.abs(a - b)
            corr = (np.corrcoef(a, b)[0, 1] if a.size > 2 and a.std() > 0
                    and b.std() > 0 else float("nan"))
            print(f"  {key:15s}: max|d| {d.max():.4f}  mean|d| "
                  f"{d.mean():.4f}  shape-corr {corr:.4f}")


if __name__ == "__main__":
    main()
