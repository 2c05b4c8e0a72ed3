"""Evaluate all p=0.20 trained checkpoints against the published values.

Stages logs/{CLIP,CDM,VLM} into checkpoints/, then computes the Fig. 2
headline metrics at the p=0.20 operating point — training-loss tails (the
published risk measure), the ZSC prototype evaluation, and Bayes baselines —
and prints a comparison table against figures/data/ghm-data values from the
reference repo.

Run on CPU (the reference also evaluates on CPU):
    python tools/eval_p20_snapshot.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
os.chdir(os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

PUBLISHED = {
    "CLIP": {"Bayes": 0.5814, "Standard TF": 0.6410, "Guided TF": 0.5857,
             "Shallow TF": 0.7015},
    "ZSC": {"Bayes": 1.8418, "Standard TF": 1.8657, "Guided TF": 1.8596,
            "Shallow TF": 1.8749},
    "CDM": {"Bayes": 33.0415, "Standard TF": 33.6041, "Guided TF": 33.0972,
            "Shallow TF": 38.7732, "Joint Training": 33.4914},
    "VLM": {"Bayes": 1.1536, "Standard TF": 1.1566, "Guided TF": 1.1555,
            "Shallow TF": 1.1709, "Joint Training": 1.1579},
}


def main():
    os.makedirs("checkpoints", exist_ok=True)
    for fam in ("CLIP", "CDM", "VLM"):
        if os.path.isdir(os.path.join("logs", fam)):
            shutil.copytree(os.path.join("logs", fam),
                            os.path.join("checkpoints", fam),
                            dirs_exist_ok=True)

    from ghm_tpu.eval.evaluators import history_risk_sweep, zsc_eval
    from ghm_tpu.eval.loaders import (CDM_VARIANTS, CLIP_VARIANTS,
                                      VLM_VARIANTS, load_clip_pair)
    from ghm_tpu.eval.paths import checkpoint_dir
    from ghm_tpu.data import DoubleTreeSampler

    results = {}
    for fam, variants in (("CLIP", CLIP_VARIANTS), ("CDM", CDM_VARIANTS),
                          ("VLM", VLM_VARIANTS)):
        try:
            res = history_risk_sweep(checkpoint_dir(fam), variants,
                                     p_grid=np.array([20]))
            results[fam] = {k: v[0] for k, v in res.items() if k != "p_flip"}
        except FileNotFoundError as exc:
            print(f"[{fam}] missing checkpoints: {exc}")

    try:
        sampler = DoubleTreeSampler(n_layers=[4, 4], n_childs=[3, 3],
                                    variable_type=10, p_flips=[0.2, 0.2],
                                    seedtree=42)
        path_runs = checkpoint_dir("CLIP") / "K4_L4C3p20_L4C3p20sc10"
        pairs = {name: load_clip_pair(path_runs / folder, name)
                 for name, folder in CLIP_VARIANTS.items()}
        out = zsc_eval(sampler, pairs, np.array([250]), jax.random.PRNGKey(0))
        results["ZSC"] = {k: v[0] for k, v in out.items()
                          if k != "num_samples_list"}
    except FileNotFoundError as exc:
        print(f"[ZSC] missing checkpoints: {exc}")

    print(f"\n{'task':6s} {'metric':16s} {'ghm_tpu':>10s} {'published':>10s} "
          f"{'Δexcess':>9s}")
    for fam, vals in results.items():
        pub = PUBLISHED.get(fam, {})
        bayes_mine = vals.get("Bayes")
        bayes_pub = pub.get("Bayes")
        for k, v in vals.items():
            pv = pub.get(k)
            dexcess = ""
            if pv is not None and k != "Bayes" and bayes_mine and bayes_pub:
                dexcess = f"{(v - bayes_mine) - (pv - bayes_pub):+9.4f}"
            print(f"{fam:6s} {k:16s} {v:10.4f} "
                  f"{pv if pv is not None else float('nan'):10.4f} {dexcess}")
    with open("p20_snapshot.json", "w") as f:
        json.dump(results, f, indent=1)
    print("\nwrote p20_snapshot.json")


if __name__ == "__main__":
    main()
