"""Generate zero-shot-classification risk data for Fig. 2b (zsc-risk.json).

For each p on the grid: rebuild the shared-root sampler, draw a 7,500-pair
zero-shot batch, and evaluate the three CLIP variants' prototype-based
zero-shot cross entropy at support size M=250 against the exact Bayes
baseline (reference ``figures/eval-zsc-risk.py``).
"""

import json
from collections import defaultdict

import jax
import numpy as np

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.data import DoubleTreeSampler
from ghm_tpu.eval.evaluators import zsc_eval
from ghm_tpu.eval.loaders import CLIP_VARIANTS, load_clip_pair


def main():
    clip_folder = checkpoint_dir("CLIP")
    p_list = np.arange(2, 42, 2)
    res = defaultdict(list)
    res["p_flip"] = p_list.tolist()
    for step, p in enumerate(p_list):
        sampler = DoubleTreeSampler(n_layers=[4, 4], n_childs=[3, 3],
                                    variable_type=10,
                                    p_flips=[p / 100, p / 100], seedtree=42)
        path_runs = clip_folder / f"K4_L4C3p{p}_L4C3p{p}sc10"
        pairs = {name: load_clip_pair(path_runs / folder, name)
                 for name, folder in CLIP_VARIANTS.items()}
        out = zsc_eval(sampler, pairs, np.array([250]),
                       jax.random.fold_in(jax.random.PRNGKey(0), step))
        for name in CLIP_VARIANTS:
            res[name].append(out[name][0])
        res["Bayes"].append(out["Bayes"][0])
        print(f"p={p}: " + ", ".join(f"{k}={res[k][-1]:.4f}"
                                     for k in ("Bayes", *CLIP_VARIANTS)))
    with open(ghm_output_path("zsc-risk.json"), "w") as f:
        json.dump(dict(res), f, indent=4)
    print("wrote", ghm_output_path("zsc-risk.json"))


if __name__ == "__main__":
    main()
