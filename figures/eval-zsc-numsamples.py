"""Generate ZSC sample-scaling data for Figs. 5/6 (zsc-numsamples.json).

Fixed p=0.20, sweeping the zero-shot support size M=1..250 (reference
``figures/eval-zsc-numsamples.py:126-146``).
"""

import json

import jax
import numpy as np

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.data import DoubleTreeSampler
from ghm_tpu.eval.evaluators import zsc_eval
from ghm_tpu.eval.loaders import CLIP_VARIANTS, load_clip_pair


def main():
    p = 20
    sampler = DoubleTreeSampler(n_layers=[4, 4], n_childs=[3, 3],
                                variable_type=10,
                                p_flips=[p / 100, p / 100], seedtree=42)
    path_runs = checkpoint_dir("CLIP") / f"K4_L4C3p{p}_L4C3p{p}sc10"
    pairs = {name: load_clip_pair(path_runs / folder, name)
             for name, folder in CLIP_VARIANTS.items()}
    num_samples_list = np.arange(1, 251)
    res = zsc_eval(sampler, pairs, num_samples_list, jax.random.PRNGKey(0))
    res["Bayes"] = res["Bayes"] * len(num_samples_list)
    with open(ghm_output_path("zsc-numsamples.json"), "w") as f:
        json.dump(dict(res), f, indent=4)
    print("wrote", ghm_output_path("zsc-numsamples.json"))


if __name__ == "__main__":
    main()
