"""Generate zero-shot-classification OOD risk data for Fig. 8b (zsc-ood.json).

CLIP checkpoints fixed at p=0.20; the zero-shot test distribution sweeps p.
Includes the mis-specified-BP row (training-p inference on OOD image
leaves).  The reference script has a latent AttributeError at this step
(``eval-zsc-ood.py:104`` references a nonexistent ``sampler.transition``);
here the intended ``t_transition`` projection chain is used.
"""

import json
from collections import defaultdict

import jax
import numpy as np

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.data import ClipSampler, DoubleTreeSampler
from ghm_tpu.eval.evaluators import zsc_eval
from ghm_tpu.eval.loaders import CLIP_VARIANTS, load_clip_pair

BATCH_SIZE = 250


def main():
    path_runs = checkpoint_dir("CLIP") / "K4_L4C3p20_L4C3p20sc10"
    pairs = {name: load_clip_pair(path_runs / folder, name)
             for name, folder in CLIP_VARIANTS.items()}
    train_sampler = DoubleTreeSampler(n_layers=[4, 4], n_childs=[3, 3],
                                      p_flips=[0.2, 0.2], seedtree=42)
    misspec = (train_sampler.t_transition, train_sampler.i_transition)
    p_list = np.arange(2, 42, 2)
    res = defaultdict(list)
    res["p_flip"] = p_list.tolist()
    for step, p in enumerate(p_list):
        sampler = DoubleTreeSampler(n_layers=[4, 4], n_childs=[3, 3],
                                    p_flips=[p / 100, p / 100], seedtree=42)
        out = zsc_eval(sampler, pairs, np.array([BATCH_SIZE]),
                       jax.random.fold_in(jax.random.PRNGKey(1), step),
                       misspec_transitions=misspec)
        res["Bayes"].append(out["Bayes"][0])
        res["Mis-spec. BP"].append(out["Mis-spec. BP"][0])
        for name in CLIP_VARIANTS:
            res[name].append(out[name][0])
        print(f"p={p}: Bayes={res['Bayes'][-1]:.4f} "
              f"MisBP={res['Mis-spec. BP'][-1]:.4f}")
    with open(ghm_output_path("zsc-ood.json"), "w") as f:
        json.dump(dict(res), f, indent=4)
    print("wrote", ghm_output_path("zsc-ood.json"))


if __name__ == "__main__":
    main()
