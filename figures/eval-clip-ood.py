"""Generate CLIP out-of-distribution risk data for Fig. 8a (clip-ood.json).

CLIP checkpoints trained at p=0.20 are evaluated on p-swept batches together
with the exact Bayes baseline and a mis-specified-BP baseline that runs
inference with the training transitions on the OOD leaves (reference
``figures/eval-clip-ood.py``).
"""

import json

import jax

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.eval.evaluators import clip_ood_eval
from ghm_tpu.eval.loaders import CLIP_VARIANTS, load_clip_pair


def main():
    path_runs = checkpoint_dir("CLIP") / "K4_L4C3p20_L4C3p20sc10"
    pairs = {name: load_clip_pair(path_runs / folder, name)
             for name, folder in CLIP_VARIANTS.items()}
    res = clip_ood_eval(pairs, jax.random.PRNGKey(0))
    with open(ghm_output_path("clip-ood.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("clip-ood.json"))


if __name__ == "__main__":
    main()
