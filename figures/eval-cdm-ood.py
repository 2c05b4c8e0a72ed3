"""Generate CDM OOD risk data for Figs. 8c/9a (cdm-ood.json, cdm-ood-pt20.json).

CDM checkpoints trained at p=0.20 evaluated under two sweeps: both
modalities swept together (Fig. 8c) and text fixed at p_t=0.20 with only the
image p_i swept (Fig. 9a), each with Bayes and mis-specified-BP baselines
(reference ``figures/eval-cdm-ood.py``).
"""

import json

import jax

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.eval.evaluators import cdm_ood_eval
from ghm_tpu.eval.loaders import CDM_VARIANTS, load_cdm_model, load_clip_encoder


def main():
    path_runs = checkpoint_dir("CDM") / "K4_L4C3p20_L4C3p20sc10"
    models = {name: load_cdm_model(path_runs / folder, name)
              for name, folder in CDM_VARIANTS.items()}
    clip_text = load_clip_encoder(
        checkpoint_dir("CLIP") / "K4_L4C3p20_L4C3p20sc10" / "TF_L5H4D128_L5H4D128",
        side="text")

    res = cdm_ood_eval(models, clip_text, jax.random.PRNGKey(2),
                       p_pair=lambda p: (p, p))
    with open(ghm_output_path("cdm-ood.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("cdm-ood.json"))

    res = cdm_ood_eval(models, clip_text, jax.random.PRNGKey(3),
                       p_pair=lambda p: (20, p))
    with open(ghm_output_path("cdm-ood-pt20.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("cdm-ood-pt20.json"))


if __name__ == "__main__":
    main()
