"""Generate VLM OOD risk data for Figs. 8d/9b (vlm-ood.json, vlm-ood-pi20.json).

VLM checkpoints trained at p=0.20 evaluated under two sweeps: both
modalities swept together (Fig. 8d) and image fixed at p_i=0.20 with only
the text p_t swept (Fig. 9b), each with Bayes and mis-specified-BP baselines
(reference ``figures/eval-vlm-ood.py``).
"""

import json

import jax

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.eval.evaluators import vlm_ood_eval
from ghm_tpu.eval.loaders import VLM_VARIANTS, load_clip_encoder, load_vlm_model


def main():
    path_runs = checkpoint_dir("VLM") / "K4_L4C3p20_L4C3p20sc10"
    models = {name: load_vlm_model(path_runs / folder, name)
              for name, folder in VLM_VARIANTS.items()}
    clip_image = load_clip_encoder(
        checkpoint_dir("CLIP") / "K4_L4C3p20_L4C3p20sc10" / "TF_L5H4D128_L5H4D128",
        side="image")

    res = vlm_ood_eval(models, clip_image, jax.random.PRNGKey(4),
                       p_pair=lambda p: (p, p))
    with open(ghm_output_path("vlm-ood.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("vlm-ood.json"))

    res = vlm_ood_eval(models, clip_image, jax.random.PRNGKey(5),
                       p_pair=lambda p: (p, 20))
    with open(ghm_output_path("vlm-ood-pi20.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("vlm-ood-pi20.json"))


if __name__ == "__main__":
    main()
