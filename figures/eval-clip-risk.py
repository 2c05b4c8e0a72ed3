"""Generate CLIP in-distribution risk data for Fig. 2a (clip-risk.json).

Reads the final training-loss window and Bayes baseline from the CLIP
checkpoints over the p-flip grid (reference ``figures/eval-clip-risk.py``).
"""

import json

from eval_paths import checkpoint_dir, ghm_output_path  # noqa: F401 (sys.path setup)
from ghm_tpu.eval.evaluators import history_risk_sweep
from ghm_tpu.eval.loaders import CLIP_VARIANTS


def main():
    res = history_risk_sweep(checkpoint_dir("CLIP"), CLIP_VARIANTS)
    with open(ghm_output_path("clip-risk.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("clip-risk.json"))


if __name__ == "__main__":
    main()
