"""Generate VLM in-distribution risk data for Fig. 2d (vlm-risk.json).

Reference ``figures/eval-vlm-risk.py``.
"""

import json

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.eval.evaluators import history_risk_sweep
from ghm_tpu.eval.loaders import VLM_VARIANTS


def main():
    res = history_risk_sweep(checkpoint_dir("VLM"), VLM_VARIANTS)
    with open(ghm_output_path("vlm-risk.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("vlm-risk.json"))


if __name__ == "__main__":
    main()
