"""Generate CDM in-distribution risk data for Fig. 2c (cdm-risk.json).

Reference ``figures/eval-cdm-risk.py``.
"""

import json

from eval_paths import checkpoint_dir, ghm_output_path
from ghm_tpu.eval.evaluators import history_risk_sweep
from ghm_tpu.eval.loaders import CDM_VARIANTS


def main():
    res = history_risk_sweep(checkpoint_dir("CDM"), CDM_VARIANTS)
    with open(ghm_output_path("cdm-risk.json"), "w") as f:
        json.dump(res, f, indent=4)
    print("wrote", ghm_output_path("cdm-risk.json"))


if __name__ == "__main__":
    main()
