"""Classification training entry point.

TPU-native counterpart of reference ``training/train_CLS.py``.  Note the
reference script, as shipped, replaces its classification sampler with a
hard-coded ``NextWordPredictSampler`` (L=4, C=3, p=0.4) and trains root
classification on its image side with a stubbed Bayes value of 0.1
(``train_CLS.py:63-96,136-138``; SURVEY.md Appendix A #5).  That shipped
behavior is reproduced here for surface parity.
"""

from dataclasses import dataclass
from typing import Optional

from ghm_tpu.train._runner import run_training
from ghm_tpu.train.tasks import build_cls_task
from ghm_tpu.utils.config import (
    ModelConfig,
    TreeConfig,
    UtilConfig,
    parse_config,
)


@dataclass
class TrainingConfig(UtilConfig, TreeConfig, ModelConfig):
    job_name: Optional[str] = "classification"


def main(argv=None):
    cfg = parse_config(TrainingConfig, argv)
    task, sampler, _ = build_cls_task(cfg)
    # Hard-coded sampler parameters per the shipped reference script.
    tree_folder = "K4_L4C3p40_L4C3p40sc10"
    model_name = f"L{cfg.n_model_layer}H{cfg.n_head}D{cfg.d_eb}"
    model_name = ("GT_" if cfg.guide else "TF_") + model_name
    tags = ("guide",) if cfg.guide else ()
    return run_training(cfg, task, model_name, tree_folder,
                        total_iters=cfg.total_iters, extra_wandb_tags=tags)


if __name__ == "__main__":
    main()
