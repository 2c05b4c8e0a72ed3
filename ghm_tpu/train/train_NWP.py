"""Joint next-word-prediction (VLM) training entry point.

TPU-native counterpart of reference ``training/train_NWP.py``: an
``AutoRegressiveTransformer`` with an image prefix and causal text block,
trained against sampled next tokens with exact autoregressive-BP posteriors
as the KL comparison diagnostic.
"""

from dataclasses import dataclass
from typing import Optional

from ghm_tpu.train._runner import double_tree_folder, run_training
from ghm_tpu.train.tasks import build_nwp_task
from ghm_tpu.utils.config import (
    DoubleTreeConfig,
    ModelConfig,
    UtilConfig,
    parse_config,
)


@dataclass
class TrainingConfig(UtilConfig, DoubleTreeConfig, ModelConfig):
    job_name: Optional[str] = "next_word_prediction"


def main(argv=None):
    cfg = parse_config(TrainingConfig, argv)
    task, sampler, _ = build_nwp_task(cfg)
    tree_folder = double_tree_folder(cfg)
    model_name = f"L{cfg.n_model_layer}H{cfg.n_head}D{cfg.d_eb}"
    model_name = ("GT_" if cfg.guide else "JT_") + model_name
    tags = ("guide",) if cfg.guide else ()
    return run_training(cfg, task, model_name, tree_folder,
                        total_iters=cfg.total_iters, extra_wandb_tags=tags,
                        track_compare=True)


if __name__ == "__main__":
    main()
