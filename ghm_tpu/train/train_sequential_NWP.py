"""Sequential next-word-prediction training entry point.

TPU-native counterpart of reference ``training/train_sequential_NWP.py``:
a frozen pretrained CLIP image encoder produces a one-token image feature
prefix for a sequential autoregressive text model.  The Bayes baseline is
only computed for persistent (``raw=False``) runs, as in the reference
(``:78-84``).
"""

from dataclasses import dataclass
from typing import Optional

from ghm_tpu.train._runner import double_tree_folder, run_training
from ghm_tpu.train.tasks import build_sequential_nwp_task
from ghm_tpu.utils.config import (
    DoubleTreeConfig,
    ModelConfig,
    UtilConfig,
    parse_config,
)


@dataclass
class TrainingConfig(UtilConfig, DoubleTreeConfig, ModelConfig):
    clip_feature: Optional[str] = "GT"
    job_name: Optional[str] = "Sequential_NWP"


def main(argv=None):
    cfg = parse_config(TrainingConfig, argv)
    task, sampler, _ = build_sequential_nwp_task(
        cfg, clip_feature=cfg.clip_feature, raw=cfg.raw)
    tree_folder = double_tree_folder(cfg)
    model_name = f"L{cfg.n_model_layer}H{cfg.n_head}D{cfg.d_eb}"
    if cfg.guide:
        model_name, tags = "GT_" + model_name, ("guide",)
    elif cfg.n_model_layer == 1:
        model_name, tags = "ShT_" + model_name, ()
    else:
        model_name, tags = "StT_" + model_name, ()
    return run_training(cfg, task, model_name, tree_folder,
                        total_iters=cfg.total_iters, extra_wandb_tags=tags,
                        track_compare=True)


if __name__ == "__main__":
    main()
