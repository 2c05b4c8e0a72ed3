"""Sequential conditional-denoising training entry point.

TPU-native counterpart of reference ``training/train_sequential_DNS.py``:
a frozen pretrained CLIP text encoder compresses text leaves into a single
feature token that conditions a sequential CDM transformer.  The CLIP
checkpoint is located under ``logs/CLIP/<tree_folder>/`` by GT/TF folder
prefix, so CLIP must be trained (or downloaded) first.
"""

from dataclasses import dataclass
from typing import Optional

from ghm_tpu.train._runner import double_tree_folder, run_training
from ghm_tpu.train.tasks import build_sequential_dns_task
from ghm_tpu.utils.config import (
    DoubleTreeConfig,
    ModelConfig,
    UtilConfig,
    parse_config,
)


@dataclass
class TrainingConfig(UtilConfig, DoubleTreeConfig, ModelConfig):
    clip_feature: Optional[str] = "GT"
    job_name: Optional[str] = "Sequential_CDNS"


def main(argv=None):
    cfg = parse_config(TrainingConfig, argv)
    task, sampler, _ = build_sequential_dns_task(cfg, clip_feature=cfg.clip_feature)
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
