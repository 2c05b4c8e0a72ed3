"""CLIP training entry point.

TPU-native counterpart of reference ``training/train_CLIP.py``: paired
``EncoderTransformer`` text/image towers trained with the symmetric K-way
contrastive objective on online-generated GHM pairs, with sampling + BP
guide targets + update fused into one compiled step.

Usage matches the reference shell scripts::

    python -m ghm_tpu.train.train_CLIP --n_ttree_layer=4 ... --clip_guide=True

Note the reference trains ``total_iters + 1`` steps for CLIP
(``train_CLIP.py:139``) — preserved here.
"""

from dataclasses import dataclass
from typing import Optional

from ghm_tpu.train._runner import double_tree_folder, run_training
from ghm_tpu.train.tasks import build_clip_task
from ghm_tpu.utils.config import (
    ClipModelConfig,
    DoubleTreeConfig,
    UtilConfig,
    parse_config,
)


@dataclass
class TrainingConfig(UtilConfig, DoubleTreeConfig, ClipModelConfig):
    job_name: Optional[str] = "clip"


def main(argv=None):
    cfg = parse_config(TrainingConfig, argv)
    task, sampler, _ = build_clip_task(cfg)
    tree_folder = double_tree_folder(cfg)
    model_name = (f"L{cfg.clip_tmodel_nlayer}H{cfg.clip_tmodel_nhead}"
                  f"D{cfg.clip_tmodel_deb}_L{cfg.clip_imodel_nlayer}"
                  f"H{cfg.clip_imodel_nhead}D{cfg.clip_imodel_deb}")
    model_name = ("GT_" if cfg.clip_guide else "TF_") + model_name
    tags = ("guide",) if cfg.clip_guide else ()
    return run_training(cfg, task, model_name, tree_folder,
                        total_iters=cfg.total_iters + 1,
                        extra_wandb_tags=tags)


if __name__ == "__main__":
    main()
