"""Shared CLI scaffolding for the six training entry points.

Mirrors the reference scripts' operational surface (``train_CLIP.py:23-220``):
flag names, checkpoint folder naming, logger/WandB/S3 sinks, Bayes logging —
while delegating the loop itself to :class:`ghm_tpu.train.trainer.Trainer`.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import asdict

import jax

from ghm_tpu.train.trainer import Trainer
from ghm_tpu.utils import checkpoint as ckpt
from ghm_tpu.utils.logger import gen_logger

__all__ = ["run_training", "double_tree_folder", "model_prefix"]


def double_tree_folder(cfg):
    return ckpt.tree_folder_name(
        cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child, cfg.p_ttree_flip,
        cfg.n_itree_layer, cfg.n_itree_child, cfg.p_itree_flip, cfg.flip_scale)


def model_prefix(guide, n_model_layer=None, sequential=False):
    """Reference model-name prefixes: GT (guided), TF/JT (standard/joint),
    StT/ShT (sequential standard/shallow) — ``train_sequential_DNS.py:48-54``."""
    if guide:
        return "GT"
    if sequential:
        return "ShT" if n_model_layer == 1 else "StT"
    return None  # caller picks TF or JT


def run_training(cfg, task, model_name, tree_folder, *, total_iters,
                 extra_wandb_tags=(), logs_root="./logs",
                 track_compare=False):
    """Set up run directory, sinks, and fit the task."""
    timestamp = time.strftime("%Y%m%d-%H%M%S", time.localtime())
    job_name = cfg.job_name
    directory = ckpt.run_directory(logs_root, job_name, tree_folder,
                                   model_name, timestamp)
    logger = gen_logger(directory, cfg, raw=cfg.raw)
    wandb_run = None
    checkpoint_path = None
    if not cfg.raw:
        checkpoint_path = os.path.join(directory, "checkpoint.pth")
        if cfg.wandb_logging:
            try:
                import wandb

                wandb_run = wandb.init(
                    project=cfg.wandb_project,
                    name=timestamp + "-" + model_name,
                    tags=[job_name, tree_folder, *extra_wandb_tags],
                    dir=cfg.wandb_path, mode=os.environ.get("WANDB_MODE", "offline"))
                wandb_run.config.update(asdict(cfg))
            except Exception as exc:  # wandb is an optional sink
                logger.warning(f"wandb unavailable ({exc}); continuing without")
    logger.info(f"Bayes Loss: {task.bayes[0]}, Bayes Std: {task.bayes[1]}")
    if wandb_run is not None:
        wandb_run.log({"Bayes_loss": task.bayes[0], "Bayes_std": task.bayes[1]})

    trainer = Trainer(
        task, total_iters=total_iters, lr_max=cfg.lr_max, lr_min=cfg.lr_min,
        warmup_iters=cfg.warmup_iters, max_norm=cfg.max_norm,
        log_interval=cfg.log_interval, eval_interval=cfg.eval_interval,
        seed=cfg.seed, logger=logger, checkpoint_path=checkpoint_path,
        track_compare=track_compare, bayes=task.bayes, wandb_run=wandb_run)
    result = trainer.fit(init_from=cfg.init_from)

    if wandb_run is not None:
        wandb_run.finish()
    logging.shutdown()

    if cfg.S3_upload:
        try:
            import s3fs

            s3 = s3fs.S3FileSystem()
            s3_path = (cfg.S3_bucket_name
                       + f"/GHM/{job_name}/{tree_folder}/{model_name}/{timestamp}")
            s3.put(directory, s3_path, recursive=True)
        except Exception as exc:
            logging.getLogger().warning(f"S3 upload failed: {exc}")
    return result, directory
