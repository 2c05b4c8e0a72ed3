"""Evaluation layer: risk/ZSC/OOD sweeps and checkpoint loaders."""

from ghm_tpu.eval.paths import (
    CHECKPOINT_ROOT,
    GHM_DATA_DIR,
    REPO_ROOT,
    checkpoint_dir,
    ghm_output_path,
    latest_checkpoint,
)
from ghm_tpu.eval import loaders, evaluators

__all__ = [
    "CHECKPOINT_ROOT",
    "GHM_DATA_DIR",
    "REPO_ROOT",
    "checkpoint_dir",
    "ghm_output_path",
    "latest_checkpoint",
    "loaders",
    "evaluators",
]
