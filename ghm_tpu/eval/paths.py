"""Path contract for evaluation artifacts, relative to the repo root.

Counterpart of reference ``figures/eval_paths.py``: checkpoints live under
``checkpoints/<FAMILY>/<tree_folder>/<model_folder>/[<timestamp>/]checkpoint.pth``
and evaluation JSONs under ``figures/data/ghm-data/``.
"""

from __future__ import annotations

import os
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
CHECKPOINT_ROOT = REPO_ROOT / "checkpoints"
GHM_DATA_DIR = REPO_ROOT / "figures" / "data" / "ghm-data"


def checkpoint_dir(model_family: str) -> Path:
    """Checkpoint directory for a model family (CLIP/CDM/VLM)."""
    return CHECKPOINT_ROOT / model_family


def latest_checkpoint(path_run) -> Path:
    """Accept ``run/checkpoint.pth`` or ``run/<timestamp>/checkpoint.pth``."""
    path_run = Path(path_run)
    direct = path_run / "checkpoint.pth"
    if direct.exists():
        return direct
    candidates = sorted(path_run.glob("*/checkpoint.pth"))
    if not candidates:
        raise FileNotFoundError(f"Checkpoint file not found under: {path_run}")
    return candidates[-1]


def ghm_output_path(filename: str) -> Path:
    GHM_DATA_DIR.mkdir(parents=True, exist_ok=True)
    return GHM_DATA_DIR / filename
