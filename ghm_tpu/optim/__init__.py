"""Optimizers and schedules (reference-semantics AdamW/SGD, cosine LR)."""

from ghm_tpu.optim.adamw import (
    AdamWState,
    adamw_init,
    adamw_update,
    SGDState,
    sgd_init,
    sgd_update,
    clip_by_global_norm,
    lr_cosine_schedule,
)

__all__ = [
    "AdamWState",
    "adamw_init",
    "adamw_update",
    "SGDState",
    "sgd_init",
    "sgd_update",
    "clip_by_global_norm",
    "lr_cosine_schedule",
]
