"""Training engine and task builders."""

from ghm_tpu.train.trainer import Task, Trainer, TrainResult
from ghm_tpu.train import tasks

__all__ = ["Task", "Trainer", "TrainResult", "tasks"]
