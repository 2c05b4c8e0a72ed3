"""Config, logging, checkpointing, and torch interop utilities."""

from ghm_tpu.utils.config import (
    TreeConfig,
    DoubleTreeConfig,
    ModelConfig,
    ClipModelConfig,
    OptimizerConfig,
    LoggingConfig,
    UtilConfig,
    parse_config,
)
from ghm_tpu.utils.logger import gen_logger
from ghm_tpu.utils import checkpoint
from ghm_tpu.utils import torch_interop

__all__ = [
    "TreeConfig",
    "DoubleTreeConfig",
    "ModelConfig",
    "ClipModelConfig",
    "OptimizerConfig",
    "LoggingConfig",
    "UtilConfig",
    "parse_config",
    "gen_logger",
    "checkpoint",
    "torch_interop",
]
