"""Configuration dataclasses and CLI parsing.

Field names and defaults mirror the reference's config blocks
(``utils/config.py:6-101``) so the published experiment shell scripts
(``scripts/experiments/*.sh``, ``scripts/examples/*.sh``) drive this
framework with unchanged flags.  Unlike the reference (which splats parsed
flags into module globals via ``locals().update``), configs here stay typed
objects passed explicitly to the trainer.

``parse_config`` is a dependency-light dataclass CLI parser accepting the
reference's ``--name=value`` style, including stringly booleans
(``--clip_guide=True``).
"""

from __future__ import annotations

import sys
from dataclasses import MISSING, asdict, dataclass, field, fields
from typing import Optional

__all__ = [
    "TreeConfig",
    "DoubleTreeConfig",
    "ModelConfig",
    "ClipModelConfig",
    "OptimizerConfig",
    "LoggingConfig",
    "UtilConfig",
    "parse_config",
    "asdict",
    "dataclass",
    "field",
    "Optional",
]


@dataclass
class TreeConfig:
    """One GHM tree (single-modality tasks)."""

    n_tree_layer: Optional[int] = 3
    n_tree_child: Optional[int] = 4
    p_tree_flip: Optional[float] = 0.10
    sigma: Optional[float] = 1
    K: Optional[int] = 4
    batch_size: Optional[int] = 128
    variable_type: Optional[int] = 10
    flip_scale: Optional[float] = 1.0
    translation_invariance: Optional[bool] = True


@dataclass
class DoubleTreeConfig:
    """Paired text/image GHM trees."""

    n_ttree_layer: Optional[int] = 3
    n_itree_layer: Optional[int] = 3
    n_ttree_child: Optional[int] = 4
    n_itree_child: Optional[int] = 4
    p_ttree_flip: Optional[float] = 0.10
    p_itree_flip: Optional[float] = 0.10
    sigma: Optional[float] = 1
    K: Optional[int] = 4
    batch_size: Optional[int] = 128
    variable_type: Optional[int] = 10
    flip_scale: Optional[float] = 1.0
    translation_invariance: Optional[bool] = True


@dataclass
class ModelConfig:
    """Single-model transformer architecture flags."""

    model_type: Optional[str] = "TF"
    n_model_layer: Optional[int] = 10
    d_eb: Optional[int] = 64
    n_head: Optional[int] = 4
    residual_pdrop: Optional[float] = 0.0
    layernorm: Optional[bool] = False
    normalize_attn: Optional[bool] = True
    guide: Optional[bool] = False
    activation: Optional[str] = "softmax"
    # Per-layer rematerialization (jax.checkpoint): trades ~1/3 more compute
    # for activation memory, letting big vmapped sweeps fit HBM unsharded.
    remat: Optional[bool] = False


@dataclass
class ClipModelConfig:
    """Separate text/image encoder flags for CLIP training."""

    clip_model_type: Optional[str] = "TF"
    clip_tmodel_nlayer: Optional[int] = 10
    clip_imodel_nlayer: Optional[int] = 10
    clip_tmodel_deb: Optional[int] = 64
    clip_imodel_deb: Optional[int] = 64
    clip_tmodel_nhead: Optional[int] = 4
    clip_imodel_nhead: Optional[int] = 4
    clip_residual_pdrop: Optional[float] = 0.0
    clip_layernorm: Optional[bool] = False
    clip_attennorm: Optional[bool] = True
    clip_guide: Optional[bool] = False
    clip_activation: Optional[str] = "softmax"


@dataclass
class OptimizerConfig:
    """Optimizer, schedule, penalty, and resume settings."""

    lr_max: Optional[float] = 5e-4
    lr_min: Optional[float] = 5e-6
    warmup_iters: Optional[int] = 0
    total_iters: Optional[int] = 2 * (10**4)
    max_norm: Optional[float] = 1.0
    penalty: Optional[float] = 0.001
    loss_type: Optional[str] = "exp"
    init_from: str = "scratch"


@dataclass
class LoggingConfig:
    """Logging, WandB, seed, and optional S3 upload settings."""

    log_interval: Optional[int] = 20
    eval_interval: Optional[int] = 200
    eval_iters: Optional[int] = 1200
    wandb_logging: bool = True
    wandb_project: str = "Clip-GHM"
    wandb_path: str = "./others/wandb"
    raw: Optional[bool] = True
    seed: Optional[int] = 224
    S3_upload: Optional[bool] = False
    S3_bucket_name: Optional[str] = "yuhangbucket"


@dataclass
class UtilConfig(LoggingConfig, OptimizerConfig):
    """Common runtime configuration inherited by training entry points."""

    device: Optional[str] = "tpu"


_TRUTHY = {"true", "1", "yes", "y"}
_FALSY = {"false", "0", "no", "n"}


def _coerce(value: str, target):
    if target is bool:
        low = value.lower()
        if low in _TRUTHY:
            return True
        if low in _FALSY:
            return False
        raise ValueError(f"cannot parse boolean from {value!r}")
    return target(value)


def parse_config(config_cls, argv=None):
    """Parse ``--name=value`` / ``--name value`` CLI args into a dataclass."""
    if argv is None:
        argv = sys.argv[1:]
    spec = {}
    for f in fields(config_cls):
        t = f.type
        default = f.default if f.default is not MISSING else None
        base = type(default) if default is not None else str
        if base is type(None):
            base = str
        spec[f.name] = base
    values = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument {arg!r}")
        body = arg[2:]
        if "=" in body:
            name, raw = body.split("=", 1)
        else:
            name = body
            i += 1
            if i >= len(argv):
                raise SystemExit(f"missing value for --{name}")
            raw = argv[i]
        if name not in spec:
            raise SystemExit(f"unknown flag --{name}")
        values[name] = _coerce(raw, spec[name])
        i += 1
    return config_cls(**values)
