"""Logging helpers mirroring the reference run-directory layout.

Reference behavior (``utils/logger.py:7-36``): a root logger with a console
handler; with ``raw=False`` additionally a one-shot ``config.log`` dump and a
persistent ``training.log`` in the run directory.  Divergence from the
reference (deliberate): handlers are not duplicated on repeated calls and the
console handler is attached once, fixing its handler-accumulation quirk
(SURVEY.md Appendix A #8) while keeping the file layout identical.
"""

from __future__ import annotations

import logging
import os
from dataclasses import asdict, is_dataclass

__all__ = ["gen_logger"]

_CONSOLE_ATTACHED = False


def gen_logger(directory, config, raw=True):
    """Create the run logger; write config.log/training.log when raw=False.

    Uses the named ``ghm_tpu`` logger rather than the root logger so that
    enabling DEBUG here does not unleash third-party (jax) debug spam.
    """
    global _CONSOLE_ATTACHED
    logger = logging.getLogger("ghm_tpu")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    if not _CONSOLE_ATTACHED:
        console = logging.StreamHandler()
        console.setLevel(logging.INFO)
        console.setFormatter(formatter)
        logger.addHandler(console)
        _CONSOLE_ATTACHED = True
    if not raw:
        os.makedirs(directory, exist_ok=True)
        cfg_handler = logging.FileHandler(os.path.join(directory, "config.log"), mode="a")
        cfg_handler.setLevel(logging.DEBUG)
        cfg_handler.setFormatter(formatter)
        logger.addHandler(cfg_handler)
        cfg = asdict(config) if is_dataclass(config) else dict(config)
        logger.info(f"Training with config: {cfg}")
        logger.removeHandler(cfg_handler)
        cfg_handler.close()
        log_handler = logging.FileHandler(os.path.join(directory, "training.log"), mode="a")
        log_handler.setLevel(logging.DEBUG)
        log_handler.setFormatter(formatter)
        logger.addHandler(log_handler)
    return logger
