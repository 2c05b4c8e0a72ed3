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
_FILE_HANDLER = None


def gen_logger(directory, config, raw=True):
    """Create the run logger; write config.log/training.log when raw=False.

    Uses the named ``ghm_tpu`` logger rather than the root logger so that
    enabling DEBUG here does not unleash third-party (jax) debug spam.
    """
    global _CONSOLE_ATTACHED, _FILE_HANDLER
    logger = logging.getLogger("ghm_tpu")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    # Multiple runs may share one process (in-process suite driver, sweeps):
    # detach the previous run's training.log handler instead of accumulating.
    if _FILE_HANDLER is not None:
        logger.removeHandler(_FILE_HANDLER)
        _FILE_HANDLER.close()
        _FILE_HANDLER = None
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
        _FILE_HANDLER = log_handler
    return logger
