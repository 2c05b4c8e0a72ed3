"""Interop between ghm_tpu param pytrees and torch ``state_dict`` checkpoints.

ghm_tpu parameter trees deliberately mirror the reference models'
``state_dict`` key structure (``_queries.0.weight`` ↔
``params['_queries']['0']['weight']``) with identical tensor layouts, so
conversion is a pure key-path reshaping:

  * :func:`params_from_state_dict` — load reference-released ``.pth`` weights
    (e.g. the published CLIP/CDM/VLM checkpoints) into ghm_tpu models;
  * :func:`state_dict_from_params` — export ghm_tpu weights so the
    reference's eval scripts and notebooks can consume them unchanged.

torch is an optional dependency used only at the interop boundary; the
training/eval hot paths never import it.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

__all__ = [
    "params_from_state_dict",
    "state_dict_from_params",
    "load_pth_state_dict",
    "save_pth_checkpoint",
]


def params_from_state_dict(state_dict, dtype=jnp.float32):
    """Build a nested param dict from flat ``name -> array`` torch entries."""
    params: dict = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        node = params
        parts = name.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr, dtype=dtype)
    return params


def state_dict_from_params(params, prefix=""):
    """Flatten a nested param dict back to torch ``state_dict`` naming."""
    flat = {}
    for k, v in params.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(state_dict_from_params(v, name))
        else:
            flat[name] = np.asarray(v)
    return flat


def load_pth_state_dict(path, key=None):
    """Load a (possibly nested) state dict from a reference ``.pth`` file."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        ckpt = ckpt[key]
    return ckpt


def save_pth_checkpoint(path, payload):
    """Save a checkpoint dict in the reference ``.pth`` container format.

    ``payload`` values that are nested ghm_tpu param dicts should already be
    flattened via :func:`state_dict_from_params`; numpy arrays are converted
    to torch tensors so reference ``load_state_dict`` calls work directly.
    """
    import torch

    def conv(obj):
        if isinstance(obj, dict):
            return {k: conv(v) for k, v in obj.items()}
        if isinstance(obj, np.ndarray):
            return torch.from_numpy(np.ascontiguousarray(obj))
        return obj

    # Atomic publish: checkpoints are snapshotted/committed while training
    # runs, so a reader must never observe a half-written container. The
    # pid in the tmp name keeps concurrent writers of the same path (two
    # processes accidentally training one shard) from racing each other's
    # rename.
    tmp = f"{path}.{os.getpid()}.tmp"
    torch.save(conv(payload), tmp)
    try:
        os.replace(tmp, path)
    except FileNotFoundError:
        pass
