"""Checkpoint save/load with reference-compatible schema and layout.

Checkpoints follow the reference contract exactly (SURVEY.md §1):

  * directory: ``logs/<job>/<tree_folder>/<model_name>/<timestamp>/checkpoint.pth``
  * CLIP payload: ``{tmodel_state_dict, imodel_state_dict,
    optimizer_state_dict, iter, loss_history, ploss_history, bayes}``
    (``train_CLIP.py:193-200``)
  * single-model payload: ``{model_state_dict, optimizer_state_dict, iter,
    loss_history, ploss_history, bayes[, compare]}``

Model weights are stored as torch-style flat ``state_dict`` tensors inside a
``torch.save`` container, so the reference's released eval scripts and
notebooks can load ghm_tpu checkpoints unchanged — and the reference's own
released checkpoints load into ghm_tpu models via
:func:`ghm_tpu.utils.torch_interop.params_from_state_dict`.

Unlike the reference, resume actually restores the iteration counter
(the reference discards it — ``train_CLIP.py:132`` vs ``:137``), and the
live loss *object* is never pickled (the reference needed
``clean_checkpoints.py`` to repair that).
"""

from __future__ import annotations

import os

import numpy as np

from ghm_tpu.utils.torch_interop import (
    params_from_state_dict,
    save_pth_checkpoint,
    state_dict_from_params,
)

__all__ = [
    "tree_folder_name",
    "model_folder_name",
    "run_directory",
    "save_checkpoint",
    "load_checkpoint",
    "pack_params",
    "unpack_params",
    "pack_opt_state",
    "unpack_opt_state",
    "latest_checkpoint",
]


def tree_folder_name(K, n_ttree_layer, n_ttree_child, p_ttree_flip,
                     n_itree_layer, n_itree_child, p_itree_flip, flip_scale):
    """Reference tree-folder naming (``train_CLIP.py:43``)."""
    return (f"K{K}_L{n_ttree_layer}C{n_ttree_child}p{int(p_ttree_flip * 100)}"
            f"_L{n_itree_layer}C{n_itree_child}p{int(p_itree_flip * 100)}"
            f"sc{int(flip_scale * 10)}")


def model_folder_name(prefix, *dims):
    """``<prefix>_L{n}H{h}D{d}[_L{n}H{h}D{d}]`` naming (``train_CLIP.py:44-50``)."""
    parts = [f"L{l}H{h}D{d}" for (l, h, d) in dims]
    return prefix + "_" + "_".join(parts)


def run_directory(root, job_name, tree_folder, model_name, timestamp):
    return os.path.join(root, job_name, tree_folder, model_name, timestamp)


def pack_params(params):
    """ghm_tpu param tree -> flat torch-style state dict of numpy arrays."""
    return state_dict_from_params(params)


def unpack_params(state_dict):
    """Flat state dict (numpy or torch tensors) -> ghm_tpu param tree."""
    return params_from_state_dict(state_dict)


def pack_opt_state(state):
    """AdamWState -> plain dict of numpy arrays (framework-agnostic)."""
    return {
        "step": np.asarray(state.step),
        "m": state_dict_from_params(state.m),
        "v": state_dict_from_params(state.v),
    }


def unpack_opt_state(blob):
    from ghm_tpu.optim import AdamWState
    import jax.numpy as jnp

    return AdamWState(
        step=jnp.asarray(np.asarray(blob["step"])),
        m=params_from_state_dict(blob["m"]),
        v=params_from_state_dict(blob["v"]),
    )


def save_checkpoint(path, payload):
    """Write a reference-schema checkpoint (torch container)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_pth_checkpoint(path, payload)


def load_checkpoint(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def latest_checkpoint(path_run):
    """Accept both ``run/checkpoint.pth`` and ``run/<timestamp>/checkpoint.pth``
    (reference ``figures/eval_paths.py:16-25``)."""
    direct = os.path.join(path_run, "checkpoint.pth")
    if os.path.exists(direct):
        return direct
    candidates = sorted(
        os.path.join(path_run, d, "checkpoint.pth")
        for d in os.listdir(path_run)
        if os.path.exists(os.path.join(path_run, d, "checkpoint.pth"))
    )
    if not candidates:
        raise FileNotFoundError(f"Checkpoint file not found under: {path_run}")
    return candidates[-1]
