"""Optimizers and learning-rate schedules.

Re-implements the reference's hand-rolled optimizers (``models/optimizer.py``)
as pure pytree transforms that live *inside* the jitted train step.

Reference semantics preserved exactly:
  * AdamW (``optimizer.py:34-75``): torch-style unbias factor applied to the
    step size (``lr_t = lr * sqrt(1-b2^t)/(1-b1^t)``), decoupled weight decay
    applied with the *base* lr (not lr_t) to the already-updated parameter;
  * gradient clipping matches ``torch.nn.utils.clip_grad_norm_`` including
    its ``max_norm / (norm + 1e-6)`` coefficient;
  * warmup → cosine → floor schedule (``optimizer.py:78-85``), evaluated every
    step, replacing the reference's ``set_lr`` mutation with a pure function
    of the iteration index.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


class AdamWState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    m: object  # pytree like params
    v: object


def adamw_init(params) -> AdamWState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamWState(step=jnp.zeros((), jnp.int32), m=zeros,
                      v=jax.tree_util.tree_map(jnp.zeros_like, params))


def adamw_update(params, grads, state: AdamWState, lr,
                 weight_decay=0.001, b1=0.9, b2=0.999, eps=1e-8):
    """One AdamW step; returns ``(new_params, new_state)``."""
    t = state.step + 1
    tf = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - b2**tf) / (1.0 - b1**tf)

    tree_map = jax.tree_util.tree_map
    new_m = tree_map(lambda g, m: b1 * m + (1.0 - b1) * g, grads, state.m)
    new_v = tree_map(lambda g, v: b2 * v + (1.0 - b2) * g * g, grads, state.v)
    # Adam step, then decoupled weight decay at the base lr applied to the
    # already-updated parameter (optimizer.py:70-71).
    new_params = tree_map(
        lambda p, m, v: (p - lr_t * m / (jnp.sqrt(v) + eps)) * (1.0 - lr * weight_decay),
        params, new_m, new_v)
    return new_params, AdamWState(step=t, m=new_m, v=new_v)


class SGDState(NamedTuple):
    step: jnp.ndarray


def sgd_init(params) -> SGDState:
    return SGDState(step=jnp.zeros((), jnp.int32))


def sgd_update(params, grads, state: SGDState, lr):
    """SGD with inverse-sqrt iteration decay (reference ``SGD``, :9-31)."""
    t = state.step
    scale = lr / jnp.sqrt(t.astype(jnp.float32) + 1.0)
    new_params = jax.tree_util.tree_map(lambda p, g: p - scale * g,
                                        params, grads)
    return new_params, SGDState(step=t + 1)


def clip_by_global_norm(grads, max_norm: float):
    """Global-norm clipping with torch ``clip_grad_norm_`` semantics."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * coef, grads), norm


def lr_cosine_schedule(t, lr_max, lr_min, warmup_iters, total_iters):
    """Warmup → cosine decay → floor (reference ``get_lr_cosine_schedule``).

    Pure function of a (possibly traced) iteration index; safe inside jit.
    """
    t = jnp.asarray(t, jnp.float32)
    warm = lr_max * t / jnp.maximum(warmup_iters, 1)
    progress = (t - warmup_iters) / jnp.maximum(total_iters - warmup_iters, 1)
    cos = lr_min + 0.5 * (lr_max - lr_min) * (1.0 + jnp.cos(progress * np.pi))
    lr = jnp.where(t < warmup_iters, warm, jnp.where(t < total_iters, cos, lr_min))
    return lr
