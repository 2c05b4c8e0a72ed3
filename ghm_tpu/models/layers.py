"""Shared functional building blocks for the ghm_tpu model family.

Parameters are plain nested dicts whose leaf names and layouts mirror a
PyTorch ``state_dict`` (``weight`` is ``[out, in]``), which makes checkpoint
interop with the reference's released ``.pth`` artifacts a pure renaming
exercise (see utils/torch_interop.py).  All forward math is pure jnp.

Initialization matches torch defaults in distribution (``nn.Linear``:
U(±1/sqrt(fan_in)) for weight and bias; ``nn.Embedding``: N(0,1);
``nn.LayerNorm``: ones/zeros), so trained-from-scratch runs are statistically
comparable with the reference even though exact RNG streams differ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "linear_init",
    "embedding_init",
    "layernorm_init",
    "mlp_init",
    "linear",
    "layer_norm",
    "mlp",
    "rms_norm",
    "get_activation",
    "prefix_lm_mask",
    "generate_mask",
    "seed_everything",
]


def linear_init(key, n_in: int, n_out: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(n_in)
    p = {"weight": jax.random.uniform(kw, (n_out, n_in), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (n_out,), dtype, -bound, bound)
    return p


def embedding_init(key, n_vocab: int, n_embd: int, dtype=jnp.float32):
    return {"weight": jax.random.normal(key, (n_vocab, n_embd), dtype)}


def layernorm_init(n: int, dtype=jnp.float32):
    return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def mlp_init(key, n_embd: int, n_hidden: int, dtype=jnp.float32):
    """Two-layer GELU MLP, stored with torch ``nn.Sequential`` child names."""
    k0, k2 = jax.random.split(key)
    return {
        "0": linear_init(k0, n_embd, n_hidden, dtype=dtype),
        "2": linear_init(k2, n_hidden, n_embd, dtype=dtype),
    }


def linear(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def layer_norm(p, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def mlp(p, x):
    # torch nn.GELU() default is the exact erf formulation.
    return linear(p["2"], jax.nn.gelu(linear(p["0"], x), approximate=False))


def rms_norm(p, x, eps: float = 1e-5):
    rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
    return x / rms * p["weight"]


def get_activation(name: str):
    """Attention activation by name (reference ``model.py:121-130``) —
    softmax-vs-relu attention is a studied axis of the paper."""
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    raise NotImplementedError(f"unknown activation {name!r}")


def prefix_lm_mask(n_token: int, n_i_token: int, dtype=jnp.float32):
    """Additive attention mask: image prefix attends within itself, text is
    causal over the whole sequence (reference ``generate_mask``,
    ``model.py:24-33``).  Returns ``[n_token, n_token]`` (broadcast over batch).
    """
    neg = jnp.float32(-jnp.inf)
    mask = jnp.zeros((n_token, n_token), dtype)
    mask = mask.at[:n_i_token, n_i_token:].set(neg)
    n_t = n_token - n_i_token
    tri = jnp.triu(jnp.full((n_t, n_t), neg, dtype), k=1)
    return mask.at[n_i_token:, n_i_token:].set(tri)


def seed_everything(seed: int):
    """Seed host-side RNGs and return a JAX PRNG key.

    API counterpart of the reference ``seed_everything`` (``model.py:12-22``),
    which aligns python/numpy/torch global state.  JAX threading is explicit:
    device-side randomness flows through the returned key; the host-side
    python/numpy seeds cover any library code with global-RNG dependencies.
    """
    import os
    import random

    import numpy as _np

    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    _np.random.seed(seed)
    return jax.random.PRNGKey(seed)


# Reference-name alias for the prefix-LM mask builder (``generate_mask``,
# model.py:24-33).
generate_mask = prefix_lm_mask
