"""On-device ancestral sampling of GHM trees.

The reference samples trees on the host with per-node Python loops
(``GHMTree.gen_values``, ``data_random_GHM.py:145-165``) and ships the result
to the accelerator every step.  Here the whole tree is a tuple of dense
per-layer value arrays ``values[l]: [B, n_child**l] int32`` and sampling is a
fully jittable, vmappable array program keyed by an explicit JAX PRNG key —
so batches are generated *inside* the compiled training step, directly in
HBM, with no host round-trip.

Perfect C-ary trees make parent/child relations pure index arithmetic:
node ``j`` of layer ``l+1`` has parent ``j // n_child`` and the transition
matrix ``transition[l][j]``.

Sampling per layer uses the same inverse-CDF construction as the reference
(``(u < cumsum(p)).argmax()``; ``data_random_GHM.py:164-165``), drawing one
uniform per (batch element, node).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_tree", "sample_root", "TreeValues"]

# values[l] has shape [B, n_child**l]; layer 0 is the root.
TreeValues = tuple


def sample_root(key, batch_size: int, variable_type: int, p_y=None):
    """Sample a batch of root classes from the prior ``p_y`` (uniform default).

    Reference: ``GHMTree.gen_values`` root branch (``data_random_GHM.py:158-160``).
    """
    if p_y is None:
        return jax.random.randint(key, (batch_size,), 0, variable_type, dtype=jnp.int32)
    logits = jnp.log(jnp.asarray(p_y, dtype=jnp.float32))
    return jax.random.categorical(key, logits, shape=(batch_size,)).astype(jnp.int32)


def _sample_layer(key, parent_values, layer_transition):
    """Sample one tree layer given its parents.

    parent_values: [B, E_parent] int32
    layer_transition: [E_child, V, V] with E_child = E_parent * n_child
    returns: [B, E_child] int32
    """
    E_child, V, _ = layer_transition.shape
    E_parent = parent_values.shape[1]
    n_child = E_child // E_parent
    # Row of the edge matrix selected by the parent's sampled value.
    parents = jnp.repeat(parent_values, n_child, axis=1)  # [B, E_child]
    probs = layer_transition[jnp.arange(E_child)[None, :], parents]  # [B, E_child, V]
    cdf = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, parent_values.shape[:1] + (E_child, 1), dtype=cdf.dtype)
    return jnp.argmax(u < cdf, axis=-1).astype(jnp.int32)


def sample_tree(key, transitions, batch_size: int, root=None, p_y=None):
    """Ancestrally sample a batch of GHM trees.

    Args:
      key: PRNG key.
      transitions: tuple of per-layer ``[E, V, V]`` arrays (see transitions.py).
      batch_size: number of independent trees.
      root: optional ``[B]`` int32 array of fixed root values (shared-root
        pairing across modalities; reference ``data_random_GHM.py:156-157``).
      p_y: optional root prior.

    Returns:
      tuple ``values`` with ``values[l]: [B, n_child**l] int32``.
    """
    n_layer = len(transitions)
    V = transitions[0].shape[-1]
    keys = jax.random.split(key, n_layer + 1)
    if root is None:
        root = sample_root(keys[0], batch_size, V, p_y)
    values = [root[:, None]]
    for layer in range(n_layer):
        values.append(_sample_layer(keys[layer + 1], values[-1], transitions[layer]))
    return tuple(values)
