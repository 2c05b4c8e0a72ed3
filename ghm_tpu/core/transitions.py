"""GHM transition-matrix generation.

The Generative Hierarchical Model (GHM) is a depth-``n_layer`` tree of
categorical variables with ``variable_type`` states.  Every edge carries a
``[V, V]`` row-stochastic transition matrix of the form

    (1 - p_flip) * P_perm  +  p_flip * softmax(N(0, flip_scale))

where ``P_perm`` is a permutation matrix (the deterministic "skeleton") and
the softmax is taken row-wise over a Gaussian matrix.  In the
translation-invariant mode one set of ``n_child`` matrices is drawn per layer
and shared by every node of that layer.

Behavioral contract: reference ``src/ghmclip/data/data_random_GHM.py:43-96``
(``GenTransition`` / ``_softmax_row``).  Transition generation is a one-time
host-side setup step, so it is implemented with numpy using the *same seeded
RNG call order* as the reference — this makes the generated tree distribution
(and therefore every Bayes baseline) bit-identical to the reference for a
given ``seedtree``, even though the per-step sampling downstream runs on TPU
with JAX PRNG.

TPU-native layout: instead of the reference's ragged list-of-lists, layer
``l`` is a single dense array ``[n_child**(l+1), V, V]`` indexed by the
breadth-first edge id (child node id).  This makes every BP layer update one
batched matmul.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "softmax_rows",
    "gen_transition",
    "transitions_to_device",
    "n_nodes_per_layer",
]


def softmax_rows(x: np.ndarray) -> np.ndarray:
    """Row-wise softmax with max-shift (reference ``_softmax_row``, :91-96)."""
    e_x = np.exp(x - np.max(x, axis=-1, keepdims=True))
    return e_x / e_x.sum(axis=-1, keepdims=True)


def gen_transition(
    n_layer: int,
    n_child: int,
    variable_type: int,
    p_flip: float = 0.3,
    flip_scale: float = 1.0,
    translation_invariance: bool = True,
    rng: np.random.RandomState | None = None,
    return_skeleton: bool = False,
):
    """Generate per-layer transition tensors for one GHM tree.

    Returns a list of ``n_layer`` numpy arrays; entry ``l`` has shape
    ``[n_child**(l+1), V, V]`` and row ``e`` is the transition matrix on the
    edge into breadth-first node ``e`` of layer ``l+1`` (parent ``e //
    n_child``).

    The RNG call order matches the reference exactly (permutation first, then
    one ``[V, V]`` normal per child), so seeding ``rng`` with the reference's
    ``seedtree`` reproduces its matrices bit-for-bit.
    """
    if rng is None:
        rng = np.random.RandomState()
    V = variable_type
    transition: list[np.ndarray] = []
    skeletons: list[np.ndarray] = []
    if translation_invariance:
        for layer in range(n_layer):
            skeleton = np.identity(V)[rng.permutation(V), :]
            templates = np.stack(
                [
                    (1.0 - p_flip) * skeleton
                    + p_flip * softmax_rows(rng.normal(0.0, flip_scale, (V, V)))
                    for _ in range(n_child)
                ]
            )  # [n_child, V, V]
            transition.append(np.tile(templates, (n_child**layer, 1, 1)))
            skeletons.append(skeleton)
    else:
        for layer in range(n_layer):
            mats = []
            for _ in range(n_child ** (layer + 1)):
                perm = np.identity(V)[rng.permutation(V), :]
                noise = softmax_rows(rng.normal(0.0, flip_scale, (V, V)))
                mats.append((1.0 - p_flip) * perm + p_flip * noise)
            transition.append(np.stack(mats))
    if return_skeleton:
        return transition, skeletons
    return transition


def transitions_to_device(transition, dtype=jnp.float32):
    """Move host transition arrays onto the accelerator as a tuple pytree."""
    return tuple(jnp.asarray(t, dtype=dtype) for t in transition)


def n_nodes_per_layer(n_layer: int, n_child: int) -> tuple[int, ...]:
    """Breadth-first node counts per layer, root layer included."""
    return tuple(n_child**l for l in range(n_layer + 1))
