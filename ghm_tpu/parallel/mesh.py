"""Device mesh and sharding utilities.

The reference has no distributed runtime (SURVEY.md §2.11) — its fleet
parallelism is 20 background shell processes on one GPU.  The TPU-native
replacement (SURVEY.md §5.8):

  * a 1-D ``Mesh('data')`` over ICI for data-parallel training: batches are
    sharded on the leading axis, parameters replicated, and gradient
    reduction happens through XLA-inserted ``psum`` collectives when the
    jitted train step runs over the mesh;
  * the CLIP loss couples the whole (K+1)·B batch through its aligned
    negative fold — with the embeddings sharded on batch, XLA materializes
    the tiny ``[B, V]`` all-gather over ICI automatically;
  * a ``'sweep'`` mesh axis for hyperparameter sweeps: the reference's "20
    background processes" become one vmapped, sharded program training 20
    independent models simultaneously (see parallel/sweep.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "P",
           "Mesh", "NamedSharding"]


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Apply a leading-axis sharding constraint to every array in a pytree."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), tree)
