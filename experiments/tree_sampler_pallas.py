"""Pallas TPU kernel: fused GHM tree sampling.  RETIRED (see README.md):
failed to lower on real hardware (cumsum unimplemented in Pallas TPU
lowering for KernelType.TC), and the profiler showed sample+BP is ~2% of a
train step — not worth a hand kernel.  Kept as a reference experiment.

``sample_tree`` (core/tree.py) lowers to one gather + cumsum + compare +
argmax chain per tree layer; XLA fuses within a layer but layer values
round-trip through HBM between fusions.  This kernel samples the *entire*
tree in one Pallas program: parent values select transition rows through a
one-hot matmul (MXU-friendly; dynamic gathers are not worth it at V=10) and
every intermediate layer lives in VMEM/registers.

The uniforms are generated outside with the standard JAX PRNG and passed in,
so the kernel is key-deterministic and produces the same inverse-CDF draws
as ``core.tree.sample_tree`` given the same uniforms.  Use
``sample_tree_pallas(key, ...)`` as a drop-in alternative; correctness is
tested in interpreter mode (CPU) and by exact equivalence against the core
path on shared uniforms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sample_tree_pallas"]


def _kernel(root_ref, u_ref, *refs, n_layer, n_child, variable_type,
            layer_offsets):
    trans_refs = refs[:n_layer]
    out_refs = refs[n_layer:]
    V = variable_type
    B = root_ref.shape[0]

    vals = root_ref[:]  # [B, 1] int32
    out_refs[0][:] = vals
    for layer in range(n_layer):
        E = n_child ** (layer + 1)
        T = trans_refs[layer][:]  # [E, V, V]
        parents = pltpu.repeat(vals, n_child, axis=1)  # [B, E]
        # One-hot the parent values and contract with the edge matrices:
        # probs[b, e, :] = T[e, parents[b, e], :].
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, E, V), 2)
        onehot = (parents[:, :, None] == iota_v).astype(jnp.float32)
        probs = jnp.einsum("bev,evw->bew", onehot, T,
                           preferred_element_type=jnp.float32)
        cdf = jnp.cumsum(probs, axis=-1)
        u = u_ref[:, layer_offsets[layer] : layer_offsets[layer] + E]
        vals = jnp.argmax(u[:, :, None] < cdf, axis=-1).astype(jnp.int32)
        out_refs[layer + 1][:] = vals


def sample_tree_pallas(key, transitions, batch_size: int, root,
                       interpret: bool = False):
    """Sample a batch of GHM trees in one fused Pallas kernel.

    Args:
      key: JAX PRNG key for the per-node uniforms.
      transitions: tuple of ``[C**(l+1), V, V]`` float32 arrays.
      batch_size: rows to sample.
      root: ``[B]`` int32 root values (root injection is the common
        multimodal case; sample it outside with ``core.tree.sample_root``).
      interpret: run in the Pallas interpreter (CPU testing).

    Returns the per-layer value tuple like ``core.tree.sample_tree``.
    """
    n_layer = len(transitions)
    n_child = transitions[0].shape[0]
    V = transitions[0].shape[-1]
    sizes = [n_child ** (l + 1) for l in range(n_layer)]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    total = sum(sizes)
    u = jax.random.uniform(key, (batch_size, total), jnp.float32)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((batch_size, n_child**l), jnp.int32)
        for l in range(n_layer + 1))
    kernel = functools.partial(_kernel, n_layer=n_layer, n_child=n_child,
                               variable_type=V, layer_offsets=tuple(offsets))
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in transitions],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        interpret=interpret,
    )(root[:, None].astype(jnp.int32), u, *transitions)
