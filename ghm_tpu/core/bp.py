"""Exact belief propagation on GHM trees, as batched log-space array programs.

The reference implements BP with per-node Python loops over ``Node`` objects
(``data_random_GHM.py:185-523``).  Here every tree layer is one dense message
array ``[B, n_nodes, V]`` and a layer update is a single batched matmul
(``einsum('evw,bew->bev')``), which XLA maps onto the TPU MXU/VPU.  All
functions are pure and jittable; the "graft OOD leaves into differently
parameterized trees" pattern used by the mis-specified-BP baselines
(``figures/eval-cdm-ood.py:94-141``) is free — just pass mismatched
``leaf_values`` and ``transitions``.

Normalization order (max-shifts) matches the reference exactly, because the
*normalized* messages are used verbatim as guided-training targets.  This
includes a subtle reference behavior: at the root, ``bu_message`` is assigned
as an alias of ``hd_message`` and then modified in place by the external
message (``data_random_GHM.py:425-429, 504-506``), so the "h" half of the
root guided target equals the external-conditioned "bu" half.  We reproduce
that.

Layer/depth convention: depth ``d`` runs 0 (root) .. L (leaves);
``transitions[d]`` has shape ``[C**(d+1), V, V]`` mapping the value of the
depth-``d`` parent to its depth-``d+1`` children.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "BPClsResult",
    "BPDnsResult",
    "bp_cls",
    "bp_dns",
    "bp_nwp_autoregressive",
    "bp_nwp_single_position",
    "guided_cls",
    "guided_dns",
]


# BP messages are training targets; keep full f32 matmul accuracy on TPU
# (default TPU f32 dots run reduced-precision bf16 passes).
_PRECISION = jax.lax.Precision.HIGHEST


def _log_matvec(T, h):
    """log(T @ exp(h)) batched over edges: T [E,V,V], h [B,E,V] -> [B,E,V].

    Stabilized by shifting with max(h); mathematically identical to the
    reference's direct ``np.log(T @ np.exp(h))``.
    """
    m = jnp.max(h, axis=-1, keepdims=True)
    return jnp.log(jnp.einsum("evw,bew->bev", T, jnp.exp(h - m),
                              precision=_PRECISION)) + m


def _log_matvec_T(T, h):
    """log(T.T @ exp(h)) batched over edges (upward direction)."""
    m = jnp.max(h, axis=-1, keepdims=True)
    return jnp.log(jnp.einsum("ewv,bew->bev", T, jnp.exp(h - m),
                              precision=_PRECISION)) + m


def _norm(h):
    """Subtract per-node max over the value axis (the reference's max-shift)."""
    return h - jnp.max(h, axis=-1, keepdims=True)


def _sum_children(q, n_child):
    """Sum child messages into their parents: [B, E, V] -> [B, E//C, V]."""
    B, E, V = q.shape
    return q.reshape(B, E // n_child, n_child, V).sum(axis=2)


def leaf_loglik(leaf_values, leaf_transition):
    """Per-leaf log-likelihood of the parent-side value given observed leaves.

    ``out[b, e, v] = log T[e][v, x[b, e]]`` — reference ``data_random_GHM.py:196``.
    """
    E = leaf_transition.shape[0]
    # Advanced-indexing gather: [E, V, V] at (edge e, :, observed value) -> [B, E, V]
    return jnp.log(
        leaf_transition[jnp.arange(E)[None, :], :, leaf_values.astype(jnp.int32)]
    )


class BPClsResult(NamedTuple):
    """Upward-pass (classification) BP state.

    posterior: ``p(root | leaves)`` — [B, V].
    h_msgs: normalized upward messages per depth 0..L-1, each [B, C**d, V]
      (reference ``hd_message``; depth 0 entry is the root message *before*
      the class prior is applied).
    """

    posterior: jnp.ndarray
    h_msgs: tuple


def bp_cls(leaf_values, transitions, p_y=None) -> BPClsResult:
    """Classification BP: exact ``p(root | all leaves)``.

    Reference: ``GHMTree.BP_CLS`` (``data_random_GHM.py:185-221``).
    """
    L = len(transitions)
    C = transitions[0].shape[0]
    V = transitions[0].shape[-1]
    ll = leaf_loglik(leaf_values, transitions[-1])  # [B, C^L, V]
    h = _norm(_sum_children(ll, C))  # depth L-1
    h_msgs = [h]
    for d in range(L - 2, -1, -1):
        # transitions[d] carries depth d+1 child messages up to depth d parents.
        q = _log_matvec(transitions[d], h_msgs[0])
        h_msgs.insert(0, _norm(_sum_children(q, C)))
    prior = (
        jnp.full((V,), 1.0 / V, dtype=h.dtype)
        if p_y is None
        else jnp.asarray(p_y, dtype=h.dtype)
    )
    h0 = _norm(h_msgs[0][:, 0, :] + jnp.log(prior)[None, :])
    posterior = jnp.exp(h0) / jnp.sum(jnp.exp(h0), axis=-1, keepdims=True)
    return BPClsResult(posterior=posterior, h_msgs=tuple(h_msgs))


def guided_cls(res: BPClsResult, n_child: int):
    """CLS guide tensors: each depth's message broadcast over its leaves.

    Returns a tuple ordered depth L-1 .. 0 of ``[B, n_leaves, V]`` arrays —
    reference ``GHMTree.guided_info`` CLS branch (``data_random_GHM.py:536-549``).
    """
    L = len(res.h_msgs)
    out = []
    extend = 1
    for d in range(L - 1, -1, -1):
        extend *= n_child
        out.append(jnp.repeat(res.h_msgs[d], extend, axis=1))
    return tuple(out)


class BPDnsResult(NamedTuple):
    """Full down/up denoising BP state (all messages kept for guides).

    h_down / q_down: downward messages per depth 1..L (list index d-1),
      each [B, C**d, V].  Leaf-depth entries are the Gaussian evidence and
      its first projection (unnormalized, as in the reference).
    root_msg: the root message *after* in-place external conditioning —
      the aliased reference value serving as both ``hd`` and ``bu``.
    bu_up: upward messages per depth 1..L, normalized.
    posterior_mean: [B, n_leaves] posterior-mean denoising target.
    """

    h_down: tuple
    q_down: tuple
    root_msg: jnp.ndarray
    bu_up: tuple
    posterior_mean: jnp.ndarray


def bp_dns(z, transitions, sigma: float = 1.0, external=None) -> BPDnsResult:
    """Denoising BP with Gaussian leaf evidence and optional external root message.

    Reference: ``GHMTree.BP_DNS`` (``data_random_GHM.py:467-523``).
    ``z``: [B, n_leaves] float noisy observations; ``external``: [B, V] log
    message from a paired tree (e.g. text ``BP_CLS`` root message).
    """
    L = len(transitions)
    C = transitions[0].shape[0]
    V = transitions[0].shape[-1]
    k = jnp.arange(V, dtype=z.dtype)
    # Leaf evidence: unnormalized Gaussian log-likelihood (reference :485).
    h_leaf = -0.5 * (z[:, :, None] - k[None, None, :]) ** 2 / (sigma**2)
    q_leaf = _log_matvec(transitions[-1], h_leaf)
    h_down = [h_leaf]
    q_down = [q_leaf]
    for d in range(L - 1, 0, -1):
        h = _norm(_sum_children(q_down[0], C))
        q = _log_matvec(transitions[d - 1], h)
        h_down.insert(0, h)
        q_down.insert(0, q)
    root = _norm(_sum_children(q_down[0], C))[:, 0, :]
    if external is not None:
        # Reference aliases bu onto hd and adds in place (:504-506): the root
        # message used everywhere downstream includes the external term.
        root = root + external
    # Upward pass (reference :509-514).
    bu_up = []
    parent_bu = root[:, None, :]  # [B, 1, V]
    for d in range(1, L + 1):
        parent_expanded = jnp.repeat(parent_bu, C, axis=1)  # [B, C^d, V]
        diff = parent_expanded - q_down[d - 1]
        bu = _norm(h_down[d - 1] + _log_matvec_T(transitions[d - 1], diff))
        bu_up.append(bu)
        parent_bu = bu
    p_leaf = jax.nn.softmax(bu_up[-1], axis=-1)
    posterior_mean = jnp.einsum("bev,v->be", p_leaf, k)
    return BPDnsResult(
        h_down=tuple(h_down),
        q_down=tuple(q_down),
        root_msg=root,
        bu_up=tuple(bu_up),
        posterior_mean=posterior_mean,
    )


def guided_dns(res: BPDnsResult, n_child: int):
    """DNS guide tensors, reference ``guided_info`` DNS branch (:551-591).

    Order: depth L..1 downward ``h‖q`` blocks ([B, T, 2V]), then the root
    ``h‖bu`` block (both halves equal to the external-conditioned root
    message, reproducing the reference aliasing), then depth 1..L upward
    ``h‖q‖bu`` blocks ([B, T, 3V]).  Every block is broadcast over the leaf
    positions its node covers.
    """
    L = len(res.h_down)
    n_leaves = res.posterior_mean.shape[1]
    out = []
    extend = 1
    for d in range(L, 0, -1):
        h = jnp.repeat(res.h_down[d - 1], extend, axis=1)
        q = jnp.repeat(res.q_down[d - 1], extend, axis=1)
        out.append(jnp.concatenate([h, q], axis=-1))
        extend *= n_child
    root = jnp.broadcast_to(
        res.root_msg[:, None, :], (res.root_msg.shape[0], n_leaves, res.root_msg.shape[1])
    )
    out.append(jnp.concatenate([root, root], axis=-1))
    for d in range(1, L + 1):
        extend //= n_child
        h = jnp.repeat(res.h_down[d - 1], extend, axis=1)
        q = jnp.repeat(res.q_down[d - 1], extend, axis=1)
        b = jnp.repeat(res.bu_up[d - 1], extend, axis=1)
        out.append(jnp.concatenate([h, q, b], axis=-1))
    return tuple(out)


def _full_subtree_q(leaf_values, transitions):
    """Per-depth q messages assuming each node's whole subtree is observed.

    In the reference's incremental autoregressive walk
    (``BP_NWP_autoregressive``, :369-461) a node's stored ``qd_message`` stops
    changing once the prefix covers its entire subtree; these steady-state
    values are exactly a bottom-up pass with the walk's normalization order
    (h and q both max-shifted).  Returns q_full[d] for depth d=1..L
    (list index d-1), each [B, C**d, V].
    """
    L = len(transitions)
    C = transitions[0].shape[0]
    q_leaf = _norm(leaf_loglik(leaf_values, transitions[-1]))
    q_full = [q_leaf]
    for d in range(L - 1, 0, -1):
        h = _norm(_sum_children(q_full[0], C))
        q_full.insert(0, _norm(_log_matvec(transitions[d - 1], h)))
    return q_full


def bp_nwp_autoregressive(
    leaf_values,
    transitions,
    external=None,
    guide: bool = False,
):
    """Autoregressive next-word BP: ``p(x_{t+1} | x_{<=t}, external)`` for all t.

    Reference: ``GHMTree.BP_NWP_autoregressive`` (``data_random_GHM.py:336-463``),
    an O(T) Python loop with incremental node state.  Here each position is an
    independent recomputation over the target leaf's ancestor path using
    precomputed full-subtree messages, vectorized with ``vmap`` over
    positions — identical values, one compiled program.

    Returns ``(predict_pp [B, T-1, V], guided)`` where ``guided`` is a tuple
    of 2L+1 tensors matching the reference layout (index 0: leaf q [B,T-1,V];
    1..L: downward h‖q with the depth-L entry being the root block [B,T-1,2V];
    L+1..2L: upward bu [B,T-1,V]) or ``None`` when ``guide`` is False.
    """
    L = len(transitions)
    B, T = leaf_values.shape
    V = transitions[0].shape[-1]
    one_position = _nwp_position_fn(leaf_values, transitions, external)
    ts = jnp.arange(T - 1)
    pp, q_leaf_g, down_g, root_g, up_g = jax.vmap(one_position, out_axes=(1, 1, 1, 1, 1))(ts)
    if not guide:
        return pp, None
    guided = [q_leaf_g]
    guided.extend(down_g)  # depths L-1 .. 1 -> guided indices 1 .. L-1
    guided.append(root_g)  # index L
    guided.extend(up_g)  # indices L+1 .. 2L
    return pp, tuple(guided)


def _nwp_position_fn(leaf_values, transitions, external=None):
    """Build the per-position BP closure shared by the autoregressive sweep
    (vmapped over all positions) and the O(L) single-position API."""
    L = len(transitions)
    C = transitions[0].shape[0]
    q_full = _full_subtree_q(leaf_values, transitions)

    def one_position(t):
        # Ancestors of the observed position t and the target position t+1
        # at each depth; a[d] = t // C**(L-d).
        a = [t // (C ** (L - d)) for d in range(L + 1)]
        g = [(t + 1) // (C ** (L - d)) for d in range(L + 1)]

        # --- downward chain along t's ancestor path (reference :389-399) ---
        q_chain = {L: jnp.take(q_full[L - 1], t, axis=1)}  # [B, V]
        h_chain = {}
        down_guides = []
        for d in range(L - 1, 0, -1):
            child_ids = a[d] * C + jnp.arange(C)
            children = jnp.take(q_full[d], child_ids, axis=1)  # [B, C, V]
            r = a[d + 1] - a[d] * C  # branch index of the chain child
            mask = (jnp.arange(C) < r).astype(children.dtype)
            h = jnp.einsum("bcv,c->bv", children, mask) + q_chain[d + 1]
            h = h - jnp.max(h, axis=-1, keepdims=True)
            Td = jnp.take(transitions[d - 1], a[d], axis=0)  # [V, V]
            m = jnp.max(h, axis=-1, keepdims=True)
            q = jnp.log(jnp.dot(jnp.exp(h - m), Td.T, precision=_PRECISION)) + m
            q = q - jnp.max(q, axis=-1, keepdims=True)
            h_chain[d], q_chain[d] = h, q
            down_guides.append(jnp.concatenate([h, q], axis=-1))

        # --- root update (reference :420-439, with the bu/hd aliasing) ---
        children = q_full[0]  # [B, C, V] (depth-1 nodes)
        mask = (jnp.arange(C) < a[1]).astype(children.dtype)
        h_root = jnp.einsum("bcv,c->bv", children, mask) + q_chain[1]
        h_root = h_root - jnp.max(h_root, axis=-1, keepdims=True)
        bu = h_root if external is None else h_root + external
        bu = bu - jnp.max(bu, axis=-1, keepdims=True)
        root_guide = jnp.concatenate([bu, bu], axis=-1)

        # --- upward pass along the target path (reference :443-459) ---
        up_guides = []
        parent_bu = bu
        for d in range(1, L + 1):
            Td = jnp.take(transitions[d - 1], g[d], axis=0)  # [V, V]
            shared = a[d] == g[d]
            if d < L:
                diff = parent_bu - q_chain[d]
                inp = jnp.where(shared, diff, parent_bu)
                base = jnp.where(shared, h_chain[d], jnp.zeros_like(h_chain[d]))
            else:
                # The target leaf never coincides with the observed leaf.
                inp = parent_bu
                base = jnp.zeros_like(parent_bu)
            m = jnp.max(inp, axis=-1, keepdims=True)
            bu_d = base + jnp.log(jnp.dot(jnp.exp(inp - m), Td, precision=_PRECISION)) + m
            bu_d = bu_d - jnp.max(bu_d, axis=-1, keepdims=True)
            up_guides.append(bu_d)
            parent_bu = bu_d

        pp = jax.nn.softmax(parent_bu, axis=-1)
        q_leaf_guide = q_chain[L]
        return pp, q_leaf_guide, tuple(down_guides), root_guide, tuple(up_guides)

    return one_position


def bp_nwp_single_position(leaf_values, transitions, position: int,
                           external=None):
    """Posterior of one next-token position: ``p(x_{pos+1} | x_{<=pos}, ext)``.

    API counterpart of the reference's single-position debug routines
    ``BP_dummy_NWP``/``BP_NWP`` (``data_random_GHM.py:223-334``).  Runs the
    one-position chain directly (O(L) matmuls after the shared O(T) leaf
    preparation) rather than computing all T-1 positions and slicing.
    Returns ``[B, V]``.
    """
    one_position = _nwp_position_fn(leaf_values, transitions, external)
    pp, *_ = one_position(jnp.asarray(position))
    return pp
