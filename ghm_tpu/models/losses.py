"""Loss functions for the GHM task suite (pure jnp, jit-first).

Behavioral contracts from reference ``model.py:811-1216``:

  * CLIP family — symmetric two-direction contrastive loss over the
    (K+1)-block batch layout, with the K-1 aligned negatives folded back onto
    their matched examples; optional Frobenius² guided penalties.
  * CE family — weighted / per-sequence cross-entropy with split guided
    penalties (down / root / up / other-modality) for VLM training.
  * LS family — summed-squared-error denoising losses with the same split
    guided penalties for CDM training.
  * ``kl_divergence`` — KL(BP posterior ‖ model) diagnostic.

Guided penalties use per-sample squared Frobenius norms over (positions,
channels), matching ``torch.linalg.norm(..., dim=(1,2))**2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "clip_loss",
    "guided_clip_loss",
    "softmax_clip_loss",
    "guided_softmax_clip_loss",
    "guided_classification_loss",
    "guided_ce_loss",
    "conditional_guided_ce_loss",
    "ls_loss",
    "guided_ls_loss",
    "conditional_guided_ls_loss",
    "kl_divergence",
    "cross_entropy",
]


def _fold_negatives(s_indep, K, batch_size):
    """Sum each matched example's K-1 aligned negatives.

    Equivalent to the reference's ``kron(ones(K-1,1), eye(B))`` matmul
    (``model.py:849-850``) without materializing the [B(K-1), B] matrix.
    """
    return s_indep.reshape(K - 1, batch_size).sum(axis=0)


def _contrastive_direction(match_a, match_b, indep, K, batch_size):
    s_match = jnp.exp(jnp.sum(match_a * match_b, axis=1))
    tiled = jnp.tile(match_b, (K - 1, 1))
    s_indep = jnp.exp(jnp.sum(indep * tiled, axis=1))
    folded = _fold_negatives(s_indep, K, batch_size)
    return -jnp.log(s_match / (s_match + folded))


def clip_loss(t_out, i_out, K, batch_size):
    """Symmetric exp-inner-product CLIP loss (reference ``ClipLoss``, :829-865)."""
    B = batch_size
    l1 = _contrastive_direction(t_out[:B], i_out[:B], t_out[2 * B :], K, B)
    l2 = _contrastive_direction(i_out[B : 2 * B], t_out[B : 2 * B],
                                i_out[2 * B :], K, B)
    return jnp.mean(l1 + l2)


def _frob_sq(a, b):
    """Per-sample squared Frobenius norm over all non-batch axes."""
    d = a - b
    return jnp.sum(d * d, axis=tuple(range(1, d.ndim)))


def guided_clip_loss(t_outputs, i_outputs, targets, K, batch_size,
                     penalty=1e-4, guide=False):
    """CLIP loss plus guided penalties; returns ``(loss, guide_diag)``.

    Reference ``GuidedClipLoss`` (:867-926).  ``t_outputs``/``i_outputs`` are
    ``(embedding, guided_list)`` pairs; ``targets`` is ``(t_guides, i_guides)``.
    ``guide_diag`` is the raw (un-weighted) guided penalty for logging.
    """
    loss = clip_loss(t_outputs[0], i_outputs[0], K, batch_size)
    diag = 0.0
    if guide:
        pen = 0.0
        for inp, tgt in zip(t_outputs[1], targets[0]):
            pen += penalty * _frob_sq(inp, tgt)
        for inp, tgt in zip(i_outputs[1], targets[1]):
            pen += penalty * _frob_sq(inp, tgt)
        pen = jnp.mean(pen)
        loss = loss + pen
        diag = pen / penalty
    return loss, diag


def softmax_clip_loss(t_out, i_out, K, batch_size):
    """Probability-space CLIP variant (reference ``SoftmaxClipLoss``, :930-969)."""
    t_p = jax.nn.softmax(t_out, axis=1)
    i_p = jax.nn.softmax(i_out, axis=1)
    B = batch_size

    def direction(match_a, match_b, indep):
        s_match = jnp.sum(match_a * match_b, axis=1)
        s_indep = jnp.sum(indep * jnp.tile(match_b, (K - 1, 1)), axis=1)
        folded = _fold_negatives(s_indep, K, B)
        return -jnp.log(s_match / (s_match + folded))

    l1 = direction(t_p[:B], i_p[:B], t_p[2 * B :])
    l2 = direction(i_p[B : 2 * B], t_p[B : 2 * B], i_p[2 * B :])
    return jnp.mean(l1 + l2)


def guided_softmax_clip_loss(t_outputs, i_outputs, targets, K, batch_size,
                             penalty=1e-4):
    """Softmax CLIP with guided penalties (reference :1162-1216)."""
    loss = softmax_clip_loss(t_outputs[0], i_outputs[0], K, batch_size)
    pen = 0.0
    for inp, tgt in zip(t_outputs[1], targets[0]):
        pen += penalty * _frob_sq(inp, tgt)
    for inp, tgt in zip(i_outputs[1], targets[1]):
        pen += penalty * _frob_sq(inp, tgt)
    return loss + jnp.mean(pen)


def cross_entropy(logits, labels):
    """Per-example CE from raw logits (torch ``cross_entropy`` semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(
        logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]


def guided_classification_loss(inputs, targets, penalty=0.1):
    """CE + guided penalties (reference ``GuidedClassificationLoss``, :811-827)."""
    loss = cross_entropy(inputs[0].reshape(-1, inputs[0].shape[-1]),
                         targets[0].reshape(-1))
    for inp, tgt in zip(inputs[1], targets[1]):
        loss = loss + penalty * _frob_sq(inp, tgt)
    return jnp.mean(loss)


def guided_ce_loss(inputs, targets, penaltys=(1.0, 0.1), guide=False):
    """Weighted CE with optional guided penalty (reference ``GuidedCELoss``,
    :1045-1065; used by classification training)."""
    loss = penaltys[0] * cross_entropy(inputs[0], targets[0])
    if guide:
        pen = 0.0
        for inp, tgt in zip(inputs[1], targets[1]):
            pen += penaltys[1] * _frob_sq(inp, tgt)
        loss = loss + pen
    return jnp.mean(loss)


def _split_guided_penalties(guided_input, guided_target, penalty):
    """Down / root / up penalty split used by the conditional losses.

    Reference ``model.py:1028-1031`` / ``:1129-1132``: with 2L+1 guide blocks,
    the first L are downward stages, block L is the root, and the last L are
    upward stages, each reported separately for diagnostics.
    """
    n = len(guided_input)
    half = n // 2
    down = 0.0
    up = 0.0
    for i in range(half):
        down += penalty * _frob_sq(guided_input[i], guided_target[i])
        up += penalty * _frob_sq(guided_input[i + half + 1],
                                 guided_target[i + half + 1])
    root = penalty * _frob_sq(guided_input[half], guided_target[half])
    return down, root, up


def conditional_guided_ce_loss(inputs, targets, penalty=1e-4, guide=False):
    """Per-sequence CE with split guided penalties (reference
    ``ConditionalGuidedCELoss``, :1080-1149; used by VLM training).

    Returns ``(loss, down_diag, root_diag, up_diag, other_diag)`` where the
    diagnostics are batch means of the individual penalty groups.
    """
    logits, (t_guides, i_guides) = inputs[0], inputs[1]
    labels, (t_targets, i_targets) = targets[0], targets[1]
    ce = cross_entropy(logits.reshape(-1, logits.shape[-1]), labels.reshape(-1))
    loss = jnp.mean(ce.reshape(-1, labels.shape[1]), axis=1)
    if not guide:
        return jnp.mean(loss), 0.0, 0.0, 0.0, 0.0
    down, root, up = _split_guided_penalties(t_guides, t_targets, penalty)
    other = 0.0
    for inp, tgt in zip(i_guides, i_targets):
        other += penalty * _frob_sq(inp, tgt)
    loss = loss + down + root + up + other
    return (jnp.mean(loss), jnp.mean(down), jnp.mean(root), jnp.mean(up),
            jnp.mean(other))


def ls_loss(pred, target):
    """Summed squared error per sample, batch mean (reference ``LsLoss``)."""
    return jnp.mean(jnp.sum((pred - target) ** 2, axis=1))


def guided_ls_loss(inputs, targets, penalty=1e-4):
    """MSE + guided penalties (reference ``GuidedLsLoss``, :971-987)."""
    loss = jnp.sum((inputs[0] - targets[0]) ** 2, axis=1)
    pen = 0.0
    for inp, tgt in zip(inputs[1], targets[1]):
        pen += penalty * _frob_sq(inp, tgt)
    return jnp.mean(loss) + jnp.mean(pen)


def conditional_guided_ls_loss(inputs, targets, penalty=1e-4, guide=False):
    """Conditional denoising MSE with split guided penalties (reference
    ``ConditionalGuidedLsLoss``, :989-1041; used by CDM training).

    Returns ``(loss, down_diag, root_diag, up_diag, other_diag)``.
    """
    pred, (t_guides, i_guides) = inputs[0], inputs[1]
    target, (t_targets, i_targets) = targets[0], targets[1]
    loss = jnp.sum((pred - target) ** 2, axis=1)
    if not guide:
        return jnp.mean(loss), 0.0, 0.0, 0.0, 0.0
    down, root, up = _split_guided_penalties(i_guides, i_targets, penalty)
    other = 0.0
    for inp, tgt in zip(t_guides, t_targets):
        other += penalty * _frob_sq(inp, tgt)
    loss = loss + down + root + up + other
    return (jnp.mean(loss), jnp.mean(down), jnp.mean(root), jnp.mean(up),
            jnp.mean(other))


def kl_divergence(logits, target_probs):
    """Batch-mean KL(target ‖ softmax(logits)) (reference ``KLdiv``, :1067-1078,
    with torch ``kl_div(..., reduction='batchmean')`` semantics)."""
    logits = logits.reshape(-1, logits.shape[-1])
    p = target_probs.reshape(-1, target_probs.shape[-1])
    logq = jax.nn.log_softmax(logits, axis=1)
    xlogx = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return jnp.sum(xlogx - p * logq) / logits.shape[0]
