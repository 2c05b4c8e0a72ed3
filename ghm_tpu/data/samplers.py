"""Task samplers: on-device GHM batch generation with exact BP targets.

Rebuilds the reference sampler layer (``data_random_GHM.py:617-942``:
``SingleSampler``/``DoubleSampler``/``ClassificationSampler``/
``DenoiseSampler``/``ClipSampler``/``ConditionalDenoiseSampler``/
``NextWordPredictSampler``) as pure functions over explicit PRNG keys.  Each
sampler class holds host-generated transition tensors (bit-identical to the
reference for a given ``seedtree``) and exposes

  * ``get_batch(key, batch_size, guide)`` — a jittable pytree-producing
    function.  Because it is pure jnp, it composes *inside* a compiled
    training step, so data generation runs on TPU with no host round-trip —
    replacing the reference's per-step CPU numpy sampling (the dominant cost
    of its training loop).
  * ``get_bayes(key, n_eval)`` — Monte-Carlo estimate of the Bayes risk from
    exact posteriors, matching the reference ``get_Bayes`` estimators.

Array layout is batch-major everywhere ([B, T], [B, V]); the reference's
[V, B] / [T, B] internals are an implementation detail its trainers
immediately transpose away.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ghm_tpu.core import (
    gen_transition,
    transitions_to_device,
    sample_tree,
    sample_root,
    bp_cls,
    bp_dns,
    bp_nwp_autoregressive,
    guided_cls,
    guided_dns,
)

__all__ = [
    "SingleTreeSampler",
    "DoubleTreeSampler",
    "ClassificationSampler",
    "DenoiseSampler",
    "ClipSampler",
    "ConditionalDenoiseSampler",
    "NextWordPredictSampler",
    "bayes_clip_loss",
    "clip_batch",
    "cdns_batch",
    "nwp_batch",
]


# ----------------------------------------------------------------------
# Transition-explicit batch functions.
#
# The sampler classes below close over fixed transition tensors; these free
# functions take the transitions as arguments instead, which makes them
# vmappable over a stacked hyperparameter axis — the basis of the sweep
# runner (parallel/sweep.py) that trains the reference's "20 background
# processes" (exp_clip_standardTF.sh:6-43) as ONE compiled program.
# ----------------------------------------------------------------------

def clip_batch(key, t_transition, i_transition, variable_type, K,
               batch_size, guide, n_childs):
    """CLIP (K+1)-block batch from explicit transition tensors."""
    B = batch_size
    kr1, kr2, kt, ki = jax.random.split(key, 4)
    t_root = sample_root(kr1, B * (K + 1), variable_type)
    i_root_extra = sample_root(kr2, B * (K - 1), variable_type)
    i_root = jnp.concatenate([t_root[: 2 * B], i_root_extra])
    t_vals = sample_tree(kt, t_transition, B * (K + 1), root=t_root)
    i_vals = sample_tree(ki, i_transition, B * (K + 1), root=i_root)
    if guide:
        t_res = bp_cls(t_vals[-1], t_transition)
        i_res = bp_cls(i_vals[-1], i_transition)
        t_guides = guided_cls(t_res, n_childs[0])
        i_guides = guided_cls(i_res, n_childs[1])
        t_pp, i_pp = t_res.posterior, i_res.posterior
    else:
        t_guides = i_guides = t_pp = i_pp = None
    return (
        (t_vals[-1], t_root, t_guides, t_pp),
        (i_vals[-1], i_root, i_guides, i_pp),
    )


def cdns_batch(key, t_transition, i_transition, variable_type, sigma,
               batch_size, guide, n_childs, diagnostics=True):
    """Conditional-denoising batch from explicit transition tensors.

    The training gradient only touches ``z``/``clean`` (plus the BP guides
    when ``guide``); the exact posteriors are a logged diagnostic, which the
    reference recomputes every iteration (``data_random_GHM.py:869-880``).
    ``diagnostics=False`` skips the BP passes entirely for unguided training
    — the sweep runner's hot path, worth ~2x on the 30k-iter grids.
    """
    kr, kt, ki, kn = jax.random.split(key, 4)
    root = sample_root(kr, batch_size, variable_type)
    t_vals = sample_tree(kt, t_transition, batch_size, root=root)
    i_vals = sample_tree(ki, i_transition, batch_size, root=root)
    x_img = i_vals[-1].astype(jnp.float32)
    z = x_img + sigma * jax.random.normal(kn, x_img.shape)
    if not guide and not diagnostics:
        return (
            (t_vals[-1], root, None, None),
            (z, i_vals[-1], None, None),
        )
    t_res = bp_cls(t_vals[-1], t_transition)
    external = t_res.h_msgs[0][:, 0, :]
    i_res = bp_dns(z, i_transition, sigma=sigma, external=external)
    if guide:
        t_guides = guided_cls(t_res, n_childs[0])
        i_guides = guided_dns(i_res, n_childs[1])
    else:
        t_guides = i_guides = None
    return (
        (t_vals[-1], root, t_guides, t_res.posterior),
        (z, i_vals[-1], i_guides, i_res.posterior_mean),
    )


def nwp_batch(key, t_transition, i_transition, variable_type,
              batch_size, guide, n_childs, diagnostics=True):
    """Next-word-prediction batch from explicit transition tensors.

    Unguided NWP training is plain next-token CE on the sampled text; the
    per-position autoregressive BP posterior (by far the most expensive op
    in the batch — one full BP pass per prefix) only feeds the KL-to-Bayes
    diagnostic the reference logs each iteration.  ``diagnostics=False``
    skips all BP for unguided training (sweep hot path).
    """
    kr, kt, ki = jax.random.split(key, 3)
    root = sample_root(kr, batch_size, variable_type)
    t_vals = sample_tree(kt, t_transition, batch_size, root=root)
    i_vals = sample_tree(ki, i_transition, batch_size, root=root)
    text = t_vals[-1]
    if not guide and not diagnostics:
        return (
            (text[:, :-1], text[:, 1:], None, None),
            (i_vals[-1], i_vals[0][:, 0], None, None),
        )
    i_res = bp_cls(i_vals[-1], i_transition)
    external = i_res.h_msgs[0][:, 0, :]
    pp, t_guides = bp_nwp_autoregressive(text, t_transition,
                                         external=external, guide=guide)
    i_guides = guided_cls(i_res, n_childs[1]) if guide else None
    return (
        (text[:, :-1], text[:, 1:], t_guides, pp),
        (i_vals[-1], i_vals[0][:, 0], i_guides, i_res.posterior),
    )


def bayes_clip_loss(t_pp, i_pp, n_eval: int, K: int, variable_type: int):
    """Bayes-optimal CLIP objective from exact posteriors.

    Reference: ``PPCLIPLoss`` / ``ClipSampler.get_Bayes``
    (``data_random_GHM.py:13-41, 786-817``).  ``t_pp``/``i_pp`` are
    ``[(K+1)*n_eval, V]`` posterior matrices laid out as two matched blocks
    followed by K-1 independent blocks.  The similarity between a text/image
    pair is ``V * <p_t, p_i>`` and each matched pair competes against its K-1
    aligned negatives.
    """
    V = variable_type

    def direction(match_a, match_b, indep):
        s_match = jnp.sum(match_a * match_b, axis=1) * V
        s_indep = jnp.einsum("kbv,bv->b", indep.reshape(K - 1, n_eval, V), match_b) * V
        return -jnp.log(s_match / (s_match + s_indep))

    s = direction(t_pp[:n_eval], i_pp[:n_eval], t_pp[2 * n_eval :])
    s += direction(i_pp[n_eval : 2 * n_eval], t_pp[n_eval : 2 * n_eval], i_pp[2 * n_eval :])
    return jnp.mean(s), jnp.std(s) / np.sqrt(n_eval)



# ----------------------------------------------------------------------
# Jitted entry points.
#
# On a remote-tunneled TPU every eagerly dispatched op pays a network round
# trip, so one-shot paths like get_bayes would take minutes if run op by op.
# These module-level jits take the transition tensors as *traced* arguments,
# so all samplers with the same tree shapes share one compiled executable
# regardless of p_flip.
# ----------------------------------------------------------------------

clip_batch_jit = jax.jit(clip_batch, static_argnums=(3, 4, 5, 6, 7))
cdns_batch_jit = jax.jit(cdns_batch, static_argnums=(3, 4, 5, 6, 7),
                         static_argnames=("diagnostics",))
nwp_batch_jit = jax.jit(nwp_batch, static_argnums=(3, 4, 5, 6),
                        static_argnames=("diagnostics",))


@partial(jax.jit, static_argnums=(3, 4, 5))
def _clip_bayes_jit(key, t_transition, i_transition, variable_type, K, n_eval):
    res_t, res_i = clip_batch(key, t_transition, i_transition, variable_type,
                              K, n_eval, False, (0, 0))
    t_pp = bp_cls(res_t[0], t_transition).posterior
    i_pp = bp_cls(res_i[0], i_transition).posterior
    return bayes_clip_loss(t_pp, i_pp, n_eval, K, variable_type)


@partial(jax.jit, static_argnums=(3, 4))
def _zeroshot_batch_jit(key, t_transition, i_transition, variable_type,
                        batch_size):
    kr, kt, ki = jax.random.split(key, 3)
    root = sample_root(kr, batch_size, variable_type)
    t_vals = sample_tree(kt, t_transition, batch_size, root=root)
    i_vals = sample_tree(ki, i_transition, batch_size, root=root)
    t_pp = bp_cls(t_vals[-1], t_transition).posterior
    i_pp = bp_cls(i_vals[-1], i_transition).posterior
    return t_vals[-1], i_vals[-1], t_pp, i_pp, root


class SingleTreeSampler:
    """One GHM tree; base for classification/denoising tasks.

    Reference ``SingleSampler`` (``data_random_GHM.py:617-639``).  Transition
    matrices are generated host-side with the reference's seeded RNG order
    (bit-identical for a given ``seedtree``), then moved to device.
    """

    def __init__(self, n_layer, n_child, p_y=None, p_flip=0.3, flip_scale=1.0,
                 variable_type=10, translation_invariance=True, seedtree=42):
        self.n_layer = int(n_layer)
        self.n_child = int(n_child)
        self.variable_type = int(variable_type)
        self.p_flip = float(p_flip)
        self.flip_scale = float(flip_scale)
        self.translation_invariance = bool(translation_invariance)
        self.seedtree = int(seedtree)
        self.p_y = (np.ones(variable_type) / variable_type) if p_y is None else np.asarray(p_y)
        self.transition_host = gen_transition(
            self.n_layer, self.n_child, self.variable_type, self.p_flip,
            self.flip_scale, self.translation_invariance,
            rng=np.random.RandomState(self.seedtree),
        )
        self.transition = transitions_to_device(self.transition_host)

    @property
    def n_leaves(self):
        return self.n_child**self.n_layer


class DoubleTreeSampler:
    """Paired text/image GHM trees (shared or independent roots).

    Reference ``DoubleSampler`` (``data_random_GHM.py:641-682``).  The text
    transitions are generated first from the seeded stream, then the image
    transitions — matching the reference's RNG consumption order exactly.
    """

    def __init__(self, n_layers, n_childs, p_ys=None, p_flips=(0.1, 0.1),
                 flip_scale=1.0, variable_type=10, translation_invariance=True,
                 seedtree=42):
        self.n_layers = [int(x) for x in n_layers]
        self.n_childs = [int(x) for x in n_childs]
        self.variable_type = int(variable_type)
        self.p_flips = [float(x) for x in p_flips]
        self.flip_scale = float(flip_scale)
        self.translation_invariance = bool(translation_invariance)
        self.seedtree = int(seedtree)
        if p_ys is None:
            p_ys = [np.ones(variable_type) / variable_type] * 2
        self.p_ys = [np.asarray(p) for p in p_ys]
        rng = np.random.RandomState(self.seedtree)
        self.t_transition_host = gen_transition(
            self.n_layers[0], self.n_childs[0], self.variable_type,
            self.p_flips[0], self.flip_scale, self.translation_invariance, rng=rng)
        self.i_transition_host = gen_transition(
            self.n_layers[1], self.n_childs[1], self.variable_type,
            self.p_flips[1], self.flip_scale, self.translation_invariance, rng=rng)
        self.t_transition = transitions_to_device(self.t_transition_host)
        self.i_transition = transitions_to_device(self.i_transition_host)

    @property
    def n_t_leaves(self):
        return self.n_childs[0] ** self.n_layers[0]

    @property
    def n_i_leaves(self):
        return self.n_childs[1] ** self.n_layers[1]

    def get_zeroshot_batch(self, key, batch_size=128):
        """Shared-root pairs with both CLS posteriors, for zero-shot evals.

        Reference ``DoubleSampler.get_zeroshot_batch`` (:670-682).
        Returns (t_leaves [B,Tt], i_leaves [B,Ti], t_pp [B,V], i_pp [B,V], root [B]).
        """
        return _zeroshot_batch_jit(key, self.t_transition,
                                   self.i_transition, self.variable_type,
                                   batch_size)


class ClassificationSampler(SingleTreeSampler):
    """Root classification from all leaves (reference :685-720)."""

    def get_batch(self, key, batch_size=128, guide=False):
        vals = sample_tree(key, self.transition, batch_size)
        res = bp_cls(vals[-1], self.transition)
        guides = guided_cls(res, self.n_child) if guide else None
        return vals[-1], vals[0][:, 0], guides, res.posterior

    def get_bayes(self, key, n_eval=10000):
        """Bayes CE: mean −log p(root | leaves) at the true root (:707-720)."""
        leaves, root, _, pp = self.get_batch(key, batch_size=n_eval, guide=False)
        sel = jnp.take_along_axis(pp, root[:, None], axis=1)[:, 0]
        loss = -jnp.log(sel)
        return float(jnp.mean(loss)), float(jnp.std(loss)) / np.sqrt(n_eval)


class DenoiseSampler(SingleTreeSampler):
    """Gaussian-noised leaves with posterior-mean targets (reference :722-742)."""

    def __init__(self, n_layer, n_child, p_y=None, p_flip=0.3, sigma=1.0,
                 flip_scale=1.0, variable_type=10, translation_invariance=True,
                 seedtree=42):
        super().__init__(n_layer, n_child, p_y, p_flip, flip_scale,
                         variable_type, translation_invariance, seedtree)
        self.sigma = float(sigma)

    def get_batch(self, key, batch_size=128, guide=False):
        kt, kn = jax.random.split(key)
        vals = sample_tree(kt, self.transition, batch_size)
        x = vals[-1].astype(jnp.float32)
        z = x + self.sigma * jax.random.normal(kn, x.shape)
        res = bp_dns(z, self.transition, sigma=self.sigma)
        guides = guided_dns(res, self.n_child) if guide else None
        return z, x, guides, res.posterior_mean


class ClipSampler(DoubleTreeSampler):
    """CLIP batches: matched pairs plus K-1 aligned independent negatives.

    Reference ``ClipSampler`` (``data_random_GHM.py:746-817``).  Root layout
    (:758-760): text roots are (K+1)·B i.i.d. draws; image roots copy the
    first 2·B text roots (the two matched directions) and draw (K-1)·B fresh
    roots for the negatives.
    """

    def __init__(self, n_layers, n_childs, p_ys=None, p_flips=(0.1, 0.1), K=4,
                 flip_scale=1.0, variable_type=10, translation_invariance=True,
                 seedtree=42):
        super().__init__(n_layers, n_childs, p_ys, p_flips, flip_scale,
                         variable_type, translation_invariance, seedtree)
        self.K = int(K)

    def get_batch(self, key, batch_size=128, guide=False):
        return clip_batch_jit(key, self.t_transition, self.i_transition,
                              self.variable_type, self.K, batch_size, guide,
                              tuple(self.n_childs))

    def get_bayes(self, key, n_eval=10000):
        """Bayes CLIP risk from exact posteriors (:786-817)."""
        mean, std = _clip_bayes_jit(key, self.t_transition, self.i_transition,
                                    self.variable_type, self.K, n_eval)
        return float(mean), float(std)


class ConditionalDenoiseSampler(DoubleTreeSampler):
    """Denoise image leaves conditioned on paired text (reference :846-894).

    As in the reference (:869-880), text CLS BP and externally-conditioned
    image DNS BP always run — the exact posterior mean is a logged diagnostic
    even for unguided training.
    """

    def __init__(self, n_layers, n_childs, p_ys=None, p_flips=(0.1, 0.1),
                 sigma=1.0, flip_scale=1.0, variable_type=10,
                 translation_invariance=True, seedtree=42):
        super().__init__(n_layers, n_childs, p_ys, p_flips, flip_scale,
                         variable_type, translation_invariance, seedtree)
        self.sigma = float(sigma)

    def get_batch(self, key, batch_size=128, guide=False):
        return cdns_batch_jit(key, self.t_transition, self.i_transition,
                              self.variable_type, self.sigma, batch_size,
                              guide, tuple(self.n_childs))

    def get_bayes(self, key, n_eval=10000):
        """Bayes MSE of the exact posterior mean vs clean leaves (:886-894)."""
        _, res_i = self.get_batch(key, batch_size=n_eval, guide=False)
        z, x, _, pm = res_i
        loss = jnp.sum((pm - x.astype(pm.dtype)) ** 2, axis=1)
        return float(jnp.mean(loss)), float(jnp.std(loss)) / np.sqrt(n_eval)


class NextWordPredictSampler(DoubleTreeSampler):
    """Image-conditioned autoregressive next-word prediction (reference :896-942)."""

    def get_batch(self, key, batch_size=128, guide=False):
        return nwp_batch_jit(key, self.t_transition, self.i_transition,
                             self.variable_type, batch_size, guide,
                             tuple(self.n_childs))

    def get_bayes(self, key, n_eval=10000):
        """Bayes next-token CE of the exact BP posterior (:931-942)."""
        res_t, _ = self.get_batch(key, batch_size=n_eval, guide=False)
        _, targets, _, pp = res_t
        V = self.variable_type
        flat_pp = pp.reshape(-1, V)
        flat_t = targets.reshape(-1)
        sel = jnp.take_along_axis(flat_pp, flat_t[:, None].astype(jnp.int32), axis=1)[:, 0]
        loss = -jnp.log(sel)
        return float(jnp.mean(loss)), float(jnp.std(loss)) / np.sqrt(n_eval)
