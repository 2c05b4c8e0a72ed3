"""The ghm_tpu transformer family (functional, jit-first).

Four models mirroring the reference's behavioral surface (``model.py``):

  * :class:`EncoderTransformer`        — CLIP / ZSC / classification encoder
  * :class:`AutoRegressiveTransformer` — image-conditioned VLM decoder
  * :class:`ConditionalDenoiseEncoderTransformer` — text-conditioned CDM
  * :class:`DenoiseEncoderTransformer` — single-tree denoiser

Each class is a static-config object exposing ``init(key) -> params`` and
``apply(params, ...) -> (output, guided_layers)``; ``apply`` is pure and is
meant to be closed over by a jitted train step.  Parameter trees use torch
``state_dict`` names/layouts for checkpoint interop.

Reference quirks reproduced deliberately (SURVEY.md Appendix A):
  * attention is effectively single-head: per-layer full-width Q/K/V linears,
    never split by ``n_head`` (``model.py:737-739, 778-782``);
  * the autoregressive model applies its attention residual TWICE — once
    after the activation and once more after dividing the weights by
    ``n_embd`` (``model.py:288-291``);
  * the encoder head pools positions with a learned ``Linear(n_token, 1)``
    after transposing, so the CLIP embedding dimension equals the class count
    (``model.py:802-805``);
  * the encoder applies pre-LN unconditionally (its ``layernorm`` flag is
    unused in forward, ``model.py:772``), and its guided slice always reads
    hidden block ``[0:V]`` because the slice counter is never advanced
    (``model.py:797-800``);
  * guided slicing offsets for the AR (leaf-q / h‖q / bu) and CDM (h/q then
    h‖q‖u) blocks follow ``model.py:258-331`` and ``:459-527``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ghm_tpu.models.layers import (
    embedding_init,
    get_activation,
    layer_norm,
    layernorm_init,
    linear,
    linear_init,
    mlp,
    mlp_init,
    prefix_lm_mask,
)

__all__ = [
    "EncoderTransformer",
    "AutoRegressiveTransformer",
    "ConditionalDenoiseEncoderTransformer",
    "DenoiseEncoderTransformer",
]


def _init_block_stack(key, n_layer, n_embd, n_mlp_hidden):
    """Per-layer Q/K/V (no bias), LN pair, and biased GELU MLP."""
    params = {"_queries": {}, "_keys": {}, "_values": {}, "_mlps": {},
              "_lns_1": {}, "_lns_2": {}}
    for i in range(n_layer):
        kq, kk, kv, km, key = jax.random.split(key, 5)
        params["_queries"][str(i)] = linear_init(kq, n_embd, n_embd, bias=False)
        params["_keys"][str(i)] = linear_init(kk, n_embd, n_embd, bias=False)
        params["_values"][str(i)] = linear_init(kv, n_embd, n_embd, bias=False)
        params["_mlps"][str(i)] = mlp_init(km, n_embd, n_mlp_hidden)
        params["_lns_1"][str(i)] = layernorm_init(n_embd)
        params["_lns_2"][str(i)] = layernorm_init(n_embd)
    return params, key


def _layer_params(params, i):
    """Per-layer parameter subtree (a proper pytree, so block functions can
    be wrapped in ``jax.checkpoint`` for rematerialization)."""
    si = str(i)
    return {"q": params["_queries"][si], "k": params["_keys"][si],
            "v": params["_values"][si], "mlp": params["_mlps"][si],
            "ln1": params["_lns_1"][si], "ln2": params["_lns_2"][si]}


def _attention(lp, H, act, scale=None, mask=None, mask_after_norm=False):
    """Single-head full-width attention producing (weights, values)."""
    q = linear(lp["q"], H)
    k = linear(lp["k"], H)
    v = linear(lp["v"], H)
    A = jnp.einsum("bid,bjd->bij", q, k)
    if mask is not None and not mask_after_norm:
        A = A + mask
    if scale is not None:
        A = A / scale
    if mask is not None and mask_after_norm:
        A = A + mask
    return act(A), v


class EncoderTransformer:
    """Leaf-token encoder for CLIP/ZSC/classification.

    Behavioral contract: reference ``EncoderTransformer``
    (``model.py:690-808``).  Output is a ``[B, num_class]`` embedding.
    """

    def __init__(self, n_token, num_class, n_embd=128, n_layer=12,
                 n_guided_layer=3, n_head=4, n_mlp_multiplier=4,
                 activation="softmax", mlp=True, normalize_attn=True,
                 layernorm=True, maxnorm=False, guide=False, remat=False):
        self.n_token = n_token
        self.vocab_size = num_class
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head  # stored for parity; attention is un-split
        self.n_mlp_hidden = n_embd * n_mlp_multiplier
        self.activation = get_activation(activation)
        self.use_mlp = mlp
        self.normalize_attn = normalize_attn
        self.layernorm = layernorm
        self.maxnorm = maxnorm
        self.guide = guide
        self.remat = remat
        self.n_guided_layer = n_guided_layer
        self.guided_layer_flag = [False] * n_layer
        if guide:
            gap = n_layer // n_guided_layer
            count = 0
            for i in range(n_layer):
                if gap and count < n_guided_layer and (i + 1) % gap == 0:
                    self.guided_layer_flag[i] = True
                    count += 1
            if self.n_layer * self.vocab_size >= self.n_mlp_hidden:
                raise ValueError(
                    "n_layer * vocab_size must stay below the MLP hidden width "
                    "for guided hidden-block slicing")

    def init(self, key):
        kt, kp, key = jax.random.split(key, 3)
        params = {
            "token_embeddings": embedding_init(kt, self.vocab_size, self.n_embd),
            "position_embeddings": embedding_init(kp, self.n_token, self.n_embd),
        }
        stack, key = _init_block_stack(key, self.n_layer, self.n_embd, self.n_mlp_hidden)
        params.update(stack)
        kr, ko = jax.random.split(key)
        params["_read_out"] = linear_init(kr, self.n_embd, self.vocab_size)
        params["_out"] = linear_init(ko, self.n_token, 1)
        return params

    def apply(self, params, x):
        """x: [B, T] int tokens -> ([B, num_class] embedding, guided list)."""
        B, T = x.shape
        H = params["token_embeddings"]["weight"][x] \
            + params["position_embeddings"]["weight"][jnp.arange(T)][None]
        scale = math.sqrt(self.n_embd) if self.normalize_attn else None
        guided = []

        def block(H, lp):
            # Pre-LN is unconditional in the reference encoder (model.py:772).
            H1 = layer_norm(lp["ln1"], H)
            A, v = _attention(lp, H1, self.activation, scale=scale)
            H = H + jnp.einsum("bij,bjd->bid", A, v)
            H2 = layer_norm(lp["ln2"], H)
            if self.maxnorm:
                H2 = H2 - jnp.max(H2, axis=2, keepdims=True)
            if self.use_mlp:
                H = H + mlp(lp["mlp"], H2)
            return H

        # Rematerialize per layer: backward recomputes block activations, so
        # peak memory scales with one layer, not n_layer (big multi-model
        # sweep programs fit HBM unsharded).  Guided slices read the block
        # *output*, which remat keeps, so guided training is unaffected.
        if self.remat:
            block = jax.checkpoint(block)
        for i in range(self.n_layer):
            H = block(H, _layer_params(params, i))
            if self.guide and self.guided_layer_flag[i]:
                # The reference never advances its slice counter (:800), so
                # every guided layer reads the first vocab-sized block.
                guided.append(H[:, :, : self.vocab_size])
        pred = linear(params["_read_out"], H)  # [B, T, num_class]
        pred = jnp.swapaxes(pred, 1, 2)  # [B, num_class, T]
        out = linear(params["_out"], pred)[:, :, 0]  # learned position pooling
        return out, guided


def _ar_guided_flags(n_layer, n_a, n_b, guide):
    """Guided-layer flags for the two-sided models.

    ``n_a`` drives spacing (text depth for the AR model, image depth for the
    CDM model); ``n_b`` is the other modality.  Reference ``model.py:208-217``
    and ``:407-416``.
    """
    a_flags = [False] * n_layer
    b_flags = [False] * n_layer
    if not guide:
        return a_flags, b_flags
    gap = n_layer // (n_a * 2 + 1)
    count = 0
    for i in range(n_layer):
        if count < (n_a * 2 + 1) and gap and (i + 1) % gap == 0:
            a_flags[i] = True
            if count < n_b:
                b_flags[i] = True
            if count == n_a - 1 and n_b < n_a:
                b_flags[i] = True
            count += 1
    return a_flags, b_flags


class AutoRegressiveTransformer:
    """Image-prefix + causal-text decoder for next-word prediction.

    Behavioral contract: reference ``AutoRegressiveTransformer``
    (``model.py:132-335``), including the double attention residual
    (``:288-291``) and the mask-before-normalize order (``:279-287``).
    """

    def __init__(self, n_token=9, n_i_token=4, num_class=10, n_embd=128,
                 n_layer=12, n_guided_layers=(3, 3), n_head=4, n_mlp_hidden=512,
                 activation="softmax", mlp=True, normalize_attn=True,
                 auto_regressive=False, sequential=False, layernorm=True,
                 guide=False, remat=False):
        self.n_token = n_token
        self.n_i_token = n_i_token
        self.vocab_size = num_class
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_mlp_hidden = n_mlp_hidden
        self.activation = get_activation(activation)
        self.use_mlp = mlp
        self.normalize_attn = normalize_attn
        self.auto_regressive = auto_regressive
        self.sequential = sequential
        self.layernorm = layernorm
        self.guide = guide
        self.remat = remat
        self.n_t_guided_layer = n_guided_layers[0]
        self.n_i_guided_layer = n_guided_layers[1]
        self.t_guided_layer_flag, self.i_guided_layer_flag = _ar_guided_flags(
            n_layer, self.n_t_guided_layer, self.n_i_guided_layer, guide)
        if guide and (3 * self.n_t_guided_layer + 1) * num_class > n_embd:
            raise ValueError(
                "guided hidden-block slicing needs n_embd >= "
                "(3*n_t_guided_layers + 1) * num_class "
                f"({(3 * self.n_t_guided_layer + 1) * num_class} > {n_embd})")
        self._mask = prefix_lm_mask(n_token, n_i_token) if auto_regressive else None

    def init(self, key):
        kp, kt, ki, key = jax.random.split(key, 4)
        params = {
            "position_embeddings": embedding_init(kp, self.n_token, self.n_embd),
            "t_embedding": embedding_init(kt, self.vocab_size, self.n_embd),
            "i_embedding": embedding_init(ki, self.vocab_size, self.n_embd),
        }
        stack, key = _init_block_stack(key, self.n_layer, self.n_embd, self.n_mlp_hidden)
        params.update(stack)
        kr, ko = jax.random.split(key)
        params["_read_out"] = linear_init(kr, self.n_embd, self.vocab_size)
        params["_out"] = linear_init(ko, self.n_token, 1)
        return params

    def token_embeddings(self, params, xt, zi):
        """Image prefix + text token embeddings (reference ``:223-242``)."""
        B = zi.shape[0]
        T = self.n_token
        emb = jnp.zeros((B, T, self.n_embd), dtype=jnp.float32)
        if self.sequential:
            # One frozen CLIP feature token, zero-padded to the model width.
            pad = jnp.zeros((B, zi.shape[1], self.n_embd - self.vocab_size),
                            dtype=jnp.float32)
            feat = jnp.concatenate([zi, pad], axis=2)
            emb = emb.at[:, 0, :].set(feat[:, 0, :])
        else:
            emb = emb.at[:, : self.n_i_token, :].set(
                params["i_embedding"]["weight"][zi])
        emb = emb.at[:, self.n_i_token :, :].set(
            params["t_embedding"]["weight"][xt])
        return emb

    def apply(self, params, xt, zi):
        """(xt [B,T_t] tokens, zi image tokens/feature) -> (logits, guides)."""
        T = self.n_token
        H = self.token_embeddings(params, xt, zi) \
            + params["position_embeddings"]["weight"][jnp.arange(T)][None]
        V = self.vocab_size
        scale = math.sqrt(self.n_embd) if self.normalize_attn else None
        # Rolling offsets into the hidden dimension for guided slices (:258-262).
        index_q = 0
        index_h = (self.n_t_guided_layer + 1) * V
        index_u = (2 * self.n_t_guided_layer + 1) * V
        index_i = 0
        counter = 0
        t_guided, i_guided = [], []

        def block(H, lp):
            src = layer_norm(lp["ln1"], H) if self.layernorm else H
            A, v = _attention(lp, src, self.activation, scale=scale,
                              mask=self._mask, mask_after_norm=False)
            H = H + jnp.einsum("bij,bjd->bid", A, v)
            if self.normalize_attn:
                # Reference quirk: the attention residual is applied a second
                # time with weights shrunk by n_embd (model.py:288-291).
                A = A / H.shape[2]
            H = H + jnp.einsum("bij,bjd->bid", A, v)
            if self.layernorm:
                if self.use_mlp:
                    H = H + mlp(lp["mlp"], layer_norm(lp["ln2"], H))
            elif self.use_mlp:
                H = H + mlp(lp["mlp"], H)
            return H

        if self.remat:
            block = jax.checkpoint(block)
        for i in range(self.n_layer):
            H = block(H, _layer_params(params, i))
            if self.guide and self.t_guided_layer_flag[i]:
                nI = self.n_i_token
                if counter == 0:
                    out = H[:, nI:, index_q : index_q + V]
                    index_q += V
                elif counter < self.n_t_guided_layer + 1:
                    h_H = H[:, nI:, index_h : index_h + V]
                    q_H = H[:, nI:, index_q : index_q + V]
                    index_h += V
                    index_q += V
                    out = jnp.concatenate([h_H, q_H], axis=2)
                else:
                    out = H[:, nI:, index_u : index_u + V]
                    index_u += V
                counter += 1
                t_guided.append(out)
            if self.guide and self.i_guided_layer_flag[i]:
                i_guided.append(H[:, : self.n_i_token, index_i : index_i + V])
                index_i += V
        pred = linear(params["_read_out"], H)
        return pred[:, self.n_i_token :, :], [t_guided, i_guided]


class ConditionalDenoiseEncoderTransformer:
    """Text-conditioned image denoiser (CDM).

    Behavioral contract: reference ``ConditionalDenoiseEncoderTransformer``
    (``model.py:337-532``): continuous noisy image leaves enter as Gaussian
    squared-distance features in the first ``vocab_size`` channels
    (``:431-433``), the text side is either a learned embedding (joint) or a
    zero-padded frozen CLIP feature (sequential), and the head reads one
    denoised value per image position.
    """

    def __init__(self, n_token, n_i_token, num_class, n_embd=128, n_layer=12,
                 n_guided_layers=(3, 3), n_head=4, n_mlp_hidden=512,
                 activation="softmax", mlp=True, normalize_attn=True,
                 auto_regressive=False, sequential=False, layernorm=True,
                 maxnorm=False, guide=False, sigma=1.0, remat=False):
        self.n_token = n_token
        self.n_i_token = n_i_token
        self.vocab_size = num_class
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_mlp_hidden = n_mlp_hidden
        self.activation = get_activation(activation)
        self.use_mlp = mlp
        self.normalize_attn = normalize_attn
        self.auto_regressive = auto_regressive
        self.sequential = sequential
        self.layernorm = layernorm
        self.maxnorm = maxnorm
        self.guide = guide
        self.sigma = sigma
        self.remat = remat
        self.n_t_guided_layer = n_guided_layers[0]
        self.n_i_guided_layer = n_guided_layers[1]
        # Image depth drives the spacing here (model.py:372, 407-416).
        self.i_guided_layer_flag, self.t_guided_layer_flag = _ar_guided_flags(
            n_layer, self.n_i_guided_layer, self.n_t_guided_layer, guide)
        need = max(self.n_t_guided_layer + self.n_i_guided_layer + 1,
                   2 * self.n_t_guided_layer + self.n_i_guided_layer)
        if guide and need * num_class > n_embd:
            raise ValueError(
                "guided hidden-block slicing needs n_embd >= "
                "max(n_t+n_i+1, 2*n_t+n_i) * num_class "
                f"({need * num_class} > {n_embd})")
        self._mask = prefix_lm_mask(n_token, n_i_token) if auto_regressive else None

    def init(self, key):
        kp, kt, key = jax.random.split(key, 3)
        params = {
            "position_embeddings": embedding_init(kp, self.n_token, self.n_embd),
            "t_embedding": embedding_init(kt, self.vocab_size, self.n_embd),
        }
        stack, key = _init_block_stack(key, self.n_layer, self.n_embd, self.n_mlp_hidden)
        params.update(stack)
        kr, ko = jax.random.split(key)
        params["_read_out"] = linear_init(kr, self.n_embd, 1)
        params["_out"] = linear_init(ko, self.n_token, 1)
        return params

    def token_embeddings(self, params, xt, zi):
        """Gaussian-distance image features + text embedding (``:422-446``)."""
        B = zi.shape[0]
        emb = jnp.zeros((B, self.n_token, self.n_embd), dtype=jnp.float32)
        k = jnp.arange(self.vocab_size, dtype=jnp.float32)
        feats = -((k[None, None, :] - zi[:, :, None]) ** 2) / 2.0
        emb = emb.at[:, : self.n_i_token, : self.vocab_size].set(feats)
        if self.sequential:
            pad = jnp.zeros((B, xt.shape[1], self.n_embd - self.vocab_size),
                            dtype=jnp.float32)
            feat = jnp.concatenate([xt, pad], axis=2)
            emb = emb.at[:, self.n_i_token :, :].set(feat)
        else:
            emb = emb.at[:, self.n_i_token :, :].set(
                params["t_embedding"]["weight"][xt])
        return emb

    def apply(self, params, xt, zi):
        """(text tokens/feature, noisy image [B, n_i]) -> (denoised, guides)."""
        H = self.token_embeddings(params, xt, zi) \
            + params["position_embeddings"]["weight"][jnp.arange(self.n_token)][None]
        V = self.vocab_size
        scale = math.sqrt(self.n_embd) if self.normalize_attn else None
        index_h = 0
        index_q = self.n_t_guided_layer * V
        index_u = 2 * self.n_t_guided_layer * V
        index_i = 0
        counter = 0
        t_guided, i_guided = [], []

        def block(H, lp):
            src = layer_norm(lp["ln1"], H) if self.layernorm else H
            # Mask (if any) is added after normalization here (model.py:481-484).
            A, v = _attention(lp, src, self.activation, scale=scale,
                              mask=self._mask, mask_after_norm=True)
            H = H + jnp.einsum("bij,bjd->bid", A, v)
            if self.layernorm:
                H2 = layer_norm(lp["ln2"], H)
                if self.maxnorm:
                    H2 = H2 - jnp.max(H2, axis=2, keepdims=True)
                if self.use_mlp:
                    H = H + mlp(lp["mlp"], H2)
            else:
                if self.maxnorm:
                    H = H - jnp.max(H, axis=2, keepdims=True)
                if self.use_mlp:
                    H = H + mlp(lp["mlp"], H)
            return H

        if self.remat:
            block = jax.checkpoint(block)
        for i in range(self.n_layer):
            H = block(H, _layer_params(params, i))
            if self.guide and self.i_guided_layer_flag[i]:
                nI = self.n_i_token
                if counter < self.n_i_guided_layer + 1:  # downward h‖q stages
                    h_H = H[:, :nI, index_h : index_h + V]
                    q_H = H[:, :nI, index_q : index_q + V]
                    index_h += V
                    index_q += V
                    out = jnp.concatenate([h_H, q_H], axis=2)
                else:  # upward h‖q‖u stages re-walk the offsets (model.py:511-518)
                    index_h -= V
                    index_q -= V
                    h_H = H[:, :nI, index_h : index_h + V]
                    q_H = H[:, :nI, index_q : index_q + V]
                    u_H = H[:, :nI, index_u : index_u + V]
                    index_u += V
                    out = jnp.concatenate([h_H, q_H, u_H], axis=2)
                counter += 1
                i_guided.append(out)
            if self.guide and self.t_guided_layer_flag[i]:
                t_guided.append(H[:, self.n_i_token :, index_i : index_i + V])
                index_i += V
        pred = linear(params["_read_out"], H)  # [B, T, 1]
        return pred[:, : self.n_i_token, 0], [t_guided, i_guided]


class DenoiseEncoderTransformer:
    """Single-tree denoiser over noisy leaf observations.

    Behavioral contract: reference ``DenoiseEncoderTransformer``
    (``model.py:534-688``).  The reference's guided branch appends nothing
    (a latent TypeError, ``model.py:680-682``); here the guided outputs are
    returned correctly using the documented h/q/u offset walk.
    """

    def __init__(self, n_token, num_class, n_embd=128, n_layer=12,
                 n_tree_layer=3, n_tree_child=3, n_guided_layer=3, n_head=4,
                 n_mlp_hidden=512, activation="softmax", mlp=True,
                 normalize_attn=True, layernorm=True, maxnorm=False,
                 guide=False, sigma=1.0):
        self.n_token = n_token
        self.vocab_size = num_class
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_mlp_hidden = n_mlp_hidden
        self.activation = get_activation(activation)
        self.use_mlp = mlp
        self.normalize_attn = normalize_attn
        self.layernorm = layernorm
        self.maxnorm = maxnorm
        self.guide = guide
        self.sigma = sigma
        self.n_guided_layer = n_guided_layer
        self.guided_layer_flag = [False] * n_layer
        if guide:
            gap = n_layer // (n_guided_layer * 2)
            count = 0
            for i in range(n_layer):
                if count < n_guided_layer * 2 and gap and (i + 1) % gap == 0:
                    self.guided_layer_flag[i] = True
                    count += 1

    def init(self, key):
        kp, key = jax.random.split(key)
        params = {
            "position_embeddings": embedding_init(kp, self.n_token, self.n_embd),
        }
        stack, key = _init_block_stack(key, self.n_layer, self.n_embd, self.n_mlp_hidden)
        params.update(stack)
        kr, ko = jax.random.split(key)
        params["_read_out"] = linear_init(kr, self.n_embd, 1)
        params["_out"] = linear_init(ko, self.n_token, 1)
        return params

    def apply(self, params, z):
        """z: [B, T] float noisy leaves -> ([B, T] denoised, guided list)."""
        B, T = z.shape
        k = jnp.arange(self.vocab_size, dtype=jnp.float32)
        feats = -((k[None, None, :] - z[:, :, None]) ** 2) / 2.0
        emb = jnp.zeros((B, T, self.n_embd), dtype=jnp.float32)
        emb = emb.at[:, :, : self.vocab_size].set(feats)
        H = emb + params["position_embeddings"]["weight"][jnp.arange(T)][None]
        V = self.vocab_size
        scale = math.sqrt(self.n_embd) if self.normalize_attn else None
        index_h = 0
        index_q = self.n_guided_layer * V
        index_u = 2 * self.n_guided_layer * V
        counter = 0
        guided = []
        for i in range(self.n_layer):
            src = layer_norm(params["_lns_1"][str(i)], H) if self.layernorm else H
            A, v = _attention(_layer_params(params, i), src, self.activation,
                              scale=scale)
            H = H + jnp.einsum("bij,bjd->bid", A, v)
            if self.layernorm:
                H2 = layer_norm(params["_lns_2"][str(i)], H)
                if self.maxnorm:
                    H2 = H2 - jnp.max(H2, axis=2, keepdims=True)
                if self.use_mlp:
                    H = H + mlp(params["_mlps"][str(i)], H2)
            else:
                if self.maxnorm:
                    H = H - jnp.max(H, axis=2, keepdims=True)
                if self.use_mlp:
                    H = H + mlp(params["_mlps"][str(i)], H)
            if self.guide and self.guided_layer_flag[i]:
                if counter < self.n_guided_layer:
                    h_H = H[:, :, index_h : index_h + V]
                    q_H = H[:, :, index_q : index_q + V]
                    index_h += V
                    index_q += V
                    guided.append(jnp.concatenate([h_H, q_H], axis=2))
                else:
                    index_h -= V
                    index_q -= V
                    h_H = H[:, :, index_h : index_h + V]
                    q_H = H[:, :, index_q : index_q + V]
                    u_H = H[:, :, index_u : index_u + V]
                    index_u += V
                    guided.append(jnp.concatenate([h_H, q_H, u_H], axis=2))
                counter += 1
        pred = linear(params["_read_out"], H)[:, :, 0]
        if self.guide:
            return pred, guided
        return pred
