"""Residual-MLP baseline over continuous inputs.

Functional counterpart of the reference's ``RMSNorm``/``GELU``/``FFN``/
``ResNetBlock``/``ResNet`` stack (``model.py:35-116``), which is an unused
baseline in the reference pipeline but part of its public model surface.
Dropout is an inference no-op in the reference configuration
(``residual_pdrop=0.0``); pass ``dropout_rng`` to enable it for training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ghm_tpu.models.layers import linear, linear_init, rms_norm

__all__ = ["ResNet"]


class ResNet:
    def __init__(self, d_model, d_ff, num_layers, num_classes,
                 residual_pdrop=0.0):
        self.d_model = d_model
        self.d_ff = d_ff
        self.num_layers = num_layers
        self.num_classes = num_classes
        self.residual_pdrop = residual_pdrop
        self.head_dim = 1 if num_classes == 2 else num_classes

    def init(self, key):
        params = {"layers": {}}
        for i in range(self.num_layers):
            k1, k2, key = jax.random.split(key, 3)
            params["layers"][str(i)] = {
                "ln": {"weight": jnp.ones((self.d_model,))},
                "ffn": {
                    "w1": linear_init(k1, self.d_model, self.d_ff, bias=False),
                    "w2": linear_init(k2, self.d_ff, self.d_model, bias=False),
                },
            }
        params["ln_final"] = {"weight": jnp.ones((self.d_model,))}
        params["rn_head"] = linear_init(key, self.d_model, self.head_dim, bias=False)
        return params

    def apply(self, params, x, dropout_rng=None):
        x = x.astype(jnp.float32)
        for i in range(self.num_layers):
            p = params["layers"][str(i)]
            h = rms_norm(p["ln"], x)
            h = linear(p["ffn"]["w2"],
                       jax.nn.gelu(linear(p["ffn"]["w1"], h), approximate=False))
            if dropout_rng is not None and self.residual_pdrop > 0:
                keep = jax.random.bernoulli(dropout_rng, 1.0 - self.residual_pdrop,
                                            h.shape)
                h = jnp.where(keep, h / (1.0 - self.residual_pdrop), 0.0)
            x = x + h
        x = rms_norm(params["ln_final"], x)
        return linear(params["rn_head"], x)
