"""Model-forward parity: ghm_tpu functional models vs reference torch outputs.

Fixtures (tests/golden/model_*.npz, from tools/gen_golden_models.py) contain
reference state_dicts plus inputs/outputs; weights are loaded directly into
the ghm_tpu param trees, so any mismatch is a math bug, not an init issue.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghm_tpu.models import (
    EncoderTransformer,
    AutoRegressiveTransformer,
    ConditionalDenoiseEncoderTransformer,
    DenoiseEncoderTransformer,
)
from ghm_tpu.utils.torch_interop import params_from_state_dict

V = 10


def fixture_params(data):
    sd = {k[4:].replace("__", "."): data[k] for k in data.files if k.startswith("sd__")}
    return params_from_state_dict(sd)


class TestEncoder:
    def test_forward_and_guides(self, golden):
        data = golden("model_encoder.npz")
        model = EncoderTransformer(n_token=27, num_class=V, n_embd=64, n_layer=5,
                                   n_guided_layer=3, n_head=4, n_mlp_multiplier=4,
                                   activation="softmax", mlp=True,
                                   normalize_attn=True, layernorm=True, guide=True)
        params = fixture_params(data)
        out, guided = model.apply(params, jnp.asarray(data["x"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=2e-4)
        n_ref = sum(1 for k in data.files if k.startswith("guided"))
        assert len(guided) == n_ref == 3
        for i, g in enumerate(guided):
            np.testing.assert_allclose(np.asarray(g), data[f"guided{i}"],
                                       atol=2e-4, err_msg=f"guided {i}")

    def test_forward_relu_noln(self, golden):
        data = golden("model_encoder_relu.npz")
        model = EncoderTransformer(n_token=27, num_class=V, n_embd=64, n_layer=2,
                                   n_guided_layer=2, n_head=4, activation="relu",
                                   normalize_attn=False, layernorm=False, guide=False)
        out, _ = model.apply(fixture_params(data), jnp.asarray(data["x"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=2e-3)

    def test_init_shapes_match_torch_layout(self):
        import jax
        model = EncoderTransformer(n_token=27, num_class=V, n_embd=64,
                                   n_layer=2, n_guided_layer=2)
        p = model.init(jax.random.PRNGKey(0))
        assert p["_queries"]["0"]["weight"].shape == (64, 64)
        assert p["_mlps"]["1"]["0"]["weight"].shape == (256, 64)
        assert p["_read_out"]["weight"].shape == (V, 64)
        assert p["_out"]["weight"].shape == (1, 27)


class TestAutoRegressive:
    def test_joint_forward_and_guides(self, golden):
        data = golden("model_ar_joint.npz")
        model = AutoRegressiveTransformer(n_token=53, n_i_token=27, num_class=V,
                                          n_embd=128, n_layer=7,
                                          n_guided_layers=[3, 3], n_head=4,
                                          n_mlp_hidden=512, activation="softmax",
                                          mlp=True, normalize_attn=True,
                                          auto_regressive=True, sequential=False,
                                          layernorm=True, guide=True)
        params = fixture_params(data)
        out, (tg, ig) = model.apply(params, jnp.asarray(data["xt"]),
                                    jnp.asarray(data["zi"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=3e-4)
        n_t = sum(1 for k in data.files if k.startswith("tg"))
        n_i = sum(1 for k in data.files if k.startswith("ig"))
        assert len(tg) == n_t == 7 and len(ig) == n_i == 3
        for i, g in enumerate(tg):
            np.testing.assert_allclose(np.asarray(g), data[f"tg{i}"],
                                       atol=3e-4, err_msg=f"tg {i}")
        for i, g in enumerate(ig):
            np.testing.assert_allclose(np.asarray(g), data[f"ig{i}"],
                                       atol=3e-4, err_msg=f"ig {i}")

    def test_sequential_forward(self, golden):
        data = golden("model_ar_seq.npz")
        model = AutoRegressiveTransformer(n_token=27, n_i_token=1, num_class=V,
                                          n_embd=128, n_layer=5,
                                          n_guided_layers=[3, 1], n_head=4,
                                          n_mlp_hidden=512, activation="softmax",
                                          normalize_attn=True, auto_regressive=True,
                                          sequential=True, layernorm=True,
                                          guide=False)
        out, _ = model.apply(fixture_params(data), jnp.asarray(data["xt"]),
                             jnp.asarray(data["zi"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=3e-4)


class TestConditionalDenoise:
    def test_joint_forward_and_guides(self, golden):
        data = golden("model_cdm_joint.npz")
        model = ConditionalDenoiseEncoderTransformer(
            n_token=54, n_i_token=27, num_class=V, n_embd=128, n_layer=7,
            n_guided_layers=[3, 3], n_head=4, n_mlp_hidden=512,
            activation="softmax", normalize_attn=True, sequential=False,
            layernorm=True, maxnorm=False, guide=True)
        params = fixture_params(data)
        out, (tg, ig) = model.apply(params, jnp.asarray(data["xt"]),
                                    jnp.asarray(data["zi"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=3e-4)
        n_t = sum(1 for k in data.files if k.startswith("tg"))
        n_i = sum(1 for k in data.files if k.startswith("ig"))
        assert len(tg) == n_t == 3 and len(ig) == n_i == 7
        for i, g in enumerate(ig):
            np.testing.assert_allclose(np.asarray(g), data[f"ig{i}"],
                                       atol=3e-4, err_msg=f"ig {i}")
        for i, g in enumerate(tg):
            np.testing.assert_allclose(np.asarray(g), data[f"tg{i}"],
                                       atol=3e-4, err_msg=f"tg {i}")

    def test_sequential_forward(self, golden):
        data = golden("model_cdm_seq.npz")
        model = ConditionalDenoiseEncoderTransformer(
            n_token=28, n_i_token=27, num_class=V, n_embd=128, n_layer=3,
            n_guided_layers=[1, 3], n_head=4, n_mlp_hidden=512,
            activation="softmax", normalize_attn=True, sequential=True,
            layernorm=True, maxnorm=False, guide=False)
        out, _ = model.apply(fixture_params(data), jnp.asarray(data["xt"]),
                             jnp.asarray(data["zi"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=3e-4)


class TestDenoise:
    def test_forward_maxnorm(self, golden):
        data = golden("model_dns.npz")
        model = DenoiseEncoderTransformer(n_token=27, num_class=V, n_embd=64,
                                          n_layer=4, n_guided_layer=2, n_head=4,
                                          n_mlp_hidden=256, activation="softmax",
                                          normalize_attn=True, layernorm=True,
                                          maxnorm=True, guide=False)
        out = model.apply(fixture_params(data), jnp.asarray(data["zi"]))
        np.testing.assert_allclose(np.asarray(out), data["out"], atol=3e-4)


class TestRemat:
    def test_remat_matches_plain_forward_and_grad(self):
        """remat=True must be numerically identical (forward AND gradients) —
        it only changes what the backward pass stores vs recomputes."""
        from ghm_tpu.models import EncoderTransformer

        kw = dict(n_token=9, num_class=V, n_embd=64, n_layer=3,
                  n_guided_layer=2, n_head=4, activation="softmax",
                  normalize_attn=True, layernorm=True, guide=True)
        plain = EncoderTransformer(**kw)
        remat = EncoderTransformer(**kw, remat=True)
        params = plain.init(jax.random.PRNGKey(0))
        x = jax.random.randint(jax.random.PRNGKey(1), (4, 9), 0, V)

        def loss(model, p):
            out, guided = model.apply(p, x)
            return jnp.sum(out ** 2) + sum(jnp.sum(g ** 2) for g in guided)

        l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(params)
        l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(params)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
