"""Evaluation-layer tests: loaders, risk sweeps, ZSC, and OOD machinery.

Runs at tiny scale with freshly initialized (or briefly trained) models and
fabricated checkpoints; validates schema, shapes, and the exactness
relations (Bayes consistency, mis-spec-BP == Bayes when test p == train p).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghm_tpu.data import ClipSampler, DoubleTreeSampler
from ghm_tpu.eval.evaluators import (
    history_risk_sweep,
    root_to_first_text_leaf,
    zsc_eval,
)
from ghm_tpu.models import EncoderTransformer
from ghm_tpu.utils import checkpoint as ckpt


def fake_checkpoint(path, loss_tail, bayes):
    hist = np.concatenate([np.ones(50), np.full(100, loss_tail)])
    ckpt.save_checkpoint(path, {
        "model_state_dict": {"w": np.zeros(3)},
        "iter": 150, "loss_history": hist,
        "ploss_history": hist, "bayes": bayes,
    })


class TestHistoryRisk:
    def test_sweep_reads_tail_and_bayes(self, tmp_path):
        variants = {"Standard TF": "TF_X", "Guided TF": "GT_X"}
        p_grid = np.array([2, 4])
        for p in p_grid:
            tree = f"K4_L4C3p{p}_L4C3p{p}sc10"
            for i, folder in enumerate(variants.values()):
                fake_checkpoint(
                    os.path.join(tmp_path, tree, folder, "ts", "checkpoint.pth"),
                    loss_tail=0.5 + 0.1 * i + p / 100, bayes=0.4 + p / 100)
        res = history_risk_sweep(tmp_path, variants, p_grid=p_grid)
        assert res["p_flip"] == [2, 4]
        np.testing.assert_allclose(res["Standard TF"], [0.52, 0.54], atol=1e-6)
        np.testing.assert_allclose(res["Bayes"], [0.42, 0.44], atol=1e-6)
        # JSON-serializable (schema contract)
        json.dumps(res)

    def test_sweep_on_non_default_tree_shape(self, tmp_path):
        """The evaluators must not be pinned to the paper's K4/L4C3 grid."""
        variants = {"Standard TF": "TF_X"}
        p_grid = np.array([10])
        tree = "K2_L2C2p10_L3C2p10sc15"
        fake_checkpoint(os.path.join(tmp_path, tree, "TF_X", "checkpoint.pth"),
                        loss_tail=0.7, bayes=0.6)
        res = history_risk_sweep(tmp_path, variants, p_grid=p_grid, K=2,
                                 n_layers=(2, 3), n_childs=(2, 2),
                                 flip_scale=1.5)
        np.testing.assert_allclose(res["Standard TF"], [0.7], atol=1e-6)


class TestOodOnToyTree:
    def test_clip_ood_misspec_equals_bayes_at_train_p(self):
        """clip_ood_eval parameterized on a non-default tree: at
        test p == train p the mis-specified BP row is exact Bayes."""
        from ghm_tpu.eval.evaluators import clip_ood_eval

        tree_args = dict(n_layers=[2, 2], n_childs=[3, 3], K=4)
        res = clip_ood_eval({}, jax.random.PRNGKey(0), batch_size=512,
                            p_grid=np.array([15]), train_p=0.15,
                            tree_args=tree_args)
        assert res["p_flip"] == [15]
        assert abs(res["Mis-spec. BP"][0] - res["Bayes"][0]) < 0.05


class TestApplyCache:
    def test_distinct_models_get_their_own_executables(self):
        """Two same-class models with different configs must never share a
        compiled apply (the old id()-keyed cache could hand a stale one to a
        model reusing a collected address)."""
        from ghm_tpu.eval.evaluators import _jitted_apply

        x = jnp.zeros((2, 9), jnp.int32)
        m1 = EncoderTransformer(n_token=9, num_class=10, n_embd=32,
                                n_layer=1, n_guided_layer=1)
        p1 = m1.init(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(_jitted_apply(m1)(p1, x)[0]),
                                   np.asarray(m1.apply(p1, x)[0]), atol=1e-6)
        m2 = EncoderTransformer(n_token=9, num_class=10, n_embd=32,
                                n_layer=2, n_guided_layer=1)
        p2 = m2.init(jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(_jitted_apply(m2)(p2, x)[0]),
                                   np.asarray(m2.apply(p2, x)[0]), atol=1e-6)


def tiny_pair():
    model = EncoderTransformer(n_token=9, num_class=10, n_embd=32, n_layer=1,
                               n_guided_layer=1, n_head=4, layernorm=True)
    p1 = model.init(jax.random.PRNGKey(0))
    p2 = model.init(jax.random.PRNGKey(1))
    return (model, p1), (model, p2)


class TestZsc:
    def test_schema_and_bayes_ordering(self):
        sampler = DoubleTreeSampler([2, 2], [3, 3], p_flips=[0.1, 0.1],
                                    seedtree=42)
        pairs = {"Standard TF": tiny_pair()}
        res = zsc_eval(sampler, pairs, np.array([5, 20]),
                       jax.random.PRNGKey(0), support_factor=30)
        assert len(res["Standard TF"]) == 2
        assert len(res["Bayes"]) == 1
        # An untrained model cannot beat the Bayes baseline.
        assert res["Standard TF"][1] > res["Bayes"][0]

    def test_misspec_equals_bayes_at_train_p(self):
        """With test p == train p the 'mis-specified' BP is exact, so its ZSC
        risk must match the Bayes row up to float error."""
        sampler = DoubleTreeSampler([2, 2], [3, 3], p_flips=[0.15, 0.15],
                                    seedtree=42)
        mis = (sampler.t_transition, sampler.i_transition)
        res = zsc_eval(sampler, {}, np.array([5]), jax.random.PRNGKey(1),
                       support_factor=30, misspec_transitions=mis)
        assert abs(res["Mis-spec. BP"][0] - res["Bayes"][0]) < 1e-3

    def test_root_projection_shapes(self):
        sampler = DoubleTreeSampler([2, 2], [3, 3], p_flips=[0.1, 0.1])
        pp = jnp.full((7, 10), 0.1)
        out = root_to_first_text_leaf(pp, sampler.t_transition)
        assert out.shape == (7, 10)
        np.testing.assert_allclose(np.asarray(out.sum(1)), 1.0, atol=1e-5)


class TestCheckpointInterop:
    def test_roundtrip_params(self):
        model = EncoderTransformer(n_token=9, num_class=10, n_embd=32,
                                   n_layer=2, n_guided_layer=1)
        params = model.init(jax.random.PRNGKey(0))
        flat = ckpt.pack_params(params)
        assert "_queries.0.weight" in flat
        back = ckpt.unpack_params(flat)
        x = jnp.zeros((2, 9), jnp.int32)
        a, _ = model.apply(params, x)
        b, _ = model.apply(back, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_pth_file_roundtrip(self, tmp_path):
        model = EncoderTransformer(n_token=9, num_class=10, n_embd=32,
                                   n_layer=1, n_guided_layer=1)
        params = model.init(jax.random.PRNGKey(2))
        path = os.path.join(tmp_path, "checkpoint.pth")
        ckpt.save_checkpoint(path, {
            "tmodel_state_dict": ckpt.pack_params(params),
            "iter": 3, "loss_history": np.zeros(5),
            "ploss_history": np.zeros(5), "bayes": 0.5})
        payload = ckpt.load_checkpoint(path)
        back = ckpt.unpack_params(payload["tmodel_state_dict"])
        x = jnp.zeros((2, 9), jnp.int32)
        np.testing.assert_allclose(np.asarray(model.apply(params, x)[0]),
                                   np.asarray(model.apply(back, x)[0]),
                                   atol=1e-7)

    def test_latest_checkpoint_both_layouts(self, tmp_path):
        flat = tmp_path / "run1"
        (flat).mkdir()
        (flat / "checkpoint.pth").write_bytes(b"x")
        assert ckpt.latest_checkpoint(str(flat)).endswith("checkpoint.pth")
        nested = tmp_path / "run2" / "20260101-000000"
        nested.mkdir(parents=True)
        (nested / "checkpoint.pth").write_bytes(b"x")
        assert "20260101-000000" in ckpt.latest_checkpoint(str(tmp_path / "run2"))


class TestHistoryRiskMissingVariant:
    def test_incomplete_variant_is_omitted(self, tmp_path):
        variants = {"Standard TF": "TF_X", "Guided TF": "GT_X"}
        p_grid = np.array([2, 4])
        for p in p_grid:
            tree = f"K4_L4C3p{p}_L4C3p{p}sc10"
            fake_checkpoint(
                os.path.join(tmp_path, tree, "TF_X", "ts", "checkpoint.pth"),
                loss_tail=0.5 + p / 100, bayes=0.4 + p / 100)
        # Guided TF has no checkpoints at all -> dropped, Standard TF kept.
        res = history_risk_sweep(tmp_path, variants, p_grid=p_grid)
        assert "Guided TF" not in res
        np.testing.assert_allclose(res["Standard TF"], [0.52, 0.54], atol=1e-6)
        np.testing.assert_allclose(res["Bayes"], [0.42, 0.44], atol=1e-6)
