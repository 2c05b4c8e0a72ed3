"""Core parity tests: transitions, sampling statistics, and BP golden values.

Golden fixtures were produced by the reference implementation
(tools/gen_golden.py); these tests assert the ghm_tpu array programs
reproduce them to float32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghm_tpu.core import (
    gen_transition,
    transitions_to_device,
    sample_tree,
    bp_cls,
    bp_dns,
    bp_nwp_autoregressive,
    guided_cls,
    guided_dns,
)

V = 10


def _load_transitions(data, n_layer=3):
    return tuple(jnp.asarray(data[f"layer{l}"], dtype=jnp.float32) for l in range(n_layer))


def assert_log_close(ours, ref, tol=2e-3, msg=""):
    """Compare log-space messages with magnitude-aware tolerance.

    Large-negative components (log of near-zero probabilities) accumulate
    float32 error proportional to their magnitude; weight the tolerance by
    (1 + |ref|) so the comparison is meaningful across the dynamic range.
    """
    ours = np.asarray(ours)
    err = np.abs(ours - ref) / (1.0 + np.abs(ref))
    assert err.max() < tol, f"{msg} scaled err {err.max()}"


class TestTransitions:
    def test_translation_invariant_matches_reference_rng(self, golden):
        data = golden("transitions_ti.npz")
        ours = gen_transition(3, 3, V, p_flip=0.12, flip_scale=1.0,
                              translation_invariance=True,
                              rng=np.random.RandomState(42))
        for l in range(3):
            np.testing.assert_allclose(ours[l], data[f"layer{l}"], rtol=0, atol=0)

    def test_per_edge_matches_reference_rng(self, golden):
        data = golden("transitions_edge.npz")
        ours = gen_transition(3, 3, V, p_flip=0.12, flip_scale=1.0,
                              translation_invariance=False,
                              rng=np.random.RandomState(42))
        for l in range(3):
            np.testing.assert_allclose(ours[l], data[f"layer{l}"], rtol=0, atol=0)

    def test_rows_are_stochastic(self):
        ours = gen_transition(2, 3, V, p_flip=0.3, rng=np.random.RandomState(0))
        for t in ours:
            np.testing.assert_allclose(t.sum(-1), 1.0, atol=1e-12)
            assert (t >= 0).all()


class TestSampling:
    def test_shapes_and_root_injection(self):
        trans = transitions_to_device(gen_transition(3, 3, V, 0.1, rng=np.random.RandomState(1)))
        root = jnp.arange(6, dtype=jnp.int32) % V
        vals = sample_tree(jax.random.PRNGKey(0), trans, 6, root=root)
        assert [v.shape for v in vals] == [(6, 1), (6, 3), (6, 9), (6, 27)]
        np.testing.assert_array_equal(np.asarray(vals[0][:, 0]), np.asarray(root))

    def test_leaf_marginals_match_chain_product(self):
        """Sampled leaf distribution equals the product of transition rows."""
        trans_np = gen_transition(2, 2, V, 0.25, rng=np.random.RandomState(3))
        trans = transitions_to_device(trans_np)
        B = 60_000
        root = jnp.zeros((B,), dtype=jnp.int32)
        vals = sample_tree(jax.random.PRNGKey(42), trans, B, root=root)
        # Exact marginal of leaf 0 given root=0: row of T0[0] then T1[0].
        p1 = trans_np[0][0][0]            # dist of node (1,0)
        p_leaf = p1 @ trans_np[1][0]      # dist of leaf (2,0)
        emp = np.bincount(np.asarray(vals[2][:, 0]), minlength=V) / B
        np.testing.assert_allclose(emp, p_leaf, atol=8e-3)

    def test_jit_compatible(self):
        trans = transitions_to_device(gen_transition(2, 3, V, 0.1, rng=np.random.RandomState(1)))
        f = jax.jit(lambda k: sample_tree(k, trans, 16))
        vals = f(jax.random.PRNGKey(0))
        assert vals[-1].shape == (16, 9)


class TestBPCls:
    def test_posterior_golden(self, golden):
        data = golden("bp_cls.npz")
        trans = _load_transitions(data)
        res = bp_cls(jnp.asarray(data["leaves"]), trans)
        np.testing.assert_allclose(np.asarray(res.posterior), data["posterior"].T,
                                   atol=3e-4)

    def test_h_messages_golden(self, golden):
        data = golden("bp_cls.npz")
        trans = _load_transitions(data)
        res = bp_cls(jnp.asarray(data["leaves"]), trans)
        for d in range(3):
            ref = data[f"h{d}"]  # [E, V, B]
            ours = np.asarray(res.h_msgs[d]).transpose(1, 2, 0)
            assert_log_close(ours, ref, msg=f"h{d}")

    def test_guided_layout_golden(self, golden):
        data = golden("bp_cls.npz")
        trans = _load_transitions(data)
        res = bp_cls(jnp.asarray(data["leaves"]), trans)
        guides = guided_cls(res, n_child=3)
        for i in range(3):
            assert_log_close(guides[i], data[f"guide{i}"], msg=f"guide{i}")

    def test_posterior_consistency(self):
        """E[1{root=v}] == E[p(v|leaves)] — Bayes self-consistency."""
        trans = transitions_to_device(gen_transition(3, 3, V, 0.15, rng=np.random.RandomState(5)))
        vals = sample_tree(jax.random.PRNGKey(1), trans, 20_000)
        post = np.asarray(bp_cls(vals[-1], trans).posterior)
        onehot = np.eye(V)[np.asarray(vals[0][:, 0])]
        np.testing.assert_allclose(post.mean(0), onehot.mean(0), atol=1e-2)


class TestBPDns:
    def test_posterior_mean_golden(self, golden):
        data = golden("bp_dns.npz")
        trans = _load_transitions(data)
        res = bp_dns(jnp.asarray(data["z"]), trans, sigma=float(data["sigma"]),
                     external=jnp.asarray(data["external"]))
        np.testing.assert_allclose(np.asarray(res.posterior_mean),
                                   data["posterior_mean"], atol=1e-4)

    def test_guided_stack_golden(self, golden):
        data = golden("bp_dns.npz")
        trans = _load_transitions(data)
        res = bp_dns(jnp.asarray(data["z"]), trans, sigma=float(data["sigma"]),
                     external=jnp.asarray(data["external"]))
        guides = guided_dns(res, n_child=3)
        n = sum(1 for k in data.files if k.startswith("guide"))
        assert len(guides) == n == 7  # 2L+1 for L=3
        for i in range(n):
            assert_log_close(guides[i], data[f"guide{i}"], msg=f"guide {i}")

    def test_moment_identity(self):
        """Posterior-mean moment identity E[m^2] == E[m x] (reference test idiom,
        tests/test_data_randomghm.py:24-34)."""
        trans = transitions_to_device(gen_transition(3, 3, V, 0.1, rng=np.random.RandomState(9)))
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        vals = sample_tree(k1, trans, 10_000)
        x = vals[-1].astype(jnp.float32)
        sigma = 0.5
        z = x + sigma * jax.random.normal(k2, x.shape)
        m = np.asarray(bp_dns(z, trans, sigma=sigma).posterior_mean)
        x = np.asarray(x)
        err = abs(np.mean(m * m) - np.mean(m * x))
        assert err < 5e-3, err


class TestBPNwp:
    def test_predict_pp_golden_with_external(self, golden):
        data = golden("bp_nwp.npz")
        trans = _load_transitions(data)
        pp, _ = bp_nwp_autoregressive(jnp.asarray(data["leaves"]), trans,
                                      external=jnp.asarray(data["external"]))
        np.testing.assert_allclose(np.asarray(pp), data["predict_pp"], atol=2e-5)

    def test_predict_pp_golden_no_external(self, golden):
        data = golden("bp_nwp_noext.npz")
        trans = _load_transitions(data)
        pp, _ = bp_nwp_autoregressive(jnp.asarray(data["leaves"]), trans)
        np.testing.assert_allclose(np.asarray(pp), data["predict_pp"], atol=2e-5)

    def test_guided_stack_golden(self, golden):
        data = golden("bp_nwp.npz")
        trans = _load_transitions(data)
        _, guides = bp_nwp_autoregressive(jnp.asarray(data["leaves"]), trans,
                                          external=jnp.asarray(data["external"]),
                                          guide=True)
        n = sum(1 for k in data.files if k.startswith("guide"))
        assert len(guides) == n == 7
        for i in range(n):
            assert_log_close(guides[i], data[f"guide{i}"], msg=f"guide {i}")

    def test_jit_and_shapes(self):
        trans = transitions_to_device(gen_transition(2, 3, V, 0.2, rng=np.random.RandomState(11)))
        vals = sample_tree(jax.random.PRNGKey(0), trans, 4)
        f = jax.jit(lambda lv: bp_nwp_autoregressive(lv, trans, guide=True))
        pp, guides = f(vals[-1])
        assert pp.shape == (4, 8, V)
        assert guides[0].shape == (4, 8, V)
        assert guides[1].shape == (4, 8, 2 * V)
        assert guides[-1].shape == (4, 8, V)
