"""Sampler tests: batch layouts and Bayes-risk parity with published artifacts.

The Bayes anchors come from the reference repo's committed risk JSONs
(figures/data/ghm-data/*.json at p_flip=0.20, trees K4_L4C3p20_L4C3p20sc10).
Because transition generation reproduces the reference's seeded RNG stream
bit-for-bit, our Monte-Carlo Bayes estimates must agree with the published
values up to Monte-Carlo error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghm_tpu.data import (
    ClassificationSampler,
    DenoiseSampler,
    ClipSampler,
    ConditionalDenoiseSampler,
    NextWordPredictSampler,
    DoubleTreeSampler,
)

P_Y = None  # uniform


def make_clip(p=0.2):
    return ClipSampler([4, 4], [3, 3], p_flips=[p, p], K=4, flip_scale=1.0,
                       variable_type=10, seedtree=42)


class TestClipSampler:
    def test_batch_layout(self):
        s = make_clip()
        B, K = 16, 4
        (t_leaves, t_root, tg, tpp), (i_leaves, i_root, ig, ipp) = s.get_batch(
            jax.random.PRNGKey(0), batch_size=B, guide=True)
        assert t_leaves.shape == (B * (K + 1), 81)
        # The two matched blocks share roots across modalities (:758-760).
        np.testing.assert_array_equal(np.asarray(t_root[: 2 * B]),
                                      np.asarray(i_root[: 2 * B]))
        assert len(tg) == 4 and tg[0].shape == (B * (K + 1), 81, 10)
        assert tpp.shape == (B * (K + 1), 10)

    def test_bayes_matches_published(self):
        """clip-risk.json Bayes at p=0.20 is 0.5814."""
        s = make_clip(0.2)
        mean, std = s.get_bayes(jax.random.PRNGKey(1), n_eval=4000)
        assert std < 0.02
        assert abs(mean - 0.5814) < 0.04, (mean, std)


class TestConditionalDenoiseSampler:
    def test_bayes_matches_published(self):
        """cdm-risk.json Bayes at p=0.20 is 33.0415."""
        s = ConditionalDenoiseSampler([4, 4], [3, 3], p_flips=[0.2, 0.2],
                                      sigma=1.0, seedtree=42)
        mean, std = s.get_bayes(jax.random.PRNGKey(2), n_eval=6000)
        assert abs(mean - 33.0415) < 4 * (std + 0.05), (mean, std)

    def test_batch_shapes_and_guides(self):
        s = ConditionalDenoiseSampler([3, 3], [3, 3], p_flips=[0.1, 0.1],
                                      sigma=1.0, seedtree=42)
        (tl, root, tg, tpp), (z, xl, ig, pm) = s.get_batch(
            jax.random.PRNGKey(3), batch_size=8, guide=True)
        assert z.shape == (8, 27) and pm.shape == (8, 27)
        assert len(tg) == 3 and len(ig) == 7
        assert ig[0].shape == (8, 27, 20) and ig[3].shape == (8, 27, 20)
        assert ig[-1].shape == (8, 27, 30)


class TestNextWordPredictSampler:
    def test_bayes_matches_published(self):
        """vlm-risk.json Bayes at p=0.20 is 1.1536."""
        s = NextWordPredictSampler([4, 4], [3, 3], p_flips=[0.2, 0.2], seedtree=42)
        mean, std = s.get_bayes(jax.random.PRNGKey(4), n_eval=2000)
        assert abs(mean - 1.1536) < 0.025, (mean, std)

    def test_batch_shift(self):
        s = NextWordPredictSampler([3, 3], [3, 3], p_flips=[0.1, 0.1], seedtree=42)
        (inp, tgt, tg, pp), (il, ir, ig, ipp) = s.get_batch(
            jax.random.PRNGKey(5), batch_size=4, guide=True)
        np.testing.assert_array_equal(np.asarray(inp[:, 1:]), np.asarray(tgt[:, :-1]))
        assert pp.shape == (4, 26, 10)
        assert len(tg) == 7 and len(ig) == 3


class TestClassificationSampler:
    def test_bayes_sane(self):
        s = ClassificationSampler(4, 3, p_flip=0.4, seedtree=42)
        mean, std = s.get_bayes(jax.random.PRNGKey(6), n_eval=5000)
        assert 0.0 < mean < np.log(10) + 0.1


class TestZeroshot:
    def test_shapes_and_shared_root(self):
        s = DoubleTreeSampler([4, 4], [3, 3], p_flips=[0.2, 0.2], seedtree=42)
        tl, il, tpp, ipp, root = s.get_zeroshot_batch(jax.random.PRNGKey(7), 64)
        assert tl.shape == (64, 81) and tpp.shape == (64, 10)
        # Posteriors of both modalities should concentrate on the shared root.
        acc_t = (np.asarray(tpp).argmax(1) == np.asarray(root)).mean()
        assert acc_t > 0.5


class TestDenoiseSampler:
    def test_moment_identity(self):
        """Reference test idiom (tests/test_data_randomghm.py:47-55)."""
        s = DenoiseSampler(3, 3, p_flip=0.1, sigma=0.1, seedtree=42)
        z, x, _, pm = s.get_batch(jax.random.PRNGKey(8), batch_size=10000, guide=False)
        pm, x = np.asarray(pm), np.asarray(x)
        err = abs(np.mean(pm**2) - np.mean(pm * x))
        assert err < 3e-3, err


class TestDiagnosticsSkip:
    """diagnostics=False must change only the diagnostic outputs (the sweep
    hot path skips the per-iteration BP the gradients never touch)."""

    def test_cdns_batch_skips_bp_not_data(self):
        from ghm_tpu.data.samplers import cdns_batch

        s = ConditionalDenoiseSampler([2, 2], [3, 3], p_flips=[0.2, 0.2],
                                      sigma=1.0, variable_type=10, seedtree=42)
        key = jax.random.PRNGKey(3)
        full = cdns_batch(key, s.t_transition, s.i_transition, 10, 1.0, 8,
                          False, (3, 3), diagnostics=True)
        fast = cdns_batch(key, s.t_transition, s.i_transition, 10, 1.0, 8,
                          False, (3, 3), diagnostics=False)
        np.testing.assert_array_equal(np.asarray(full[0][0]),
                                      np.asarray(fast[0][0]))  # text leaves
        np.testing.assert_array_equal(np.asarray(full[1][0]),
                                      np.asarray(fast[1][0]))  # noisy z
        assert full[1][3] is not None and fast[1][3] is None

    def test_nwp_batch_skips_bp_not_data(self):
        from ghm_tpu.data.samplers import nwp_batch

        s = NextWordPredictSampler([2, 2], [3, 3], p_flips=[0.2, 0.2],
                                   variable_type=10, seedtree=42)
        key = jax.random.PRNGKey(4)
        full = nwp_batch(key, s.t_transition, s.i_transition, 10, 8,
                         False, (3, 3), diagnostics=True)
        fast = nwp_batch(key, s.t_transition, s.i_transition, 10, 8,
                         False, (3, 3), diagnostics=False)
        np.testing.assert_array_equal(np.asarray(full[0][0]),
                                      np.asarray(fast[0][0]))  # inputs
        np.testing.assert_array_equal(np.asarray(full[0][1]),
                                      np.asarray(fast[0][1]))  # targets
        assert full[0][3] is not None and fast[0][3] is None

    def test_guided_ignores_diagnostics_flag(self):
        from ghm_tpu.data.samplers import cdns_batch

        s = ConditionalDenoiseSampler([2, 2], [3, 3], p_flips=[0.2, 0.2],
                                      sigma=1.0, variable_type=10, seedtree=42)
        key = jax.random.PRNGKey(5)
        res = cdns_batch(key, s.t_transition, s.i_transition, 10, 1.0, 8,
                         True, (3, 3), diagnostics=False)
        assert res[0][2] is not None and res[1][3] is not None
