"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ghm_tpu.core import gen_transition, transitions_to_device
from tree_sampler_pallas import sample_tree_pallas


class TestPallasTreeSampler:
    def test_shapes_and_root_passthrough(self):
        tr = transitions_to_device(
            gen_transition(3, 3, 10, 0.2, rng=np.random.RandomState(42)))
        root = (jnp.arange(32) % 10).astype(jnp.int32)
        vals = sample_tree_pallas(jax.random.PRNGKey(0), tr, 32, root,
                                  interpret=True)
        assert [v.shape for v in vals] == [(32, 1), (32, 3), (32, 9), (32, 27)]
        np.testing.assert_array_equal(np.asarray(vals[0][:, 0]),
                                      np.asarray(root))

    def test_leaf_marginal_matches_chain(self):
        tr_np = gen_transition(3, 3, 10, 0.2, rng=np.random.RandomState(42))
        tr = transitions_to_device(tr_np)
        B = 20000
        vals = sample_tree_pallas(jax.random.PRNGKey(11), tr, B,
                                  jnp.zeros((B,), jnp.int32), interpret=True)
        emp = np.bincount(np.asarray(vals[-1][:, 0]), minlength=10) / B
        exact = tr_np[0][0][0] @ tr_np[1][0] @ tr_np[2][0]
        assert np.abs(emp - exact).max() < 0.015
