"""Posterior-moment identity tests, mirroring the reference's test file.

Counterpart of reference ``tests/test_data_randomghm.py``: for a Bayes
posterior mean m(z) it holds that E[m^2] = E[m x], so the empirical gap over
a 10,000-sample batch must be small.  Same parameters and 3e-3 tolerance as
the reference.
"""

import numpy as np
import jax

from ghm_tpu.data import ConditionalDenoiseSampler, DenoiseSampler

N_LAYERS = [3, 4]
N_CHILDS = [3, 3]
P_FLIPS = [0.1, 0.1]
SIGMA = 0.1


def denoise_gap(true_leaves, pred_means):
    true_leaves = np.asarray(true_leaves, dtype=np.float64)
    pred_means = np.asarray(pred_means, dtype=np.float64)
    m_sq = np.mean(np.power(pred_means, 2), 1)
    m_x = np.mean(np.multiply(pred_means, true_leaves), 1)
    return abs(np.mean(m_sq) - np.mean(m_x))


def test_conditional_denoising():
    sampler = ConditionalDenoiseSampler(N_LAYERS, N_CHILDS, p_flips=P_FLIPS,
                                        sigma=SIGMA, flip_scale=1.0,
                                        variable_type=10,
                                        translation_invariance=True)
    _, res_image = sampler.get_batch(jax.random.PRNGKey(0), batch_size=10000,
                                     guide=True)
    err = denoise_gap(res_image[1], res_image[-1])
    assert err < 3e-3, f"Conditional denoising failed: {err}"


def test_denoising():
    sampler = DenoiseSampler(N_LAYERS[0], N_CHILDS[0], p_flip=P_FLIPS[0],
                             sigma=SIGMA, flip_scale=1.0, variable_type=10,
                             translation_invariance=True)
    res = sampler.get_batch(jax.random.PRNGKey(1), batch_size=10000,
                            guide=True)
    err = denoise_gap(res[1], res[-1])
    assert err < 3e-3, f"Denoising failed: {err}"
