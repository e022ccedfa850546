"""Pose-prior unit tests (SURVEY.md §2 row 9)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from tpu_pose.fitting import priors


def test_gmm_logprob_matches_scipy():
    p = priors.synthetic_gmm_prior(seed=0, num_components=3)
    x = np.random.RandomState(1).randn(69).astype(np.float32) * 0.3

    means = np.asarray(p.means, np.float64)
    precs = np.asarray(p.precisions, np.float64)
    # Reconstruct per-component weights from stored log-consts.
    _, logdets = np.linalg.slogdet(precs)
    logw = np.asarray(p.log_consts, np.float64) - 0.5 * logdets \
        + 0.5 * 69 * np.log(2 * np.pi)

    comp = [
        logw[k] + multivariate_normal.logpdf(
            x, means[k], np.linalg.inv(precs[k]))
        for k in range(3)
    ]
    expected_sum = -np.logaddexp.reduce(comp)
    expected_max = -np.max(comp)

    got_sum = float(p.neg_log_prob(jnp.asarray(x), mode="sum"))
    got_max = float(p.neg_log_prob(jnp.asarray(x), mode="max"))
    np.testing.assert_allclose(got_sum, expected_sum, rtol=1e-3)
    np.testing.assert_allclose(got_max, expected_max, rtol=1e-3)


def test_gmm_prior_gradient_finite():
    p = priors.synthetic_gmm_prior(seed=0)
    g = jax.grad(lambda x: p.neg_log_prob(x))(jnp.zeros(69))
    assert np.all(np.isfinite(np.asarray(g)))


def test_l2_prior():
    p = priors.l2_prior()
    assert float(p.neg_log_prob(jnp.zeros(69))) == 0.0
    assert float(p.neg_log_prob(jnp.ones(69))) == 0.5 * 69


def test_angle_prior_penalizes_hyperextension():
    theta_ok = jnp.zeros(72)
    base = float(priors.angle_prior(theta_ok))
    # Knee hyperextension: negative x-rotation at joint 4 → index 12.
    theta_bad = theta_ok.at[12].set(-1.0)
    worse = float(priors.angle_prior(theta_bad))
    assert worse > base
    # Natural knee bend (positive) should reduce the penalty term.
    theta_good = theta_ok.at[12].set(1.0)
    better = float(priors.angle_prior(theta_good))
    assert better < base
