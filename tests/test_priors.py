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


def test_fit_gmm_recovers_mixture():
    """EM recovers a well-separated 2-component mixture's means/weights."""
    rng = np.random.RandomState(0)
    d = 69
    mu0 = np.zeros(d)
    mu1 = np.zeros(d)
    mu1[:5] = 4.0
    n0, n1 = 1400, 600
    x = np.concatenate([
        mu0 + 0.3 * rng.randn(n0, d),
        mu1 + 0.3 * rng.randn(n1, d),
    ])
    rng.shuffle(x)
    p = priors.fit_gmm(x, num_components=2, seed=0)

    means = np.asarray(p.means, np.float64)
    _, logdets = np.linalg.slogdet(np.asarray(p.precisions, np.float64))
    logw = np.asarray(p.log_consts, np.float64) - 0.5 * logdets \
        + 0.5 * d * np.log(2 * np.pi)
    w = np.exp(logw)
    order = np.argsort(means[:, 0])          # component 0 ↔ mu0 first
    np.testing.assert_allclose(means[order[0]], mu0, atol=0.1)
    np.testing.assert_allclose(means[order[1]], mu1, atol=0.1)
    np.testing.assert_allclose(w[order], [0.7, 0.3], atol=0.03)


def test_fit_gmm_beats_random_prior_on_pose_corpus():
    """A prior EM-fitted to the synthetic pose distribution scores held-out
    poses far better than the random stand-in GMM (ROADMAP #2 lever)."""
    from tpu_pose.data import synthetic

    rng = np.random.RandomState(0)
    theta_tr, _ = synthetic.sample_poses(rng, 2000)
    theta_te, _ = synthetic.sample_poses(np.random.RandomState(999), 200)

    fitted = priors.fit_gmm(theta_tr[:, 3:], num_components=4, seed=0)
    stand_in = priors.synthetic_gmm_prior(seed=0)

    nll = jax.jit(jax.vmap(lambda x, p=fitted: p.neg_log_prob(x, "sum")))
    nll_rand = jax.jit(
        jax.vmap(lambda x, p=stand_in: p.neg_log_prob(x, "sum")))
    te = jnp.asarray(theta_te[:, 3:])
    assert float(nll(te).mean()) < float(nll_rand(te).mean()) - 10.0


def test_gmm_npz_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    p = priors.fit_gmm(rng.randn(300, 69) * 0.2, num_components=2, seed=1)
    path = str(tmp_path / "gmm.npz")
    priors.save_gmm_npz(path, p)
    q = priors.load_gmm_npz(path)
    x = jnp.asarray(rng.randn(69) * 0.2, jnp.float32)
    np.testing.assert_allclose(float(p.neg_log_prob(x)),
                               float(q.neg_log_prob(x)), rtol=1e-6)


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
