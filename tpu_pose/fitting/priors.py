"""Pose/shape priors for the SMPLify-style fit (SURVEY.md §2 row 9).

The reference's exact prior form is unverified (mount empty, SURVEY.md §0);
the SMPLify family standard is a GMM-8 over the 69-dim body pose plus an
angle prior on knees/elbows. Both are provided behind one pluggable
interface, with an L2-to-mean fallback so parity can match either choice.

All priors are pure jnp functions of θ (precision matrices precomputed on
host at load time), so they trace into the fit loop at zero host cost.
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BODY_POSE_DIM = 69  # 23 non-root joints × 3


class GMMPrior(NamedTuple):
    """Gaussian-mixture pose prior over body pose (θ[3:], 69-dim).

    Stored in precision form: per-component constant c_k collects the
    mixture weight and normalizer so evaluation is one einsum + logsumexp.
    """
    means: jnp.ndarray        # (K, 69)
    precisions: jnp.ndarray   # (K, 69, 69)
    log_consts: jnp.ndarray   # (K,) = log w_k + 0.5 log|P_k| - D/2 log(2π)

    def neg_log_prob(self, body_pose: jnp.ndarray,
                     mode: str = "max") -> jnp.ndarray:
        """−log p(θ_body). ``mode='max'`` is the SMPLify MaxMixture
        approximation (min over components of per-component NLL); 'sum' is
        the exact logsumexp mixture."""
        d = body_pose - self.means                        # (K, 69)
        maha = 0.5 * jnp.einsum(
            "kd,kde,ke->k", d, self.precisions, d,
            precision=jax.lax.Precision.HIGHEST)
        comp_ll = self.log_consts - maha                  # (K,)
        if mode == "max":
            return -jnp.max(comp_ll)
        return -jax.nn.logsumexp(comp_ll)


def make_gmm_prior(means: np.ndarray, covs: np.ndarray,
                   weights: np.ndarray) -> GMMPrior:
    """Precompute the precision-form GMM from (means, covariances, weights)."""
    means = np.asarray(means, np.float64)
    covs = np.asarray(covs, np.float64)
    weights = np.asarray(weights, np.float64)
    precisions = np.stack([np.linalg.inv(c) for c in covs])
    _, logdets = np.linalg.slogdet(precisions)
    d = means.shape[1]
    log_consts = (np.log(weights) + 0.5 * logdets
                  - 0.5 * d * np.log(2.0 * np.pi))
    return GMMPrior(
        means=jnp.asarray(means, jnp.float32),
        precisions=jnp.asarray(precisions, jnp.float32),
        log_consts=jnp.asarray(log_consts, jnp.float32),
    )


def load_gmm_pickle(path: str) -> GMMPrior:
    """Load the standard SMPLify ``gmm_08.pkl`` (license-gated, user-supplied;
    keys: means (8,69), covars (8,69,69), weights (8,))."""
    with open(path, "rb") as f:
        dd = pickle.load(f, encoding="latin1")
    # Py2-era pickles can surface byte keys under latin1 decoding.
    dd = {(k.decode() if isinstance(k, bytes) else k): v
          for k, v in dd.items()}
    return make_gmm_prior(dd["means"], dd["covars"], dd["weights"])


def synthetic_gmm_prior(seed: int = 0, num_components: int = 8) -> GMMPrior:
    """Deterministic stand-in GMM centered near the zero pose with mild
    anisotropy — keeps the test suite and demos hermetic (SURVEY.md §4.1)."""
    rng = np.random.RandomState(seed)
    means = 0.1 * rng.randn(num_components, BODY_POSE_DIM)
    covs = []
    for _ in range(num_components):
        a = rng.randn(BODY_POSE_DIM, BODY_POSE_DIM) * 0.05
        covs.append(0.25 * np.eye(BODY_POSE_DIM) + a @ a.T)
    weights = rng.dirichlet(np.full(num_components, 5.0))
    return make_gmm_prior(means, np.stack(covs), weights)


def _log_gauss(x: np.ndarray, means: np.ndarray, precisions: np.ndarray,
               logdets: np.ndarray) -> np.ndarray:
    """Row-wise log N(x_n | mean_k, prec_k⁻¹) → (N, K), host numpy."""
    d = x[:, None, :] - means[None, :, :]                     # (N, K, D)
    maha = np.einsum("nkd,kde,nke->nk", d, precisions, d)
    dim = x.shape[1]
    return 0.5 * (logdets - dim * np.log(2.0 * np.pi) - maha)


def fit_gmm(samples: np.ndarray, num_components: int = 8,
            iters: int = 100, seed: int = 0, ridge: float = 1e-4,
            tol: float = 1e-6) -> GMMPrior:
    """Fit a full-covariance GMM to pose samples by EM (host numpy).

    The SMPLify lineage ships ``gmm_08.pkl`` — a GMM-8 fitted offline to
    CMU-mocap body poses. The real artifact is license-gated and absent
    here (SURVEY.md §7 hard parts #2), so this builds the same kind of
    artifact from whatever pose corpus IS available (e.g. the synthetic
    training distribution, a user's mocap dumps, or fitted-sequence θ's):
    an *informative* prior measured to improve 3D recovery over the
    random stand-in (see PARITY.md self-check table).

    EM with log-domain responsibilities; empty/collapsed components are
    re-seeded from random samples; ``ridge`` keeps covariances SPD.

    Args:
      samples: (N, D) pose vectors (body pose θ[3:], D=69, for the fit
        prior — but any D works).
    Returns: precision-form :class:`GMMPrior`.
    """
    x = np.asarray(samples, np.float64)
    n, dim = x.shape
    k = min(num_components, n)
    rng = np.random.RandomState(seed)

    # k-means init (a handful of Lloyd iterations): without it, broad
    # initial covariances make the responsibilities near-uniform and EM
    # collapses every mean onto the corpus mean (classic local optimum).
    means = x[rng.choice(n, k, replace=False)].copy()
    for _ in range(10):
        d2 = ((x[:, None, :] - means[None]) ** 2).sum(-1)     # (N, K)
        assign = d2.argmin(1)
        for j in range(k):
            sel = x[assign == j]
            means[j] = sel.mean(0) if len(sel) else x[rng.randint(n)]
    base_cov = np.cov(x, rowvar=False) + ridge * np.eye(dim)
    covs = np.tile(base_cov, (k, 1, 1))
    weights = np.full(k, 1.0 / k)

    prev_ll = -np.inf
    for _ in range(iters):
        precisions = np.linalg.inv(covs)
        _, logdets = np.linalg.slogdet(precisions)
        log_r = np.log(weights)[None, :] + _log_gauss(
            x, means, precisions, logdets)                    # (N, K)
        norm = np.logaddexp.reduce(log_r, axis=1)             # (N,)
        ll = float(norm.mean())
        resp = np.exp(log_r - norm[:, None])                  # (N, K)

        nk = resp.sum(0)                                      # (K,)
        for j in np.nonzero(nk < 1e-6)[0]:                    # dead comp.
            means[j] = x[rng.randint(n)]
            covs[j] = base_cov
            nk[j] = 1e-6
        weights = nk / nk.sum()
        means = (resp.T @ x) / nk[:, None]
        for j in range(k):
            d = x - means[j]
            covs[j] = ((resp[:, j, None] * d).T @ d) / nk[j] \
                + ridge * np.eye(dim)

        if ll - prev_ll < tol:
            break
        prev_ll = ll

    return make_gmm_prior(means, covs, weights)


def save_gmm_npz(path: str, prior: GMMPrior) -> None:
    """Cache a (fitted) prior in precision form — the loadable artifact
    mirroring the reference lineage's offline-fitted pickle."""
    np.savez(path, means=np.asarray(prior.means),
             precisions=np.asarray(prior.precisions),
             log_consts=np.asarray(prior.log_consts))


def load_gmm_npz(path: str) -> GMMPrior:
    with np.load(path) as z:
        return GMMPrior(means=jnp.asarray(z["means"], jnp.float32),
                        precisions=jnp.asarray(z["precisions"], jnp.float32),
                        log_consts=jnp.asarray(z["log_consts"], jnp.float32))


class L2Prior(NamedTuple):
    """L2-to-mean fallback prior (the simpler TF ports' choice)."""
    mean: jnp.ndarray  # (69,)

    def neg_log_prob(self, body_pose: jnp.ndarray, mode: str = "max"
                     ) -> jnp.ndarray:
        del mode
        return 0.5 * jnp.sum((body_pose - self.mean) ** 2)


def l2_prior(mean: np.ndarray | None = None) -> L2Prior:
    if mean is None:
        mean = np.zeros(BODY_POSE_DIM)
    return L2Prior(mean=jnp.asarray(mean, jnp.float32))


def angle_prior(theta: jnp.ndarray) -> jnp.ndarray:
    """SMPLify angle prior: exponential penalty on unnatural bending of
    knees and elbows. Components θ[55], θ[58] (elbow y-rotations) and
    θ[12], θ[15] (knee x-rotations) with signs (+1, −1, −1, −1), penalized
    as Σ exp(s·θ)² — the standard SMPLify formulation.

    Args: theta (72,) full pose. Returns scalar.
    """
    comps = theta[jnp.array([55, 58, 12, 15])]
    signs = jnp.array([1.0, -1.0, -1.0, -1.0], theta.dtype)
    return jnp.sum(jnp.exp(comps * signs) ** 2)
