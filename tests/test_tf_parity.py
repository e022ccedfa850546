"""Parity vs the TF oracle (SURVEY.md §4.2): the JAX SMPL must match the
tf_smpl-lineage TF computation to ≤1e-5 — the precision contract backing
the 'numerically matched meshes' north star."""

import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tests import oracle_tf  # noqa: E402
from tpu_pose.models import smpl, smpl_data  # noqa: E402


@pytest.fixture(scope="module")
def model():
    return smpl_data.synthetic_smpl(seed=0)


@pytest.mark.parametrize("seed,pose_scale", [(0, 0.0), (1, 0.3), (2, 1.2)])
def test_smpl_matches_tf_oracle(model, seed, pose_scale):
    rng = np.random.RandomState(seed)
    beta = rng.randn(10).astype(np.float32) * 0.5
    theta = rng.randn(72).astype(np.float32) * pose_scale

    out = smpl.smpl_forward(model, jnp.asarray(beta), jnp.asarray(theta))

    verts_tf, joints_tf = oracle_tf.smpl_tf(
        model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.weights, model.parents, beta, theta)

    np.testing.assert_allclose(
        np.asarray(out.vertices), verts_tf, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.joints), joints_tf, atol=1e-5)


def test_oracles_agree(model):
    """Cross-check: TF oracle vs independent numpy oracle."""
    from tests import oracle_numpy
    rng = np.random.RandomState(3)
    beta = rng.randn(10) * 0.5
    theta = rng.randn(72) * 0.4
    v_np, j_np = oracle_numpy.smpl_np(
        model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.weights, model.parents, beta, theta)
    v_tf, j_tf = oracle_tf.smpl_tf(
        model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.weights, model.parents, beta, theta)
    np.testing.assert_allclose(v_tf, v_np, atol=1e-9)
    np.testing.assert_allclose(j_tf, j_np, atol=1e-9)
