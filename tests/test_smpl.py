"""Golden-value tests for the pure-JAX SMPL core (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from tpu_pose.models import smpl
from tpu_pose.models.smpl_data import synthetic_smpl

from oracle_numpy import rodrigues_np, smpl_np


@pytest.fixture(scope="module")
def small_model():
    # Real joint count, reduced vertex count: the naive oracle is O(V·J).
    return synthetic_smpl(seed=1, num_verts=400)


@pytest.fixture(scope="module")
def full_model():
    return synthetic_smpl(seed=2)


def test_rodrigues_vs_scipy():
    rng = np.random.RandomState(0)
    r = rng.randn(50, 3) * 2.0
    ours = np.asarray(smpl.rodrigues(jnp.asarray(r, jnp.float32)))
    ref = ScipyRotation.from_rotvec(r).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rodrigues_zero_angle_grad_safe():
    r = jnp.zeros(3)
    np.testing.assert_allclose(
        np.asarray(smpl.rodrigues(r)), np.eye(3), atol=1e-6)
    g = jax.grad(lambda x: jnp.sum(smpl.rodrigues(x)))(r)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rodrigues_vs_oracle():
    rng = np.random.RandomState(3)
    for _ in range(10):
        r = rng.randn(3)
        np.testing.assert_allclose(
            np.asarray(smpl.rodrigues(jnp.asarray(r, jnp.float32))),
            rodrigues_np(r), atol=2e-6)


def test_smpl_forward_vs_numpy_oracle(small_model):
    m = small_model
    rng = np.random.RandomState(7)
    beta = rng.randn(10) * 0.5
    theta = rng.randn(24 * 3) * 0.3

    out = smpl.smpl_forward(
        m, jnp.asarray(beta, jnp.float32), jnp.asarray(theta, jnp.float32))
    verts_ref, joints_ref = smpl_np(
        m.v_template, m.shapedirs, m.posedirs, m.J_regressor, m.weights,
        np.asarray(m.parents), beta, theta)

    np.testing.assert_allclose(np.asarray(out.joints), joints_ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.vertices), verts_ref, atol=1e-4)


def test_zero_pose_is_rest_pose(full_model):
    m = full_model
    out = smpl.smpl_forward(m, jnp.zeros(10), jnp.zeros(72))
    j_rest = np.asarray(m.J_regressor @ m.v_template)
    np.testing.assert_allclose(np.asarray(out.joints), j_rest, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.vertices), np.asarray(m.v_template), atol=1e-5)


def test_global_rotation_rotates_everything(full_model):
    """θ with only a global rotation must rigidly rotate the rest mesh
    about the root joint (hand-computable check, SURVEY.md §4.1)."""
    m = full_model
    rotvec = np.array([0.0, np.pi / 2, 0.0])
    theta = np.zeros(72)
    theta[:3] = rotvec
    out = smpl.smpl_forward(m, jnp.zeros(10), jnp.asarray(theta, jnp.float32))

    R = ScipyRotation.from_rotvec(rotvec).as_matrix()
    j_rest = np.asarray(m.J_regressor @ m.v_template)
    root = j_rest[0]
    expected_joints = (j_rest - root) @ R.T + root
    np.testing.assert_allclose(
        np.asarray(out.joints), expected_joints, atol=1e-5)

    v_rest = np.asarray(m.v_template)
    expected_verts = (v_rest - root) @ R.T + root
    np.testing.assert_allclose(
        np.asarray(out.vertices), expected_verts, atol=1e-4)


def test_single_joint_rotation_chain(full_model):
    """Rotating one mid-chain joint moves exactly its subtree (kinematic
    chain correctness via hand-computed positions)."""
    m = full_model
    parents = np.asarray(m.parents)
    k = 4  # left knee in standard SMPL numbering (child of joint 1)
    rotvec = np.array([1.0, 0.2, -0.4])
    theta = np.zeros((24, 3))
    theta[k] = rotvec
    out = smpl.smpl_forward(
        m, jnp.zeros(10), jnp.asarray(theta.ravel(), jnp.float32))
    j_rest = np.asarray(m.J_regressor @ m.v_template)

    # Descendants of k move; everything else stays.
    desc = set()
    for j in range(24):
        p = j
        while p != -1:
            if p == k:
                desc.add(j)
                break
            p = parents[p]
    R = ScipyRotation.from_rotvec(rotvec).as_matrix()
    got = np.asarray(out.joints)
    for j in range(24):
        if j in desc and j != k:
            expected = R @ (j_rest[j] - j_rest[k]) + j_rest[k]
        else:
            expected = j_rest[j]
        np.testing.assert_allclose(got[j], expected, atol=1e-5,
                                   err_msg=f"joint {j}")


def test_vmap_batch_matches_loop(small_model):
    m = small_model
    rng = np.random.RandomState(11)
    betas = jnp.asarray(rng.randn(4, 10) * 0.3, jnp.float32)
    thetas = jnp.asarray(rng.randn(4, 72) * 0.2, jnp.float32)
    batched = smpl.smpl_forward_batch(m, betas, thetas)
    for i in range(4):
        single = smpl.smpl_forward(m, betas[i], thetas[i])
        np.testing.assert_allclose(
            np.asarray(batched.vertices[i]), np.asarray(single.vertices),
            atol=1e-5)


def test_jit_matches_eager(small_model):
    m = small_model
    beta = jnp.asarray(np.random.RandomState(5).randn(10) * 0.2, jnp.float32)
    theta = jnp.asarray(np.random.RandomState(6).randn(72) * 0.2, jnp.float32)
    eager = smpl.smpl_forward(m, beta, theta)
    jitted = jax.jit(smpl.smpl_forward)(m, beta, theta)
    np.testing.assert_allclose(
        np.asarray(eager.vertices), np.asarray(jitted.vertices), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(eager.joints), np.asarray(jitted.joints), atol=1e-5)


def test_forward_is_differentiable(small_model):
    m = small_model

    def loss(theta, beta):
        out = smpl.smpl_forward(m, beta, theta)
        return jnp.sum(out.vertices ** 2) + jnp.sum(out.joints ** 2)

    g_theta, g_beta = jax.grad(loss, argnums=(0, 1))(
        jnp.full(72, 0.1), jnp.full(10, 0.1))
    assert np.all(np.isfinite(np.asarray(g_theta)))
    assert np.all(np.isfinite(np.asarray(g_beta)))
    assert float(jnp.abs(g_theta).sum()) > 0
