"""Capsule self-interpenetration penalty (fitting/interpenetration.py)
— SMPLify's fourth energy term, off by default."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.fitting import fit as fit_lib
from tpu_pose.fitting import interpenetration as interp
from tpu_pose.models import smpl as smpl_lib
from tpu_pose.models import smpl_data
from tpu_pose.utils.config import FitConfig, StageConfig


@pytest.fixture(scope="module")
def model():
    return smpl_data.synthetic_smpl(seed=0)


@pytest.fixture(scope="module")
def spec(model):
    return jax.jit(interp.build_capsule_spec)(model)


def test_spec_static_topology_and_radii(model, spec):
    n_b = 23                              # 24 joints, one root
    s = 3
    assert spec.sphere_a.shape == (n_b * s,)
    assert spec.frac.shape == (n_b * s,)
    assert np.asarray(spec.radius).shape == (n_b * s,)
    assert (np.asarray(spec.radius) >= 0.015 - 1e-7).all()
    # Pairs never come from bones sharing a joint.
    bones = interp._bones(model.parents)
    for i, j in zip(spec.pair_i[:200], spec.pair_j[:200]):
        b1, b2 = bones[i // s], bones[j // s]
        assert not (set(b1) & set(b2))
    # Calibrated thresholds never exceed the raw radius sum.
    rsum = (np.asarray(spec.radius)[spec.pair_i]
            + np.asarray(spec.radius)[spec.pair_j])
    assert (np.asarray(spec.threshold) <= rsum + 1e-7).all()


def test_rest_pose_scores_zero_and_collapse_scores_positive(model, spec):
    rest_j = np.asarray(jnp.matmul(model.J_regressor, model.v_template))
    p_rest = float(interp.interpenetration_penalty(
        jnp.asarray(rest_j), spec))
    assert p_rest == pytest.approx(0.0, abs=1e-10)
    # Everything collapsed to one point: every pair overlaps fully.
    collapsed = jnp.zeros((24, 3)) + 0.01
    p_col = float(interp.interpenetration_penalty(collapsed, spec))
    assert p_col > 1e-4
    # Rest skeleton scaled 10×: every pair distance grows while the
    # thresholds stay fixed → zero overlap. (A collinear spread is NOT
    # a valid zero case: bone intervals along one line can overlap.)
    assert float(interp.interpenetration_penalty(
        jnp.asarray(rest_j * 10.0), spec)) == 0.0


def test_penalty_gradient_pushes_apart(model, spec):
    # EXACT coincidence: the safe-norm gradient is finite (a plain norm
    # NaNs here) and zero by symmetry — the degenerate saddle.
    collapsed = jnp.zeros((24, 3)) + 0.01
    g0 = jax.grad(lambda j: interp.interpenetration_penalty(j, spec))(
        collapsed)
    assert np.isfinite(np.asarray(g0)).all()
    # NEAR-collapse (the realistic transient): finite and nonzero.
    rng = np.random.RandomState(0)
    near = collapsed + jnp.asarray(rng.randn(24, 3) * 1e-3)
    g = jax.grad(lambda j: interp.interpenetration_penalty(j, spec))(near)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_fit_with_interpenetration_term_runs_and_reduces_overlap(model):
    """A fit with the term on runs jitted, stays finite, and its
    solution carries no more capsule overlap than the term-off fit on
    identical observations."""
    from tpu_pose.models import camera as camera_lib
    from tpu_pose.models import joints as joints_lib
    rng = np.random.RandomState(4)
    theta_true = (rng.randn(72) * 0.3).astype(np.float32)
    beta_true = (rng.randn(10) * 0.5).astype(np.float32)
    out = smpl_lib.smpl_forward(model, jnp.asarray(beta_true),
                                jnp.asarray(theta_true))
    j3d = joints_lib.select_smpl_joints(out.joints)
    cam = jnp.asarray([2.0, 0.1, -0.05])
    obs = (camera_lib.project(j3d, cam) + 1.0) * 32.0   # 64-px frame
    conf = jnp.ones(14)

    def cfg(w):
        return FitConfig(
            stages=(StageConfig(iters=12, lr=0.05, opt_pose=False,
                                opt_shape=False, w_pose_prior=0,
                                w_shape_prior=0, w_angle_prior=0,
                                w_interpenetration=w),
                    StageConfig(iters=25, lr=0.02, w_pose_prior=0.5,
                                w_shape_prior=1.0,
                                w_interpenetration=w)),
            img_size=64)

    spec = interp.build_capsule_spec(model)

    def overlap_of(res):
        o = smpl_lib.smpl_forward(model, res.beta, res.theta)
        return float(interp.interpenetration_penalty(o.joints, spec))

    fit_on = jax.jit(functools.partial(fit_lib.fit_smpl_single,
                                       cfg=cfg(5e3)))
    fit_off = jax.jit(functools.partial(fit_lib.fit_smpl_single,
                                        cfg=cfg(0.0)))
    r_on = fit_on(model, obs, conf)
    r_off = fit_off(model, obs, conf)
    for r in (r_on, r_off):
        assert np.isfinite(float(r.energy))
        assert np.isfinite(np.asarray(r.theta)).all()
    assert overlap_of(r_on) <= overlap_of(r_off) + 1e-8
