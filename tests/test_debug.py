"""Numerical-safety subsystem tests (utils/debug.py) + profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.utils import debug, profiling


def test_checked_passes_clean_fn():
    err, out = jax.jit(debug.checked(lambda x: x * 2.0))(jnp.ones(3))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # log(-1) → NaN

    err, _ = jax.jit(debug.checked(bad))(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_assert_all_finite_guard():
    def guarded(x):
        return debug.assert_all_finite(x / x.sum(), "normed")

    err, _ = jax.jit(debug.checked(guarded))(jnp.zeros(4))  # 0/0 → NaN
    with pytest.raises(Exception):
        err.throw()
    err2, _ = jax.jit(debug.checked(guarded))(jnp.ones(4))
    err2.throw()


def test_checked_fit_is_finite():
    """The whole traced fit passes float checks on a well-posed problem."""
    from tpu_pose.fitting import fit as fit_lib
    from tpu_pose.models import smpl_data
    from tpu_pose.utils.config import FitConfig, StageConfig

    model = smpl_data.synthetic_smpl(seed=0)
    cfg = FitConfig(stages=(StageConfig(iters=8, lr=0.05),), img_size=64)
    rng = np.random.RandomState(0)
    j2d = jnp.asarray(rng.rand(14, 2) * 64, jnp.float32)
    conf = jnp.ones(14)

    def run(j, c):
        res = fit_lib.fit_smpl_single(model, j, c, cfg=cfg)
        debug.assert_all_finite(res.theta, "theta")
        debug.assert_all_finite(res.energy, "energy")
        return res

    err, res = jax.jit(debug.checked(run))(j2d, conf)
    err.throw()
    assert np.isfinite(float(res.energy))


def test_cost_analysis_reports_flops():
    cost = profiling.cost_analysis(
        lambda a, b: jnp.dot(a, b), jnp.ones((128, 64)), jnp.ones((64, 32)))
    assert cost.get("flops", 0) > 0


def test_timer_runs():
    f = jax.jit(lambda x: x * 2)
    sec = profiling.Timer(f, jnp.ones(8), warmup=1, iters=2).run()
    assert sec > 0
