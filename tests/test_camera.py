"""Projection round-trip tests (SURVEY.md §4.1 'Projection')."""

import jax.numpy as jnp
import numpy as np

from tpu_pose.models import camera


def test_weak_perspective_known_values():
    pts = jnp.asarray([[1.0, 2.0, 5.0], [-1.0, 0.5, 3.0]])
    cam = jnp.asarray([2.0, 10.0, -4.0])  # s, tx, ty
    out = np.asarray(camera.weak_perspective_project(pts, cam))
    np.testing.assert_allclose(out, [[12.0, 0.0], [8.0, -3.0]], atol=1e-6)


def test_perspective_known_values():
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, -1.0, 5.0]])
    cam = jnp.asarray([0.0, 0.0, 10.0])  # tx, ty, tz
    out = np.asarray(camera.perspective_project(pts, cam, focal=100.0))
    np.testing.assert_allclose(out[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [100.0 / 15.0, -100.0 / 15.0],
                               atol=1e-5)


def test_perspective_z_clamp_no_blowup():
    pts = jnp.asarray([[0.0, 0.0, -5.0]])
    cam = jnp.asarray([0.0, 0.0, 0.0])
    out = np.asarray(camera.perspective_project(pts, cam, focal=100.0))
    assert np.all(np.isfinite(out))


def test_weak_perspective_init_roundtrip():
    """init from projected rest joints should recover (s, t) well."""
    rng = np.random.RandomState(0)
    j3d = jnp.asarray(rng.randn(14, 3), jnp.float32)
    cam_gt = jnp.asarray([1.7, 0.3, -0.2])
    j2d = camera.weak_perspective_project(j3d, cam_gt)
    cam0 = camera.init_weak_perspective(j2d, j3d)
    np.testing.assert_allclose(np.asarray(cam0), np.asarray(cam_gt),
                               atol=0.35)


def test_perspective_init_sane_depth():
    rng = np.random.RandomState(1)
    j3d = jnp.asarray(rng.randn(14, 3) * 0.4, jnp.float32)
    cam_gt = jnp.asarray([0.1, -0.2, 8.0])
    j2d = camera.perspective_project(j3d, cam_gt, focal=1000.0)
    cam0 = camera.init_perspective(j2d, j3d, focal=1000.0)
    assert 4.0 < float(cam0[2]) < 16.0  # right depth ballpark


def test_project_dispatch():
    pts = jnp.zeros((5, 3))
    out = camera.project(pts, jnp.asarray([1.0, 0.0, 0.0]),
                         model=camera.WEAK_PERSPECTIVE)
    assert out.shape == (5, 2)
    out = camera.project(pts, jnp.asarray([0.0, 0.0, 5.0]),
                         model=camera.PERSPECTIVE, focal=500.0)
    assert out.shape == (5, 2)
