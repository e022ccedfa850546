"""Public-API tests: entry-point parity surface (SURVEY.md §2 row 14)."""


import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.api import PoseEstimator
from tpu_pose.utils.config import CPMConfig, FitConfig, StageConfig

SMALL_CPM = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                      refine_width=16, num_stages=2)
SMALL_FIT = FitConfig(
    stages=(StageConfig(iters=20, lr=0.05, opt_pose=False, opt_shape=False,
                        w_pose_prior=0, w_shape_prior=0, w_angle_prior=0),
            StageConfig(iters=40, lr=0.02, w_pose_prior=0.5,
                        w_shape_prior=1.0)),
    img_size=64)


@pytest.fixture(scope="module")
def est():
    return PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT)


def test_estimate_2d_shapes(est):
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 80, 60, 3)), jnp.uint8)
    r = est.estimate_2d(imgs)
    assert r.heatmaps.shape == (2, 8, 8, 15)
    assert r.joints2d.shape == (2, 14, 2)
    assert r.conf.shape == (2, 14)


def test_fit_smpl_single_and_batch(est):
    rng = np.random.RandomState(1)
    j = jnp.asarray(rng.rand(14, 2) * 64, jnp.float32)
    c = jnp.ones(14)
    single = est.fit_smpl(j, c)
    assert single.theta.shape == (72,)
    batch = est.fit_smpl(j[None], c[None])
    assert batch.theta.shape == (1, 72)
    assert np.all(np.isfinite(np.asarray(batch.theta)))


def test_estimate_and_fit_fused(est):
    imgs = jnp.asarray(
        np.random.RandomState(2).randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    r = est.estimate_and_fit(imgs)
    assert r.theta.shape == (2, 72)
    assert r.vertices.shape == (2, 6890, 3)
    assert r.joints3d.shape == (2, 24, 3)
    assert np.all(np.isfinite(np.asarray(r.vertices)))


def test_module_level_functions():
    """Loose functions exist and share a default estimator (parity feel)."""
    from tpu_pose import api
    assert callable(api.estimate_2d)
    assert callable(api.fit_smpl)
    assert callable(api.estimate_and_fit)


def test_viz_helpers(est, tmp_path):
    from tpu_pose.utils import viz
    img = np.zeros((64, 64, 3), np.uint8)
    joints = np.random.RandomState(3).rand(14, 2) * 64
    out = viz.draw_skeleton(img, joints)
    assert out.shape == img.shape and out.sum() > 0

    verts = np.random.RandomState(4).rand(10, 3)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]])
    path = tmp_path / "mesh.obj"
    viz.export_obj(str(path), verts, faces)
    text = path.read_text()
    assert text.count("\nf ") + text.startswith("f ") == 2
    assert "v " in text

    sheet = viz.tile_heatmaps(np.random.RandomState(5).rand(8, 8, 15))
    assert sheet.dtype == np.uint8


def test_converter_npz_roundtrip(tmp_path, est):
    from tpu_pose.utils import tf_converter
    path = str(tmp_path / "params.npz")
    tf_converter.save_params_npz(path, est.cpm_params)
    loaded = tf_converter.load_params_npz(path)
    assert set(loaded) == set(est.cpm_params)
    for k in loaded:
        np.testing.assert_array_equal(
            np.asarray(loaded[k]["w"]), np.asarray(est.cpm_params[k]["w"]))


def test_fused_with_refine_center_and_restarts():
    """Fused path with both accuracy options on: in-graph center refine
    plus multi-start fitting."""
    import numpy as np
    from tpu_pose.api import PoseEstimator
    from tpu_pose.utils.config import CPMConfig, FitConfig, StageConfig
    est = PoseEstimator.create_synthetic(
        seed=0,
        cpm_cfg=CPMConfig(input_size=64, features=8, stage1_head_width=16,
                          refine_width=8, num_stages=2),
        fit_cfg=FitConfig(stages=(StageConfig(iters=8, lr=0.05),),
                          img_size=64),
        with_prior=False, fit_restarts=2, refine_center=True)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    res = est.estimate_and_fit(imgs)
    assert res.theta.shape == (2, 72)
    assert bool(jnp.all(jnp.isfinite(res.vertices)))
