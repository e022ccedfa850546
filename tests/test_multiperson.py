"""Multi-person decode + fit (TPU-native extension beyond the
single-person reference; VERDICT r1 item 9, ROADMAP r1 #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_pose.api
from tpu_pose.api import PoseEstimator
from tpu_pose.models import cpm
from tpu_pose.utils.config import CPMConfig, FitConfig, StageConfig

SMALL = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                  refine_width=16, num_stages=3)
SMALL_FIT = FitConfig(
    stages=(StageConfig(iters=10, lr=0.05, opt_pose=False, opt_shape=False,
                        w_pose_prior=0, w_shape_prior=0, w_angle_prior=0),
            StageConfig(iters=15, lr=0.02, w_pose_prior=0.5,
                        w_shape_prior=1.0)),
    img_size=64)


def test_find_person_peaks_two_blobs():
    """Two separated bumps → two NMS'd peaks at the bump centers, sorted
    by strength."""
    h = w = 16
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    g1 = 1.0 * np.exp(-((xs - 4) ** 2 + (ys - 8) ** 2) / 4.0)
    g2 = 0.7 * np.exp(-((xs - 12) ** 2 + (ys - 7) ** 2) / 4.0)
    fg = jnp.asarray((g1 + g2)[None])
    centers, scores = cpm.find_person_peaks(fg, k=2, stride=8,
                                            nms_radius_px=3 * 8)
    c = np.asarray(centers)[0]
    s = np.asarray(scores)[0]
    np.testing.assert_allclose(c[0], [4 * 8, 8 * 8], atol=8)
    np.testing.assert_allclose(c[1], [12 * 8, 7 * 8], atol=8)
    assert s[0] >= s[1] > 0


def test_find_person_peaks_nms_suppresses_shoulder():
    """A single wide bump must NOT yield two nearby peaks: the second
    peak lands outside the NMS radius."""
    h = w = 16
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    fg = jnp.asarray(np.exp(-((xs - 8) ** 2 + (ys - 8) ** 2) / 16.0)[None])
    centers, _ = cpm.find_person_peaks(fg, k=2, stride=8,
                                       nms_radius_px=4 * 8)
    c = np.asarray(centers)[0]
    dist = np.linalg.norm(c[0] - c[1])
    assert dist > 4 * 8 - 1e-3, c


def test_estimate_2d_multi_shapes_and_distinct_hypotheses():
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    hm, joints, conf, scores = jax.jit(
        lambda p, i: cpm.estimate_2d_multi(p, i, SMALL, max_people=2)
    )(params, imgs)
    assert hm.shape == (2, 2, 8, 8, 15)
    assert joints.shape == (2, 2, 14, 2)
    assert conf.shape == (2, 2, 14)
    assert scores.shape == (2, 2)
    assert np.isfinite(np.asarray(joints)).all()
    # Different center hints → the two hypotheses' heatmaps differ.
    assert not np.allclose(np.asarray(hm[:, 0]), np.asarray(hm[:, 1]))


def test_estimate_2d_multi_requires_center_map():
    cfg = CPMConfig(**{**SMALL.__dict__, "use_center_map": False})
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        cpm.estimate_2d_multi(params, jnp.zeros((1, 64, 64, 3)), cfg)


def test_select_people_thresholds():
    """Person-count selection: absolute floor + frame-relative fraction,
    top hypothesis always kept (ROADMAP #4's variable-count piece)."""
    scores = jnp.asarray([[1.0, 0.9],     # two real people
                          [1.0, 0.3],     # one person + weak second peak
                          [0.04, 0.02]])  # noise frame: keep top only
    mask = np.asarray(cpm.select_people(scores))
    assert mask.tolist() == [[True, True], [True, False], [True, False]]
    # allow_empty (r4, VERDICT r3 weak #4): the noise frame whose best
    # peak misses the absolute floor reports ZERO people; frames with a
    # real person are unchanged.
    mask_e = np.asarray(cpm.select_people(scores, allow_empty=True))
    assert mask_e.tolist() == [[True, True], [True, False],
                               [False, False]]


def test_two_person_frame_resolves_two_fits():
    """VERDICT r1 item 9's done-criterion: a synthetic two-person frame
    resolves two distinct fitted hypotheses."""
    from tpu_pose.data import synthetic

    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT)
    # Two blob-people: one in each half of the frame (the blob renderer
    # is what the CPM trains on, so stage-1 foreground mass lands on
    # them even with random weights being noisy — we only need the NMS
    # geometry + plumbing here, not 2D accuracy).
    rng = np.random.RandomState(1)
    half_joints = rng.rand(14, 2).astype(np.float32) * 24 + 4
    left = synthetic.render_blob_image(half_joints, 64)
    right = synthetic.render_blob_image(half_joints + [32, 16], 64)
    frame = np.maximum(left, right)
    imgs = jnp.asarray(frame[None])

    res = est.estimate_and_fit_multi(imgs, max_people=2)
    assert res.person_mask.shape == (1, 2)
    assert res.person_mask.dtype == jnp.bool_
    assert bool(res.person_mask[0, 0])       # top hypothesis always kept
    assert res.theta.shape == (1, 2, 72)
    assert res.vertices.shape == (1, 2, 6890, 3)
    assert res.person_scores.shape == (1, 2)
    assert np.isfinite(np.asarray(res.vertices)).all()
    assert np.isfinite(np.asarray(res.energy)).all()
    # Two DISTINCT fits: the hypotheses' 2D evidence differs, so the
    # fitted cameras/joints must differ.
    assert not np.allclose(np.asarray(res.joints2d[0, 0]),
                           np.asarray(res.joints2d[0, 1]), atol=1e-3)
    assert not np.allclose(np.asarray(res.cam[0, 0]),
                           np.asarray(res.cam[0, 1]), atol=1e-4)


def test_person_evidence_separates_person_from_lone_joint():
    """person_evidence: a 14-joint cluster must score several times any
    single stray joint blob — the property that fixes count selection on
    sharply-trained nets (a raw max-over-channels map peaks at every
    joint, so peak VALUE cannot tell a person from a limb)."""
    from tpu_pose.data.synthetic import gaussian_heatmaps

    size, stride = 368, 8
    cfg = CPMConfig()  # full geometry: h = 46
    rng = np.random.RandomState(0)
    # Person: 14 joints clustered around (100, 190); lone joint at (300, 90).
    person = rng.randn(14, 2).astype(np.float32) * 30 + [100, 190]
    hm_p = gaussian_heatmaps(person, size, stride, sigma=3.0)       # person
    lone = np.zeros_like(hm_p)
    lone[..., 3] = gaussian_heatmaps(
        np.asarray([[300.0, 90.0]]), size, stride, sigma=3.0)[..., 0]
    beliefs = jnp.asarray(np.maximum(hm_p, lone)[None])             # (1,h,h,15)

    ev = cpm.person_evidence(beliefs, cfg)
    centers, scores = cpm.find_person_peaks(ev, k=2, stride=stride,
                                            nms_radius_px=96.0)
    c, s = np.asarray(centers)[0], np.asarray(scores)[0]
    # Top peak at the person's center (not at its strongest single
    # joint), integrating several times any single blob's evidence.
    assert np.linalg.norm(c[0] - [100, 190]) < 40, c
    lone_ev = float(ev[0, 90 // stride, 300 // stride])
    assert s[0] > 2.5 * lone_ev, (s, lone_ev)


def test_select_people_pose_dedupe():
    """Scale-robust person counting: hypotheses decoding near-identical
    joint sets are duplicates of ONE person (dropped), regardless of
    their peak scores; genuinely distinct joint sets survive."""
    rng = np.random.RandomState(0)
    person_a = rng.rand(14, 2).astype(np.float32) * 300
    person_b = person_a + 150.0
    scores = jnp.asarray([[1.0, 0.9], [1.0, 0.9]])
    joints = jnp.asarray(np.stack([
        np.stack([person_a, person_a + 5.0]),   # same person twice
        np.stack([person_a, person_b]),          # two distinct people
    ]))
    mask = np.asarray(cpm.select_people(scores, joints=joints))
    assert mask.tolist() == [[True, False], [True, True]]
    # Without joints, score-only selection keeps both in both frames.
    mask_s = np.asarray(cpm.select_people(scores))
    assert mask_s.tolist() == [[True, True], [True, True]]


def test_select_people_order_by_score():
    """Track-ordered inputs are not score-sorted: a high-scoring
    duplicate in slot 0 must lose to the real person in slot 1 when
    order_by_score=True (the slot-order dedupe would keep slot 0); on
    score-sorted inputs the flag is a no-op."""
    rng = np.random.RandomState(3)
    person_a = rng.rand(14, 2).astype(np.float32) * 300
    # Slot 0: weaker DUPLICATE of slot 1's person (track order).
    scores = jnp.asarray([[0.6, 1.0]])
    joints = jnp.asarray(np.stack([person_a + 4.0, person_a])[None])
    slot_order = np.asarray(cpm.select_people(scores, joints=joints))
    assert slot_order.tolist() == [[True, False]]  # keeps the weak dup
    by_score = np.asarray(cpm.select_people(scores, joints=joints,
                                            order_by_score=True))
    assert by_score.tolist() == [[False, True]]    # keeps the real one
    # Score-sorted inputs: identical with and without the flag.
    person_b = person_a + 150.0
    s2 = jnp.asarray([[1.0, 0.9], [1.0, 0.2]])
    j2 = jnp.asarray(np.stack([
        np.stack([person_a, person_b]),
        np.stack([person_a, person_a + 3.0]),
    ]))
    np.testing.assert_array_equal(
        np.asarray(cpm.select_people(s2, joints=j2)),
        np.asarray(cpm.select_people(s2, joints=j2,
                                     order_by_score=True)))
    # allow_empty composes: below-floor frames report zero people in
    # either ordering.
    low = jnp.asarray([[0.01, 0.02]])
    m = np.asarray(cpm.select_people(low, joints=joints,
                                     allow_empty=True,
                                     order_by_score=True))
    assert m.tolist() == [[False, False]]


def test_multi_person_fit_first_class_levers():
    """The per-hypothesis fits get the SAME accuracy levers as the
    single-person fused path (VERDICT r2 weak #2): fit_restarts>1 runs a
    yaw multistart per hypothesis (matching fit_smpl_multistart on the
    same decoded joints), and an attached init head warm-starts the
    single-start path."""
    from tpu_pose.fitting import fit as fit_lib
    from tpu_pose.fitting import init_head as head_lib

    rng = np.random.RandomState(1)
    half_joints = rng.rand(14, 2).astype(np.float32) * 24 + 4
    from tpu_pose.data import synthetic
    frame = np.maximum(synthetic.render_blob_image(half_joints, 64),
                       synthetic.render_blob_image(half_joints + [32, 16],
                                                   64))
    imgs = jnp.asarray(frame[None])

    est_ms = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, fit_restarts=2,
        with_prior=False)
    res = est_ms.estimate_and_fit_multi(imgs, max_people=2)
    assert res.theta.shape == (1, 2, 72)
    # Oracle: multistart fit on the decoded per-hypothesis joints.
    e2d = cpm.estimate_2d_multi(est_ms.cpm_params, imgs, SMALL,
                                max_people=2)
    _, joints, conf, _ = e2d
    want = fit_lib.fit_smpl_multistart(
        est_ms.smpl_model, joints[0, 1], conf[0, 1], cfg=SMALL_FIT,
        restarts=2)
    np.testing.assert_allclose(np.asarray(res.theta[0, 1]),
                               np.asarray(want.theta), atol=1e-4)

    # Init head: attached head changes the single-start solution vs the
    # mean-pose init (it warm-starts every hypothesis).
    head = head_lib.init_head_params(jax.random.PRNGKey(0))
    est_head = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False,
        init_head=head)
    est_plain = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False)
    r_head = est_head.estimate_and_fit_multi(imgs, max_people=2)
    r_plain = est_plain.estimate_and_fit_multi(imgs, max_people=2)
    assert np.isfinite(np.asarray(r_head.theta)).all()
    assert not np.allclose(np.asarray(r_head.theta),
                           np.asarray(r_plain.theta), atol=1e-5)


def test_multi_refine_scale_runs_and_differs():
    """Per-hypothesis scale normalization (refine_scale) jits through the
    multi path, keeps joints in the input frame, and changes the decode
    (each hypothesis re-runs on its own normalized crop)."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    run = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2, refine_scale=True))
    hm, joints, conf, scores = run(params, imgs)
    assert joints.shape == (2, 2, 14, 2)
    assert np.isfinite(np.asarray(joints)).all()
    _, j0, _, _ = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2))(params, imgs)
    assert not np.allclose(np.asarray(joints), np.asarray(j0), atol=1e-3)

    # Through the fused API path as well.
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False,
        refine_scale=True)
    res = est.estimate_and_fit_multi(imgs, max_people=2)
    assert res.theta.shape == (2, 2, 72)
    assert np.isfinite(np.asarray(res.vertices)).all()


def test_multi_flip_tta_runs_and_slots_stay_aligned():
    """Multi-person flip TTA jits (with and without refine_scale),
    keeps slot alignment (centers come from the UNFLIPPED pass and the
    mirrored pass reuses them mirrored, same slot order), returns
    finite input-frame joints, and changes the decode vs no-TTA."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(7).randint(0, 255, (2, 64, 64, 3)),
        jnp.uint8)
    run = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2, flip_tta=True))
    hm, joints, conf, scores = run(params, imgs)
    assert joints.shape == (2, 2, 14, 2) and conf.shape == (2, 2, 14)
    assert np.isfinite(np.asarray(joints)).all()
    _, j0, _, s0 = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2))(params, imgs)
    # person_scores come from the unflipped evidence only → identical.
    np.testing.assert_allclose(np.asarray(scores), np.asarray(s0),
                               atol=1e-6)
    assert not np.allclose(np.asarray(joints), np.asarray(j0), atol=1e-3)

    _, j2, _, _ = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2, flip_tta=True, refine_scale=True))(
            params, imgs)
    assert np.isfinite(np.asarray(j2)).all()

    # Composes through the fused multi API (constructor flag).
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False,
        flip_tta=True)
    res = est.estimate_and_fit_multi(imgs, max_people=2)
    assert res.theta.shape == (2, 2, 72)
    assert np.isfinite(np.asarray(res.vertices)).all()


def test_multi_warns_once_when_scale_tta_ignored():
    """scale_tta applies only to single-person front ends; the multi
    path says so (once) instead of silently dropping the lever."""
    import warnings

    est = PoseEstimator.create_synthetic(seed=0, cpm_cfg=SMALL,
                                         scale_tta=(0.8,))
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        est.estimate_and_fit_multi(imgs, max_people=2)
        est.estimate_and_fit_multi(imgs, max_people=2)
    msgs = [x for x in w if "scale_tta" in str(x.message)]
    assert len(msgs) == 1

    # The video-multi entry points share the warn-once guard (session
    # construction is lazy — no device work before push).
    est2 = PoseEstimator.create_synthetic(seed=0, cpm_cfg=SMALL,
                                          scale_tta=(0.8,))
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        tpu_pose.api.MultiPersonVideoSession(est2, max_people=2, chunk=4)
    assert len([x for x in w2 if "scale_tta" in str(x.message)]) == 1


def test_hint_crop_centers_crop_on_hint_not_decode(monkeypatch):
    """hint_crop's entire contract is WHERE the crop window sits: the
    crop affine must map the caller's HINT to the frame center
    (t = S/2 − (hint + 0.5)·s — crop_affine_from_geometry's documented
    relation), regardless of where the hypothesis decode landed.
    Capture (s, t) from the crop pass and check the relation per
    hypothesis; refine_scale (decode-geometry centering) must NOT
    satisfy it on random-weight decodes."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(3).randint(0, 255, (2, 64, 64, 3)),
        jnp.uint8)
    hints = jnp.asarray([[[12.0, 20.0], [50.0, 40.0]],
                         [[30.0, 10.0], [22.0, 55.0]]])
    captured = []
    orig = cpm._crop_zoom

    def spy(images_net, s, t, **kw):
        captured.append((np.asarray(s), np.asarray(t)))
        return orig(images_net, s, t, **kw)

    monkeypatch.setattr(cpm, "_crop_zoom", spy)
    cpm.estimate_2d_multi(params, imgs, SMALL, max_people=2,
                          center_hints=hints, hint_crop=True)
    assert len(captured) == 1
    s, t = captured[0]
    want_t = 32.0 - (np.asarray(hints).reshape(4, 2) + 0.5) * s[:, None]
    np.testing.assert_allclose(t, want_t, rtol=1e-5, atol=1e-4)

    captured.clear()
    cpm.estimate_2d_multi(params, imgs, SMALL, max_people=2,
                          center_hints=hints, refine_scale=True)
    s2, t2 = captured[0]
    assert not np.allclose(
        t2, 32.0 - (np.asarray(hints).reshape(4, 2) + 0.5)
        * s2[:, None], atol=1.0)


def test_hint_crop_noop_without_hints_and_jits():
    """hint_crop without center_hints must be a bit-exact no-op (no
    crop pass), and the active path jits with finite in-frame output,
    composing with flip_tta (mirrored hints, same slot order)."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(5).randint(0, 255, (2, 64, 64, 3)),
        jnp.uint8)
    _, j_base, _, _ = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2))(params, imgs)
    _, j_noop, _, _ = jax.jit(lambda p, i: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2, hint_crop=True))(params, imgs)
    np.testing.assert_array_equal(np.asarray(j_base), np.asarray(j_noop))

    hints = jnp.asarray([[[12.0, 20.0], [50.0, 40.0]],
                         [[30.0, 10.0], [22.0, 55.0]]])
    run = jax.jit(lambda p, i, h: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2, center_hints=h, hint_crop="all",
        flip_tta=True))
    _, j_hc, c_hc, s_hc = run(params, imgs, hints)
    assert j_hc.shape == (2, 2, 14, 2)
    assert np.isfinite(np.asarray(j_hc)).all()
    # The "all" crop pass must actually change the decode vs the plain
    # hinted pass (it re-runs the net on hint-centered crops).
    _, j_plain, _, _ = jax.jit(lambda p, i, h: cpm.estimate_2d_multi(
        p, i, SMALL, max_people=2, center_hints=h, flip_tta=True))(
            params, imgs, hints)
    assert not np.allclose(np.asarray(j_hc), np.asarray(j_plain),
                           atol=1e-3)


def test_hint_crop_selective_substitutes_only_duplicates():
    """Default hint_crop (True/"dup") swaps in the crop decode ONLY for
    slots whose plain hinted decode duplicates a stronger slot.
    Identical hints for both slots force identical plain decodes (a
    guaranteed duplicate, tie broken by slot index): slot 0 must keep
    the plain decode bit-exactly, slot 1 must get the crop decode.
    Well-separated hints (no duplication) must be a bit-exact no-op vs
    the plain hinted pass."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(13).randint(0, 255, (2, 64, 64, 3)),
        jnp.uint8)
    same = jnp.asarray([[[32.0, 30.0], [32.0, 30.0]]] * 2)
    _, j_plain, _, _ = cpm.estimate_2d_multi(
        params, imgs, SMALL, max_people=2, center_hints=same)
    _, j_sel, _, _ = cpm.estimate_2d_multi(
        params, imgs, SMALL, max_people=2, center_hints=same,
        hint_crop=True)
    np.testing.assert_array_equal(np.asarray(j_sel[:, 0]),
                                  np.asarray(j_plain[:, 0]))
    assert not np.allclose(np.asarray(j_sel[:, 1]),
                           np.asarray(j_plain[:, 1]), atol=1e-3)
    # Far-apart hints whose decodes do not duplicate → selective crop
    # is inert (dup mask empty).
    far = jnp.asarray([[[8.0, 8.0], [56.0, 56.0]]] * 2)
    _, j_plain_f, _, _ = cpm.estimate_2d_multi(
        params, imgs, SMALL, max_people=2, center_hints=far)
    _, j_sel_f, _, _ = cpm.estimate_2d_multi(
        params, imgs, SMALL, max_people=2, center_hints=far,
        hint_crop=True, hint_crop_dup_px=1.0)
    np.testing.assert_array_equal(np.asarray(j_sel_f),
                                  np.asarray(j_plain_f))


def test_video_multi_hint_crop_runs_and_streams():
    """hint_crop through the tracked-video API: the one-shot program
    runs with finite output, and the session/stream form accepts the
    knob (window programs compile with the crop pass baked in)."""
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False,
        fit_restarts=1)
    frames = jnp.asarray(
        np.random.RandomState(9).randint(0, 255, (4, 64, 64, 3)),
        jnp.uint8)
    res = est.estimate_and_fit_video_multi(frames, max_people=2,
                                           hint_crop=True)
    assert res.joints2d.shape == (4, 2, 14, 2)
    assert np.isfinite(np.asarray(res.theta)).all()
    # (No differs-from-plain assertion: the selective default is a
    # deliberate no-op when no slot duplicates a stronger one, which
    # random-weight decodes may or may not do.)

    sess = tpu_pose.api.MultiPersonVideoSession(
        est, max_people=2, chunk=3, hint_crop=True)
    outs = [r for r in (sess.push(frames), sess.flush())
            if r is not None]
    tot = sum(int(r.joints2d.shape[0]) for r in outs)
    assert tot == 4


def test_select_people_dup_joint_frac():
    """Partial-overlap dedupe: a clutter-split hypothesis shares most
    joints with the person slot but sits far in part-ALIGNED mean
    distance (the round-5 measured failure: 49–84 px aligned, 0.64–1.0
    joints within 30 px nearest). dup_joint_frac kills it; a genuinely
    distinct person (zero overlap) survives; 0.0 is bit-identical to
    the round-4 behavior."""
    rng = np.random.RandomState(0)
    person = rng.uniform(40, 200, (14, 2)).astype(np.float32)
    # Split hypothesis: joints are the person's joints SHUFFLED (every
    # joint within 0 px of SOME person joint → overlap 1.0) — but the
    # part-aligned mean distance is large.
    split = person[::-1].copy()
    other = person + np.array([300.0, 0.0], np.float32)
    joints = jnp.asarray(np.stack([
        np.stack([person, split, other]),      # frame 0
    ]))                                        # (1, 3, 14, 2)
    scores = jnp.asarray([[1.0, 0.8, 0.6]])
    aligned_d = np.linalg.norm(person - split, axis=-1).mean()
    assert aligned_d > 30.0                    # invisible to mean dedupe
    m_old = np.asarray(cpm.select_people(scores, 0.05, 0.4,
                                         joints=joints, dup_px=30.0))
    assert m_old.tolist() == [[True, True, True]]
    m_new = np.asarray(cpm.select_people(scores, 0.05, 0.4,
                                         joints=joints, dup_px=30.0,
                                         dup_joint_frac=0.5))
    assert m_new.tolist() == [[True, False, True]]
    # 0.0 → bit-identical to the old mask on random inputs.
    jr = jnp.asarray(rng.uniform(0, 256, (4, 3, 14, 2)).astype(np.float32))
    sr = jnp.asarray(rng.uniform(0, 1, (4, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(cpm.select_people(sr, 0.1, 0.4, joints=jr)),
        np.asarray(cpm.select_people(sr, 0.1, 0.4, joints=jr,
                                     dup_joint_frac=0.0)))
    # order_by_score path carries the knob (weaker-first slot order).
    joints_rev = joints[:, ::-1]
    scores_rev = scores[:, ::-1]
    m_rev = np.asarray(cpm.select_people(
        scores_rev, 0.05, 0.4, joints=joints_rev, dup_px=30.0,
        dup_joint_frac=0.5, order_by_score=True))
    assert m_rev.tolist() == [[True, False, True]]
