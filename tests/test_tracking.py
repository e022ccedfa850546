"""Multi-person video tracking (fitting/tracking.py +
api.estimate_and_fit_video_multi) — in-graph identity association over
hypothesis slots, per-track smooth fits (TPU-native extension beyond the
single-person single-frame reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pose.api import PoseEstimator
from tpu_pose.fitting import tracking
from tpu_pose.utils.config import CPMConfig, FitConfig, StageConfig

SMALL = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                  refine_width=16, num_stages=3)
SMALL_FIT = FitConfig(
    stages=(StageConfig(iters=10, lr=0.05, opt_pose=False, opt_shape=False,
                        w_pose_prior=0, w_shape_prior=0, w_angle_prior=0),
            StageConfig(iters=15, lr=0.02, w_pose_prior=0.5,
                        w_shape_prior=1.0)),
    img_size=64)


def _shuffle_slots(rng, tracks):
    """GT track features (T, k, D) → slot-shuffled copy + GT perms."""
    t, k, _ = tracks.shape
    perms = np.stack([rng.permutation(k) for _ in range(t)])
    slots = np.empty_like(tracks)
    for i in range(t):
        # track j lands in slot perms[i, j] ⇒ slots[perm] = tracks
        slots[i, perms[i]] = tracks[i]
    return slots, perms


def test_associate_recovers_shuffled_identities():
    """Three well-separated smooth trajectories, slots shuffled per frame
    with noise: gather_tracks(slots, perm) must reproduce the GT tracks
    exactly (after aligning track labels via frame 0)."""
    rng = np.random.RandomState(0)
    t, k, d = 24, 3, 2
    base = rng.uniform(0, 300, (k, d))
    drift = rng.uniform(-2, 2, (t, k, d)).cumsum(axis=0)
    tracks = base[None] + drift + rng.uniform(-1, 1, (t, k, d))
    slots, _ = _shuffle_slots(rng, tracks.astype(np.float32))

    perm = jax.jit(tracking.associate_tracks)(jnp.asarray(slots))
    rec = np.asarray(tracking.gather_tracks(jnp.asarray(slots), perm))
    # Track labels are born from frame-0 slot order; realign to GT ids.
    order = np.argmin(np.linalg.norm(
        rec[0][:, None] - tracks[0][None], axis=-1), axis=1)
    assert sorted(order.tolist()) == list(range(k))
    np.testing.assert_allclose(rec[:, np.argsort(order)], tracks,
                               atol=1e-4)


def test_associate_crossing_resolved_by_pose_features():
    """Two hypotheses whose POSITIONS cross mid-sequence but whose pose
    features stay distinct: a center-only cost would swap them at the
    crossing; the full-feature cost must not."""
    t = 21
    u = np.linspace(0.0, 1.0, t, dtype=np.float32)
    pos_a = np.stack([40 + 240 * u, np.full(t, 100.0)], -1)
    pos_b = np.stack([280 - 240 * u, np.full(t, 104.0)], -1)
    pose_a = np.tile([10.0, -10.0, 5.0], (t, 1)).astype(np.float32)
    pose_b = np.tile([-10.0, 10.0, -5.0], (t, 1)).astype(np.float32)
    tr = np.stack([np.concatenate([pos_a, pose_a], -1),
                   np.concatenate([pos_b, pose_b], -1)], axis=1)
    rng = np.random.RandomState(1)
    tr += rng.uniform(-0.5, 0.5, tr.shape).astype(np.float32)
    slots, _ = _shuffle_slots(rng, tr)

    perm = tracking.associate_tracks(jnp.asarray(slots))
    rec = np.asarray(tracking.gather_tracks(jnp.asarray(slots), perm))
    swap = rec[0, 0, 2] < 0          # frame-0 slot order vs GT id order
    exp = tr[:, ::-1] if swap else tr
    np.testing.assert_allclose(rec, exp, atol=1e-4)


def test_associate_score_gate_coasts_through_dropout():
    """Track B's hypothesis goes low-score garbage for a middle window
    (occlusion): the gated tracker must neither yank track B onto the
    garbage nor swap A, and must re-lock B on reappearance."""
    t = 20
    a = np.stack([np.linspace(50, 120, t), np.full(t, 60.0)],
                 -1).astype(np.float32)
    b = np.stack([np.linspace(250, 180, t), np.full(t, 200.0)],
                 -1).astype(np.float32)
    feats = np.stack([a, b], axis=1).copy()
    scores = np.ones((t, 2), np.float32)
    rng = np.random.RandomState(2)
    drop = slice(8, 13)
    feats[drop, 1] = rng.uniform(0, 300, (5, 2))     # garbage position
    scores[drop, 1] = 0.0
    slots, gt_perms = _shuffle_slots(rng, feats)
    slot_scores = np.empty_like(scores)
    for i in range(t):
        slot_scores[i, gt_perms[i]] = scores[i]

    perm = tracking.associate_tracks(jnp.asarray(slots),
                                     jnp.asarray(slot_scores),
                                     score_gate=0.5)
    rec = np.asarray(tracking.gather_tracks(jnp.asarray(slots), perm))
    keep = np.ones(t, bool)
    keep[drop] = False
    # Track labels are born from frame-0 slot order; realign to (a, b).
    ia = int(np.argmin(np.linalg.norm(rec[0] - a[0], axis=-1)))
    np.testing.assert_allclose(rec[keep, ia], a[keep], atol=1e-4)
    np.testing.assert_allclose(rec[keep, 1 - ia], b[keep], atol=1e-4)


def test_appearance_features_sample_painted_colors():
    """Uniform color patches painted at known spots come back exactly
    through the bilinear patch sampler; edge joints clamp, not wrap."""
    img = np.zeros((32, 32, 3), np.float32)
    img[8:14, 8:14] = [0.9, 0.1, 0.2]
    img[20:26, 20:26] = [0.1, 0.8, 0.3]
    jts = jnp.asarray([[[[10.5, 10.5], [22.5, 22.5], [0.0, 0.0]]]],
                      jnp.float32)                  # (T=1, k=1, P=3, 2)
    app = np.asarray(tracking.appearance_features(
        jnp.asarray(img)[None], jts, patch=3)).reshape(3, 3)
    np.testing.assert_allclose(app[0], [0.9, 0.1, 0.2], atol=1e-5)
    np.testing.assert_allclose(app[1], [0.1, 0.8, 0.3], atol=1e-5)
    np.testing.assert_allclose(app[2], [0.0, 0.0, 0.0], atol=1e-5)


def test_associate_appearance_bridges_crossing_blackout():
    """The measured hard-crossing failure as a unit test: track B's
    hypotheses are garbage through a blackout window during which the
    people SWAP SIDES. A geometry-only tracker re-acquires the wrong
    person (its frozen position points at the old side); the appearance
    half of the features must bridge the gap."""
    t = 16
    u = np.linspace(0.0, 1.0, t, dtype=np.float32)
    pos_a = np.stack([0.2 + 0.6 * u, np.full(t, 0.5)], -1)
    pos_b = np.stack([0.8 - 0.6 * u, np.full(t, 0.55)], -1)
    app_a = np.tile([0.8, 0.1, 0.1], (t, 1)).astype(np.float32)
    app_b = np.tile([0.1, 0.1, 0.8], (t, 1)).astype(np.float32)
    tr = np.stack([np.concatenate([pos_a, app_a], -1),
                   np.concatenate([pos_b, app_b], -1)], axis=1)
    scores = np.ones((t, 2), np.float32)
    rng = np.random.RandomState(4)
    drop = slice(5, 11)
    tr[drop, 1] = rng.uniform(0, 1, (6, 5))          # garbage features
    scores[drop, 1] = 0.5                            # below 0.75·max
    tr += rng.uniform(-0.01, 0.01, tr.shape).astype(np.float32)
    slots, gt_perms = _shuffle_slots(rng, tr)
    slot_scores = np.empty_like(scores)
    for i in range(t):
        slot_scores[i, gt_perms[i]] = scores[i]

    perm = tracking.associate_tracks(jnp.asarray(slots),
                                     jnp.asarray(slot_scores))
    rec = np.asarray(tracking.gather_tracks(jnp.asarray(slots), perm))
    ia = int(np.argmin(np.linalg.norm(rec[0] - tr[0, 0], axis=-1)))
    keep = np.ones(t, bool)
    keep[drop] = False
    np.testing.assert_allclose(rec[keep, ia], tr[keep, 0], atol=1e-4)
    np.testing.assert_allclose(rec[keep, 1 - ia], tr[keep, 1], atol=1e-4)


def test_estimate_and_fit_video_multi_end_to_end():
    """The fused multi-person video path jits end to end on tiny shapes:
    track-ordered result shapes, finite outputs, valid perm rows, and a
    boolean track mask with at least one live track."""
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False)
    frames = jnp.asarray(
        np.random.RandomState(3).randint(0, 255, (5, 64, 64, 3)),
        jnp.uint8)
    res = est.estimate_and_fit_video_multi(frames, max_people=2)
    t, k = 5, 2
    assert res.joints2d.shape == (t, k, 14, 2)
    assert res.theta.shape == (k, t, 72)
    assert res.beta.shape == (k, t, 10)
    assert res.vertices.shape[:2] == (k, t)
    assert res.perm.shape == (t, k)
    p = np.asarray(res.perm)
    assert all(sorted(row.tolist()) == [0, 1] for row in p)
    assert np.isfinite(np.asarray(res.joints2d)).all()
    assert np.isfinite(np.asarray(res.theta)).all()
    assert np.isfinite(np.asarray(res.energy)).all()
    assert res.track_mask.dtype == jnp.bool_
    assert np.asarray(res.frame_mask).any(axis=1).all()  # ≥1 per frame


def test_associate_state_carry_matches_single_call():
    """Splitting a sequence into windows with carried (features,
    presence) state reproduces the single-call assignment exactly —
    the streaming path's identity-persistence contract."""
    rng = np.random.RandomState(5)
    t, k, d = 20, 3, 4
    base = rng.uniform(0, 300, (k, d))
    tracks = (base[None] + rng.uniform(-2, 2, (t, k, d)).cumsum(0)
              ).astype(np.float32)
    slots, _ = _shuffle_slots(rng, tracks)
    scores = rng.uniform(0.8, 1.2, (t, k)).astype(np.float32)

    full = np.asarray(tracking.associate_tracks(
        jnp.asarray(slots), jnp.asarray(scores)))
    p1, st = tracking.associate_tracks(
        jnp.asarray(slots[:8]), jnp.asarray(scores[:8]),
        return_state=True)
    p2 = tracking.associate_tracks(
        jnp.asarray(slots[8:]), jnp.asarray(scores[8:]), init_state=st)
    np.testing.assert_array_equal(np.concatenate([p1, p2]), full)


def test_estimate_and_fit_video_multi_stream_windows():
    """The windowed streaming path: T ≫ chunk runs through the carried
    association state + per-track anchors, pads the final partial window
    with masked frames, and returns full-length track-ordered results."""
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False)
    frames = jnp.asarray(
        np.random.RandomState(6).randint(0, 255, (7, 64, 64, 3)),
        jnp.uint8)
    res = est.estimate_and_fit_video_multi_stream(
        frames, max_people=2, chunk=4)
    assert res.joints2d.shape == (7, 2, 14, 2)
    assert res.theta.shape == (2, 7, 72)
    assert res.perm.shape == (7, 2)
    p = np.asarray(res.perm)
    assert all(sorted(row.tolist()) == [0, 1] for row in p)
    assert np.isfinite(np.asarray(res.theta)).all()
    assert np.isfinite(np.asarray(res.joints2d)).all()
    # Pad frames (the final window's) must not leak: exactly 7 rows.
    assert res.frame_mask.shape == (7, 2)
    assert res.track_mask.shape == (2,)


def test_video_session_matches_one_shot_stream():
    """Incremental MultiPersonVideoSession (irregular pushes: 1, 3, 2, 1
    frames) must reproduce estimate_and_fit_video_multi_stream exactly —
    same windows, same carried state, same results."""
    from tpu_pose.api import MultiPersonVideoSession
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False)
    frames = np.random.RandomState(9).randint(
        0, 255, (7, 64, 64, 3)).astype(np.uint8)
    ref = est.estimate_and_fit_video_multi_stream(
        jnp.asarray(frames), max_people=2, chunk=3)

    sess = MultiPersonVideoSession(est, max_people=2, chunk=3)
    outs = []
    for lo, hi in ((0, 1), (1, 4), (4, 6), (6, 7)):
        r = sess.push(frames[lo:hi])
        if r is not None:
            outs.append(r)
    assert sess.frames_buffered == 1
    outs.append(sess.flush())
    theta = np.concatenate([np.asarray(o.theta) for o in outs], axis=1)
    j2d = np.concatenate([np.asarray(o.joints2d) for o in outs], axis=0)
    perm = np.concatenate([np.asarray(o.perm) for o in outs], axis=0)
    np.testing.assert_array_equal(perm, np.asarray(ref.perm))
    np.testing.assert_allclose(theta, np.asarray(ref.theta), atol=1e-6)
    np.testing.assert_allclose(j2d, np.asarray(ref.joints2d), atol=1e-6)
    # Closed session refuses further input.
    try:
        sess.push(frames[:1])
        assert False, "push after flush should raise"
    except RuntimeError:
        pass


def test_hard_multi_video_generator_schema():
    """Two-person hard video: stable identity axis, crossing paths
    actually cross, joints match the returned centers' convention."""
    from tpu_pose.data import synthetic_hard as sh
    from tpu_pose.models import smpl_data
    model = smpl_data.synthetic_smpl(seed=0)
    v = sh.make_hard_multi_video(model, 8, SMALL, seed=1, crossing=True)
    assert v["images"].shape == (8, 64, 64, 3)
    assert v["joints2d"].shape == (8, 2, 14, 2)
    assert v["gt_joints3d"].shape == (8, 2, 24, 3)
    # Person 0 starts left of person 1 and ends right of them.
    cx = v["centers"][..., 0]
    assert cx[0, 0] < cx[0, 1] and cx[-1, 0] > cx[-1, 1]
    # Joint clouds sit around their person's center.
    d = np.linalg.norm(
        v["joints2d"].mean(2) - v["centers"], axis=-1)
    assert d.max() < 12.0


def test_video_multi_three_slots_end_to_end():
    """k=3 hypothesis slots through the FULL tracked-video pipeline
    (3! = 6 assignment candidates per frame): shapes, per-frame perm
    validity, and presence semantics — the k>2 path had no end-to-end
    execution before this."""
    from tpu_pose.api import PoseEstimator
    from tpu_pose.utils.config import CPMConfig, FitConfig, StageConfig

    cpm = CPMConfig(input_size=64, features=8, stage1_head_width=16,
                    refine_width=8, num_stages=2)
    fit = FitConfig(stages=(StageConfig(iters=6, lr=0.05),), img_size=64)
    est = PoseEstimator.create_synthetic(seed=0, cpm_cfg=cpm,
                                         fit_cfg=fit)
    frames = np.random.RandomState(0).randint(
        0, 255, (4, 64, 64, 3)).astype(np.uint8)
    r = est.estimate_and_fit_video_multi(jnp.asarray(frames),
                                         max_people=3)
    assert r.joints2d.shape == (4, 3, 14, 2)
    assert r.theta.shape == (3, 4, 72)
    assert r.vertices.shape[:2] == (3, 4)
    perm = np.asarray(r.perm)
    for t in range(4):
        assert sorted(perm[t].tolist()) == [0, 1, 2]
    # Presence calls stay boolean and at least one track is real.
    assert np.asarray(r.track_mask).dtype == bool
    assert np.asarray(r.track_mask).any()


def _np_viterbi(geom, app, w_app=2.0, w_anchor=8.0, eps=1e-4):
    """Reference DP (all slots live) for associate_tracks_viterbi."""
    import itertools
    t, k = geom.shape[:2]
    perms = np.array(list(itertools.permutations(range(k))))
    node = np.stack(
        [w_anchor * np.mean((app[:, p] - app[0][None]) ** 2, (1, 2))
         for p in perms], -1)                               # (T, P)
    cost = node[0].copy()
    back = np.zeros((t, len(perms)), int)
    for i in range(1, t):
        e = np.array([[np.mean((geom[i, p] - geom[i - 1, q]) ** 2)
                       + w_app * np.mean((app[i, p] - app[i - 1, q]) ** 2)
                       + (eps if qi != pi else 0.0)
                       for pi, p in enumerate(perms)]
                      for qi, q in enumerate(perms)])
        c = cost[:, None] + e + node[i][None]
        back[i] = np.argmin(c, 0)
        cost = c[back[i], np.arange(len(perms))]
    path = [int(np.argmin(cost))]
    for i in range(t - 1, 0, -1):
        path.append(int(back[i][path[-1]]))
    return perms[path[::-1]]


def test_viterbi_matches_numpy_dp_oracle():
    rng = np.random.RandomState(1)
    for k in (2, 3):
        for _ in range(3):
            geom = rng.randn(10, k, 6).astype(np.float32)
            app = rng.randn(10, k, 9).astype(np.float32)
            ref = _np_viterbi(geom, app)
            got = np.asarray(tracking.associate_tracks_viterbi(
                jnp.asarray(geom), jnp.asarray(app)))
            np.testing.assert_array_equal(ref, got)


def test_viterbi_anchor_survives_blackout_where_greedy_fails():
    """A crossing with a mid-sequence garbage gap: geometry continuity
    prefers the identity swap, but the frame-0 appearance anchor pulls
    the global path back to the true identities — the failure mode the
    greedy EMA filter locks into (it has no way to undo a wrong branch
    after the gap)."""
    t, k = 20, 2
    rng = np.random.RandomState(3)
    # Tracks swap positions across a 4-frame garbage window.
    x = np.linspace(0.0, 1.0, t, dtype=np.float32)
    geom = np.zeros((t, k, 2), np.float32)
    geom[:, 0, 0], geom[:, 1, 0] = x, 1.0 - x
    geom[:, :, 1] = 0.5
    app = np.zeros((t, k, 3), np.float32)
    app[:, 0], app[:, 1] = (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)
    # Slot order is position-sorted (what NMS peak order does): after the
    # crossing the slots swap identity.
    order = np.argsort(geom[..., 0], axis=1)
    slots_g = np.take_along_axis(geom, order[..., None], 1)
    slots_a = np.take_along_axis(app, order[..., None], 1)
    gap = slice(8, 12)
    slots_g[gap] = rng.rand(4, k, 2)
    slots_a[gap] = rng.rand(4, k, 3)
    perm = np.asarray(tracking.associate_tracks_viterbi(
        jnp.asarray(slots_g), jnp.asarray(slots_a)))
    tracked_a = np.asarray(tracking.gather_tracks(
        jnp.asarray(slots_a), jnp.asarray(perm)))
    # Outside the garbage gap every frame must recover the true colors.
    keep = np.ones(t, bool)
    keep[gap] = False
    np.testing.assert_allclose(tracked_a[keep, 0], app[keep, 0], atol=1e-6)
    np.testing.assert_allclose(tracked_a[keep, 1], app[keep, 1], atol=1e-6)


def test_viterbi_stream_state_matches_batch():
    rng = np.random.RandomState(5)
    t, k = 16, 2
    geom = rng.randn(t, k, 4).astype(np.float32)
    base = rng.randn(1, k, 6).astype(np.float32)
    app = (np.repeat(base, t, 0)
           + 0.02 * rng.randn(t, k, 6)).astype(np.float32)
    pb = np.asarray(tracking.associate_tracks_viterbi(
        jnp.asarray(geom), jnp.asarray(app)))
    p1, st = tracking.associate_tracks_viterbi(
        jnp.asarray(geom[:9]), jnp.asarray(app[:9]), return_state=True)
    p2 = tracking.associate_tracks_viterbi(
        jnp.asarray(geom[9:]), jnp.asarray(app[9:]), init_state=st)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(p1), np.asarray(p2)]), pb)


def test_smooth_track_centers_bridges_outliers():
    """A garbage mid-trajectory observation (the crossing failure mode)
    must be pulled back to the smooth path; clean observations must
    survive nearly untouched."""
    t = 24
    x = np.linspace(10.0, 50.0, t, dtype=np.float32)
    centers = np.stack([x, np.full(t, 32.0, np.float32)], -1)[:, None]
    obs = centers.copy()
    obs[10, 0] += (40.0, -25.0)                 # one garbage decode
    w = np.ones((t, 1), np.float32)
    sm = np.asarray(tracking.smooth_track_centers(
        jnp.asarray(obs), jnp.asarray(w)))
    err_out = np.linalg.norm(sm[10, 0] - centers[10, 0])
    err_clean = np.linalg.norm(sm - centers, axis=-1)[np.arange(t) != 10]
    assert err_out < 10.0, err_out               # 47 px outlier bridged
    assert err_clean.max() < 2.0, err_clean.max()
    # Zero-weight frames (streaming pads) are interpolated, not copied.
    w2 = w.copy()
    w2[15] = 0.0
    obs2 = obs.copy()
    obs2[15, 0] = (0.0, 0.0)
    sm2 = np.asarray(tracking.smooth_track_centers(
        jnp.asarray(obs2), jnp.asarray(w2)))
    assert np.linalg.norm(sm2[15, 0] - centers[15, 0]) < 3.0


def test_estimate_2d_multi_center_hints_fix_slot_identity():
    """Explicit center_hints must decode slot i at hint i (the temporal
    second pass's contract) — swap the hints, the slots swap."""
    from tpu_pose.models import cpm as cpm_lib
    est = PoseEstimator.create_synthetic(seed=0, cpm_cfg=SMALL,
                                         fit_cfg=SMALL_FIT)
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, 64, 64, 3)).astype(np.uint8))
    hints = jnp.asarray(np.array([[[16.0, 32.0], [48.0, 32.0]],
                                  [[40.0, 20.0], [20.0, 44.0]]],
                                 np.float32))
    _, j1, c1, s1 = cpm_lib.estimate_2d_multi(
        est.cpm_params, frames, cfg=SMALL, max_people=2,
        center_hints=hints)
    _, j2, c2, s2 = cpm_lib.estimate_2d_multi(
        est.cpm_params, frames, cfg=SMALL, max_people=2,
        center_hints=hints[:, ::-1])
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2[:, ::-1]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2[:, ::-1]),
                               rtol=1e-5)
    assert np.isfinite(np.asarray(c1)).all()


def test_viterbi_frame0_garbage_slot_keeps_identity_order():
    """Round-4 regression: one real person + one garbage (non-live)
    hypothesis whose decode sits ON the same person. Without the
    frame-0 birth charge the DP swapped identities at birth (track 0
    born on the garbage slot); track 0 must stay the top-scored slot."""
    t = 8
    rng = np.random.RandomState(0)
    app = np.zeros((t, 2, 3), np.float32)
    app[:, 0] = [0.8, 0.2, 0.1]
    app[:, 1] = app[:, 0] + rng.uniform(-0.02, 0.02, (t, 3))  # same person
    geom = rng.rand(t, 2, 4).astype(np.float32) * 0.1
    scores = np.stack([np.ones(t), np.full(t, -1e9)], 1).astype(np.float32)
    perm = np.asarray(tracking.associate_tracks_viterbi(
        jnp.asarray(geom), jnp.asarray(app), jnp.asarray(scores),
        score_gate=0.5))
    np.testing.assert_array_equal(perm[:, 0], np.zeros(t))  # track0=slot0


def test_viterbi_birth_anchors_new_person_to_free_slot():
    """A person ENTERING mid-sequence claims the never-live track (slot
    freed by the anchored0=live0 rule) instead of stealing the anchored
    track, and keeps it for the rest of the sequence."""
    t = 14
    rng = np.random.RandomState(1)
    app = np.zeros((t, 2, 3), np.float32)
    app[:, 0] = [0.9, 0.1, 0.1]                     # person A throughout
    app[:, 1] = rng.rand(t, 3)                      # garbage ...
    app[6:, 1] = [0.1, 0.1, 0.9]                    # ... then person B
    app += rng.uniform(-0.01, 0.01, app.shape).astype(np.float32)
    geom = np.zeros((t, 2, 2), np.float32)
    geom[:, 0, 0], geom[:, 1, 0] = 0.3, 0.7
    scores = np.ones((t, 2), np.float32)
    scores[:6, 1] = 0.1                             # gated pre-entry
    # Slot order shuffles after entry: B sometimes lands in slot 0.
    sw = slice(9, 12)
    app[sw] = app[sw, ::-1]
    geom[sw] = geom[sw, ::-1]
    perm = np.asarray(tracking.associate_tracks_viterbi(
        jnp.asarray(geom), jnp.asarray(app), jnp.asarray(scores),
        score_gate=0.5))
    tracked = np.asarray(tracking.gather_tracks(jnp.asarray(app),
                                                jnp.asarray(perm)))
    # Track 0 is A everywhere; track 1 is B from entry on.
    assert (tracked[:, 0, 0] > 0.6).all()
    assert (tracked[6:, 1, 2] > 0.6).all()


def test_viterbi_death_frees_slot_for_new_identity():
    """B leaves permanently; C enters later with different clothing.
    With death enabled (death_frames=3 < the 5-frame gap), C claims B's
    released slot and anchors to C's OWN appearance — B's stale anchor
    must not force C into an appearance mismatch against A's track.
    With death disabled, B's anchor persists and the same frames pay
    the mismatch (C still must not steal A's track)."""
    t = 18
    rng = np.random.RandomState(2)
    a_app, b_app, c_app = ([0.9, 0.1, 0.1], [0.1, 0.9, 0.1],
                           [0.1, 0.1, 0.9])
    app = np.zeros((t, 2, 3), np.float32)
    app[:, 0] = a_app
    app[:7, 1] = b_app                              # B present 0..6
    app[7:12, 1] = rng.rand(5, 3)                   # gone 7..11
    app[12:, 1] = c_app                             # C present 12..
    app += rng.uniform(-0.01, 0.01, app.shape).astype(np.float32)
    geom = np.zeros((t, 2, 2), np.float32)
    geom[:, 0, 0], geom[:, 1, 0] = 0.3, 0.7
    scores = np.ones((t, 2), np.float32)
    scores[7:12, 1] = 0.1
    for death in (3, 0):
        perm, state = tracking.associate_tracks_viterbi(
            jnp.asarray(geom), jnp.asarray(app), jnp.asarray(scores),
            score_gate=0.5, death_frames=death, return_state=True)
        tracked = np.asarray(tracking.gather_tracks(
            jnp.asarray(app), jnp.asarray(perm)))
        assert (tracked[:, 0, 0] > 0.6).all(), f"A stolen (death={death})"
        assert (tracked[12:, 1, 2] > 0.6).all(), f"C misrouted ({death})"
        anchored = np.asarray(state[5])
        anchor = np.asarray(state[4])
        assert anchored[1] == 1.0
        if death:
            # C re-anchored the released slot: anchor ≈ C, not B.
            assert anchor[1, 2] > 0.6, anchor[1]


def test_viterbi_birth_state_carries_across_windows():
    """Splitting the birth sequence into windows (return_state /
    init_state) reproduces the single-call assignment — births persist
    through the streaming carry."""
    t = 14
    rng = np.random.RandomState(3)
    app = np.zeros((t, 2, 3), np.float32)
    app[:, 0] = [0.9, 0.1, 0.1]
    app[:, 1] = rng.rand(t, 3)
    app[6:, 1] = [0.1, 0.1, 0.9]
    app += rng.uniform(-0.01, 0.01, app.shape).astype(np.float32)
    geom = rng.rand(t, 2, 4).astype(np.float32) * 0.05
    scores = np.ones((t, 2), np.float32)
    scores[:6, 1] = 0.1
    full = np.asarray(tracking.associate_tracks_viterbi(
        jnp.asarray(geom), jnp.asarray(app), jnp.asarray(scores),
        score_gate=0.5))
    p1, st = tracking.associate_tracks_viterbi(
        jnp.asarray(geom[:4]), jnp.asarray(app[:4]),
        jnp.asarray(scores[:4]), score_gate=0.5, return_state=True)
    p2 = tracking.associate_tracks_viterbi(
        jnp.asarray(geom[4:]), jnp.asarray(app[4:]),
        jnp.asarray(scores[4:]), score_gate=0.5, init_state=st)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(p1), np.asarray(p2)]), full)


def test_smooth_track_centers_single_observation_stays_finite():
    """Round-4 regression: a track with ONE observed frame (the rest
    weight-0 garbage) made the f32 smoothing solve singular → NaN
    trajectory → NaN hints → NaN decode. The weight floor must keep it
    finite and near the raw observations."""
    t = 5
    obs = np.array([[30., 30.], [28., 25.], [27., 26.], [29., 24.],
                    [30., 25.]], np.float32)[:, None]
    w = np.array([[0.92], [0.], [0.], [0.], [0.]], np.float32)
    sm = np.asarray(tracking.smooth_track_centers(
        jnp.asarray(obs), jnp.asarray(w)))
    assert np.isfinite(sm).all()
    assert abs(sm[0, 0, 0] - 30.0) < 3.0
    # All-zero weights degrade to ~the raw centers, not NaN.
    sm0 = np.asarray(tracking.smooth_track_centers(
        jnp.asarray(obs), jnp.zeros((t, 1), np.float32)))
    assert np.isfinite(sm0).all()


def test_video_session_birth_death_knobs_execute():
    """track_death_frames / track_birth_cost / allow_empty thread
    through the windowed session (7-leaf association carry incl.
    anchors/anchored/miss) and produce finite, valid output."""
    from tpu_pose.api import MultiPersonVideoSession
    cpm = CPMConfig(input_size=64, features=8, stage1_head_width=16,
                    refine_width=8, num_stages=2)
    fit = FitConfig(stages=(StageConfig(iters=6, lr=0.05),), img_size=64)
    est = PoseEstimator.create_synthetic(seed=0, cpm_cfg=cpm, fit_cfg=fit)
    sess = MultiPersonVideoSession(est, max_people=2, chunk=3,
                                   track_death_frames=2,
                                   track_birth_cost=0.1,
                                   allow_empty=True)
    frames = np.random.RandomState(4).randint(
        0, 255, (5, 64, 64, 3)).astype(np.uint8)
    outs = [r for r in (sess.push(frames), sess.flush())
            if r is not None]
    assert sum(o.perm.shape[0] for o in outs) == 5
    for o in outs:
        assert np.isfinite(np.asarray(o.theta)).all()
        p = np.asarray(o.perm)
        assert all(sorted(r.tolist()) == [0, 1] for r in p)
        # allow_empty: frame_mask MAY be all-false — it must still be
        # boolean with valid shape (no ≥1-per-frame guarantee).
        assert o.frame_mask.dtype == jnp.bool_


def test_viterbi_anchor_refresh_tracks_appearance_drift():
    """Gated anchor refresh (round 5): two people SWAP appearances by
    slow drift (A red→blue, B blue→red) across a mid-sequence garbage
    gap after which the slots arrive identity-swapped. Frozen birth
    anchors then match the WRONG slots (B's late appearance is A's
    birth appearance), while refreshed anchors tracked the drift and
    recover the true identities. The refresh gate (birth_cost
    appearance-MSE) keeps the garbage gap from polluting the anchors —
    the failure mode that sank the greedy EMA filter."""
    t, k = 24, 2
    rng = np.random.RandomState(9)
    u = np.linspace(0.0, 1.0, t, dtype=np.float32)[:, None]
    e = np.eye(4, dtype=np.float32)
    app_true = np.zeros((t, k, 4), np.float32)
    app_true[:, 0] = (1.0 - u) * e[0] + u * e[3]      # A: ch0 → ch3
    app_true[:, 1] = (1.0 - u) * e[2] + u * e[0]      # B: ch2 → ch0
    # The paths never meet, but B ENDS at A's BIRTH appearance — the
    # construction that fools a frozen birth anchor: post-gap, frozen
    # anchor0 matches B (wrong slot) almost exactly while A's drifted
    # appearance is far from BOTH birth anchors.
    slots_a = app_true.copy()
    gap = slice(10, 14)
    slots_a[14:] = slots_a[14:, ::-1]                 # slots swap
    slots_a[gap] = rng.rand(4, k, 4)
    geom = np.zeros((t, k, 2), np.float32)            # neutral geometry

    def run(rate):
        return np.asarray(tracking.associate_tracks_viterbi(
            jnp.asarray(geom), jnp.asarray(slots_a),
            anchor_refresh=rate))

    frozen, refreshed = run(0.0), run(0.5)
    ident = np.arange(k)
    # Refreshed: identity order before the gap, swapped after.
    np.testing.assert_array_equal(refreshed[:10],
                                  np.tile(ident, (10, 1)))
    np.testing.assert_array_equal(refreshed[14:],
                                  np.tile(ident[::-1], (t - 14, 1)))
    # Frozen anchors land on the wrong (identity) assignment after the
    # gap — the appearance swap fools the birth-frame anchor.
    assert (frozen[14:] == ident).all(), \
        "frozen-anchor baseline unexpectedly recovered; test is vacuous"
    # And the refresh gate kept garbage out: the returned anchors stay
    # within the drifted appearances' range.
    _, state = tracking.associate_tracks_viterbi(
        jnp.asarray(geom), jnp.asarray(slots_a), anchor_refresh=0.5,
        return_state=True)
    anchors = np.asarray(state[4])
    assert np.isfinite(anchors).all()
    assert (anchors >= -0.05).all() and (anchors <= 1.05).all()


def test_compose_perms_matches_sequential_gather():
    """gather(x, compose(p1, p2)) == gather(gather(x, p1), p2) for
    random per-frame permutations — the law the api's re-association
    pass (track_reassociate) relies on to keep the returned perm
    mapping final tracks to original NMS slots."""
    rng = np.random.RandomState(3)
    t, k = 7, 4
    p1 = jnp.asarray(np.stack([rng.permutation(k) for _ in range(t)]))
    p2 = jnp.asarray(np.stack([rng.permutation(k) for _ in range(t)]))
    x = jnp.asarray(rng.rand(t, k, 5).astype(np.float32))
    seq = tracking.gather_tracks(tracking.gather_tracks(x, p1), p2)
    one = tracking.gather_tracks(x, tracking.compose_perms(p1, p2))
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(one))


def test_video_multi_reassociate_executes_and_perm_valid():
    """track_reassociate threads through the public tracked-video entry:
    runs, returns a VALID per-frame permutation (the composed perm must
    still be a bijection onto the NMS slots), finite output, and a
    distinct cached program from the non-reassociated one."""
    est = PoseEstimator.create_synthetic(seed=0, cpm_cfg=SMALL,
                                         fit_cfg=SMALL_FIT)
    frames = jnp.asarray(np.random.RandomState(21).randint(
        0, 255, (5, 64, 64, 3)), jnp.uint8)
    r = est.estimate_and_fit_video_multi(
        frames, max_people=3, track_reassociate=True,
        track_anchor_refresh=0.3)
    assert np.isfinite(np.asarray(r.theta)).all()
    perm = np.asarray(r.perm)
    assert perm.shape == (5, 3)
    for row in perm:
        assert sorted(row.tolist()) == [0, 1, 2], row
    keys = [k_ for k_ in est._programs if k_[0] == "video_multi"]
    assert any(dict(kk[2:]).get("reassociate") for kk in keys)


def test_presence_hysteresis_semantics():
    """The latch law: present[t] = strong[t] | (present[t-1] & weak[t]).
    A strong birth latches through weak-only frames, one weak-failing
    frame resets the latch (no coasting), and init seeds frame 0 —
    the carry contract the streamed path relies on."""
    strong = jnp.asarray([[1, 0, 0, 0, 0, 1, 0],
                          [0, 0, 0, 0, 0, 0, 0]], bool).T   # (7, 2)
    weak = jnp.asarray([[1, 1, 1, 0, 1, 1, 1],
                        [1, 1, 0, 1, 1, 1, 1]], bool).T
    out = np.asarray(tracking.presence_hysteresis(
        strong, weak, jnp.asarray([False, True])))
    # Track 0: birth at 0, held by weak 1-2, dropped at 3 (weak fails),
    # NOT resurrected at 4 (weak alone cannot birth), reborn at 5.
    np.testing.assert_array_equal(out[:, 0],
                                  [1, 1, 1, 0, 0, 1, 1])
    # Track 1: init=True carries through weak frames 0-1, dies at 2.
    np.testing.assert_array_equal(out[:, 1],
                                  [1, 1, 0, 0, 0, 0, 0])


def test_video_multi_presence_keep_frac_stream_and_monotone():
    """presence_keep_frac < 1 through the public paths: the session
    must reproduce the windowed one-shot call exactly (the hysteresis
    carry — last presence row riding the anchor dict — flows through
    push/flush), and on a fixed program the hysteresis can only ADD
    presence relative to the strong gate (same decodes, latch on top).
    One-shot vs windowed are NOT compared: windowed fits/hints differ
    by design (anchored windows), as for every other knob."""
    from tpu_pose.api import MultiPersonVideoSession
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=SMALL_FIT, with_prior=False)
    frames = np.random.RandomState(11).randint(
        0, 255, (7, 64, 64, 3)).astype(np.uint8)
    kw = dict(max_people=2, presence_keep_frac=0.5, allow_empty=True)
    streamed = est.estimate_and_fit_video_multi_stream(
        jnp.asarray(frames), chunk=3, **kw)
    sess = MultiPersonVideoSession(est, chunk=3, **kw)
    outs = [r for r in (sess.push(frames), sess.flush())
            if r is not None]
    fm = np.concatenate([np.asarray(o.frame_mask) for o in outs], 0)
    th = np.concatenate([np.asarray(o.theta) for o in outs], 1)
    np.testing.assert_array_equal(fm, np.asarray(streamed.frame_mask))
    np.testing.assert_allclose(th, np.asarray(streamed.theta),
                               atol=1e-6)
    # Monotonicity on the ONE-SHOT program (identical decodes).
    one = est.estimate_and_fit_video_multi(jnp.asarray(frames), **kw)
    base = est.estimate_and_fit_video_multi(
        jnp.asarray(frames), max_people=2, allow_empty=True)
    fm_h = np.asarray(one.frame_mask)
    fm_b = np.asarray(base.frame_mask)
    assert (fm_h | fm_b).tolist() == fm_h.tolist()
