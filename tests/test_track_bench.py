"""track_bench metric functions (tpu_pose/tools/track_bench.py) — the
scoring is host numpy, so the benchmark's correctness is testable
without a device or trained weights."""

import collections

import numpy as np

from tpu_pose.tools import track_bench as tb


_Res = collections.namedtuple(
    "_Res", ["joints2d", "joints3d", "frame_mask"])


class _Metrics:
    @staticmethod
    def pa_mpjpe_np(pred, gt):
        # Alignment-free stand-in: plain mean joint distance — enough
        # to verify the matching/aggregation logic around it.
        return np.linalg.norm(pred - gt, axis=-1).mean(-1)


def _video(t=10, k=2, swap_from=None):
    """GT centers on distinct paths + a 'result' whose tracks follow
    them exactly; ``swap_from`` swaps the result's tracks from that
    frame on (an identity swap)."""
    rng = np.random.RandomState(0)
    gt_centers = np.zeros((t, k, 2), np.float32)
    for p in range(k):
        gt_centers[:, p, 0] = 60 + 120 * p + np.linspace(0, 12, t)
        gt_centers[:, p, 1] = 100
    joints2d = gt_centers[:, :, None, :] + rng.uniform(
        -1, 1, (t, k, 14, 2)).astype(np.float32)
    gt_j3d = rng.rand(t, k, 24, 3).astype(np.float32)
    joints3d = np.swapaxes(gt_j3d, 0, 1).copy()       # (k, T, 24, 3)
    if swap_from is not None:
        joints2d[swap_from:] = joints2d[swap_from:, ::-1]
        for tt in range(swap_from, t):
            joints3d[:, tt] = joints3d[::-1, tt]
    return (_Res(joints2d, joints3d, np.ones((t, k), bool)),
            gt_centers, gt_j3d)


def test_match_metrics_perfect_tracks():
    res, gc, gj = _video()
    m = tb._match_metrics(res, gc, gj, _Metrics)
    assert m["id_acc"] == 1.0
    assert m["center_err_px"] < 1.0
    assert m["pa_mpjpe_mm"] < 1.0


def test_match_metrics_detects_identity_swap():
    res, gc, gj = _video(t=10, swap_from=5)
    m = tb._match_metrics(res, gc, gj, _Metrics)
    assert m["id_acc"] == 0.5              # half the frames swapped
    assert m["center_err_px"] > 20.0       # swapped frames pay the gap


def test_match_metrics_k3_label_invariance():
    """Relabeling tracks (a global permutation) must not change any
    metric — σ matching absorbs it."""
    res, gc, gj = _video(k=3)
    m1 = tb._match_metrics(res, gc, gj, _Metrics)
    relabel = [2, 0, 1]
    res2 = _Res(res.joints2d[:, relabel],
                res.joints3d[relabel], res.frame_mask[:, relabel])
    m2 = tb._match_metrics(res2, gc, gj, _Metrics)
    assert m1["id_acc"] == m2["id_acc"] == 1.0
    # f32 summation order differs under relabeling — equal to float tol.
    np.testing.assert_allclose(m1["center_err_px"], m2["center_err_px"],
                               rtol=1e-5)
    np.testing.assert_allclose(m1["pa_mpjpe_mm"], m2["pa_mpjpe_mm"],
                               rtol=1e-5)


def test_match_metrics_slack_track_unscored():
    """n_tracks > n_gt (slack proposal slot): the injection σ must pick
    the 3 tracks that follow GT and ignore the spare; metrics equal the
    square case run on just the matching tracks."""
    res, gc, gj = _video(k=3)
    t = res.joints2d.shape[0]
    rng = np.random.RandomState(5)
    spare_j = rng.uniform(300, 360, (t, 1, 14, 2)).astype(np.float32)
    res4 = _Res(np.concatenate([res.joints2d[:, :2], spare_j,
                                res.joints2d[:, 2:]], 1),
                np.concatenate([res.joints3d[:2],
                                rng.rand(1, t, 24, 3).astype(np.float32),
                                res.joints3d[2:]], 0),
                np.ones((t, 4), bool))
    m3 = tb._match_metrics(res, gc, gj, _Metrics)
    m4 = tb._match_metrics(res4, gc, gj, _Metrics)
    assert m4["id_acc"] == m3["id_acc"] == 1.0
    np.testing.assert_allclose(m4["center_err_px"], m3["center_err_px"],
                               rtol=1e-5)
    np.testing.assert_allclose(m4["pa_mpjpe_mm"], m3["pa_mpjpe_mm"],
                               rtol=1e-5)


def test_enterleave_metrics_perfect_and_miscount():
    t = 12
    present = np.zeros((t, 3), np.float32)
    present[:, 0] = 1                       # A always
    present[:6, 1] = 1                      # B first half
    present[8:, 2] = 1                      # C last third
    centers = np.zeros((t, 3, 2), np.float32)
    centers[:, 0] = [80, 100]
    centers[:, 1] = [260, 100]
    centers[:, 2] = [240, 140]
    el = {"present": present, "centers": centers}
    # Tracks: 0 follows A; 1 follows B then C (slot reuse).
    tj = np.zeros((t, 2, 14, 2), np.float32)
    tj[:, 0] = centers[:, 0, None]
    tj[:6, 1] = centers[:6, 1, None]
    tj[6:, 1] = centers[6:, 2, None]
    fmask = np.zeros((t, 2), bool)
    fmask[:, 0] = True
    fmask[:6, 1] = True
    fmask[8:, 1] = True
    res = _Res(tj, None, fmask)
    m = tb._enterleave_metrics(res, el)
    assert m["id_acc"] == 1.0
    assert m["count_acc"] == 1.0
    assert m["ab_c_distinct_tracks"] is True
    assert m["c_track_reuses_b_slot"] is True
    assert m["count_over"] == m["count_under"] == 0.0
    assert m["count_err_transition"] == m["count_err_steady"] == 0.0
    # Presence miscalls hit count_acc but not the exclusive matching.
    res_bad = _Res(tj, None, np.ones((t, 2), bool))
    m2 = tb._enterleave_metrics(res_bad, el)
    assert m2["id_acc"] == 1.0
    assert m2["count_acc"] < 1.0
    # n_gt = 2,2,2,2,2,2,1,1,2,2,2,2 → all-ones fmask overcounts exactly
    # frames 6–7, both within the ±1 transition windows (5→6 and 7→8).
    assert m2["count_over"] == 2 / t and m2["count_under"] == 0.0
    assert m2["count_err_transition"] == 2 / t
    assert m2["count_err_steady"] == 0.0


def test_match_metrics_cover40():
    """cover40 = fraction of frames with a full bijective 40 px
    track→person cover of the FINAL decodes. Perfect tracks cover every
    frame; pushing one track 60 px off its person for half the frames
    drops exactly those frames (the other track cannot cover both)."""
    res, gc, gj = _video(t=10)
    assert tb._match_metrics(res, gc, gj, _Metrics)["cover40"] == 1.0
    j2 = np.asarray(res.joints2d).copy()
    j2[5:, 0] += np.array([60.0, 0.0])
    res2 = _Res(j2, np.asarray(res.joints3d), res.frame_mask)
    assert tb._match_metrics(res2, gc, gj, _Metrics)["cover40"] == 0.5
