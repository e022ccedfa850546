"""Metrics: MPJPE / PA-MPJPE golden behavior (SURVEY.md §2 row 12)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pose.utils import metrics


def test_mpjpe_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 24, 3))
    assert np.allclose(np.asarray(metrics.mpjpe(x, x)), 0.0)


def test_mpjpe_known_offset():
    x = jnp.zeros((1, 4, 3))
    y = x.at[..., 0].add(0.05)
    # root-aligned: constant offset cancels
    assert np.allclose(np.asarray(metrics.mpjpe(y, x)), 0.0, atol=1e-7)
    assert np.allclose(
        np.asarray(metrics.mpjpe(y, x, align_root=False)), 0.05)


def test_pa_mpjpe_invariant_to_similarity_transform():
    rng = np.random.RandomState(1)
    gt = rng.rand(14, 3)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    q = q * np.linalg.det(q)  # proper rotation
    pred = 2.3 * gt @ q.T + np.array([0.5, -1.0, 2.0])
    err = float(metrics.pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    assert err < 1e-5, err


def test_pa_mpjpe_np_matches_jnp():
    rng = np.random.RandomState(2)
    gt = rng.rand(4, 14, 3).astype(np.float32)
    pred = gt + rng.randn(4, 14, 3).astype(np.float32) * 0.05
    ref = np.asarray(jax.vmap(metrics.pa_mpjpe)(
        jnp.asarray(pred), jnp.asarray(gt)))
    host = metrics.pa_mpjpe_np(pred, gt)
    np.testing.assert_allclose(host, ref, rtol=1e-4)


def test_pck():
    gt = jnp.zeros((1, 4, 2))
    pred = jnp.asarray(np.array(
        [[[0.0, 0.0], [1.0, 0.0], [3.0, 0.0], [10.0, 0.0]]]))
    assert np.allclose(np.asarray(metrics.pck(pred, gt, 2.0)), 0.5)


def test_scaled_mpjpe_scale_invariant():
    """Uniform pred scaling is absorbed; pure shape error is not."""
    rng = np.random.RandomState(3)
    gt = jnp.asarray(rng.rand(2, 14, 3))
    assert np.allclose(np.asarray(metrics.scaled_mpjpe(3.0 * gt, gt)), 0.0,
                       atol=1e-6)
    pred = gt + 0.05 * rng.randn(2, 14, 3)
    assert np.all(np.asarray(metrics.scaled_mpjpe(pred, gt)) > 0.0)


def test_p1_keeps_scale_error_scaled_does_not():
    """The protocol distinction that round 1 blurred: Protocol-1 MPJPE
    must PENALIZE a global scale error; scaled-MPJPE must not."""
    rng = np.random.RandomState(4)
    gt = jnp.asarray(rng.rand(1, 14, 3))
    pred = 1.5 * (gt - gt[..., :1, :]) + gt[..., :1, :]  # root-anchored ×1.5
    p1 = float(metrics.mpjpe(pred, gt, align_root=True, root_index=0)[0])
    sc = float(metrics.scaled_mpjpe(pred, gt)[0])
    assert p1 > 0.05
    assert sc < 1e-6


def test_pckh_head_normalized():
    """Joints within 0.5×head-segment count; exactly at the boundary
    counts; beyond does not."""
    # GT: head at (0,0), neck at (0,10) → head segment = 10 px.
    gt = jnp.asarray(
        [[[0.0, 0.0], [0.0, 10.0], [20.0, 0.0], [40.0, 0.0]]])
    pred = jnp.asarray(
        [[[3.0, 0.0],      # 3 px ≤ 5 px: correct
          [0.0, 10.0],     # exact: correct
          [20.0, 5.0],     # 5 px ≤ 5 px: correct (boundary)
          [46.0, 0.0]]])   # 6 px > 5 px: wrong
    assert np.allclose(np.asarray(metrics.pckh(pred, gt, 0.5)), 0.75)


def test_host_metric_twins_match_jnp():
    """The numpy twins the streaming evaluator uses (mpjpe_np,
    scaled_mpjpe_np, pckh_np — parallel/eval.py hot path) must agree
    with the jnp definitions."""
    rng = np.random.RandomState(3)
    pred = rng.randn(6, 24, 3).astype(np.float32)
    gt = (pred + rng.randn(6, 24, 3).astype(np.float32) * 0.1)
    np.testing.assert_allclose(
        metrics.mpjpe_np(pred, gt),
        np.asarray(metrics.mpjpe(jnp.asarray(pred), jnp.asarray(gt))),
        rtol=1e-5)
    np.testing.assert_allclose(
        metrics.scaled_mpjpe_np(pred, gt),
        np.asarray(metrics.scaled_mpjpe(jnp.asarray(pred),
                                        jnp.asarray(gt))), rtol=1e-5)
    p2 = rng.rand(6, 14, 2).astype(np.float32) * 300
    g2 = p2 + rng.randn(6, 14, 2).astype(np.float32) * 20
    np.testing.assert_allclose(
        metrics.pckh_np(p2, g2, 0.5),
        np.asarray(metrics.pckh(jnp.asarray(p2), jnp.asarray(g2), 0.5)),
        rtol=1e-6)


def test_oks_identity_known_value_and_mask():
    """OKS = 1 at pred==gt; a single displaced joint contributes its
    hand-computed exp term; unlabeled joints are excluded by the mask;
    an all-unlabeled sample scores 0 (COCO δ(v>0) gate)."""
    from tpu_pose.models import joints as joints_lib
    rng = np.random.RandomState(3)
    gt = rng.rand(2, 14, 2) * 100
    area = np.array([80.0 * 180.0, 60.0 * 120.0])
    np.testing.assert_allclose(metrics.oks_np(gt, gt, area), 1.0)

    pred = gt.copy()
    d = 7.0
    pred[0, 4, 0] += d                      # displace r_wrist, sample 0
    kappa = 2.0 * joints_lib.CPM_OKS_SIGMA[4]
    expect = (13.0 + np.exp(-d * d / (2 * area[0] * kappa ** 2))) / 14.0
    got = metrics.oks_np(pred, gt, area)
    np.testing.assert_allclose(got[0], expect, rtol=1e-6)
    np.testing.assert_allclose(got[1], 1.0)

    # Masking the displaced joint out restores OKS 1; masking everything
    # scores 0, not NaN.
    mask = np.ones((2, 14))
    mask[0, 4] = 0.0
    np.testing.assert_allclose(metrics.oks_np(pred, gt, area, mask=mask),
                               1.0)
    assert metrics.oks_np(pred, gt, area,
                          mask=np.zeros((2, 14)))[0] == 0.0


def test_oks_larger_person_more_tolerant():
    """The same pixel error scores higher OKS on a larger person — the
    area normalization that distinguishes OKS from plain PCK."""
    gt = np.tile(np.linspace(0, 100, 28).reshape(14, 2), (2, 1, 1))
    pred = gt + 5.0
    area = np.array([1000.0, 16000.0])
    oks = metrics.oks_np(pred, gt, area)
    assert oks[1] > oks[0]


def test_keypoint_bbox_area_fallback():
    """Fallback area = 0.53 × labeled-keypoint bbox; unlabeled joints do
    not inflate the box."""
    gt = np.zeros((1, 14, 2))
    gt[0, :, 0] = np.linspace(10, 60, 14)    # width 50
    gt[0, :, 1] = np.linspace(20, 120, 14)   # height 100
    area = metrics.keypoint_bbox_area_np(gt)
    np.testing.assert_allclose(area, 0.53 * 50 * 100, rtol=1e-6)
    # Outlier joint masked out → box shrinks.
    gt2 = gt.copy()
    gt2[0, 13] = (1000.0, 1000.0)
    mask = np.ones((1, 14))
    mask[0, 13] = 0
    np.testing.assert_allclose(
        metrics.keypoint_bbox_area_np(gt2, mask),
        0.53 * np.ptp(gt[0, :13, 0]) * np.ptp(gt[0, :13, 1]), rtol=1e-6)


def test_pve_np_alignment_conventions():
    import pytest
    rng = np.random.RandomState(7)
    gt = rng.rand(3, 50, 3)
    # Pure translation: centroid alignment (default) removes it, raw
    # distances keep it.
    pred = gt + np.array([0.3, -0.1, 0.9])
    np.testing.assert_allclose(metrics.pve_np(pred, gt), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        metrics.pve_np(pred, gt, align="none"),
        np.full(3, np.linalg.norm([0.3, -0.1, 0.9])), rtol=1e-12)
    # Known per-vertex offset survives centroid alignment when it is
    # zero-mean across vertices.
    off = rng.randn(50, 3)
    off -= off.mean(0)
    pred2 = gt + off
    np.testing.assert_allclose(
        metrics.pve_np(pred2, gt),
        np.full(3, np.linalg.norm(off, axis=-1).mean()), rtol=1e-12)
    with pytest.raises(ValueError, match="align"):
        metrics.pve_np(pred, gt, align="procrustes")


def test_pa_pve_invariant_to_similarity_transform():
    rng = np.random.RandomState(8)
    gt = rng.rand(2, 100, 3)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    q = q * np.linalg.det(q)
    pred = 1.7 * gt @ q.T + np.array([1.0, 2.0, -0.5])
    assert (metrics.pa_pve_np(pred, gt) < 1e-9).all()
    # A real shape difference is NOT removed by the alignment.
    noisy = gt + rng.randn(*gt.shape) * 0.05
    assert (metrics.pa_pve_np(noisy, gt) > 0.01).all()
