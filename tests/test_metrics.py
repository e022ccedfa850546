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
