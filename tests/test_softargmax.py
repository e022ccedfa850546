"""Soft-argmax decode tests (SURVEY.md §4.1): delta-peaked heatmap → exact
coordinate; β→∞ → hard argmax; differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pose.ops import preprocess as pre
from tpu_pose.ops.softargmax import hard_argmax, soft_argmax


def _delta_heatmaps(h, w, peaks):
    """(h, w, len(peaks)+1) maps with a 1.0 delta at each (row, col)."""
    maps = np.zeros((h, w, len(peaks) + 1), np.float32)
    for c, (i, j) in enumerate(peaks):
        maps[i, j, c] = 1.0
    return jnp.asarray(maps)


def test_delta_peak_exact():
    hm = _delta_heatmaps(46, 46, [(10, 20), (45, 0)])
    joints, conf = soft_argmax(hm, beta=200.0, stride=8)
    np.testing.assert_allclose(
        np.asarray(joints), [[160.0, 80.0], [0.0, 360.0]], atol=1e-2)
    np.testing.assert_allclose(np.asarray(conf), [1.0, 1.0], atol=1e-5)


def test_matches_hard_argmax_high_beta():
    rng = np.random.RandomState(0)
    hm = rng.rand(4, 46, 46, 15).astype(np.float32)
    # Real belief maps have a clear peak; give each channel a clear peak
    # (uniform-random maps have ~1e-5 top-2 gaps no finite beta separates).
    for b in range(4):
        for c in range(15):
            i, j = rng.randint(0, 46, 2)
            hm[b, i, j, c] += 2.0
    hm = jnp.asarray(hm)
    soft_j, _ = soft_argmax(hm, beta=5000.0, stride=8)
    hard_j, _ = hard_argmax(hm, stride=8)
    np.testing.assert_allclose(np.asarray(soft_j), np.asarray(hard_j),
                               atol=0.5)


def test_subpixel_interpolation():
    """Two equal adjacent peaks → soft-argmax lands midway (sub-cell
    precision hard argmax can't give)."""
    maps = np.zeros((46, 46, 2), np.float32)
    maps[10, 20, 0] = 1.0
    maps[10, 21, 0] = 1.0
    joints, _ = soft_argmax(jnp.asarray(maps), beta=50.0, stride=8)
    np.testing.assert_allclose(np.asarray(joints[0]), [164.0, 80.0],
                               atol=0.1)


def test_gaussian_roundtrip():
    """paint_heatmaps(joints) → soft_argmax recovers the joints (the
    self-consistency contract between training targets and decode)."""
    joints_px = jnp.asarray([[100.0, 200.0], [48.0, 56.0], [300.0, 12.0]])
    hm = pre.paint_heatmaps(joints_px, size=368, stride=8, sigma_px=8.0,
                            num_channels=4)
    assert hm.shape == (46, 46, 4)
    decoded, conf = soft_argmax(hm, beta=30.0, stride=8)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(joints_px),
                               atol=2.0)
    assert float(conf.min()) > 0.7  # off-grid peak: nearest cell 4px away


def test_differentiable():
    rng = np.random.RandomState(1)
    hm = jnp.asarray(rng.rand(46, 46, 3), jnp.float32)

    def loss(h):
        j, _ = soft_argmax(h, beta=30.0)
        return jnp.sum(j ** 2)

    g = jax.grad(loss)(hm)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_batched_leading_axes():
    rng = np.random.RandomState(2)
    hm = jnp.asarray(rng.rand(2, 3, 46, 46, 15), jnp.float32)
    j, c = soft_argmax(hm)
    assert j.shape == (2, 3, 14, 2)
    assert c.shape == (2, 3, 14)
