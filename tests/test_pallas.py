"""Pallas kernels vs XLA reference implementations (interpret mode on
CPU; compiled path exercised on TPU by bench/verify runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.ops import pallas_kernels, softargmax


@pytest.fixture(scope="module")
def heatmaps():
    rng = np.random.RandomState(0)
    hm = rng.rand(3, 46, 46, 15).astype(np.float32)
    # plant distinct peaks so the decode is well-conditioned
    for b in range(3):
        for j in range(14):
            hm[b, (7 * b + j) % 46, (3 * j + 5) % 46, j] = 3.0
    return jnp.asarray(hm)


def test_soft_argmax_pallas_matches_xla(heatmaps):
    j_ref, c_ref = softargmax.soft_argmax(heatmaps, beta=50.0, stride=8)
    j_pl, c_pl = pallas_kernels.soft_argmax_pallas(
        heatmaps, beta=50.0, stride=8, interpret=True)
    np.testing.assert_allclose(np.asarray(j_pl), np.asarray(j_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-6)


def test_soft_argmax_pallas_delta_peak():
    """Delta-peaked map decodes to the exact peak coordinate (the §4.1
    golden-value contract, on the Pallas path)."""
    hm = np.zeros((1, 46, 46, 15), np.float32)
    hm[0, 20, 33, 0] = 10.0
    j, c = pallas_kernels.soft_argmax_pallas(
        jnp.asarray(hm), beta=100.0, stride=8, interpret=True)
    assert np.allclose(np.asarray(j)[0, 0], [33 * 8, 20 * 8], atol=1e-3)
    assert np.allclose(np.asarray(c)[0, 0], 10.0)


def test_soft_argmax_pallas_odd_batch(heatmaps):
    """Row padding: batch sizes not divisible by the row tile."""
    hm = heatmaps[:1]
    j_ref, _ = softargmax.soft_argmax(hm, beta=50.0, stride=8)
    j_pl, _ = pallas_kernels.soft_argmax_pallas(
        hm, beta=50.0, stride=8, interpret=True)
    np.testing.assert_allclose(np.asarray(j_pl), np.asarray(j_ref),
                               rtol=1e-5, atol=1e-4)


def test_quantize_act_pallas_matches_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 46, 46, 32).astype(np.float32) * 3.0)
    q_pl, s_pl = pallas_kernels.quantize_act_pallas(x, interpret=True)
    s_ref = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    q_ref = jnp.clip(jnp.round(x / s_ref), -127, 127).astype(jnp.int8)
    assert float(s_pl) == pytest.approx(float(s_ref))
    np.testing.assert_array_equal(np.asarray(q_pl), np.asarray(q_ref))


def test_quantize_act_pallas_nonaligned_size():
    x = jnp.asarray(np.random.RandomState(2).randn(7, 13).astype(np.float32))
    q, s = pallas_kernels.quantize_act_pallas(x, interpret=True)
    assert q.shape == x.shape and q.dtype == jnp.int8
