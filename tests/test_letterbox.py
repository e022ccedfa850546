"""Letterbox preprocessing tests (SURVEY.md §2 row 1 / §3.1: the
reference's "resize → pad" contract): aspect preservation, content-level
round-trip accuracy, and threading through the 2D/fused entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pose.models import cpm
from tpu_pose.ops import preprocess as pre
from tpu_pose.utils.config import CPMConfig

SMALL = CPMConfig(input_size=64, features=16, stage1_head_width=32,
                  refine_width=16, num_stages=3)


def _blob_image(h, w, cx, cy, sigma=6.0):
    """Bright Gaussian blob at (cx, cy) on mid-gray — a localizable
    feature whose position survives resampling."""
    ys = np.arange(h, dtype=np.float32)[:, None]
    xs = np.arange(w, dtype=np.float32)[None, :]
    g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))
    img = 128.0 + 120.0 * g
    return np.repeat(img[..., None], 3, axis=-1).astype(np.float32)


def _soft_peak(img2d):
    """Sub-pixel peak of a single-channel image via intensity centroid of
    the top region (matches how a heatmap decode localizes content)."""
    a = np.asarray(img2d, np.float64)
    a = np.maximum(a - np.percentile(a, 99.0), 0.0)
    ys, xs = np.mgrid[: a.shape[0], : a.shape[1]]
    m = a.sum() + 1e-12
    return float((a * xs).sum() / m), float((a * ys).sum() / m)


def test_affine_inverse_exact():
    aff = pre.letterbox_affine(720, 1280, 368)
    src = jnp.asarray(np.random.RandomState(0).rand(7, 2) * 1000,
                      jnp.float32)
    net = pre.joints_to_network_frame(src, aff)
    back = pre.joints_to_source_frame(net, aff)
    np.testing.assert_allclose(np.asarray(back), np.asarray(src),
                               atol=1e-4)


def test_aspect_preserved():
    """Equal x/y scale: non-square inputs must not be distorted."""
    for h0, w0 in [(720, 1280), (1280, 720), (500, 500), (368, 368)]:
        aff = pre.letterbox_affine(h0, w0, 368)
        assert abs(aff[0] - aff[1]) / max(aff[0], aff[1]) < 0.01, (h0, w0)


def test_content_roundtrip_1280x720_within_1px():
    """VERDICT round-2 item 2's done-criterion: a 1280×720 input
    round-trips content positions to source coordinates within 1 px."""
    size = 368
    for cx, cy in [(640.0, 360.0), (300.0, 500.0), (1100.0, 150.0)]:
        img = _blob_image(720, 1280, cx, cy, sigma=10.0)
        lb = np.asarray(pre.letterbox_image(jnp.asarray(img), size))
        # Pad region is exactly mid-gray fill.
        assert np.allclose(lb[0, :, 0], 128.0, atol=1e-3)
        px, py = _soft_peak(lb[..., 0])
        aff = pre.letterbox_affine(720, 1280, size)
        back = pre.joints_to_source_frame(
            jnp.asarray([[px, py]], jnp.float32), aff)
        err = np.abs(np.asarray(back)[0] - np.array([cx, cy]))
        assert err.max() < 1.0, (cx, cy, np.asarray(back)[0])


def test_letterbox_noop_on_square_network_size():
    img = _blob_image(64, 64, 20.0, 40.0)
    lb = np.asarray(pre.letterbox_image(jnp.asarray(img), 64))
    np.testing.assert_allclose(lb, img, atol=1e-4)
    aff = pre.letterbox_affine(64, 64, 64)
    np.testing.assert_allclose(np.asarray(aff), [1.0, 1.0, 0.0, 0.0],
                               atol=1e-6)


def test_estimate_2d_source_frame_consistency():
    """source_frame=True output == inverse-affine of the network-frame
    output, on a non-square batch."""
    params = cpm.init_cpm_params(jax.random.PRNGKey(0), SMALL)
    imgs = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (2, 48, 96, 3)),
        jnp.uint8)
    _, j_net, c1 = cpm.estimate_2d_from_images(
        params, imgs, SMALL, letterbox=True, source_frame=False)
    _, j_src, c2 = cpm.estimate_2d_from_images(
        params, imgs, SMALL, letterbox=True, source_frame=True)
    aff = pre.letterbox_affine(48, 96, SMALL.input_size)
    np.testing.assert_allclose(
        np.asarray(pre.joints_to_source_frame(j_net, aff)),
        np.asarray(j_src), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    # Source-frame joints land inside the source image bounds (the
    # network never peaks inside the pad margin on real-ish inputs is NOT
    # guaranteed with random weights, so allow the pad reach).
    assert np.isfinite(np.asarray(j_src)).all()


def test_fused_api_letterbox():
    """The fused path accepts non-square inputs with letterbox=True and
    returns source-frame joints."""
    from tpu_pose.api import PoseEstimator
    from tpu_pose.utils.config import FitConfig, StageConfig

    fit_cfg = FitConfig(
        stages=(StageConfig(iters=5, lr=0.05),), img_size=64)
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=fit_cfg, letterbox=True)
    imgs = jnp.asarray(
        np.random.RandomState(2).randint(0, 255, (2, 40, 80, 3)),
        jnp.uint8)
    res = est.estimate_and_fit(imgs)
    assert res.joints2d.shape == (2, SMALL.num_joints, 2)
    assert np.isfinite(np.asarray(res.joints2d)).all()
    assert np.isfinite(np.asarray(res.vertices)).all()
    # estimate_2d honors the constructor default and the override.
    r_lb = est.estimate_2d(imgs)
    r_sq = est.estimate_2d(imgs, letterbox=False)
    assert not np.allclose(np.asarray(r_lb.joints2d),
                           np.asarray(r_sq.joints2d))


def test_stream_and_multi_api_letterbox_consistency():
    """The streaming-video and multi-person paths must follow the SAME
    letterbox contract as the fused path: letterboxed preprocessing,
    source-frame joints (the r2 review found the stream path applying
    the letterbox inverse to square-resized decodes)."""
    from tpu_pose.api import PoseEstimator
    from tpu_pose.utils.config import FitConfig, StageConfig

    fit_cfg = FitConfig(
        stages=(StageConfig(iters=5, lr=0.05),), img_size=64)
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=SMALL, fit_cfg=fit_cfg, letterbox=True)
    imgs = jnp.asarray(
        np.random.RandomState(2).randint(0, 255, (3, 40, 80, 3)),
        jnp.uint8)

    fused = est.estimate_and_fit(imgs)
    stream = est.estimate_and_fit_video_stream(imgs, chunk=2)
    # Same 2D front end (restarts=1 default on both) → the decoded
    # source-frame joints must MATCH the fused path's.
    np.testing.assert_allclose(np.asarray(stream.joints2d),
                               np.asarray(fused.joints2d), atol=1e-3)

    multi = est.estimate_and_fit_multi(imgs, max_people=2)
    # Multi joints are source-frame too: hypothesis coordinates live in
    # the 80-px-wide source raster, not the 64-px network frame.
    j = np.asarray(multi.joints2d)
    assert np.isfinite(j).all()
    assert j[..., 0].max() > 64.0 - 1e-3  # beyond network width ⇒ source


def test_host_letterbox_twin_matches_in_graph():
    """ops/preprocess.letterbox_image_np (the serving submit-time path)
    must match the in-graph letterbox to uint8 rounding, and return the
    same affine letterbox_affine computes."""
    from tpu_pose.ops import preprocess as pre
    rng = np.random.RandomState(0)
    for (h, w) in [(480, 640), (100, 100), (64, 64), (37, 91)]:
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        host, aff = pre.letterbox_image_np(img, 64)
        assert host.dtype == np.uint8
        dev = np.asarray(pre.letterbox_image(jnp.asarray(img), 64))
        assert np.abs(host.astype(np.float32) - dev).max() <= 0.501
        np.testing.assert_allclose(aff, pre.letterbox_affine(h, w, 64))
    # float input stays float (no quantization).
    host_f, _ = pre.letterbox_image_np(
        rng.rand(30, 50, 3).astype(np.float32) * 255, 64)
    assert host_f.dtype == np.float32
