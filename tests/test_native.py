"""Native C++ letterbox kernel (tpu_pose/native) vs the numpy twin.

The native path must be a drop-in for ops/preprocess.letterbox_image_np's
resample+pad on uint8 frames: same resample plan (it imports the plan
from _resample_weights_np — one convention source), ≤1 uint8 LSB output
difference (float accumulation order), identical affine. SURVEY.md §2
row 17: the reference has no first-party native code; this is the
rebuild's host-side native layer (serving submit-time preprocessing).
"""

import numpy as np
import pytest

from tpu_pose import native
from tpu_pose.ops import preprocess as pre

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def _numpy_letterbox_u8(img, size, fill=128.0):
    """The pure-numpy reference path (native short-circuit bypassed)."""
    h0, w0, c = img.shape
    nh, nw, off_y, off_x = pre._letterbox_geometry(h0, w0, size)
    r = (pre.resize_bilinear_np(img, nh, nw)
         if (nh, nw) != (h0, w0) else np.asarray(img, np.float32))
    if (nh, nw) == (size, size):
        out = r
    else:
        out = np.full((size, size, c), np.float32(fill))
        out[off_y:off_y + nh, off_x:off_x + nw] = r
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [
    (720, 540),    # downscale, portrait
    (480, 640),    # downscale, landscape
    (100, 200),    # mild downscale wide
    (64, 64),      # upscale square (no pad)
    (800, 100),    # extreme aspect: thin vertical strip
    (400, 368),    # one axis lands exactly at network size after scaling
])
def test_native_matches_numpy_within_1lsb(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    img = rng.randint(0, 256, shape + (3,)).astype(np.uint8)
    out = native.letterbox_u8(img, 368)
    assert out is not None and out.shape == (368, 368, 3)
    ref = _numpy_letterbox_u8(img, 368)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_letterbox_image_np_routes_uint8_through_native():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (480, 640, 3)).astype(np.uint8)
    out, aff = pre.letterbox_image_np(img, 368)
    assert out.dtype == np.uint8
    np.testing.assert_allclose(aff, pre.letterbox_affine(480, 640, 368))
    ref = _numpy_letterbox_u8(img, 368)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_identity_and_float_inputs_fall_back():
    rng = np.random.RandomState(1)
    # Identity geometry: native declines (pad-only/no-op path).
    img = rng.randint(0, 256, (368, 368, 3)).astype(np.uint8)
    assert native.letterbox_u8(img, 368) is None
    # Float input: native declines, letterbox_image_np still works.
    imgf = rng.rand(100, 150, 3).astype(np.float32) * 255
    out, _ = pre.letterbox_image_np(imgf, 64)
    assert out.dtype == np.float32 and out.shape == (64, 64, 3)


def test_fill_value_in_pad_region():
    img = np.zeros((100, 400, 3), np.uint8)  # wide → top/bottom pad
    out = native.letterbox_u8(img, 368, fill=77)
    assert out is not None
    nh, nw, off_y, off_x = pre._letterbox_geometry(100, 400, 368)
    assert (out[:off_y] == 77).all() and (out[off_y + nh:] == 77).all()


def test_concurrent_clients_threadsafe():
    from concurrent.futures import ThreadPoolExecutor
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (480, 640, 3)).astype(np.uint8)
    expect = native.letterbox_u8(img, 368)
    with ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(lambda _: native.letterbox_u8(img, 368),
                             range(16)))
    for o in outs:
        np.testing.assert_array_equal(o, expect)
