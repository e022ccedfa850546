"""In-graph image preprocessing (SURVEY.md §2 rows 1–2, layer L2).

The reference preprocesses on host with cv2/numpy (resize → pad →
x/256 − 0.5 → gaussian center map) and feeds the result through feed_dict.
Here the same math is traced into the device graph so raw bytes → joints
runs on-TPU in one program (BASELINE north-star: "preprocessing fuses into
the device graph").

All functions are single-image; ``vmap``/leading-batch friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """CPM input normalization: x/256 − 0.5 (Caffe-port convention [K],
    SURVEY.md §2 row 1). Accepts uint8 or float32 in [0, 255]."""
    return img.astype(jnp.float32) / 256.0 - 0.5


def resize_image(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize to (size, size, C), traced (jax.image.resize).
    No-op (cast only) when the image is already the target size — saves a
    full gather/interp pass in the common pre-cropped pipeline."""
    if img.shape[0] == size and img.shape[1] == size:
        return img.astype(jnp.float32)
    return jax.image.resize(
        img.astype(jnp.float32), (size, size, img.shape[-1]),
        method="linear")


def preprocess(img: jnp.ndarray, size: int = 368) -> jnp.ndarray:
    """Full input pipeline for one image: resize → normalize.

    The v0 contract matches the simple CPM pipelines: direct resize to the
    square network input (person assumed centered — SURVEY.md §2 row 2
    documents this as an explicit contract).
    """
    return normalize_image(resize_image(img, size))


def gaussian_center_map(size: int = 368, sigma: float = 21.0,
                        center: jnp.ndarray | None = None) -> jnp.ndarray:
    """(size, size, 1) Gaussian centered at ``center`` (default: image
    center) — the CPM person-centering hint (SURVEY.md §2 row 1)."""
    if center is None:
        center = jnp.array([(size - 1) / 2.0, (size - 1) / 2.0])
    ys = jnp.arange(size, dtype=jnp.float32)
    xs = jnp.arange(size, dtype=jnp.float32)
    dy = (ys - center[1])[:, None]
    dx = (xs - center[0])[None, :]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    return g[..., None]


def downsample_center_map(cmap: jnp.ndarray, stride: int = 8) -> jnp.ndarray:
    """Average-pool the full-res center map to belief-map resolution
    (the Caffe model's ``pool_center_lower`` 9×9/stride-8 avg pool).
    Accepts (H, W, 1) or batched (..., H, W, 1)."""
    lead = cmap.ndim - 3
    window = (1,) * lead + (9, 9, 1)
    strides = (1,) * lead + (stride, stride, 1)
    return jax.lax.reduce_window(
        cmap, 0.0, jax.lax.add,
        window_dimensions=window,
        window_strides=strides,
        padding="SAME") / 81.0


def paint_heatmaps(joints_px: jnp.ndarray, size: int, stride: int,
                   sigma_px: float, num_channels: int) -> jnp.ndarray:
    """Ground-truth belief maps from joint pixels (training/tests): one
    Gaussian per part at heatmap resolution, plus a background channel
    1 − max_parts (CPM training convention).

    joints_px: (P, 2) in input-pixel coords. Returns (H, H, P+1)."""
    hm = size // stride
    ys = jnp.arange(hm, dtype=jnp.float32) * stride
    xs = jnp.arange(hm, dtype=jnp.float32) * stride
    dy = ys[:, None, None] - joints_px[None, None, :, 1]   # (hm,1,P)
    dx = xs[None, :, None] - joints_px[None, None, :, 0]   # broadcast
    d2 = dx * dx + dy * dy
    parts = jnp.exp(-d2 / (2.0 * sigma_px * sigma_px))      # (hm, hm, P)
    bg = 1.0 - jnp.max(parts, axis=-1, keepdims=True)
    pad = num_channels - joints_px.shape[0] - 1
    if pad > 0:
        parts = jnp.concatenate(
            [parts, jnp.zeros((hm, hm, pad), parts.dtype)], axis=-1)
    return jnp.concatenate([parts, bg], axis=-1)
