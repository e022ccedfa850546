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
import numpy as np


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


def preprocess(img: jnp.ndarray, size: int = 368,
               letterbox: bool = False, fill: float = 128.0) -> jnp.ndarray:
    """Full input pipeline for one image: resize(/pad) → normalize.

    ``letterbox=False`` matches the simple CPM pipelines: direct square
    resize (person assumed centered — SURVEY.md §2 row 2 documents this as
    an explicit contract) — which DISTORTS non-square inputs.

    ``letterbox=True`` is the reference's "resize → pad" contract
    (SURVEY.md §2 row 1, §3.1): aspect-preserving scale-to-fit plus
    centered mid-gray padding; use :func:`letterbox_affine` /
    :func:`joints_to_source_frame` to map decoded joints back to source
    pixels.
    """
    if letterbox:
        return normalize_image(letterbox_image(img, size, fill=fill))
    return normalize_image(resize_image(img, size))


# -- aspect-preserving letterbox (resize → pad) -----------------------------

def _letterbox_geometry(h0: int, w0: int, size: int):
    """(new_h, new_w, off_y, off_x) for scale-to-fit + centered pad.
    Pure python on static shapes — resolved at trace time."""
    scale = size / max(h0, w0)
    nh = max(1, min(size, round(h0 * scale)))
    nw = max(1, min(size, round(w0 * scale)))
    return nh, nw, (size - nh) // 2, (size - nw) // 2


def letterbox_affine(h0: int, w0: int, size: int) -> np.ndarray:
    """Affine mapping source pixels → network pixels for the letterbox:

        net = src * scale + offset,   affine = [sx, sy, ox, oy].

    The offsets fold in the half-pixel-center convention of the bilinear
    resize (``jax.image.resize(method='linear')`` places output pixel i at
    input coordinate (i+0.5)/s − 0.5), so image CONTENT — not just the
    frame corners — round-trips source→net→source to sub-pixel accuracy.
    A trace-time constant: depends only on static shapes.
    """
    nh, nw, off_y, off_x = _letterbox_geometry(h0, w0, size)
    sx, sy = nw / w0, nh / h0
    return np.array([sx, sy,
                     off_x + 0.5 * sx - 0.5,
                     off_y + 0.5 * sy - 0.5], np.float32)


def letterbox_image(img: jnp.ndarray, size: int,
                    fill: float = 128.0) -> jnp.ndarray:
    """Aspect-preserving resize + centered constant pad → (size, size, C)
    float32 in [0, 255]. Traced; static shapes only (vmap-able)."""
    h0, w0, c = img.shape
    nh, nw, off_y, off_x = _letterbox_geometry(h0, w0, size)
    r = img.astype(jnp.float32)
    if (nh, nw) != (h0, w0):
        r = jax.image.resize(r, (nh, nw, c), method="linear")
    if (nh, nw) == (size, size):
        return r
    out = jnp.full((size, size, c), jnp.float32(fill))
    return jax.lax.dynamic_update_slice(out, r, (off_y, off_x, 0))


def _resample_weights_np(n_in: int, n_out: int):
    """Separable triangle-kernel resampling plan (idx (n_out, k) int,
    w (n_out, k) f32) matching ``jax.image.resize(method='linear')``
    semantics: half-pixel-center sampling, anti-aliased (kernel support
    widens by 1/scale) when downscaling, weights renormalized at the
    borders. Host-side numpy twin for the serving front end."""
    scale = n_out / n_in
    support = max(1.0, 1.0 / scale)           # triangle half-width (input px)
    k = int(np.ceil(2.0 * support)) + 1
    coords = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
    left = np.floor(coords - support).astype(np.int64) + 1
    idx = left[:, None] + np.arange(k)[None, :]
    dist = (idx - coords[:, None]) * min(scale, 1.0)
    w = np.clip(1.0 - np.abs(dist), 0.0, None)
    valid = (idx >= 0) & (idx < n_in)
    w = np.where(valid, w, 0.0)
    idx = np.clip(idx, 0, n_in - 1)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return idx, w.astype(np.float32)


def resize_bilinear_np(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """(H, W, C) → (nh, nw, C) float32, triangle-kernel resampling with
    the same conventions as the in-graph ``jax.image.resize``. Vectorized
    gather+weight (O(k) per output pixel) — fast enough for a serving
    front end on host."""
    x = np.asarray(img, np.float32)
    iy, wy = _resample_weights_np(x.shape[0], nh)
    ix, wx = _resample_weights_np(x.shape[1], nw)
    x = np.einsum("okwc,ok->owc", x[iy], wy)       # rows
    x = np.einsum("hokc,ok->hoc", x[:, ix], wx)    # cols
    return x


def letterbox_image_np(img: np.ndarray, size: int, fill: float = 128.0):
    """Host-numpy twin of :func:`letterbox_image` for per-request serving
    preprocessing (mixed-resolution traffic letterboxes at submit time —
    one static batch shape on device). Returns ``(net_image, affine)``
    with ``net_image`` (size, size, C) in the INPUT's dtype family (uint8
    stays uint8 — 4× smaller on a bandwidth-limited host→device link) and
    ``affine`` the :func:`letterbox_affine` source→network mapping.

    uint8 frames route through the native C++ kernel when available
    (tpu_pose/native — same resample plan, ≤1 LSB vs this path, ~15×
    faster and GIL-free so serving client threads overlap); otherwise
    this pure-numpy twin runs."""
    img = np.asarray(img)
    h0, w0, c = img.shape
    affine = letterbox_affine(h0, w0, size)
    if img.dtype == np.uint8:
        from tpu_pose import native
        out = native.letterbox_u8(img, size, fill=int(fill))
        if out is not None:
            return out, affine
    nh, nw, off_y, off_x = _letterbox_geometry(h0, w0, size)
    r = (resize_bilinear_np(img, nh, nw) if (nh, nw) != (h0, w0)
         else np.asarray(img, np.float32))
    if (nh, nw) == (size, size):
        out = r
    else:
        out = np.full((size, size, c), np.float32(fill))
        out[off_y:off_y + nh, off_x:off_x + nw] = r
    if img.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out, affine


def joints_to_source_frame(joints_net: jnp.ndarray,
                           affine) -> jnp.ndarray:
    """Map (..., P, 2) network-frame pixel joints back to source-image
    pixels through a :func:`letterbox_affine` (inverse affine)."""
    a = jnp.asarray(affine, jnp.float32)
    return (joints_net - a[..., 2:4]) / a[..., 0:2]


def joints_to_network_frame(joints_src: jnp.ndarray,
                            affine) -> jnp.ndarray:
    """Map source-image pixel joints into the letterboxed network frame
    (forward affine) — e.g. for painting training heatmaps."""
    a = jnp.asarray(affine, jnp.float32)
    return joints_src * a[..., 0:2] + a[..., 2:4]


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
