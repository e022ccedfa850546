"""Heatmap → joint decoding (SURVEY.md §2 row 4).

The reference decodes with a host-side hard argmax after ``sess.run``.
TPU-native redesign: a *soft-argmax* (differentiable spatial expectation
over softmax(β·heatmap), per the soft-argmax literature — PAPERS.md
arXiv:1710.02322) fused into the inference graph, so decode costs one
fused reduction instead of a host round-trip. Hard argmax is kept for
bit-parity checks against the reference's decode.

Coordinate convention: heatmap cell (row i, col j) ↦ input pixel
(x, y) = (j·stride, i·stride) — the CPM Caffe decode convention; the
soft variant adds sub-cell precision on top.
"""

from __future__ import annotations

import jax.numpy as jnp


def soft_argmax(heatmaps: jnp.ndarray, beta: float = 100.0,
                stride: int = 8):
    """Differentiable decode for a stack of belief maps.

    Args:
      heatmaps: (..., H, W, C) belief maps (any number of leading axes);
        the LAST channel is the CPM background map and is excluded.
      beta: softmax temperature; β→∞ recovers hard argmax.
      stride: heatmap→input-pixel scale.

    Returns:
      joints_px: (..., C-1, 2) (x, y) input-pixel coordinates.
      conf:      (..., C-1) per-part confidence = max belief value.
    """
    parts = heatmaps[..., :-1]                     # drop background
    *lead, h, w, p = parts.shape
    flat = parts.reshape(*lead, h * w, p)
    # Stable softmax over the spatial axis.
    m = jnp.max(flat, axis=-2, keepdims=True)
    e = jnp.exp(beta * (flat - m))
    z = jnp.sum(e, axis=-2, keepdims=True)
    prob = (e / z).reshape(*lead, h, w, p)

    ys = jnp.arange(h, dtype=jnp.float32) * stride
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    ey = jnp.einsum("...hwp,h->...p", prob, ys)
    ex = jnp.einsum("...hwp,w->...p", prob, xs)
    joints = jnp.stack([ex, ey], axis=-1)
    conf = jnp.max(flat, axis=-2)
    return joints, conf


def hard_argmax(heatmaps: jnp.ndarray, stride: int = 8):
    """Reference-parity decode: per-channel spatial argmax × stride
    (SURVEY.md §2 row 4 'must also expose hard-argmax')."""
    parts = heatmaps[..., :-1]
    *lead, h, w, p = parts.shape
    flat = parts.reshape(*lead, h * w, p)
    idx = jnp.argmax(flat, axis=-2)
    ys = (idx // w).astype(jnp.float32) * stride
    xs = (idx % w).astype(jnp.float32) * stride
    joints = jnp.stack([xs, ys], axis=-1)
    conf = jnp.max(flat, axis=-2)
    return joints, conf
