"""Camera / projection models (SURVEY.md §2 row 7, layer L3).

The reference optimizes camera parameters inside the SMPLify-style fit;
its lineage uses either weak-perspective (HMR ``batch_orth_proj_idrot``
style: scale + 2D translation) or full perspective with fixed focal length
and an optimized 3D translation (SMPLify style). Both live here behind one
interface so the fit can be configured for parity with whichever the
reference used (re-verify when the reference mount appears — SURVEY.md §0).

Pure functions over a small camera parameter vector; differentiable, so the
fit optimizes camera jointly with pose/shape (SURVEY.md §3.3).
"""

from __future__ import annotations

import jax.numpy as jnp

# Camera parameter vector layouts:
#   weak-perspective: cam = (s, tx, ty)          — 3 params
#   perspective:      cam = (tx, ty, tz)         — 3 params, focal is fixed
WEAK_PERSPECTIVE = "weak_perspective"
PERSPECTIVE = "perspective"


def weak_perspective_project(points3d: jnp.ndarray,
                             cam: jnp.ndarray) -> jnp.ndarray:
    """x2d = s · x3d[..., :2] + t. ``points3d``: (..., N, 3), ``cam``: (3,).

    HMR-lineage orthographic projection with isotropic scale; global
    rotation is carried by θ[0:3] of the body, not the camera.
    """
    s = cam[..., 0:1]
    t = cam[..., 1:3]
    return s[..., None] * points3d[..., :2] + t[..., None, :]


def perspective_project(points3d: jnp.ndarray, cam: jnp.ndarray,
                        focal: float = 5000.0,
                        center: tuple[float, float] = (0.0, 0.0),
                        ) -> jnp.ndarray:
    """Pinhole projection with fixed focal length (SMPLify convention:
    f≈5000 px for a 368-crop-scale image, principal point at crop center).

    x2d = f · (X + t)_{xy} / (X + t)_z + c, with z clamped away from 0 so
    the fit cannot step through the camera plane.
    """
    translated = points3d + cam[..., None, :]
    z = jnp.maximum(translated[..., 2:3], 1e-3)
    c = jnp.asarray(center, points3d.dtype)
    return focal * translated[..., :2] / z + c


def project(points3d: jnp.ndarray, cam: jnp.ndarray,
            model: str = WEAK_PERSPECTIVE, **kwargs) -> jnp.ndarray:
    """Unified projection entry point used by the fit energy."""
    if model == WEAK_PERSPECTIVE:
        return weak_perspective_project(points3d, cam)
    if model == PERSPECTIVE:
        return perspective_project(points3d, cam, **kwargs)
    raise ValueError(f"unknown camera model: {model}")


def init_weak_perspective(joints2d: jnp.ndarray,
                          joints3d_rest: jnp.ndarray,
                          conf: jnp.ndarray | None = None) -> jnp.ndarray:
    """Initial (s, tx, ty) matching the 2D extent/centroid of observed
    joints to the rest-pose 3D extent — the TPU-native analogue of the
    reference lineage's torso-based camera init (SURVEY.md §3.3 stage A).

    Robust to missing joints via the confidence weights.
    """
    if conf is None:
        conf = jnp.ones(joints2d.shape[:-1], joints2d.dtype)
    w = conf / (jnp.sum(conf, axis=-1, keepdims=True) + 1e-8)
    mean2d = jnp.sum(w[..., None] * joints2d, axis=-2)
    mean3d = jnp.sum(w[..., None] * joints3d_rest[..., :2], axis=-2)
    var2d = jnp.sum(
        w * jnp.sum((joints2d - mean2d[..., None, :]) ** 2, axis=-1),
        axis=-1)
    var3d = jnp.sum(
        w * jnp.sum(
            (joints3d_rest[..., :2] - mean3d[..., None, :]) ** 2, axis=-1),
        axis=-1)
    s = jnp.sqrt(var2d / (var3d + 1e-8))
    t = mean2d - s[..., None] * mean3d
    return jnp.concatenate([s[..., None], t], axis=-1)


def init_perspective(joints2d: jnp.ndarray,
                     joints3d_rest: jnp.ndarray,
                     focal: float = 5000.0,
                     conf: jnp.ndarray | None = None) -> jnp.ndarray:
    """Initial (tx, ty, tz): depth from similar triangles on the joint
    extents (the SMPLify torso-depth heuristic, generalized to all joints)."""
    if conf is None:
        conf = jnp.ones(joints2d.shape[:-1], joints2d.dtype)
    w = conf / (jnp.sum(conf, axis=-1, keepdims=True) + 1e-8)
    mean2d = jnp.sum(w[..., None] * joints2d, axis=-2)
    spread2d = jnp.sqrt(jnp.sum(
        w * jnp.sum((joints2d - mean2d[..., None, :]) ** 2, axis=-1),
        axis=-1) + 1e-8)
    mean3d = jnp.sum(w[..., None] * joints3d_rest, axis=-2)
    spread3d = jnp.sqrt(jnp.sum(
        w * jnp.sum(
            (joints3d_rest - mean3d[..., None, :]) ** 2, axis=-1),
        axis=-1) + 1e-8)
    tz = focal * spread3d / spread2d
    txy = mean2d * tz / focal - mean3d[..., :2]
    return jnp.concatenate([txy, tz[..., None]], axis=-1)
