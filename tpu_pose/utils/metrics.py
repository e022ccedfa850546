"""Evaluation metrics (SURVEY.md §2 row 12): MPJPE and PA-MPJPE.

Pure jnp; batched over leading axes; used by the Human3.6M-style eval
pipeline (parallel/eval.py) and the parity harness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray,
          align_root: bool = True, root_index: int = 0) -> jnp.ndarray:
    """Mean per-joint position error, in the input's length units.

    Args:
      pred, gt: (..., J, 3).
      align_root: subtract the root joint first (standard H3.6M protocol 1).
    Returns: (...) per-example MPJPE.
    """
    if align_root:
        pred = pred - pred[..., root_index: root_index + 1, :]
        gt = gt - gt[..., root_index: root_index + 1, :]
    return jnp.mean(
        jnp.linalg.norm(pred - gt, axis=-1), axis=-1)


def procrustes_align(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Similarity-transform (scale+rot+trans) alignment of pred onto gt —
    one (J,3) pair; vmap for batches. Classic Umeyama solution via SVD."""
    mu_p = jnp.mean(pred, axis=0, keepdims=True)
    mu_g = jnp.mean(gt, axis=0, keepdims=True)
    pc = pred - mu_p
    gc = gt - mu_g
    cov = jnp.matmul(gc.T, pc, precision=HIGHEST) / pred.shape[0]
    u, s, vt = jnp.linalg.svd(cov)
    # Reflection guard: det(U Vᵀ) must be +1.
    d = jnp.sign(jnp.linalg.det(jnp.matmul(u, vt, precision=HIGHEST)))
    dsign = jnp.ones(3).at[-1].set(d)
    rot = jnp.matmul(u * dsign[None, :], vt, precision=HIGHEST)
    var_p = jnp.mean(jnp.sum(pc * pc, axis=-1))
    scale = jnp.sum(s * dsign) / (var_p + 1e-12)
    return scale * jnp.matmul(pc, rot.T, precision=HIGHEST) + mu_g


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE for one (J,3) pair; vmap for batches."""
    aligned = procrustes_align(pred, gt)
    return jnp.mean(jnp.linalg.norm(aligned - gt, axis=-1))


def pa_mpjpe_np(pred, gt) -> "np.ndarray":
    """Host-numpy batched PA-MPJPE: (B,J,3),(B,J,3) → (B,).

    Metrics are not on the device perf path, and ``jnp.linalg.svd``
    compiles to a pathologically slow iterative HLO on TPU (observed to
    wedge the axon remote-compile helper for 15+ min) — so dataset eval
    computes Procrustes alignment on host. Matches :func:`pa_mpjpe`.
    """
    import numpy as np
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    out = np.empty(pred.shape[0])
    for i in range(pred.shape[0]):
        p, g = pred[i], gt[i]
        mu_p, mu_g = p.mean(0), g.mean(0)
        pc, gc = p - mu_p, g - mu_g
        cov = gc.T @ pc / p.shape[0]
        u, s, vt = np.linalg.svd(cov)
        d = np.sign(np.linalg.det(u @ vt))
        dsign = np.array([1.0, 1.0, d])
        rot = (u * dsign) @ vt
        var_p = (pc * pc).sum(-1).mean()
        scale = (s * dsign).sum() / (var_p + 1e-12)
        aligned = scale * pc @ rot.T + mu_g
        out[i] = np.linalg.norm(aligned - g, axis=-1).mean()
    return out


def pck(pred2d: jnp.ndarray, gt2d: jnp.ndarray,
        threshold: float) -> jnp.ndarray:
    """Percentage of correct 2D keypoints within ``threshold`` (same units
    as the inputs). pred2d/gt2d: (..., P, 2); returns (...) fraction."""
    dist = jnp.linalg.norm(pred2d - gt2d, axis=-1)
    return jnp.mean((dist < threshold).astype(jnp.float32), axis=-1)


def scaled_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Centroid-aligned MPJPE after matching per-frame RMS skeleton extent.

    NOT a standard H3.6M protocol — it removes the monocular scale
    ambiguity of weak-perspective fits and is reported under the explicit
    name ``mpjpe_scaled`` (see parallel/eval.py). For the standard
    Protocol-1 number use :func:`mpjpe` (root-aligned, no scale).

    pred, gt: (..., J, 3); returns (...).
    """
    pred_c = pred - jnp.mean(pred, axis=-2, keepdims=True)
    gt_c = gt - jnp.mean(gt, axis=-2, keepdims=True)
    s = (jnp.sqrt(jnp.sum(gt_c ** 2, axis=(-2, -1)))
         / (jnp.sqrt(jnp.sum(pred_c ** 2, axis=(-2, -1))) + 1e-9))
    return jnp.mean(
        jnp.linalg.norm(pred_c * s[..., None, None] - gt_c, axis=-1),
        axis=-1)


def pckh(pred2d: jnp.ndarray, gt2d: jnp.ndarray,
         threshold: float = 0.5,
         head_a: int = 0, head_b: int = 1,
         headsize=None, mask=None) -> jnp.ndarray:
    """PCKh: fraction of 2D keypoints within ``threshold`` × the
    ground-truth head-segment length (the MPII-style normalized metric;
    SURVEY.md §6 quality rows).

    With 14-joint CPM annotations the head segment is joint ``head_a``
    (head top, index 0) to ``head_b`` (neck, index 1) — the standard proxy
    when the MPII head bounding box is unavailable. Pass ``headsize``
    (...,) — e.g. from MPII's annotated head rectangle via
    ``data.datasets.load_mpii`` — for the official MPII normalization,
    and ``mask`` (..., P) to score only annotated joints (the official
    protocol skips unlabeled ones).

    pred2d/gt2d: (..., P, 2); returns (...) per-example fraction.
    """
    if headsize is None:
        headsize = jnp.linalg.norm(
            gt2d[..., head_a, :] - gt2d[..., head_b, :], axis=-1)
    dist = jnp.linalg.norm(pred2d - gt2d, axis=-1)
    hit = (dist <= threshold * headsize[..., None]).astype(jnp.float32)
    if mask is None:
        return jnp.mean(hit, axis=-1)
    mask = mask.astype(jnp.float32)
    return (jnp.sum(hit * mask, axis=-1)
            / jnp.maximum(jnp.sum(mask, axis=-1), 1.0))


# -- host-numpy twins (eval hot path) -------------------------------------
# The streaming evaluator (parallel/eval.py) computes metrics on HOST so
# the device pipeline never stalls on tiny metric programs: one (B, J, 3)
# transfer per batch, then pure numpy. Kept numerically equivalent to the
# jnp versions above (f64 accumulation is a superset of f32).

def mpjpe_np(pred, gt, align_root: bool = True,
             root_index: int = 0) -> "np.ndarray":
    """Host twin of :func:`mpjpe`. pred/gt: (B, J, 3) → (B,)."""
    import numpy as np
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if align_root:
        pred = pred - pred[..., root_index: root_index + 1, :]
        gt = gt - gt[..., root_index: root_index + 1, :]
    return np.linalg.norm(pred - gt, axis=-1).mean(-1)


def scaled_mpjpe_np(pred, gt) -> "np.ndarray":
    """Host twin of :func:`scaled_mpjpe`. pred/gt: (B, J, 3) → (B,)."""
    import numpy as np
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    pred_c = pred - pred.mean(-2, keepdims=True)
    gt_c = gt - gt.mean(-2, keepdims=True)
    s = (np.sqrt((gt_c ** 2).sum((-2, -1)))
         / (np.sqrt((pred_c ** 2).sum((-2, -1))) + 1e-9))
    return np.linalg.norm(
        pred_c * s[..., None, None] - gt_c, axis=-1).mean(-1)


def oks_np(pred2d, gt2d, area, mask=None, sigmas=None) -> "np.ndarray":
    """Object Keypoint Similarity (the COCO keypoint metric), host numpy.

    ``OKS = Σ_i m_i·exp(−d_i² / (2·area·κ_i²)) / Σ_i m_i`` with
    ``κ_i = 2σ_i`` and ``area`` the object's pixel area (s² in the COCO
    formula). Sigmas default to the CPM-14 mapping of the official COCO
    constants (models/joints.CPM_OKS_SIGMA).

    pred2d/gt2d: (B, P, 2); area: (B,) pixel area; mask: (B, P) truthy =
    labeled joint (the COCO δ(v_i>0) gate). Returns (B,) OKS in [0, 1];
    a sample with no labeled joints scores 0.
    """
    import numpy as np
    from tpu_pose.models import joints as joints_lib
    pred2d = np.asarray(pred2d, np.float64)
    gt2d = np.asarray(gt2d, np.float64)
    area = np.asarray(area, np.float64)
    if sigmas is None:
        sigmas = joints_lib.CPM_OKS_SIGMA
    kappa = 2.0 * np.asarray(sigmas, np.float64)
    d2 = ((pred2d - gt2d) ** 2).sum(-1)                   # (B, P)
    e = d2 / (2.0 * np.maximum(area[:, None], 1e-9) * kappa[None, :] ** 2)
    ks = np.exp(-e)
    if mask is None:
        mask = np.ones(gt2d.shape[:2], np.float64)
    m = np.asarray(mask, np.float64)
    m = (m > 0).astype(np.float64)
    return (ks * m).sum(-1) / np.maximum(m.sum(-1), 1.0)


def keypoint_bbox_area_np(gt2d, mask=None,
                          bbox_to_area: float = 0.53) -> "np.ndarray":
    """Fallback OKS area when the annotation's segmentation area is
    unavailable: axis-aligned bbox of the labeled GT keypoints ×
    ``bbox_to_area`` (0.53 ≈ the mean person-segmentation/bbox area
    ratio, the conventional bbox-only stand-in). gt2d: (B, P, 2) →
    (B,) pixel area."""
    import numpy as np
    gt2d = np.asarray(gt2d, np.float64)
    if mask is None:
        m = np.ones(gt2d.shape[:2], bool)
    else:
        m = np.asarray(mask) > 0
    out = np.zeros(gt2d.shape[0], np.float64)
    for i in range(gt2d.shape[0]):
        pts = gt2d[i][m[i]] if m[i].any() else gt2d[i]
        lo, hi = pts.min(0), pts.max(0)
        out[i] = float((hi[0] - lo[0]) * (hi[1] - lo[1])) * bbox_to_area
    return np.maximum(out, 1e-9)


def pve_np(pred_verts, gt_verts, align: str = "centroid") -> "np.ndarray":
    """Per-Vertex Error (PVE / MPVPE): mean Euclidean distance between
    predicted and ground-truth SMPL meshes — the mesh-level companion of
    MPJPE for datasets that ship SMPL parameters (3DPW-style).

    ``align`` — the translation convention:

    - ``"centroid"`` (default): subtract each mesh's vertex centroid.
      The monocular-eval convention when no common camera frame exists
      (weak-perspective fits have a free translation/depth).
    - ``"none"``: raw distances (both meshes already in one frame).

    For the Procrustes-aligned variant (PA-PVE) use :func:`pa_pve_np`.
    pred_verts/gt_verts: (B, V, 3) → (B,) in the input's length units.
    """
    import numpy as np
    if align not in ("centroid", "none"):
        raise ValueError(f"align must be 'centroid' or 'none', got "
                         f"{align!r}")
    pred = np.asarray(pred_verts, np.float64)
    gt = np.asarray(gt_verts, np.float64)
    if align == "centroid":
        pred = pred - pred.mean(-2, keepdims=True)
        gt = gt - gt.mean(-2, keepdims=True)
    return np.linalg.norm(pred - gt, axis=-1).mean(-1)


def pa_pve_np(pred_verts, gt_verts) -> "np.ndarray":
    """Procrustes-aligned Per-Vertex Error: the Umeyama similarity
    alignment of :func:`pa_mpjpe_np` applied to the 6890-vertex meshes
    (the covariance is still 3×3 — the SVD cost does not grow with V).
    (B, V, 3), (B, V, 3) → (B,)."""
    return pa_mpjpe_np(pred_verts, gt_verts)


def pckh_np(pred2d, gt2d, threshold: float = 0.5,
            head_a: int = 0, head_b: int = 1,
            headsize=None, mask=None) -> "np.ndarray":
    """Host twin of :func:`pckh`. pred2d/gt2d: (B, P, 2) → (B,)."""
    import numpy as np
    pred2d = np.asarray(pred2d, np.float64)
    gt2d = np.asarray(gt2d, np.float64)
    if headsize is None:
        headsize = np.linalg.norm(
            gt2d[..., head_a, :] - gt2d[..., head_b, :], axis=-1)
    else:
        headsize = np.asarray(headsize, np.float64)
    dist = np.linalg.norm(pred2d - gt2d, axis=-1)
    hit = (dist <= threshold * headsize[..., None]).astype(np.float64)
    if mask is None:
        return hit.mean(-1)
    mask = np.asarray(mask, np.float64)
    return (hit * mask).sum(-1) / np.maximum(mask.sum(-1), 1.0)
