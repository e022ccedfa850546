"""Joint conventions and CPM↔SMPL joint correspondence.

The reference glues a 14-joint CPM 2D detector (MPII/LSP body convention
[K — CPM Caffe→TF port lineage, SURVEY.md §2 rows 3–4]) to the 24-joint
SMPL skeleton inside the fit energy. The correspondence below is the
standard LSP-style mapping used throughout the SMPLify family.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# CPM / MPII 14-joint order (detector output channels 0..13; channel 14 is
# background in the heatmap tensor).
CPM_JOINT_NAMES = [
    "head",        # 0
    "neck",        # 1
    "r_shoulder",  # 2
    "r_elbow",     # 3
    "r_wrist",     # 4
    "l_shoulder",  # 5
    "l_elbow",     # 6
    "l_wrist",     # 7
    "r_hip",       # 8
    "r_knee",      # 9
    "r_ankle",     # 10
    "l_hip",       # 11
    "l_knee",      # 12
    "l_ankle",     # 13
]
NUM_CPM_JOINTS = len(CPM_JOINT_NAMES)

# SMPL 24-joint names (standard numbering).
SMPL_JOINT_NAMES = [
    "pelvis", "l_hip", "r_hip", "spine1", "l_knee", "r_knee", "spine2",
    "l_ankle", "r_ankle", "spine3", "l_foot", "r_foot", "neck", "l_collar",
    "r_collar", "head", "l_shoulder", "r_shoulder", "l_elbow", "r_elbow",
    "l_wrist", "r_wrist", "l_hand", "r_hand",
]

# CPM joint index → SMPL joint index (LSP↔SMPL convention of the SMPLify
# family; 'head' maps to the SMPL head joint).
CPM_TO_SMPL = np.array(
    [15, 12, 17, 19, 21, 16, 18, 20, 2, 5, 8, 1, 4, 7], dtype=np.int32)

# Left↔right channel permutation under a horizontal image flip
# (head/neck fixed; shoulder/elbow/wrist/hip/knee/ankle pairs swap).
# Used by flip test-time augmentation (models/cpm.py flip_tta).
CPM_FLIP_PERM = np.array(
    [0, 1, 5, 6, 7, 2, 3, 4, 11, 12, 13, 8, 9, 10], dtype=np.int32)

# COCO OKS per-keypoint falloff constants (σ_i), mapped into the CPM-14
# convention. The COCO evaluation defines
#   OKS = Σ_i δ(v_i>0)·exp(−d_i² / (2 s² κ_i²)) / Σ_i δ(v_i>0),
# κ_i = 2σ_i, s² = object area. Source values are the official COCO
# keypoint sigmas (nose .026, shoulders .079, elbows .072, wrists .062,
# hips .107, knees .087, ankles .089); the two CPM joints COCO lacks use
# the σ of the COCO keypoints they are synthesized from in the adapter
# (data/datasets.py): head ≈ nose → .026, neck = shoulder midpoint →
# .079. Used by utils/metrics.oks_np and parallel/eval.evaluate_oks.
CPM_OKS_SIGMA = np.array(
    [0.026, 0.079, 0.079, 0.072, 0.062, 0.079, 0.072, 0.062,
     0.107, 0.087, 0.089, 0.107, 0.087, 0.089], dtype=np.float32)


def select_smpl_joints(joints3d_smpl24: jnp.ndarray) -> jnp.ndarray:
    """(..., 24, 3) SMPL joints → (..., 14, 3) in CPM order, for the
    reprojection energy (SURVEY.md §2 row 8)."""
    return joints3d_smpl24[..., CPM_TO_SMPL, :]


# COCO 17-keypoint convention (0 nose, 1/2 l/r eye, 3/4 l/r ear,
# 5/6 l/r shoulder, 7/8 l/r elbow, 9/10 l/r wrist, 11/12 l/r hip,
# 13/14 l/r knee, 15/16 l/r ankle) — what most modern external
# detectors emit. Direct CPM slot → COCO id correspondences; CPM's
# head/neck are synthesized (see :func:`coco_to_cpm`).
COCO_KEYPOINT_NAMES = [
    "nose", "l_eye", "r_eye", "l_ear", "r_ear", "l_shoulder",
    "r_shoulder", "l_elbow", "r_elbow", "l_wrist", "r_wrist", "l_hip",
    "r_hip", "l_knee", "r_knee", "l_ankle", "r_ankle",
]
COCO_TO_CPM_DIRECT = {2: 6, 3: 8, 4: 10, 5: 5, 6: 7, 7: 9,
                      8: 12, 9: 14, 10: 16, 11: 11, 12: 13, 13: 15}


def coco_to_cpm(joints17, conf17):
    """COCO-17 detector output → the CPM-14 convention ``fit_smpl`` and
    the ``/fit`` serving route consume.

    The two CPM joints COCO lacks are synthesized the standard way
    (same rules as the annotation adapter, ``data.datasets.load_coco``):
    neck = shoulder midpoint with conf = min(shoulders); head ≈ nose
    (about half a head low — documented approximation). Eyes/ears are
    dropped. Works on numpy or jnp arrays, any leading batch shape:
    (..., 17, 2), (..., 17) → ((..., 14, 2), (..., 14)).
    """
    xp = jnp if isinstance(joints17, jnp.ndarray) else np
    joints17 = xp.asarray(joints17)
    conf17 = xp.asarray(conf17)
    if joints17.shape[-2:] != (17, 2) or conf17.shape != joints17.shape[:-1]:
        raise ValueError(
            f"coco_to_cpm takes (..., 17, 2) joints with matching "
            f"(..., 17) conf; got {joints17.shape}, {conf17.shape}")
    idx = np.zeros(14, np.int32)
    for cpm_i, coco_i in COCO_TO_CPM_DIRECT.items():
        idx[cpm_i] = coco_i
    j = joints17[..., idx, :]
    c = conf17[..., idx]
    neck = (joints17[..., 5, :] + joints17[..., 6, :]) / 2.0
    neck_c = xp.minimum(conf17[..., 5], conf17[..., 6])
    if xp is jnp:
        j = j.at[..., 0, :].set(joints17[..., 0, :])   # head ≈ nose
        j = j.at[..., 1, :].set(neck)
        c = c.at[..., 0].set(conf17[..., 0])
        c = c.at[..., 1].set(neck_c)
    else:
        j = j.copy()
        c = c.copy()
        j[..., 0, :] = joints17[..., 0, :]
        j[..., 1, :] = neck
        c[..., 0] = conf17[..., 0]
        c[..., 1] = neck_c
    return j, c


# MPII-16 id → CPM-14 slot (a pure permutation: MPII carries every CPM
# joint; pelvis 6 and thorax 7 are dropped). Canonical table — the
# dataset adapter (data.datasets.MPII_TO_CPM) and the jax-free client
# twin (client.PoseClient.mpii_to_cpm) are drift-guarded against it.
MPII16_TO_CPM = np.array([9, 8, 12, 11, 10, 13, 14, 15, 2, 1, 0, 3, 4, 5],
                         dtype=np.int32)


def mpii_to_cpm(joints16, conf16):
    """MPII-16 detector output → the CPM-14 convention ``fit_smpl`` and
    the ``/fit`` serving route consume.

    Unlike COCO (:func:`coco_to_cpm`), nothing is synthesized: MPII
    annotates head-top and upper-neck directly, so this is the pure
    :data:`MPII16_TO_CPM` permutation (pelvis/thorax dropped). Works on
    numpy or jnp arrays, any leading batch shape: (..., 16, 2),
    (..., 16) → ((..., 14, 2), (..., 14)).
    """
    xp = jnp if isinstance(joints16, jnp.ndarray) else np
    joints16 = xp.asarray(joints16)
    conf16 = xp.asarray(conf16)
    if joints16.shape[-2:] != (16, 2) or conf16.shape != joints16.shape[:-1]:
        raise ValueError(
            f"mpii_to_cpm takes (..., 16, 2) joints with matching "
            f"(..., 16) conf; got {joints16.shape}, {conf16.shape}")
    return joints16[..., MPII16_TO_CPM, :], conf16[..., MPII16_TO_CPM]


# Human3.6M 17-joint convention for evaluation (SURVEY.md §2 row 12).
H36M_JOINT_NAMES = [
    "pelvis", "r_hip", "r_knee", "r_ankle", "l_hip", "l_knee", "l_ankle",
    "spine", "neck", "head", "site", "l_shoulder", "l_elbow", "l_wrist",
    "r_shoulder", "r_elbow", "r_wrist",
]
# SMPL joints closest to the H3.6M convention (spine→spine2, head/site→head).
H36M_TO_SMPL = np.array(
    [0, 2, 5, 8, 1, 4, 7, 6, 12, 15, 15, 16, 18, 20, 17, 19, 21],
    dtype=np.int32)


def select_h36m_joints(joints3d_smpl24: jnp.ndarray) -> jnp.ndarray:
    return joints3d_smpl24[..., H36M_TO_SMPL, :]
