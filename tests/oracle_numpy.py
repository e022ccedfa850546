"""Independent numpy SMPL oracle (SURVEY.md §4.1).

A deliberately-naive, loop-based implementation of the standard SMPL
equations, written WITHOUT reference to tpu_pose.models.smpl — golden tests
assert the fast JAX implementation matches this one.
"""

import numpy as np


def rodrigues_np(r):
    """Single axis-angle (3,) → rotation matrix (3,3), classic formula."""
    theta = np.linalg.norm(r)
    if theta < 1e-10:
        return np.eye(3)
    k = r / theta
    K = np.array([
        [0, -k[2], k[1]],
        [k[2], 0, -k[0]],
        [-k[1], k[0], 0],
    ])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def smpl_np(v_template, shapedirs, posedirs, J_regressor, weights, parents,
            beta, theta):
    """Naive SMPL forward. Returns (verts (V,3), joints (J,3))."""
    v_template = np.asarray(v_template, np.float64)
    shapedirs = np.asarray(shapedirs, np.float64)
    posedirs = np.asarray(posedirs, np.float64)
    J_regressor = np.asarray(J_regressor, np.float64)
    weights = np.asarray(weights, np.float64)
    parents = np.asarray(parents)
    beta = np.asarray(beta, np.float64)
    theta = np.asarray(theta, np.float64).reshape(-1, 3)
    J = theta.shape[0]
    V = v_template.shape[0]

    # Shape blend shapes.
    v_shaped = v_template.copy()
    for b in range(beta.shape[0]):
        v_shaped += beta[b] * shapedirs[:, :, b]

    j_rest = J_regressor @ v_shaped

    # Rotations.
    R = np.stack([rodrigues_np(theta[k]) for k in range(J)])

    # Pose blend shapes.
    pose_feat = np.concatenate(
        [(R[k] - np.eye(3)).ravel() for k in range(1, J)])
    v_posed = v_shaped + posedirs @ pose_feat

    # Kinematic chain (world transforms).
    G = np.zeros((J, 4, 4))
    G[0, :3, :3] = R[0]
    G[0, :3, 3] = j_rest[0]
    G[0, 3, 3] = 1.0
    for k in range(1, J):
        local = np.eye(4)
        local[:3, :3] = R[k]
        local[:3, 3] = j_rest[k] - j_rest[parents[k]]
        G[k] = G[parents[k]] @ local
    joints = G[:, :3, 3].copy()

    # Remove rest pose.
    Grel = G.copy()
    for k in range(J):
        Grel[k, :3, 3] -= G[k, :3, :3] @ j_rest[k]

    # LBS.
    verts = np.zeros((V, 3))
    for v in range(V):
        T = np.zeros((4, 4))
        for k in range(J):
            T += weights[v, k] * Grel[k]
        verts[v] = T[:3, :3] @ v_posed[v] + T[:3, 3]
    return verts, joints
