"""TF second oracle (SURVEY.md §4.2): the tf_smpl-lineage SMPL equations
implemented with TensorFlow ops, independent of both tpu_pose.models.smpl
and the numpy oracle.

The reference vendors an HMR-style TF1 SMPL port (batch_smpl/batch_lbs
lineage [K]); this module reproduces that computation graph's SEMANTICS in
TF2 eager so parity tests certify our JAX implementation against the same
math the reference executes. When/if the reference mount appears, its
actual module runs under tf.compat.v1 in place of this."""

import numpy as np


def smpl_tf(v_template, shapedirs, posedirs, J_regressor, weights, parents,
            beta, theta):
    """TF batch-of-one SMPL forward. Returns numpy (verts, joints)."""
    import tensorflow as tf

    f64 = tf.float64
    v_template = tf.constant(np.asarray(v_template), f64)    # (V, 3)
    shapedirs = tf.constant(np.asarray(shapedirs), f64)      # (V, 3, 10)
    posedirs = tf.constant(np.asarray(posedirs), f64)        # (V, 3, 207)
    J_regressor = tf.constant(np.asarray(J_regressor), f64)  # (J, V)
    weights = tf.constant(np.asarray(weights), f64)          # (V, J)
    parents = np.asarray(parents)
    beta = tf.constant(np.asarray(beta), f64)                # (10,)
    theta = tf.reshape(tf.constant(np.asarray(theta), f64), (-1, 3))

    num_j = int(theta.shape[0])

    # Shape blend shapes: v_shaped = T + Σ β_b S_b  (batch_smpl lineage).
    v_shaped = v_template + tf.einsum("vcb,b->vc", shapedirs, beta)
    j_rest = tf.matmul(J_regressor, v_shaped)                # (J, 3)

    # batch_rodrigues-style axis-angle → rotation matrices.
    def rodrigues(r):
        angle = tf.norm(r) + 1e-16
        k = r / angle
        K = tf.convert_to_tensor([
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0]])
        K = tf.cast(K, f64)
        eye = tf.eye(3, dtype=f64)
        return (eye + tf.sin(angle) * K
                + (1.0 - tf.cos(angle)) * tf.matmul(K, K))

    R = tf.stack([rodrigues(theta[k]) for k in range(num_j)])  # (J, 3, 3)

    # Pose blend shapes on (R[1:] − I), flattened in joint-major order.
    pose_feat = tf.reshape(R[1:] - tf.eye(3, dtype=f64), (-1,))  # (207,)
    v_posed = v_shaped + tf.einsum("vcp,p->vc", posedirs, pose_feat)

    # batch_global_rigid_transformation: root-first chain compose.
    def rigid(Rk, t):
        top = tf.concat([Rk, tf.reshape(t, (3, 1))], axis=1)
        bottom = tf.constant([[0.0, 0.0, 0.0, 1.0]], f64)
        return tf.concat([top, bottom], axis=0)

    world = [rigid(R[0], j_rest[0])]
    for k in range(1, num_j):
        t_local = j_rest[k] - j_rest[parents[k]]
        world.append(tf.matmul(world[parents[k]], rigid(R[k], t_local)))
    world = tf.stack(world)                                   # (J, 4, 4)
    joints_posed = world[:, :3, 3]

    # Remove rest pose: A_k = W_k − pack(W_k · [j_rest_k; 0]).
    j_h = tf.concat([j_rest, tf.zeros((num_j, 1), f64)], axis=1)
    correction = tf.einsum("jab,jb->ja", world, j_h)          # (J, 4)
    A = world - tf.pad(correction[:, :, None],
                       [[0, 0], [0, 0], [3, 0]])              # zero cols 0..2

    # LBS: per-vertex blended transforms.
    T = tf.einsum("vj,jab->vab", weights, A)                  # (V, 4, 4)
    v_h = tf.concat(
        [v_posed, tf.ones((v_posed.shape[0], 1), f64)], axis=1)
    verts = tf.einsum("vab,vb->va", T, v_h)[:, :3]
    return np.asarray(verts), np.asarray(joints_posed)
