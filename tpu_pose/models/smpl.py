"""Pure-JAX SMPL body model.

TPU-native rebuild of the reference's tf_smpl-lineage TF1 graph
(SURVEY.md §2 row 5, §3.2):

    v = LBS(v_template + Σ β·shapedirs + Σ (R(θ)−I)·posedirs,
            J(β), θ, weights)

Design (idiomatic JAX, not a TF translation):

- ``rodrigues``           — closed-form axis-angle → rotation matrix via the
                            quaternion formulation (grad-safe at θ→0, same
                            numerics as the tf_smpl ``batch_rodrigues``
                            lineage the reference vendors).
- ``global_rigid_transform`` — kinematic chain statically unrolled over the
                            topologically-sorted kintree (the tree is
                            compile-time constant aux data of SMPLData);
                            XLA fuses the 23 batched 4×4 composes, ~2×
                            faster per fit iteration than a device scan.
- blend shapes / LBS      — einsums; everything is single-example and
                            ``vmap``-able over batch (frames × people).

All functions take the model tensors explicitly (a ``SMPLData`` pytree), so
the whole model is a pure function: jit/vmap/grad compose freely, and the
SMPLify fit differentiates straight through it (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from tpu_pose.models.smpl_data import SMPLData

# Matmul/einsum precision for the SMPL math, in two tiers:
# - FIT_PRECISION (DEFAULT) — the hot fit loop. Measured on v5e (b=128,
#   140-iter fit): 1.8× faster per fit (41.2 → 23.0 ms) with 3D recovery
#   unchanged (PA-MPJPE 73.8 vs 75.1 mm; the observation-noise floor
#   dominates the ~1e-3 m bf16 rounding).
# - EXACT_PRECISION (HIGHEST) — final mesh/eval outputs, where ~1e-3 m
#   rounding would eat the whole 1 mm MPJPE parity budget (BASELINE.md).
# ``smpl_forward(..., precision=...)`` selects; the fit loop uses the
# default, the public API's mesh outputs pass EXACT_PRECISION.
FIT_PRECISION = jax.lax.Precision.DEFAULT
EXACT_PRECISION = jax.lax.Precision.HIGHEST


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray  # (V, 3) posed mesh vertices
    joints: jnp.ndarray    # (J, 3) posed joint locations (kinematic)
    rotmats: jnp.ndarray   # (J, 3, 3) per-joint local rotation matrices


def rodrigues(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors → rotation matrices, batched over leading dims.

    Quaternion formulation: q = [cos(θ/2), sin(θ/2)·axis] → R(q). The small
    ε inside the norm keeps the gradient finite at θ = 0 (the zero pose is
    the *initialization* of every fit, so this matters). Matches the
    reference's tf_smpl ``batch_rodrigues`` numerics (SURVEY.md §3.2).

    Args:
      r: (..., 3) axis-angle.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    theta = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True) + 1e-16)
    axis = r / theta
    half = 0.5 * theta
    w = jnp.cos(half)[..., 0]
    xyz = jnp.sin(half) * axis
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]

    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        axis=-1)
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        axis=-1)
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _rigid(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack rotation (...,3,3) + translation (...,3) into (...,4,4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (*R.shape[:-2], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def global_rigid_transform(
    rotmats: jnp.ndarray,   # (J, 3, 3) local joint rotations
    j_rest: jnp.ndarray,    # (J, 3)   rest-pose joint locations
    parents: jnp.ndarray,   # (J,)     int32, parents[k] < k, parents[0] = -1
    precision=None,
):
    """Compose the kinematic chain; TPU-native replacement for the reference's
    ``batch_global_rigid_transformation`` (SURVEY.md §3.2).

    With a static (numpy) kintree — the SMPLData contract — the composition
    unrolls into 23 batched 4×4 matmuls XLA fuses into one kernel; the
    topological sort guarantees each parent is finalized before its
    children. A ``lax.scan`` fallback covers traced-parents callers.

    Returns:
      joints_world: (J, 3) posed joint positions.
      rel_transforms: (J, 4, 4) world transforms with the rest pose removed —
        the matrices LBS consumes.
    """
    precision = FIT_PRECISION if precision is None else precision
    num_j = rotmats.shape[0]
    # Local (bone) translations: joint k sits at j_rest[k] - j_rest[parent].
    parent_idx = jnp.maximum(jnp.asarray(parents), 0)
    t_local = j_rest - j_rest[parent_idx]
    t_local = t_local.at[0].set(j_rest[0])
    local = _rigid(rotmats, t_local)  # (J, 4, 4)

    if isinstance(parents, np.ndarray):
        # STATIC kintree (the SMPLData contract): unroll the composition.
        # 23 fused batched matmuls beat a 23-step sequential device scan
        # ~2× on the whole fit iteration (see SMPLData docstring).
        worlds = [local[0]]
        for k in range(1, num_j):
            worlds.append(jnp.matmul(
                worlds[int(parents[k])], local[k], precision=precision))
        world = jnp.stack(worlds)
    else:
        # Traced-parents fallback: lax.scan over the sorted kintree.
        init = jnp.zeros((num_j, 4, 4), rotmats.dtype).at[0].set(local[0])

        def step(w, inp):
            k, p, loc = inp
            return w.at[k].set(
                jnp.matmul(w[p], loc, precision=precision)), None

        ks = jnp.arange(1, num_j, dtype=jnp.int32)
        world, _ = jax.lax.scan(
            step, init, (ks, jnp.asarray(parents)[1:], local[1:]))

    joints_world = world[:, :3, 3]
    # Remove the rest pose: A_k ← A_k · [[I, -j_rest_k], [0, 1]], i.e.
    # subtract R_world·j_rest from the translation column.
    corr = jnp.einsum("jab,jb->ja", world[:, :3, :3], j_rest,
                      precision=precision)
    rel = world.at[:, :3, 3].add(-corr)
    return joints_world, rel


def smpl_forward(
    data: SMPLData,
    beta: jnp.ndarray,   # (num_betas,)
    theta: jnp.ndarray,  # (J*3,) or (J, 3) axis-angle, theta[0] = global rot
    precision=None,      # None → FIT_PRECISION; pass EXACT_PRECISION for
                         # parity-grade mesh outputs (see header comment)
) -> SMPLOutput:
    """Full SMPL forward pass for ONE body. ``vmap`` for batches.

    Pipeline (SURVEY.md §3.2): shape blend → rest joints → Rodrigues →
    pose blend → kinematic chain → LBS.
    """
    precision = FIT_PRECISION if precision is None else precision
    num_j = data.parents.shape[0]
    theta = theta.reshape(num_j, 3)

    # Shape blend shapes: v_shaped = v_template + shapedirs · β.
    v_shaped = data.v_template + jnp.einsum(
        "vcb,b->vc", data.shapedirs, beta, precision=precision)

    # Rest-pose joints from the regressor.
    j_rest = jnp.matmul(data.J_regressor, v_shaped,
                        precision=precision)  # (J, 3)

    # Per-joint rotations.
    rotmats = rodrigues(theta)  # (J, 3, 3)

    # Pose blend shapes: driven by (R_k − I) for non-root joints.
    pose_feat = (rotmats[1:] - jnp.eye(3, dtype=rotmats.dtype)).reshape(-1)
    v_posed = v_shaped + jnp.einsum(
        "vcp,p->vc", data.posedirs, pose_feat, precision=precision)

    # Kinematic chain.
    joints_world, rel = global_rigid_transform(rotmats, j_rest, data.parents,
                                               precision=precision)

    # Linear blend skinning: per-vertex transform = Σ_j w_vj · A_j.
    T = jnp.einsum("vj,jab->vab", data.weights, rel,
                   precision=precision)  # (V, 4, 4)
    verts = (jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed,
                        precision=precision)
             + T[:, :3, 3])

    return SMPLOutput(vertices=verts, joints=joints_world, rotmats=rotmats)


def regress_joints(data: SMPLData, vertices: jnp.ndarray,
                   precision=None) -> jnp.ndarray:
    """Joints from posed vertices via the joint regressor (alternative joint
    definition; the reference lineage exposes both — SURVEY.md §3.2 last line).
    """
    return jnp.matmul(data.J_regressor, vertices,
                      precision=FIT_PRECISION if precision is None
                      else precision)


# Batched conveniences (frames × people collapse into one leading axis).
def smpl_forward_batch(data, beta, theta, precision=None):
    return jax.vmap(
        lambda b, t: smpl_forward(data, b, t, precision=precision)
    )(beta, theta)
