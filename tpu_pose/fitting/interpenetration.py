"""Capsule self-interpenetration penalty — the SMPLify objective's
fourth term (SURVEY.md §2 row 8 cites the SMPLify family via
[P:1805.04092 §2]; the original formulation approximates body parts by
capsules and penalizes overlap). Off by default
(``StageConfig.w_interpenetration = 0``) so the certified energy parity
is untouched; config-visible because reference parity tuning may need
it either way.

Design (TPU-first): everything is traced jnp on STATIC topology —

- Bones come from the static kintree (``SMPLData.parents`` is pytree
  aux data), so bone indices, sphere fractions, and the non-adjacent
  pair list are all compile-time constants (fixed gathers, no dynamic
  shapes).
- Per-bone radii derive from the model tensors (mean distance of each
  bone's dominant-LBS vertices to the rest bone axis) with traced ops
  only — :func:`build_capsule_spec` runs ONCE per fit program, outside
  the optimization scan.
- The penalty self-calibrates to the rest pose: each sphere pair's
  hinge threshold is reduced by its REST-pose overlap, so structurally
  touching parts (spine stack, hips) contribute zero at rest and only
  NEW interpenetration is penalized.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_pose.models.smpl_data import SMPLData


class CapsuleSpec(NamedTuple):
    """Static topology + traced geometry for the penalty.

    ``sphere_a``/``sphere_b``/``frac``: per-sphere static gather indices
    (bone endpoints into the 24-joint array) and interpolation fraction.
    ``radius``: traced per-sphere radius. ``pair_i``/``pair_j``: static
    sphere-pair indices (non-adjacent bones only). ``threshold``: traced
    per-pair hinge threshold r_i + r_j − rest_overlap_slack.
    """
    sphere_a: np.ndarray     # (S,) int32 — STATIC
    sphere_b: np.ndarray     # (S,) int32 — STATIC
    frac: np.ndarray         # (S,) f32   — STATIC
    radius: jnp.ndarray      # (S,) traced
    pair_i: np.ndarray       # (M,) int32 — STATIC
    pair_j: np.ndarray       # (M,) int32 — STATIC
    threshold: jnp.ndarray   # (M,) traced


def _bones(parents: np.ndarray) -> Tuple[Tuple[int, int], ...]:
    return tuple((int(p), int(c)) for c, p in enumerate(np.asarray(parents))
                 if p >= 0)


def _segment_distance(points: jnp.ndarray, a: jnp.ndarray,
                      b: jnp.ndarray) -> jnp.ndarray:
    """Distance of each point (N, 3) to segment a→b (3,)."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab), 1e-9)
    t = jnp.clip(jnp.einsum("nd,d->n", points - a, ab) / denom, 0.0, 1.0)
    proj = a[None, :] + t[:, None] * ab[None, :]
    return jnp.linalg.norm(points - proj, axis=-1)


def sphere_centers(joints24: jnp.ndarray, spec: CapsuleSpec
                   ) -> jnp.ndarray:
    """(…, 24, 3) posed joints → (…, S, 3) sphere centers (static
    gathers + lerp — the only per-iteration geometry work)."""
    a = joints24[..., spec.sphere_a, :]
    b = joints24[..., spec.sphere_b, :]
    f = jnp.asarray(spec.frac)[..., :, None]
    return a * (1.0 - f) + b * f


def build_capsule_spec(model: SMPLData, spheres_per_bone: int = 3,
                       min_radius: float = 0.015) -> CapsuleSpec:
    """Derive the capsule approximation from the model tensors (traced;
    call once per fit program, before the optimization scan).

    Radii use the REST mesh (β=0) — a deliberate approximation (SMPLify
    fits per-shape capsules; shape deviations are centimeters while the
    penalty acts on multi-centimeter overlaps). Each bone's radius is
    the mean distance of its dominant-LBS vertices to the rest bone
    axis, computed with a soft one-hot mask so everything stays
    fixed-shape under jit.
    """
    parents = np.asarray(model.parents)
    bones = _bones(parents)
    n_b = len(bones)
    rest_j = jnp.matmul(model.J_regressor, model.v_template)   # (24, 3)
    assign = jnp.argmax(model.weights, axis=1)                 # (6890,)

    radii_b = []
    for (p, c) in bones:
        mask = (assign == c).astype(model.v_template.dtype)
        d = _segment_distance(model.v_template, rest_j[p], rest_j[c])
        r = jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        radii_b.append(jnp.maximum(r, min_radius))
    radii_b = jnp.stack(radii_b)                               # (n_b,)

    s = int(spheres_per_bone)
    fracs = (np.arange(s, dtype=np.float32) + 0.5) / s
    sphere_a = np.repeat([p for p, _ in bones], s).astype(np.int32)
    sphere_b = np.repeat([c for _, c in bones], s).astype(np.int32)
    frac = np.tile(fracs, n_b)
    radius = jnp.repeat(radii_b, s)

    # Non-adjacent bone pairs (no shared joint) — static.
    pair_i, pair_j = [], []
    for b1 in range(n_b):
        j1 = set(bones[b1])
        for b2 in range(b1 + 1, n_b):
            if j1 & set(bones[b2]):
                continue
            for s1 in range(s):
                for s2 in range(s):
                    pair_i.append(b1 * s + s1)
                    pair_j.append(b2 * s + s2)
    pair_i = np.asarray(pair_i, np.int32)
    pair_j = np.asarray(pair_j, np.int32)

    # Rest-pose calibration: threshold_m = r_i + r_j − rest_overlap, so
    # the rest pose scores ~0 and only NEW overlap is penalized.
    spec0 = CapsuleSpec(sphere_a, sphere_b, frac, radius, pair_i, pair_j,
                        threshold=radius[pair_i] + radius[pair_j])
    centers0 = sphere_centers(rest_j, spec0)
    d0 = jnp.linalg.norm(centers0[pair_i] - centers0[pair_j], axis=-1)
    rest_overlap = jnp.maximum(spec0.threshold - d0, 0.0)
    return spec0._replace(threshold=spec0.threshold - rest_overlap)


def interpenetration_penalty(joints24: jnp.ndarray, spec: CapsuleSpec
                             ) -> jnp.ndarray:
    """Scalar Σ hinge(threshold − d)² over the static pair list, in m².
    One frame (24, 3); vmap for batches.

    The distance is ``sqrt(‖Δ‖² + ε²)`` (ε = 0.1 mm): a plain norm has a
    NaN gradient at exactly coincident centers, which optimization CAN
    hit transiently (observed under ``jax.grad`` on a collapsed pose),
    and one NaN would poison the whole fit's gradients."""
    centers = sphere_centers(joints24, spec)
    diff = (centers[..., spec.pair_i, :] - centers[..., spec.pair_j, :])
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-8)
    overlap = jnp.maximum(spec.threshold - d, 0.0)
    return jnp.sum(overlap * overlap, axis=-1)
