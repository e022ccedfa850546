"""SMPLify-style fit energy (SURVEY.md §2 row 8, §3.3):

    E(θ, β, cam) = Σ_j conf_j · ρ( Π(J3d(θ, β))_j − j2d_j )
                   + λ_θ · pose_prior(θ[3:])
                   + λ_a · angle_prior(θ)
                   + λ_β · ‖β‖²
                   + λ_sp · interpenetration(θ, β)   [optional, default 0]

with ρ the Geman–McClure robustifier (GMoF) and the optional fourth
term SMPLify's capsule self-interpenetration penalty
(fitting/interpenetration.py; certified parity covers the 3-prior
form). Pure scalar jnp function of a
parameter pytree — ``jax.value_and_grad`` of this is the entire inner loop
of the fit; no host round-trips (the reference crossed host↔device once per
optimizer iteration, SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from tpu_pose.fitting import priors as priors_lib
from tpu_pose.models import camera as camera_lib
from tpu_pose.models import joints as joints_lib
from tpu_pose.models import smpl as smpl_lib
from tpu_pose.models.smpl_data import SMPLData
from tpu_pose.utils.config import FitConfig, StageConfig

Params = Dict[str, jnp.ndarray]  # {'theta': (72,), 'beta': (10,), 'cam': (3,)}


def perspective_kwargs(cfg: FitConfig) -> Dict[str, Any]:
    """Projection kwargs putting the perspective camera in the fit's
    observation frame. ``cfg.focal`` is ALWAYS in PIXELS (the SMPLify
    convention, f≈5000 px, principal point at the crop center); with
    ``normalize_obs`` the pixel projection maps into [-1, 1] as
    (f·x/z + S/2 − S/2)/(S/2) = (2f/S)·x/z, i.e. effective focal 2f/S
    and center 0 — so users never convert focal units by hand."""
    if cfg.camera_model != camera_lib.PERSPECTIVE:
        return {}
    if cfg.normalize_obs:
        return {"focal": cfg.focal * 2.0 / cfg.img_size,
                "center": (0.0, 0.0)}
    return {"focal": cfg.focal,
            "center": (cfg.img_size / 2.0, cfg.img_size / 2.0)}


def gmof(residual: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman–McClure robustifier: ρ(x) = σ²·x² / (x² + σ²), elementwise."""
    sq = residual * residual
    return sigma * sigma * sq / (sq + sigma * sigma)


def reprojection_energy(
    joints2d_pred: jnp.ndarray,  # (P, 2)
    joints2d_obs: jnp.ndarray,   # (P, 2)
    conf: jnp.ndarray,           # (P,)
    sigma: float,
) -> jnp.ndarray:
    """Confidence-weighted robust reprojection error (scalar)."""
    res = joints2d_pred - joints2d_obs
    return jnp.sum(conf[..., None] * gmof(res, sigma))


def fit_energy(
    params: Params,
    model: SMPLData,
    joints2d_obs: jnp.ndarray,    # (P, 2) observed 2D joints (CPM order)
    conf: jnp.ndarray,            # (P,)
    stage: StageConfig,
    cfg: FitConfig,
    prior: Any = None,            # GMMPrior | L2Prior | None
    capsule_spec: Any = None,     # interpenetration.CapsuleSpec | None
) -> jnp.ndarray:
    """Total scalar energy for ONE frame. vmap over frames/people.

    Units: if ``cfg.normalize_obs``, observations are pre-normalized to
    [-1, 1] by the caller and ``gmof_sigma`` is rescaled accordingly; the
    energy definition itself is unit-agnostic.
    """
    theta, beta, cam = params["theta"], params["beta"], params["cam"]

    precision = (smpl_lib.EXACT_PRECISION
                 if cfg.smpl_precision == "highest" else None)
    out = smpl_lib.smpl_forward(model, beta, theta, precision=precision)
    j3d = joints_lib.select_smpl_joints(out.joints)       # (14, 3)
    j2d = camera_lib.project(
        j3d, cam, model=cfg.camera_model,
        **perspective_kwargs(cfg))

    scale = (2.0 / cfg.img_size) if cfg.normalize_obs else 1.0
    sigma = cfg.gmof_sigma * scale
    e = reprojection_energy(j2d, joints2d_obs, conf, sigma)

    if prior is not None and stage.w_pose_prior > 0.0:
        e = e + stage.w_pose_prior * prior.neg_log_prob(theta[3:]) * scale ** 2
    if stage.w_angle_prior > 0.0:
        e = e + stage.w_angle_prior * priors_lib.angle_prior(theta) * scale ** 2
    if stage.w_shape_prior > 0.0:
        e = e + stage.w_shape_prior * jnp.sum(beta * beta) * scale ** 2
    if capsule_spec is not None and stage.w_interpenetration > 0.0:
        # SMPLify's fourth term (fitting/interpenetration.py): capsule
        # overlap hinge² on the posed joints, m² — weights are large.
        from tpu_pose.fitting import interpenetration as interp_lib
        e = e + (stage.w_interpenetration
                 * interp_lib.interpenetration_penalty(out.joints,
                                                       capsule_spec)
                 * scale ** 2)

    return e
