"""SMPLify-style fit as a fully traced on-device optimization loop.

TPU-native replacement for the reference's python-level ``sess.run``-per-
iteration loop (SURVEY.md §3.3 — its central inefficiency). Here the staged
schedule compiles to a sequence of ``lax.scan`` phases over an optax
optimizer; a whole fit is ONE device program, and ``jax.vmap`` batches it
across frames and people (SURVEY.md §2 rows 10, 15).

Staging (camera-first, then annealed full optimization) is expressed as a
static python loop over ``FitConfig.stages`` — each stage contributes one
scan to the trace, with per-parameter-group masking instead of re-declared
variables (masking, not control flow, is what composes with vmap —
SURVEY.md §7 hard parts #3).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tpu_pose.fitting.energy import fit_energy, perspective_kwargs
from tpu_pose.models import camera as camera_lib
from tpu_pose.models import joints as joints_lib
from tpu_pose.models import smpl as smpl_lib
from tpu_pose.models.smpl_data import SMPLData
from tpu_pose.utils.config import FitConfig, StageConfig


class FitResult(NamedTuple):
    theta: jnp.ndarray        # (72,) fitted pose
    beta: jnp.ndarray         # (10,) fitted shape
    cam: jnp.ndarray          # (3,) fitted camera
    energy: jnp.ndarray       # () final energy value
    energy_history: jnp.ndarray  # (total_iters,) or (0,) if not kept


def _stage_mask(stage: StageConfig, params) -> dict:
    """0/1 gradient mask implementing the stage's parameter groups."""
    theta_mask = jnp.concatenate([
        jnp.full(3, 1.0 if stage.opt_global else 0.0),
        jnp.full(params["theta"].shape[0] - 3,
                 1.0 if stage.opt_pose else 0.0),
    ]).astype(params["theta"].dtype)
    return {
        "theta": theta_mask,
        "beta": jnp.full_like(params["beta"],
                              1.0 if stage.opt_shape else 0.0),
        "cam": jnp.full_like(params["cam"], 1.0 if stage.opt_cam else 0.0),
    }


def _normalize_obs(joints2d, cfg: FitConfig):
    """Map pixel observations to [-1, 1] (see FitConfig.normalize_obs)."""
    if not cfg.normalize_obs:
        return joints2d
    half = cfg.img_size / 2.0
    return (joints2d - half) / half


def yaw_from_limb_order(model: SMPLData, joints2d_norm, conf,
                        cfg: FitConfig):
    """Closed-form global-yaw estimate from 2D limb ordering.

    Monocular 2D evidence is NOT yaw-symmetric once joints carry
    left/right labels: facing the camera puts the subject's left shoulder
    on the image's right, facing away flips it (ROADMAP #2's
    "limb-ordering" residual lever). Generalized to every joint and any
    body model: under a global yaw ψ the rest-pose joint x-coordinate
    projects as x·cosψ + z·sinψ, so the conf-weighted correlation between
    observed (centered) x-coordinates and the rotated rest pose is
    A·cosψ + B·sinψ with

        A = Σ_j w_j·õx_j·x̃_j,   B = Σ_j w_j·õx_j·z̃_j

    (õx/x̃/z̃ = conf-weighted-centered observed-x / rest-x / rest-z).
    The maximizer is ψ* = atan2(B, A) — one closed form, no search, valid
    for the real SMPL and the synthetic stand-in alike.

    Returns:
      yaw: () radians, the correlation-optimal y-axis rotation.
      strength: () in [0, 1], the normalized correlation magnitude — low
        for profile views / degenerate observations, where the estimate
        carries little information and multistart should arbitrate.
    """
    j_rest = jnp.matmul(model.J_regressor, model.v_template,
                        precision=jax.lax.Precision.HIGHEST)
    j14 = joints_lib.select_smpl_joints(j_rest)
    w = conf / (jnp.sum(conf) + 1e-8)
    ox = joints2d_norm[..., 0]
    ox = ox - jnp.sum(w * ox)
    x = j14[:, 0] - jnp.sum(w * j14[:, 0])
    z = j14[:, 2] - jnp.sum(w * j14[:, 2])
    a = jnp.sum(w * ox * x)
    b = jnp.sum(w * ox * z)
    mag = jnp.sqrt(a * a + b * b)
    norm = (jnp.sqrt(jnp.sum(w * ox * ox))
            * jnp.sqrt(jnp.sum(w * (x * x + z * z))) + 1e-8)
    return jnp.arctan2(b, a), mag / norm


def default_init(model: SMPLData, joints2d_norm, conf, cfg: FitConfig):
    """Initial parameter pytree: mean pose (plus the limb-order yaw
    estimate unless ``cfg.yaw_init == "zero"``), zero shape, camera from
    the rest-pose extents heuristic (SURVEY.md §3.3 init line)."""
    theta0 = jnp.zeros(cfg.num_joints_smpl * 3, jnp.float32)
    if cfg.yaw_init == "limb_order":
        yaw, _ = yaw_from_limb_order(model, joints2d_norm, conf, cfg)
        theta0 = theta0.at[1].set(yaw)
    beta0 = jnp.zeros(cfg.num_betas, jnp.float32)
    j_rest = jnp.matmul(model.J_regressor, model.v_template,
                        precision=jax.lax.Precision.HIGHEST)
    j_rest14 = joints_lib.select_smpl_joints(j_rest)
    if cfg.yaw_init == "limb_order":
        # Camera init must see the YAWED rest pose: the x-extent the
        # scale/depth heuristics match against changes with facing.
        c, s = jnp.cos(theta0[1]), jnp.sin(theta0[1])
        rot = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        j_rest14 = j_rest14 @ rot.T
    if cfg.camera_model == camera_lib.WEAK_PERSPECTIVE:
        cam0 = camera_lib.init_weak_perspective(joints2d_norm, j_rest14, conf)
    else:
        cam0 = camera_lib.init_perspective(
            joints2d_norm, j_rest14,
            focal=perspective_kwargs(cfg)["focal"], conf=conf)
    return {"theta": theta0, "beta": beta0, "cam": cam0}


def _run_stage_adam(energy_fn, params, stage: StageConfig,
                    keep_history: bool):
    opt = optax.adam(stage.lr)
    mask = _stage_mask(stage, params)
    opt_state = opt.init(params)

    def step(carry, _):
        p, s = carry
        e, g = jax.value_and_grad(energy_fn)(p)
        g = jax.tree.map(lambda gi, mi: gi * mi, g, mask)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), (e if keep_history else None)

    (params, _), hist = jax.lax.scan(
        step, (params, opt_state), None, length=stage.iters)
    return params, hist


def _run_stage_lbfgs(energy_fn, params, stage: StageConfig,
                     keep_history: bool):
    """L-BFGS stage (optax zoom linesearch) — the traced analogue of the
    reference lineage's ScipyOptimizerInterface path (SURVEY.md §2 row 10).

    Measured on v5e (b=64 noisy synthetic observations, 2026-08-16):
    L-BFGS reaches far lower ENERGY than Adam but WORSE 3D recovery
    (187.9 vs 146.5 mm MPJPE single-start; 172.2 vs 146.5 multistart-4) at
    3-10× the wall-clock — it optimizes the noisy objective too well,
    while Adam's fixed-iteration schedule acts as implicit regularization.
    Adam stays the default; this path exists for reference parity and for
    clean-observation use where exact minimization is wanted.

    Parameter-group freezing is applied by zeroing gradients; frozen
    coordinates then never enter the curvature pairs, so the Hessian
    approximation stays consistent within the stage.
    """
    mask = _stage_mask(stage, params)

    def masked_energy(p):
        # stop_gradient on frozen coords keeps linesearch directional
        # derivatives consistent with the masked gradient.
        p_eff = jax.tree.map(
            lambda pi, mi: pi * mi + jax.lax.stop_gradient(pi) * (1 - mi),
            p, mask)
        return energy_fn(p_eff)

    opt = optax.lbfgs()
    opt_state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(masked_energy)

    def step(carry, _):
        p, s = carry
        e, g = value_and_grad(p, state=s)
        updates, s = opt.update(
            g, s, p, value=e, grad=g, value_fn=masked_energy)
        p = optax.apply_updates(p, updates)
        return (p, s), (e if keep_history else None)

    (params, _), hist = jax.lax.scan(
        step, (params, opt_state), None, length=stage.iters)
    return params, hist


def fit_smpl_single(
    model: SMPLData,
    joints2d: jnp.ndarray,              # (P, 2) pixels, CPM joint order
    conf: jnp.ndarray,                  # (P,)
    cfg: FitConfig = FitConfig(),
    prior: Any = None,
    init: Optional[dict] = None,        # warm start {'theta','beta','cam'}
) -> FitResult:
    """Fit SMPL pose/shape/camera to one frame's 2D joints. Jit-safe;
    ``cfg`` must be static. Entry point parity: reference ``fit_smpl``
    (SURVEY.md §2 row 14)."""
    obs = _normalize_obs(joints2d, cfg)
    params = default_init(model, obs, conf, cfg) if init is None else init

    # SMPLify's capsule interpenetration term: derive the capsule
    # geometry ONCE per fit program (outside the optimization scans) —
    # static topology, traced radii (fitting/interpenetration.py).
    capsule_spec = None
    if any(s.w_interpenetration > 0.0 for s in cfg.stages):
        from tpu_pose.fitting import interpenetration as interp_lib
        capsule_spec = interp_lib.build_capsule_spec(model)

    hists = []
    for stage in cfg.stages:  # static: one scan per stage in the trace
        energy_fn = functools.partial(
            fit_energy, model=model, joints2d_obs=obs, conf=conf,
            stage=stage, cfg=cfg, prior=prior,
            capsule_spec=capsule_spec)
        runner = (_run_stage_lbfgs if cfg.optimizer == "lbfgs"
                  else _run_stage_adam)
        params, hist = runner(energy_fn, params, stage, cfg.keep_history)
        if cfg.keep_history:
            hists.append(hist)

    final_stage = cfg.stages[-1]
    final_e = fit_energy(params, model, obs, conf, final_stage, cfg, prior,
                         capsule_spec=capsule_spec)
    history = (jnp.concatenate(hists) if cfg.keep_history
               else jnp.zeros((0,), jnp.float32))
    return FitResult(theta=params["theta"], beta=params["beta"],
                     cam=params["cam"], energy=final_e,
                     energy_history=history)


def fit_smpl_multistart(
    model: SMPLData,
    joints2d: jnp.ndarray,              # (P, 2) pixels
    conf: jnp.ndarray,                  # (P,)
    cfg: FitConfig = FitConfig(),
    prior: Any = None,
    restarts: int = 4,
    return_all: bool = False,
) -> FitResult:
    """Multi-hypothesis fit: ``restarts`` global-orientation inits (evenly
    spaced yaw), all optimized in parallel via ``vmap``, lowest final
    energy wins. The SMPLify lineage restarts from flipped orientations to
    escape the facing-direction ambiguity of monocular 2D evidence; on TPU
    the hypotheses batch for (almost) free — wall-clock is one fit with a
    ×restarts batch, not ``restarts`` sequential fits.

    ``return_all=True`` returns every hypothesis stacked on a leading
    ``restarts`` axis instead of the argmin winner (the video smoother's
    Viterbi selection consumes the full set — temporal.py)."""
    obs = _normalize_obs(joints2d, cfg)
    base = default_init(model, obs, conf, cfg)
    # Hypothesis grid centered on the limb-order facing estimate (zero
    # under cfg.yaw_init == "zero"): the informed yaw is always hypothesis
    # 0, the rest cover the circle uniformly, and energy still arbitrates.
    yaws = (base["theta"][1]
            + jnp.linspace(0.0, 2.0 * jnp.pi, restarts, endpoint=False))

    def run(yaw):
        init = dict(base, theta=base["theta"].at[1].set(yaw))
        return fit_smpl_single(model, joints2d, conf, cfg=cfg,
                               prior=prior, init=init)

    results = jax.vmap(run)(yaws)
    if return_all:
        return results
    # A diverged restart (NaN energy — possible on the lbfgs path or with
    # degenerate inputs) must never win the argmin: NaN compares false
    # everywhere, making argmin's answer implementation-defined.
    energies = jnp.where(jnp.isnan(results.energy), jnp.inf, results.energy)
    best = jnp.argmin(energies)
    return jax.tree.map(lambda x: x[best], results)


def fit_smpl_batch(model, joints2d, conf, cfg: FitConfig = FitConfig(),
                   prior: Any = None, init: Optional[dict] = None
                   ) -> FitResult:
    """vmapped batch fit over a leading frames×people axis
    (SURVEY.md §2 row 15: within-chip batching is vmap)."""
    fn = functools.partial(fit_smpl_single, cfg=cfg, prior=prior)
    if init is None:
        return jax.vmap(lambda j, c: fn(model, j, c))(joints2d, conf)
    return jax.vmap(lambda j, c, i: fn(model, j, c, init=i))(
        joints2d, conf, init)


def reproject(model: SMPLData, result: FitResult, cfg: FitConfig):
    """Project the fitted model's joints back to the fit's observation
    frame — used by tests and the eval harness to measure residual
    reprojection error."""
    out = smpl_lib.smpl_forward(model, result.beta, result.theta)
    j3d = joints_lib.select_smpl_joints(out.joints)
    return camera_lib.project(
        j3d, result.cam, model=cfg.camera_model,
        **perspective_kwargs(cfg))
