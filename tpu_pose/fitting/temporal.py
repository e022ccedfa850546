"""Temporal / video fitting (SURVEY.md §2 row 11, §3.5).

The reference processes video strictly sequentially, initializing frame t
from frame t−1's solution. TPU-native redesign: a cheap sequential
*warm-start* pass (``lax.scan`` with a truncated stage schedule) propagates
solutions along time, then a full-strength *refine* pass runs ``vmap``-
parallel across all frames. The sequential dependency is confined to the
cheap pass, so wall-clock scales with the refine pass, which is
embarrassingly parallel (and shards across chips — parallel/eval.py).

MEASURED FINDING (v5e, 32-frame synthetic sequences, trained CPM): the
fully-parallel :func:`fit_video_independent` beats temporal warm-starting
on accuracy in every regime we tested — clean 2D (41.8 vs 49–55 mm
PA-MPJPE) and noisy/occluded 2D (50.3 vs 57–59 mm) — at the same
wall-clock, because the warm start biases each frame toward its
predecessor's basin while the vmapped full fit converges per-frame
anyway. Temporal init mattered in the reference because its fits ran
sequentially on host; on TPU the batch axis makes it unnecessary.
``fit_video`` is kept for reference-capability parity (BASELINE config 4
names temporal init).

The accuracy frontier is :func:`fit_video_smooth` — a JOINT whole-
sequence optimization (all frames in one energy, shared β, temporal
smoothness, Viterbi-consistent yaw hypotheses) that the reference's
frame-at-a-time host loop could never afford: measured 24 % better
PA-MPJPE than independent fits with 3× less frame-to-frame jitter (see
its docstring). Preference order: ``fit_video_smooth`` >
``fit_video_independent`` > ``fit_video``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from tpu_pose.fitting.energy import fit_energy
from tpu_pose.fitting.fit import (FitResult, _normalize_obs,
                                  fit_smpl_multistart, fit_smpl_single)
from tpu_pose.models.smpl_data import SMPLData
from tpu_pose.utils.config import FitConfig


def warmstart_schedule(cfg: FitConfig, iters: int = 30) -> FitConfig:
    """Truncated single-stage schedule for the sequential pass: the previous
    frame's solution is already near-optimal, so a short full-parameter
    polish suffices."""
    last = cfg.stages[-1]
    stage = dataclasses.replace(last, iters=iters)
    return dataclasses.replace(cfg, stages=(stage,))


def fit_video(
    model: SMPLData,
    joints2d_seq,                 # (T, P, 2) pixels
    conf_seq,                     # (T, P)
    cfg: FitConfig = FitConfig(),
    prior: Any = None,
    warm_iters: int = 30,
    anchor_restarts: int = 4,
) -> FitResult:
    """Temporal-init video fit (BASELINE config 4).

    Pass 1 (sequential, cheap): frame 0 gets a full MULTI-START staged
    fit — the anchor's yaw basin propagates to every later frame, so a
    wrong facing direction at frame 0 would poison the whole sequence
    (measured: anchor without restarts scored WORSE than independent
    per-frame fits, 49.1 vs 41.8 mm PA-MPJPE on a synthetic sequence).
    Frames 1..T-1 get ``warm_iters`` polish steps seeded from frame t−1
    via scan. Pass 2 (parallel): every frame refined with the full last
    stage, vmapped — wall-clock is one fit, not T fits.
    """
    # Frame 0 (anchor): multi-start staged fit from the cold-start init.
    if anchor_restarts > 1:
        first = fit_smpl_multistart(model, joints2d_seq[0], conf_seq[0],
                                    cfg=cfg, prior=prior,
                                    restarts=anchor_restarts)
    else:
        first = fit_smpl_single(model, joints2d_seq[0], conf_seq[0],
                                cfg=cfg, prior=prior)

    warm_cfg = warmstart_schedule(cfg, warm_iters)
    warm_fit = functools.partial(fit_smpl_single, cfg=warm_cfg, prior=prior)

    def step(prev_params, frame):
        j2d, c = frame
        res = warm_fit(model, j2d, c, init=prev_params)
        params = {"theta": res.theta, "beta": res.beta, "cam": res.cam}
        return params, params

    init_params = {"theta": first.theta, "beta": first.beta,
                   "cam": first.cam}
    _, warm_params = jax.lax.scan(
        step, init_params, (joints2d_seq[1:], conf_seq[1:]))

    # Prepend frame 0 to form (T, ...) warm-start parameters.
    all_params = jax.tree.map(
        lambda f, w: jax.numpy.concatenate([f[None], w], axis=0),
        init_params, warm_params)

    # Parallel refine with the final stage at full strength.
    refine_cfg = warmstart_schedule(cfg, cfg.stages[-1].iters)
    refine = functools.partial(fit_smpl_single, cfg=refine_cfg, prior=prior)
    return jax.vmap(lambda j, c, p: refine(model, j, c, init=p))(
        joints2d_seq, conf_seq, all_params)


def fit_video_independent(model, joints2d_seq, conf_seq,
                          cfg: FitConfig = FitConfig(), prior: Any = None
                          ) -> FitResult:
    """Baseline without temporal init (every frame cold-started, vmapped) —
    used to measure what temporal warm-starting buys."""
    fn = functools.partial(fit_smpl_single, cfg=cfg, prior=prior)
    return jax.vmap(lambda j, c: fn(model, j, c))(joints2d_seq, conf_seq)


def _viterbi_select(energy: jnp.ndarray,     # (T, R) hypothesis energies
                    glob: jnp.ndarray,       # (T, R, 3) global orientations
                    weight: float,
                    anchor_glob: jnp.ndarray | None = None,
                    frame_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Minimum-cost hypothesis path through the (frame × restart) lattice.

    Unary cost = fit energy; pairwise cost = ``weight``·‖Δθ_global‖²
    between consecutive frames' hypotheses. Per-frame argmin can flip the
    facing direction mid-sequence (the monocular yaw ambiguity is near-
    symmetric in energy); the DP picks the globally consistent path
    instead. One ``lax.scan`` forward + one reversed backtrack scan —
    fully traced, O(T·R²) with R ≤ 8. Returns (T,) int32 selections.
    ``anchor_glob`` (3,) adds a transition cost from a virtual frame -1
    (the previous chunk's last solution — streaming, fit_video_stream),
    so the selected path cannot flip facing at a chunk boundary.
    """
    e = jnp.where(jnp.isnan(energy), jnp.inf, energy)
    if frame_mask is not None:
        # Padded frames (mask 0, streaming) contribute no unary cost and
        # no transition cost — they must not steer the real frames.
        # where(), NOT multiplication: a diverged pad hypothesis has
        # e = inf and inf·0 = NaN, which would poison the whole DP.
        e = jnp.where(frame_mask[:, None] > 0, e, 0.0)
        step_w = weight * frame_mask[1:] * frame_mask[:-1]
    else:
        step_w = jnp.full(e.shape[0] - 1, weight)
    if anchor_glob is not None:
        e = e.at[0].add(weight * jnp.sum(
            (glob[0] - anchor_glob[None, :]) ** 2, -1))

    def fwd(prev_cost, inp):
        e_t, g_t, g_prev, w_t = inp
        trans = jnp.sum(
            (g_t[None, :, :] - g_prev[:, None, :]) ** 2, -1)  # (R_prev, R)
        tot = prev_cost[:, None] + w_t * trans + e_t[None, :]
        return jnp.min(tot, axis=0), jnp.argmin(tot, axis=0)

    final_cost, backs = jax.lax.scan(
        fwd, e[0], (e[1:], glob[1:], glob[:-1], step_w))
    last = jnp.argmin(final_cost)

    def back(nxt, bp):
        cur = bp[nxt]
        return cur, cur

    _, path_head = jax.lax.scan(back, last, backs, reverse=True)
    return jnp.concatenate([path_head, last[None]]).astype(jnp.int32)


def fit_video_smooth(
    model: SMPLData,
    joints2d_seq,                 # (T, P, 2) pixels
    conf_seq,                     # (T, P)
    cfg: FitConfig = FitConfig(),
    prior: Any = None,
    restarts: int = 4,
    select_weight: float | None = None,
    smooth_theta: float | None = None,
    smooth_cam: float | None = None,
    shared_beta: bool = True,
    iters: int = 100,
    lr: float = 0.01,
    anchor: dict | None = None,
    frame_mask: jnp.ndarray | None = None,
) -> FitResult:
    """Joint whole-sequence fit: the TPU-native video formulation the
    reference's frame-at-a-time loop could never afford (SURVEY.md §3.5).

    Three traced passes, one device program:

    1. **Hypothesis generation** — per-frame multi-start fits, ALL
       ``restarts`` yaw hypotheses kept (``fit_smpl_multistart
       return_all``), vmapped over frames: (T, R) parallel fits.
    2. **Viterbi selection** — the globally-consistent hypothesis path
       (energy + global-orientation continuity), not per-frame argmin,
       so the facing direction cannot flip mid-sequence.
    3. **Joint refinement** — Adam over the WHOLE sequence at once:
       Σ_t frame_energy + λ_θ‖θ_t−θ_{t−1}‖² + λ_c‖cam_t−cam_{t−1}‖²,
       with ONE shared β for the sequence (one body, the standard video
       constraint; ``shared_beta=False`` keeps per-frame shapes).

    Smoothness weights are in the same internally-scaled units as the
    prior weights (multiplied by ``scale²``), so they behave identically
    under ``normalize_obs`` on/off. Returns per-frame results; ``beta``
    is broadcast (T, 10) when shared.

    MEASURED (CPU, 16-frame synthetic sequence, 3 px observation noise,
    EM-fitted GMM-4 prior, 2026-08-16): independent vmapped fits 27.7 mm
    PA-MPJPE / 0.63 rad mean frame-to-frame ‖Δθ‖; this smoother at the
    defaults 21.1 mm / 0.19 — a 24 % accuracy gain AND 3× less jitter.
    The weight sweep was flat between λ≈800–1600 (21.0–21.4 mm); 100
    refine iters beat 200 (longer re-fits the noise, matching the
    DEFAULT_STAGES finding in utils/config.py).

    ``anchor`` — {'theta','beta','cam'} of the frame PRECEDING this
    sequence (a previous chunk's last solution): couples the Viterbi
    selection, the shared-β init, and the smoothness energy across the
    boundary so chunked streaming (:func:`fit_video_stream`) stays
    continuous.

    ``frame_mask`` (T,) 0/1 — frames with mask 0 (streaming pad frames)
    are excluded from the data energy, the smoothness coupling, and the
    Viterbi costs, so prior-driven pad poses cannot pull real frames.

    The smoothing/selection weights default to the config's
    ``video_smooth_theta`` / ``video_smooth_cam`` /
    ``video_select_weight`` (utils/config.py — config-visible like every
    SMPLify λ); pass explicitly to override.
    """
    select_weight = (cfg.video_select_weight if select_weight is None
                     else select_weight)
    smooth_theta = (cfg.video_smooth_theta if smooth_theta is None
                    else smooth_theta)
    smooth_cam = cfg.video_smooth_cam if smooth_cam is None else smooth_cam
    t_frames = joints2d_seq.shape[0]
    if restarts > 1:
        all_res = jax.vmap(lambda j, c: fit_smpl_multistart(
            model, j, c, cfg=cfg, prior=prior, restarts=restarts,
            return_all=True))(joints2d_seq, conf_seq)      # (T, R, ...)
        sel = _viterbi_select(
            all_res.energy, all_res.theta[..., :3], select_weight,
            anchor_glob=None if anchor is None else anchor["theta"][:3],
            frame_mask=frame_mask)
        base = jax.tree.map(
            lambda x: x[jnp.arange(t_frames), sel], all_res)
    else:
        base = fit_video_independent(model, joints2d_seq, conf_seq,
                                     cfg=cfg, prior=prior)

    if anchor is not None and shared_beta:
        beta0 = anchor["beta"]           # one body across ALL chunks
    elif shared_beta and frame_mask is not None:
        # Masked mean: pad frames' per-frame β hypotheses depend on pad
        # CONTENT, and averaging them into the shared-β init leaks pads
        # into every real frame's fit (caught by the pad-invariance
        # test). An all-masked track (api substitutes an all-ones mask
        # before calling) never reaches here with sum(mask)=0, but the
        # epsilon keeps it safe anyway.
        w = frame_mask.astype(base.beta.dtype)
        beta0 = ((base.beta * w[:, None]).sum(0)
                 / (w.sum() + 1e-8))
    else:
        beta0 = base.beta.mean(0) if shared_beta else base.beta
    params = {"theta": base.theta, "beta": beta0, "cam": base.cam}
    obs = _normalize_obs(joints2d_seq, cfg)
    stage = cfg.stages[-1]
    scale = (2.0 / cfg.img_size) if cfg.normalize_obs else 1.0
    s2 = scale * scale
    capsule_spec = None
    if stage.w_interpenetration > 0.0:
        # SMPLify's interpenetration term follows the last stage's
        # weight into the joint refine, like the other priors.
        from tpu_pose.fitting import interpenetration as interp_lib
        capsule_spec = interp_lib.build_capsule_spec(model)

    def beta_per_frame(beta):
        if shared_beta:
            return jnp.broadcast_to(beta, (t_frames, beta.shape[-1]))
        return beta

    def frame_energies(p):
        e = jax.vmap(
            lambda th, be, ca, j, c: fit_energy(
                {"theta": th, "beta": be, "cam": ca},
                model, j, c, stage, cfg, prior,
                capsule_spec=capsule_spec)
        )(p["theta"], beta_per_frame(p["beta"]), p["cam"], obs, conf_seq)
        # where(), not multiplication: a NaN/inf pad-frame energy times 0
        # is NaN and would take the whole sequence's gradients down.
        return e if frame_mask is None else jnp.where(frame_mask > 0, e,
                                                      0.0)

    step_mask = (jnp.ones(t_frames - 1) if frame_mask is None
                 else frame_mask[1:] * frame_mask[:-1])

    def total_energy(p):
        dth = p["theta"][1:] - p["theta"][:-1]
        dca = p["cam"][1:] - p["cam"][:-1]
        e = (frame_energies(p).sum()
             + smooth_theta * s2 * jnp.sum(
                 step_mask * jnp.sum(dth * dth, -1))
             + smooth_cam * s2 * jnp.sum(
                 step_mask * jnp.sum(dca * dca, -1)))
        if anchor is not None:
            # Boundary smoothness to the (fixed) previous chunk's last
            # frame — same weights as the in-sequence terms.
            dth0 = p["theta"][0] - anchor["theta"]
            dca0 = p["cam"][0] - anchor["cam"]
            e = (e + smooth_theta * s2 * jnp.sum(dth0 * dth0)
                 + smooth_cam * s2 * jnp.sum(dca0 * dca0))
        return e

    opt = optax.adam(lr)

    def step(carry, _):
        p, s = carry
        g = jax.grad(total_energy)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), None

    (params, _), _ = jax.lax.scan(
        step, (params, opt.init(params)), None, length=iters)

    return FitResult(theta=params["theta"],
                     beta=beta_per_frame(params["beta"]),
                     cam=params["cam"],
                     energy=frame_energies(params),
                     energy_history=jnp.zeros((0,), jnp.float32))


def fit_video_stream(
    model: SMPLData,
    joints2d_seq,                 # (T, P, 2) pixels, T arbitrary
    conf_seq,                     # (T, P)
    cfg: FitConfig = FitConfig(),
    prior: Any = None,
    chunk: int = 64,
    **smooth_kw,
) -> FitResult:
    """Arbitrary-length video via anchored fixed-size chunks (streaming /
    bounded-memory serving; the in-device :func:`fit_video_smooth` holds
    the WHOLE sequence in one program, which caps T by HBM).

    Each chunk runs the joint smooth fit COMPILED ONCE for the chunk
    shape; chunk i+1 receives chunk i's last solution as its ``anchor``
    (Viterbi facing continuity + boundary smoothness + the SAME shared β
    carried through every chunk). The final partial chunk pads by
    repeating its last frame with zero confidence — static shapes, one
    compiled program total.

    Host loop over chunks (device work per chunk is one program; the
    sequential carry is inherent to streaming). Returns concatenated
    (T, ...) results.
    """
    t_total = joints2d_seq.shape[0]
    if t_total <= chunk:
        return fit_video_smooth(model, joints2d_seq, conf_seq, cfg=cfg,
                                prior=prior, **smooth_kw)

    fit_first = jax.jit(functools.partial(
        fit_video_smooth, cfg=cfg, prior=prior, **smooth_kw))
    fit_anchored = jax.jit(functools.partial(
        fit_video_smooth, cfg=cfg, prior=prior, **smooth_kw))

    outs = []
    anchor = None
    for start in range(0, t_total, chunk):
        j = joints2d_seq[start:start + chunk]
        c = conf_seq[start:start + chunk]
        n_real = j.shape[0]
        mask = jnp.ones(chunk)
        if n_real < chunk:  # pad: repeat last frame, zero confidence
            reps = chunk - n_real
            j = jnp.concatenate(
                [j, jnp.broadcast_to(j[-1], (reps,) + j.shape[1:])])
            c = jnp.concatenate([c, jnp.zeros((reps,) + c.shape[1:],
                                              c.dtype)])
            mask = mask.at[n_real:].set(0.0)
        if anchor is None:
            res = fit_first(model, j, c, frame_mask=mask)
        else:
            res = fit_anchored(model, j, c, anchor=anchor,
                               frame_mask=mask)
        anchor = {"theta": res.theta[n_real - 1],
                  "beta": res.beta[n_real - 1],
                  "cam": res.cam[n_real - 1]}
        outs.append(jax.tree.map(lambda x: x[:n_real], res))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
