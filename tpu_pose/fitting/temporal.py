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
names temporal init); prefer ``fit_video_independent`` for accuracy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax

from tpu_pose.fitting.fit import FitResult, fit_smpl_single
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
    from tpu_pose.fitting.fit import fit_smpl_multistart

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
