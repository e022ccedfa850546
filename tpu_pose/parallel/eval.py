"""Sharded dataset-scale evaluation (SURVEY.md §3.5, BASELINE config 5).

The fused estimate→fit program shards its batch axis across the ``data``
mesh; metrics reduce with a ``psum`` — the only collectives this workload
needs (SURVEY.md §2 row 16). Resumability: the eval loop checkpoints its
cursor + accumulated metric sums (SURVEY.md §5 'Failure detection').
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Iterator, Optional

import jax

from tpu_pose.parallel import mesh as mesh_lib
from tpu_pose.utils import metrics as metrics_lib


def sharded_fused_fn(estimator, mesh):
    """jit the fused estimate_and_fit with batch sharded over the mesh and
    params/model replicated (XLA inserts any needed collectives)."""
    batch_s = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)

    fn = jax.jit(
        estimator._estimate_and_fit_impl,
        in_shardings=(repl, repl, batch_s),
        out_shardings=batch_s,
    )
    cpm_params = mesh_lib.replicate(estimator.cpm_params, mesh)
    smpl_model = mesh_lib.replicate(estimator.smpl_model, mesh)

    def run(images):
        return fn(cpm_params, smpl_model, images)

    return run


@dataclasses.dataclass
class EvalState:
    """Resumable accumulator (saved as json every ``save_every``)."""
    cursor: int = 0
    n: int = 0
    sum_mpjpe_p1: float = 0.0      # root-aligned, NO scale (Protocol 1)
    sum_mpjpe_scaled: float = 0.0  # RMS-extent-matched (explicit deviation)
    sum_pa_mpjpe: float = 0.0      # Procrustes-aligned
    n2d: int = 0                   # frames with 2D ground truth
    sum_pckh: float = 0.0          # PCKh@0.5 accumulator
    n_mesh: int = 0                # frames with SMPL mesh ground truth
    sum_pve: float = 0.0           # centroid-aligned per-vertex error
    sum_pa_pve: float = 0.0        # Procrustes-aligned per-vertex error

    def save(self, path: str):
        # Atomic write: a crash mid-save must not truncate the resume
        # cursor (same tmp+replace idiom as utils/checkpoint.py).
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dataclasses.asdict(self), f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "EvalState":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            fields = {f.name for f in dataclasses.fields(cls)}
            if set(d) == fields:
                return cls(**d)
            # Schema drift (checkpoint from an older metric layout):
            # partial accumulator sums cannot be resumed consistently —
            # start the eval over rather than average mismatched fields.
            return cls()
        return cls()



def _stream_eval(run, batches, state, accumulate, mesh,
                 checkpoint_path: Optional[str]) -> None:
    """Shared streaming driver for every evaluator: 1-deep software
    pipeline (dispatch batch i+1's device program BEFORE accumulating
    batch i's host metrics, so host work and the i+1 input transfer
    overlap device compute — JAX dispatch is async; accumulate()'s
    device_get is the synchronization point), cursor resume, and
    device-count padding for the sharded path. Measured on v5e via axon
    (3×128 synthetic frames): 125 → 172 frames/s vs the round-1
    serialized loop. ONE copy so the pipeline/resume/padding semantics
    cannot drift between the 3D, PCK, and OKS evaluators."""
    n_dev = mesh.devices.size if mesh is not None else 1
    pending = None
    for i, batch in enumerate(batches):
        if i < state.cursor:
            continue  # resume: skip already-accumulated batches
        images = batch["images"]
        n_real = int(images.shape[0])
        if mesh is not None and n_real % n_dev != 0:
            # Uneven final batch: edge-pad up to the device count so the
            # sharded program's static shape holds, slice results back.
            images, _ = mesh_lib.pad_to_multiple(images, n_dev)
        res = run(images)
        if pending is not None:
            accumulate(*pending)
        pending = (res, batch, n_real, i)
    if pending is not None:
        accumulate(*pending)
    if checkpoint_path:
        state.save(checkpoint_path)


def evaluate_h36m_style(
    estimator,
    batches: Iterator,          # yields dicts: images (B,H,W,3), gt_joints3d
    mesh=None,
    select_joints: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    save_every: int = 10,
    root_index: int = 0,
    primary_protocol: str = "p1",
    pckh_threshold: float = 0.5,
    gt_smpl_model=None,
):
    """Streaming eval of the fused pipeline, all standard protocols at once:

    - ``mpjpe_p1``     — H3.6M Protocol 1: root-aligned, NO scale
      adjustment. The standard headline number; absolute depth/scale must
      come from the camera model (use the perspective camera for fits
      scored this way — weak-perspective fits have a free monocular scale
      and will score poorly here by construction).
    - ``mpjpe_scaled`` — centroid-aligned + per-frame RMS-extent scale
      match. NOT a standard protocol; explicitly named so it can never be
      mistaken for Protocol 1 (it was round 1's silent default).
    - ``pa_mpjpe``     — Procrustes-aligned (Protocol 2 family).
    - ``pckh``         — PCKh@``pckh_threshold`` of decoded 2D joints,
      accumulated for batches that carry ``gt_joints2d`` (same pixel frame
      as the estimator's decoded joints).
    - ``pve`` / ``pa_pve`` — mesh-level Per-Vertex Error
      (centroid-aligned / Procrustes-aligned), accumulated for batches
      that carry SMPL ground truth: ``gt_vertices`` directly, or
      ``gt_theta`` (B, 72) + ``gt_beta`` (B, 10) posed through the
      estimator's SMPL model (the 3DPW-style protocol — both meshes use
      the official model file, only parameters differ). Pass
      ``gt_smpl_model`` (a loaded SMPLData) to pose GT through a
      DIFFERENT model than the predictor's — e.g. the official gendered
      3DPW protocol, where GT uses the male/female model while the
      predictor fits the neutral one (convert per-gender shard dirs; the
      adapter records ``gt_gender`` codes).

    ``gt_joints3d`` must be in the SMPL 24-joint frame, or provide
    ``select_joints`` mapping predicted (B,24,3) → GT convention (the root
    joint is ``root_index`` in that convention). ``primary_protocol``
    ('p1' | 'scaled' | 'pa') selects which number the legacy ``mpjpe`` key
    aliases.
    """
    state = (EvalState.load(checkpoint_path) if checkpoint_path
             else EvalState())
    run = (sharded_fused_fn(estimator, mesh) if mesh is not None
           else (lambda im: estimator.estimate_and_fit(im)))

    import numpy as np

    # Mesh-level GT (3DPW-style shards): batches carrying gt_vertices,
    # or gt_theta + gt_beta (GT meshes posed through the estimator's
    # SMPL model — the standard protocol: both meshes use the official
    # model file, only the parameters differ). One tiny jitted forward,
    # compiled once; it runs in accumulate() so it overlaps the NEXT
    # batch's fused program under the 1-deep pipeline.
    gt_verts_fn_cache = []

    def _gt_vertices(batch, n_real):
        if "gt_vertices" in batch:
            return np.asarray(batch["gt_vertices"], np.float64)[:n_real]
        if "gt_theta" in batch and "gt_beta" in batch:
            if not gt_verts_fn_cache:
                from tpu_pose.models import smpl as smpl_lib
                gt_model = (estimator.smpl_model if gt_smpl_model is None
                            else gt_smpl_model)
                gt_verts_fn_cache.append(jax.jit(
                    lambda b, t: smpl_lib.smpl_forward_batch(
                        gt_model, b, t).vertices))
            v = gt_verts_fn_cache[0](
                np.asarray(batch["gt_beta"], np.float32),
                np.asarray(batch["gt_theta"], np.float32))
            return np.asarray(v, np.float64)[:n_real]
        return None

    def accumulate(res, batch, n_real, batch_index):
        """Host-side metrics for one COMPLETED batch. The np.asarray is
        the only device→host transfer (and the only wait) per batch; all
        metrics run in numpy so no tiny device programs stall the
        pipeline (PA-MPJPE must be host anyway — jnp SVD wedges the TPU
        compile helper, see metrics.pa_mpjpe_np)."""
        pred = np.asarray(res.joints3d)[:n_real]
        if select_joints is not None:
            pred = np.asarray(select_joints(pred))
        gt = np.asarray(batch["gt_joints3d"])
        state.n += n_real
        state.sum_mpjpe_p1 += float(metrics_lib.mpjpe_np(
            pred, gt, align_root=True, root_index=root_index).sum())
        state.sum_mpjpe_scaled += float(
            metrics_lib.scaled_mpjpe_np(pred, gt).sum())
        state.sum_pa_mpjpe += float(metrics_lib.pa_mpjpe_np(pred, gt).sum())
        if "gt_joints2d" in batch:
            state.n2d += n_real
            state.sum_pckh += float(metrics_lib.pckh_np(
                np.asarray(res.joints2d)[:n_real], batch["gt_joints2d"],
                threshold=pckh_threshold).sum())
        gt_verts = _gt_vertices(batch, n_real)
        if gt_verts is not None:
            pred_v = np.asarray(res.vertices)[:n_real]
            state.n_mesh += n_real
            state.sum_pve += float(
                metrics_lib.pve_np(pred_v, gt_verts).sum())
            state.sum_pa_pve += float(
                metrics_lib.pa_pve_np(pred_v, gt_verts).sum())
        state.cursor = batch_index + 1
        if checkpoint_path and (batch_index + 1) % save_every == 0:
            state.save(checkpoint_path)

    # Steady state HERE is bound by the host→device image transfer (the
    # axon tunnel moves ~41 MB/s measured: a 52 MB uint8 batch costs
    # ~0.6 s against 0.18 s of compute); on a real PCIe host link the
    # same loop is compute-bound (~690 frames/s).
    _stream_eval(run, batches, state, accumulate, mesh, checkpoint_path)
    n = max(state.n, 1)
    out = {
        "mpjpe_p1": state.sum_mpjpe_p1 / n,
        "mpjpe_scaled": state.sum_mpjpe_scaled / n,
        "pa_mpjpe": state.sum_pa_mpjpe / n,
        "num_frames": state.n,
    }
    out["mpjpe"] = out["mpjpe_p1" if primary_protocol == "p1" else
                       "mpjpe_scaled" if primary_protocol == "scaled" else
                       "pa_mpjpe"]
    if state.n2d:
        out["pckh"] = state.sum_pckh / state.n2d
        out["num_frames_2d"] = state.n2d
    if state.n_mesh:
        # Mesh-level protocol (PVE centroid-aligned / PA-PVE), for
        # batches carrying SMPL GT — see _gt_vertices above.
        out["pve"] = state.sum_pve / state.n_mesh
        out["pa_pve"] = state.sum_pa_pve / state.n_mesh
        out["num_frames_mesh"] = state.n_mesh
    return out


def sharded_2d_fn(estimator, mesh):
    """jit ``estimate_2d`` with the batch sharded over the mesh and
    params replicated — the 2D-only counterpart of
    :func:`sharded_fused_fn` for detector benchmarks (MPII/LSP)."""
    from tpu_pose.models import cpm as cpm_lib
    batch_s = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    fn = jax.jit(
        lambda params, images: cpm_lib.estimate_2d_microbatched(
            params, images, cfg=estimator.cpm_cfg,
            chunk=estimator.cpm_microbatch,
            refine_center=estimator.refine_center,
            refine_scale=estimator.refine_scale,
            scale_from_refined=estimator.scale_from_refined,
            flip_tta=estimator.flip_tta,
            scale_tta=getattr(estimator, "scale_tta", ()),
            letterbox=estimator.letterbox),
        in_shardings=(repl, batch_s), out_shardings=batch_s)
    # The f32/bf16 param set, matching sharded_fused_fn (eval favors
    # accuracy; the int8 serving set is bench-gated separately).
    params = mesh_lib.replicate(estimator.cpm_params, mesh)

    def run(images):
        return fn(params, images)

    return run


@dataclasses.dataclass
class Eval2DState:
    """Resumable accumulator for the 2D-detector eval (PCK protocols).
    ``norm`` is recorded so a resume under a different normalizer starts
    fresh instead of mixing protocols."""
    cursor: int = 0
    n: int = 0
    sum_pckh: float = 0.0
    norm: str = "head"
    joint_hits: list = dataclasses.field(
        default_factory=lambda: [0.0] * 14)
    joint_counts: list = dataclasses.field(
        default_factory=lambda: [0.0] * 14)
    # PCK curve accumulators at 10 evenly-spaced fractions of the
    # headline threshold (t·k/10, k=1..10) — the MPII-style PCKh curve;
    # auc = its mean (normalized area over [0, threshold]).
    curve_hits: list = dataclasses.field(
        default_factory=lambda: [0.0] * 10)

    def save(self, path: str):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dataclasses.asdict(self), f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "Eval2DState":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if set(d) == {f.name for f in dataclasses.fields(cls)}:
                return cls(**d)
        return cls()


def evaluate_pckh(
    estimator,
    batches: Iterator,          # dicts: images, gt_joints2d[, conf, headsize]
    mesh=None,
    threshold: float = 0.5,
    norm: str = "head",
    checkpoint_path: Optional[str] = None,
    save_every: int = 10,
):
    """Streaming 2D-detector evaluation: PCK@``threshold`` over shards
    from :mod:`tpu_pose.data.datasets` (MPII/LSP protocols — SURVEY.md
    §6 CPM quality rows).

    ``norm`` selects the protocol's normalizer:

    - ``"head"`` (PCKh, the MPII protocol): the batch's ``headsize``
      (B,) when present (official 0.6·head-rect size), else the
      head–neck GT segment proxy.
    - ``"torso"`` (PCK, the LSP protocol — e.g. PCK@0.2): the GT torso
      diameter, left-shoulder↔right-hip distance (CPM slots 5/8), per
      the classic Yang&Ramanan definition the CPM paper's LSP numbers
      use. ``headsize`` is ignored.

    Batches carry ``images`` (B, S, S, 3) and ``gt_joints2d`` (B, 14, 2)
    in the same pixel frame; ``conf`` (B, 14) masks unannotated joints
    (official protocol). Same 1-deep pipeline + cursor-resume as the 3D
    evaluator. Returns the overall fraction plus the official-style
    per-joint breakdown.
    """
    if norm not in ("head", "torso"):
        raise ValueError(f"norm must be 'head' or 'torso', got {norm!r}")
    import numpy as np
    state = (Eval2DState.load(checkpoint_path) if checkpoint_path
             else Eval2DState())
    if state.norm != norm:
        state = Eval2DState(norm=norm)   # protocol change: start fresh
    run = (sharded_2d_fn(estimator, mesh) if mesh is not None
           else (lambda im: estimator.estimate_2d(im)))

    def accumulate(res, batch, n_real, batch_index):
        # Both paths return (heatmaps, joints2d, conf): Estimate2DResult
        # is a NamedTuple; the sharded fn returns the raw tuple.
        pred = np.asarray(res[1], np.float64)[:n_real]
        gt = np.asarray(batch["gt_joints2d"], np.float64)[:n_real]
        headsize = (np.asarray(batch["headsize"])[:n_real]
                    if "headsize" in batch else None)
        mask = (np.asarray(batch["conf"])[:n_real] > 0
                if "conf" in batch else np.ones(gt.shape[:2], bool))
        if norm == "torso":
            # The torso normalizer needs BOTH endpoint joints annotated:
            # an unlabeled l_shoulder/r_hip sits at the loader's (0, 0)
            # sentinel and would yield a garbage diameter — exclude the
            # sample (the protocol's treatment), don't score it.
            valid = mask[:, 5] & mask[:, 8]
            pred, gt, mask = pred[valid], gt[valid], mask[valid]
            if headsize is not None:
                headsize = headsize[valid]
        state.n += int(gt.shape[0])
        # One hit/mask computation feeds BOTH accumulators — the overall
        # PCKh is exactly the masked per-example mean of these hits
        # (numerically identical to metrics_lib.pckh_np; tested).
        if norm == "torso":
            # LSP PCK: l_shoulder (CPM 5) ↔ r_hip (CPM 8) diameter.
            hs = np.linalg.norm(gt[:, 5] - gt[:, 8], axis=-1)
        elif headsize is not None:
            hs = np.asarray(headsize, np.float64)
        else:
            hs = np.linalg.norm(gt[:, 0] - gt[:, 1], axis=-1)
        dist = np.linalg.norm(pred - gt, axis=-1)
        hit = (dist <= threshold * hs[:, None]).astype(np.float64)
        m = mask.astype(np.float64)
        denom = np.maximum(m.sum(-1), 1.0)
        state.sum_pckh += float(((hit * m).sum(-1) / denom).sum())
        for k in range(10):
            t_k = threshold * (k + 1) / 10.0
            h_k = (dist <= t_k * hs[:, None]).astype(np.float64)
            state.curve_hits[k] += float(((h_k * m).sum(-1) / denom).sum())
        for j in range(gt.shape[1]):
            state.joint_hits[j] += float((hit[:, j] * m[:, j]).sum())
            state.joint_counts[j] += float(m[:, j].sum())
        state.cursor = batch_index + 1
        if checkpoint_path and (batch_index + 1) % save_every == 0:
            state.save(checkpoint_path)

    _stream_eval(run, batches, state, accumulate, mesh, checkpoint_path)

    n = max(state.n, 1)
    curve = {round(threshold * (k + 1) / 10.0, 4):
             state.curve_hits[k] / n for k in range(10)}
    out = {"pckh": state.sum_pckh / n,
           "num_frames": state.n,
           # MPII-style PCK curve + its normalized area (the standard
           # companion figure to the @threshold point).
           "per_threshold": curve,
           "auc": float(np.mean(list(curve.values()))),
           "per_joint": {}}
    from tpu_pose.models import joints as joints_lib
    for j, name in enumerate(joints_lib.CPM_JOINT_NAMES):
        c = state.joint_counts[j]
        out["per_joint"][name] = state.joint_hits[j] / c if c else 0.0
    return out


# OKS AP thresholds: the COCO ladder 0.50:0.05:0.95.
OKS_THRESHOLDS = tuple(round(0.5 + 0.05 * i, 2) for i in range(10))


@dataclasses.dataclass
class EvalOKSState:
    """Resumable accumulator for the OKS protocol (COCO keypoints)."""
    cursor: int = 0
    n: int = 0
    sum_oks: float = 0.0
    hits: list = dataclasses.field(
        default_factory=lambda: [0.0] * len(OKS_THRESHOLDS))

    def save(self, path: str):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dataclasses.asdict(self), f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "EvalOKSState":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if (set(d) == {f.name for f in dataclasses.fields(cls)}
                    and len(d["hits"]) == len(OKS_THRESHOLDS)):
                return cls(**d)
        return cls()


def evaluate_oks(
    estimator,
    batches: Iterator,          # dicts: images, gt_joints2d[, conf, area]
    mesh=None,
    checkpoint_path: Optional[str] = None,
    save_every: int = 10,
):
    """Streaming 2D-detector evaluation under the COCO OKS protocol.

    Per sample, OKS (utils/metrics.oks_np — official per-keypoint
    sigmas mapped to CPM-14, models/joints.CPM_OKS_SIGMA) between the
    decoded joints and ``gt_joints2d``, gated by ``conf`` > 0 (the COCO
    δ(v_i>0) term). The object scale s² is the batch's ``area`` (crop
    pixels — ``data.datasets.coco_to_shards`` carries the annotation's
    segmentation area through the crop affine) or, when absent, the
    labeled-keypoint-bbox stand-in (metrics.keypoint_bbox_area_np).

    Reports ``mean_oks`` plus the COCO threshold ladder: ``ap`` is the
    mean over t ∈ 0.50:0.05:0.95 of the fraction of people with
    OKS ≥ t, with ``ap50``/``ap75`` the usual named points. This is the
    top-down simplification of COCO's detection AP: one hypothesis per
    ground-truth person (the evaluator scores person-centric crops), so
    matching is the identity and precision == recall — the convention
    top-down pose papers use when boxes are given.

    Same 1-deep pipeline + cursor-resume as :func:`evaluate_pckh`.
    """
    import numpy as np
    state = (EvalOKSState.load(checkpoint_path) if checkpoint_path
             else EvalOKSState())
    run = (sharded_2d_fn(estimator, mesh) if mesh is not None
           else (lambda im: estimator.estimate_2d(im)))

    def accumulate(res, batch, n_real, batch_index):
        pred = np.asarray(res[1], np.float64)[:n_real]
        gt = np.asarray(batch["gt_joints2d"], np.float64)[:n_real]
        mask = (np.asarray(batch["conf"])[:n_real] > 0
                if "conf" in batch else np.ones(gt.shape[:2], bool))
        area = (np.asarray(batch["area"], np.float64)[:n_real]
                if "area" in batch
                else metrics_lib.keypoint_bbox_area_np(gt, mask))
        oks = metrics_lib.oks_np(pred, gt, area, mask=mask)
        state.n += n_real
        state.sum_oks += float(oks.sum())
        for k, t in enumerate(OKS_THRESHOLDS):
            state.hits[k] += float((oks >= t).sum())
        state.cursor = batch_index + 1
        if checkpoint_path and (batch_index + 1) % save_every == 0:
            state.save(checkpoint_path)

    _stream_eval(run, batches, state, accumulate, mesh, checkpoint_path)

    n = max(state.n, 1)
    per_t = {t: state.hits[k] / n for k, t in enumerate(OKS_THRESHOLDS)}
    return {
        "mean_oks": state.sum_oks / n,
        "ap": float(np.mean(list(per_t.values()))),
        "ap50": per_t[0.5],
        "ap75": per_t[0.75],
        "per_threshold": per_t,
        "num_frames": state.n,
    }
