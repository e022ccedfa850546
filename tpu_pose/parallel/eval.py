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
import jax.numpy as jnp

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
    """Resumable accumulator (saved as json+npz every ``save_every``)."""
    cursor: int = 0
    n: int = 0
    sum_mpjpe: float = 0.0
    sum_pa_mpjpe: float = 0.0

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
                return cls(**json.load(f))
        return cls()


def evaluate_h36m_style(
    estimator,
    batches: Iterator,          # yields dicts: images (B,H,W,3), gt_joints3d
    mesh=None,
    select_joints: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    save_every: int = 10,
    scale_to_gt: bool = True,
):
    """Streaming MPJPE/PA-MPJPE eval of the fused pipeline.

    ``gt_joints3d`` must be in the SMPL 24-joint frame, or provide
    ``select_joints`` mapping predicted (B,24,3) → GT convention.
    ``scale_to_gt`` resolves the monocular scale ambiguity per-frame by
    matching skeleton RMS extent before (non-PA) MPJPE, the standard
    protocol for weak-perspective fits.
    """
    state = (EvalState.load(checkpoint_path) if checkpoint_path
             else EvalState())
    run = (sharded_fused_fn(estimator, mesh) if mesh is not None
           else (lambda im: estimator.estimate_and_fit(im)))

    # PA-MPJPE runs on host: jnp SVD wedges the TPU compiler (see
    # metrics.pa_mpjpe_np docstring); the (B,J,3) transfer is tiny.
    pa_fn = metrics_lib.pa_mpjpe_np

    n_dev = mesh.devices.size if mesh is not None else 1

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
        pred = res.joints3d[:n_real]
        if select_joints is not None:
            pred = select_joints(pred)
        gt = jnp.asarray(batch["gt_joints3d"])

        pred_c = pred - jnp.mean(pred, axis=-2, keepdims=True)
        gt_c = gt - jnp.mean(gt, axis=-2, keepdims=True)
        if scale_to_gt:
            s = (jnp.sqrt(jnp.sum(gt_c ** 2, axis=(-2, -1)))
                 / (jnp.sqrt(jnp.sum(pred_c ** 2, axis=(-2, -1))) + 1e-9))
            pred_c = pred_c * s[..., None, None]
        mp = jnp.mean(jnp.linalg.norm(pred_c - gt_c, axis=-1), axis=-1)
        pa = pa_fn(pred, gt)

        b = int(pred.shape[0])
        state.n += b
        state.sum_mpjpe += float(jnp.sum(mp))
        state.sum_pa_mpjpe += float(jnp.sum(pa))
        state.cursor = i + 1
        if checkpoint_path and (i + 1) % save_every == 0:
            state.save(checkpoint_path)

    if checkpoint_path:
        state.save(checkpoint_path)
    return {
        "mpjpe": state.sum_mpjpe / max(state.n, 1),
        "pa_mpjpe": state.sum_pa_mpjpe / max(state.n, 1),
        "num_frames": state.n,
    }
