"""Checkpoint / resume subsystem (SURVEY.md §5 'Checkpoint / resume').

Reference behavior: read-only restore of a pretrained CPM ``.ckpt`` +
SMPL pickle; fitted results were transient. The rebuild adds real
checkpointing the JAX way:

- **orbax** for anything trained (CPM train state: params + opt state +
  step), with atomic versioned saves and latest-step restore;
- plain ``.npz`` for fitted (θ, β, cam) sequences — small, portable,
  numpy-readable downstream;
- the eval cursor checkpoint lives in parallel/eval.py (JSON — tiny).

orbax is imported lazily so the library works where it is absent.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Orbax train-state checkpointing
# ---------------------------------------------------------------------------

def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp


def save_train_state(ckpt_dir: str, step: int, params: Any,
                     opt_state: Any) -> None:
    """Atomic versioned save of a CPM train state under ``ckpt_dir/step``."""
    ocp = _checkpointer()
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(
            {"params": params, "opt_state": opt_state}))
        mngr.wait_until_finished()


def restore_train_state(ckpt_dir: str, params_like: Any,
                        opt_state_like: Any,
                        step: Optional[int] = None
                        ) -> Tuple[int, Any, Any]:
    """Restore (step, params, opt_state); ``*_like`` give target structure
    and shardings (pass the freshly-initialized state)."""
    ocp = _checkpointer()
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        target = {"params": params_like, "opt_state": opt_state_like}
        restored = mngr.restore(
            step, args=ocp.args.StandardRestore(target))
    return step, restored["params"], restored["opt_state"]


def latest_step(ckpt_dir: str) -> Optional[int]:
    ocp = _checkpointer()
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        return mngr.latest_step()


# ---------------------------------------------------------------------------
# Fitted-sequence results (npz)
# ---------------------------------------------------------------------------

def save_fit_results(path: str, theta: Any, beta: Any, cam: Any,
                     energy: Any = None, extra: Optional[Dict] = None
                     ) -> None:
    """Save fitted (θ, β, cam[, energy]) arrays — frame-batched or single —
    as a portable npz (SURVEY.md §5: 'fitted sequences saved as npz')."""
    arrays = {
        "theta": np.asarray(theta),
        "beta": np.asarray(beta),
        "cam": np.asarray(cam),
    }
    if energy is not None:
        arrays["energy"] = np.asarray(energy)
    for k, v in (extra or {}).items():
        arrays[k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_fit_results(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# CPM params npz (shared format with utils/tf_converter.py)
# ---------------------------------------------------------------------------

def save_cpm_params(path: str, params: Dict[str, Dict]) -> None:
    """Same flat-npz format ``tf_converter.save_params_npz`` emits, so
    trained-from-scratch and converted-from-TF weights are
    interchangeable (both load via ``tf_converter.load_params_npz``)."""
    from tpu_pose.utils import tf_converter
    tf_converter.save_params_npz(path, params)
