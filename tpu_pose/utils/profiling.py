"""Tracing / profiling subsystem (SURVEY.md §5 'Tracing / profiling').

The reference had nothing beyond TF1's (unused) timeline; the rebuild makes
profiling first-class the JAX way:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard trace directory.
- :func:`cost_analysis` — XLA-compiled FLOPs / bytes-accessed accounting
  for any jittable function, used by the benchmark harness to report
  achieved-vs-peak utilization.
- :func:`sync` — a *real* device fence. Under the axon TPU platform
  ``jax.block_until_ready`` is a no-op (verified 2026-08-16), so every
  timing in this repo fences via a scalar ``device_get`` instead.
- :class:`Timer` — wall-clock timing with the sync fence built in.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def sync(tree: Any) -> float:
    """Force completion of all queued work producing ``tree``.

    Returns a scalar combining one element from EVERY leaf (cheap 4-byte
    transfer, full pipeline wait). Fencing every leaf matters when the
    timed callable dispatched more than one XLA program with independent
    outputs — a first-leaf-only fence can return before the later
    programs finish. This is the ONLY reliable fence under the axon TPU
    platform, where ``block_until_ready`` returns immediately.
    """
    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "ravel") and getattr(l, "size", 0) > 0]
    if not leaves:
        return 0.0
    probe = sum(jnp.sum(l.ravel()[:1]).astype(jnp.float32) for l in leaves)
    return float(jax.device_get(probe))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_pose_trace"):
    """Profile a region to a Perfetto/TensorBoard trace directory.

    Usage::

        with profiling.trace("/tmp/trace"):
            out = est.estimate_and_fit(images)
            profiling.sync(out)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with warmup and the sync fence built in."""

    def __init__(self, fn: Callable, *args, warmup: int = 2, iters: int = 5):
        self.fn = fn
        self.args = args
        self.warmup = warmup
        self.iters = iters

    def run(self) -> float:
        """Mean seconds per call (post-warmup, fenced)."""
        out = None
        for _ in range(self.warmup):
            out = self.fn(*self.args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = self.fn(*self.args)
        sync(out)
        return (time.perf_counter() - t0) / self.iters


def cost_analysis(fn: Callable, *args,
                  static_argnums=()) -> Dict[str, float]:
    """XLA cost model for a jitted function: FLOPs, bytes accessed, and
    (when a peak is supplied via :func:`utilization`) achieved fraction.

    Returns a dict with keys like ``flops`` and ``bytes accessed`` —
    whatever the backend's HLO cost analysis exposes.
    """
    jitted = jax.jit(fn, static_argnums=static_argnums)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    analyses = compiled.cost_analysis()
    # cost_analysis returns a dict (newer jax) or list of dicts (older).
    if isinstance(analyses, (list, tuple)):
        analyses = analyses[0] if analyses else {}
    return dict(analyses or {})


# Peak numbers for utilization accounting (per chip).
PEAKS = {
    # TPU v5e (v5 lite): ~197 TFLOP/s bf16, ~98 TFLOP/s f32-ish via
    # bf16x3 passes, 16 GB HBM @ ~819 GB/s. Public spec-sheet numbers.
    "tpu v5e": {"flops_bf16": 197e12, "flops_f32": 98e12,
                "hbm_bytes_per_s": 819e9},
}


def utilization(seconds_per_call: float, cost: Dict[str, float],
                chip: str = "tpu v5e",
                dtype: str = "bf16") -> Dict[str, float]:
    """Achieved FLOP/s and HBM-bandwidth fractions for a timed call."""
    peak = PEAKS.get(chip, PEAKS["tpu v5e"])
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    out = {
        "flops_per_s": flops / seconds_per_call if seconds_per_call else 0.0,
        "hbm_bytes_per_s": (byts / seconds_per_call
                            if seconds_per_call else 0.0),
    }
    peak_f = peak["flops_bf16"] if dtype == "bf16" else peak["flops_f32"]
    out["mfu"] = out["flops_per_s"] / peak_f
    out["hbm_frac"] = out["hbm_bytes_per_s"] / peak["hbm_bytes_per_s"]
    return out
