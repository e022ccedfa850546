"""Micro-batching serving front end for the fused pipeline.

Production-serving layer the TF1 reference never had (its scripts are
one-shot; SURVEY.md §1 negative space — "no serving layer"): on TPU the
fused estimate_and_fit program is throughput-optimal at large batch but
requests arrive one at a time, so a server must aggregate. This module is
the host-side half of that contract:

- :class:`BatchingServer` collects concurrent single-frame requests into
  device batches (up to ``max_batch``, waiting at most ``max_wait_ms`` —
  the standard latency/throughput knob), pads to a static BUCKET size so
  XLA compiles a handful of programs instead of one per occupancy, and
  scatters per-frame results back to caller futures.
- The estimator's batch-conditional precision policy composes: small
  buckets route to bf16 weights, large ones to int8
  (api.PoseEstimator._params_for_batch), with no server logic needed.

Threading model: callers enqueue from any thread; ONE dispatch thread
owns the device (the axon TPU tolerates only one submitting process, and
a single dispatcher also serializes programs deliberately — interleaved
small launches would just time-slice the chip). Results resolve through
``concurrent.futures.Future``.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def default_buckets(max_batch: int) -> tuple:
    """Power-of-two batch buckets ≤ max_batch (plus max_batch itself):
    each bucket is one compiled program; ~2× padding waste worst case."""
    b, out = 1, []
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class ServerStats:
    """Running serving telemetry. Updates AND snapshots synchronize on
    the internal lock (an unlocked snapshot can race the dispatcher's
    deque.extend → 'deque mutated during iteration')."""

    def __init__(self, window: int = 1024):
        self.requests = 0
        self.batches = 0
        self.padded_frames = 0
        self.latencies_ms = collections.deque(maxlen=window)
        self._lock = threading.Lock()

    def record_batch(self, n: int, padded: int, latencies_ms) -> None:
        with self._lock:
            self.requests += n
            self.batches += 1
            self.padded_frames += padded
            self.latencies_ms.extend(latencies_ms)

    def snapshot(self) -> dict:
        with self._lock:
            return self._snapshot_locked()

    def _snapshot_locked(self) -> dict:
        lat = sorted(self.latencies_ms)
        pick = (lambda q: lat[min(int(q * len(lat)), len(lat) - 1)]
                if lat else 0.0)
        occupancy = (self.requests / max(self.requests + self.padded_frames,
                                         1))
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch": self.requests / max(self.batches, 1),
            "occupancy": occupancy,
            "latency_ms_p50": pick(0.50),
            "latency_ms_p99": pick(0.99),
        }


class BatchingServer:
    """Aggregate concurrent requests into fused-program batches.

    Args:
      estimator: an ``api.PoseEstimator`` (owns weights + compiled paths).
      max_batch: largest device batch (the throughput sweet spot — 128 on
        16 GB v5e for the int8 path, bench.py).
      max_wait_ms: how long the dispatcher waits to fill a batch after
        the first request arrives. 0 = dispatch whatever is queued.
      buckets: static batch sizes to compile; default power-of-two.
      fields: result fields to return (e.g. ``("theta", "beta", "cam",
        "joints2d", "conf")``). None returns everything. The fused
        result's mesh (``vertices``: ~80 KB/frame) dominates the
        device→host response; serving consumers that reconstruct the
        mesh client-side (SMPL is deterministic in (θ, β)) should drop
        it — on a bandwidth-limited host link the response transfer is
        part of the serving critical path.

    Use as a context manager, or call :meth:`shutdown`.
    """

    def __init__(self, estimator, max_batch: int = 64,
                 max_wait_ms: float = 5.0,
                 buckets: Optional[Sequence[int]] = None,
                 fields: Optional[Sequence[str]] = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.estimator = estimator
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.fields = None if fields is None else tuple(fields)
        if self.fields is not None:
            from tpu_pose.api import EstimateAndFitResult, PoseEstimator
            if isinstance(estimator, PoseEstimator):
                unknown = set(self.fields) - set(
                    EstimateAndFitResult._fields)
                if unknown:
                    raise ValueError(
                        f"unknown result fields: {sorted(unknown)}")
        self.buckets = tuple(sorted(set(
            buckets if buckets is not None else default_buckets(max_batch))))
        if self.buckets[-1] != max_batch:
            raise ValueError("largest bucket must equal max_batch")
        self.stats = ServerStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._thread.start()

    # -- client side ------------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue ONE frame (H, W, 3); resolves to a per-frame result
        pytree (the fused EstimateAndFitResult sliced to this frame)."""
        if image.ndim != 3:
            raise ValueError(f"submit takes one (H, W, 3) frame, "
                             f"got shape {image.shape}")
        fut: Future = Future()
        # Lock pairs the closed-check with the enqueue: without it a
        # submit racing shutdown() can land BEHIND the sentinel after
        # the dispatcher already drained and exited — a Future that
        # never resolves.
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is shut down")
            self._queue.put((np.asarray(image), fut, time.perf_counter()))
        return fut

    def submit_many(self, images: np.ndarray) -> list:
        """Enqueue a (N, H, W, 3) stack as N independent requests."""
        return [self.submit(im) for im in images]

    # -- dispatch side ----------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _collect(self):
        """Block for the first request, then drain until max_batch or the
        max_wait deadline; returns list of (image, future, t_enqueue)."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:  # shutdown sentinel
            return None
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            try:
                item = self._queue.get(
                    timeout=max(remaining, 0.0) if remaining > 0 else None,
                    block=remaining > 0)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post sentinel for the outer loop
                break
            batch.append(item)
        return batch

    @staticmethod
    def _resolve(fut: Future, value=None, exc=None) -> None:
        """Resolve a future, tolerating callers that already cancelled
        it (an unguarded set_result would raise InvalidStateError and
        kill the dispatch thread for every other client)."""
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(value)
        except Exception:
            pass  # cancelled / already resolved — the caller moved on

    def _drain_failed(self, exc: Exception) -> None:
        """Fail every request still queued (shutdown path)."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                self._resolve(item[1], exc=exc)

    def _dispatch_loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                # Sentinel: a submit() racing shutdown() may have queued
                # BEHIND it — fail those futures rather than hang them.
                self._drain_failed(RuntimeError("server is shut down"))
                return
            if not batch:
                continue
            images = [b[0] for b in batch]
            futures = [b[1] for b in batch]
            t_enq = [b[2] for b in batch]
            n = len(images)
            bucket = self._bucket_for(n)
            # Pad by repeating the last frame: real pixels keep every
            # padded lane on the measured numeric path (an all-zeros
            # frame is a degenerate fit input).
            padded = np.stack(images + [images[-1]] * (bucket - n))
            try:
                res = self.estimator.estimate_and_fit(jnp.asarray(padded))
                if self.fields is not None:
                    res = {k: getattr(res, k) for k in self.fields}
                res = jax.tree.map(np.asarray, res)  # one host transfer
                now = time.perf_counter()
                for i, fut in enumerate(futures):
                    self._resolve(fut,
                                  jax.tree.map(lambda x, i=i: x[i], res))
                self.stats.record_batch(
                    n, bucket - n, [(now - t) * 1e3 for t in t_enq])
            except Exception as e:  # propagate to every caller, keep serving
                for fut in futures:
                    self._resolve(fut, exc=e)

    # -- lifecycle --------------------------------------------------------

    def shutdown(self, wait: bool = True):
        """Stop accepting requests; drain the queue, then stop."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        if wait:
            self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
