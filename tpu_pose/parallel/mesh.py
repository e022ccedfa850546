"""Device-mesh utilities (SURVEY.md §2 rows 15–16).

The reference is single-process/single-device with no parallelism of any
kind; the rebuild makes scaling first-class the TPU way: a named
``jax.sharding.Mesh``, ``NamedSharding`` annotations, and XLA collectives
over ICI — NOT a translation of any NCCL/MPI pattern (there is none to
translate).

Parallelism design (justified in SURVEY.md §2 row 15):
- the model is tiny (<100 MB) → parameters fully REPLICATED;
- frames/people are independent given temporal init → pure DATA
  parallelism over a ``data`` mesh axis; within-chip batching is ``vmap``;
- no attention / no cross-frame coupling → ring/Ulysses sequence
  parallelism is deliberately out of scope (SURVEY.md §5).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN) transparently via jax device discovery.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch/frames) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array's leading axis across the mesh (params & model
    tensors should instead use :func:`replicate`)."""
    s = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad ``axis`` up to a multiple (uneven final eval batches); returns
    (padded, original_size)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(np.asarray(x), pad, mode="edge"), n
