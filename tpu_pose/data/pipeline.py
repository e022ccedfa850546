"""Grain-backed input pipeline (SURVEY.md §2 row 12; §5 config system).

On-disk layout: a directory of ``.npz`` shards, each holding aligned
arrays (``images`` (N,S,S,3) uint8 + any label arrays). This is the
interchange format for real datasets (an H3.6M preprocessing job would
emit it) and what :mod:`tpu_pose.data.synthetic` can materialize for
hermetic tests.

Design: grain's ``MapDataset`` over a global index space gives
deterministic ordering, seeded shuffling, sharding across hosts
(``jax.process_index``), and prefetch-friendly iteration — the TPU-native
replacement for the reference's per-frame ``cv2.imread`` loop [K].
grain is imported lazily; a plain numpy fallback iterator keeps the
library importable without it.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def write_npz_shards(out_dir: str, arrays: Dict[str, np.ndarray],
                     shard_size: int = 256) -> List[str]:
    """Materialize aligned arrays into numbered npz shards."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(next(iter(arrays.values())))
    paths = []
    for s, start in enumerate(range(0, n, shard_size)):
        sl = slice(start, min(start + shard_size, n))
        path = os.path.join(out_dir, f"shard-{s:05d}.npz")
        np.savez_compressed(path, **{k: v[sl] for k, v in arrays.items()})
        paths.append(path)
    return paths


class NpzShardSource:
    """Random-access record source over a directory of npz shards.

    Implements ``__len__`` / ``__getitem__`` (the grain RandomAccess
    protocol) with a small thread-safe LRU of open shards. The cache MUST
    be thread-safe: grain's DataLoader prefetches from worker threads,
    and a naive single-slot cache raced under it, returning wrong-shard
    records nondeterministically (caught by the determinism stress test).
    """

    def __init__(self, data_dir: str, keys: Optional[Sequence[str]] = None):
        import functools
        self.paths = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".npz"))
        if not self.paths:
            raise FileNotFoundError(f"no .npz shards under {data_dir}")
        self._sizes = []
        for p in self.paths:
            with np.load(p) as z:
                first = keys[0] if keys else z.files[0]
                self._sizes.append(len(z[first]))
        self._offsets = np.cumsum([0] + self._sizes)
        self.keys = keys
        # lru_cache is safe under concurrent readers (consistent returns;
        # at worst a duplicated load on a racing miss).
        self._shard = functools.lru_cache(maxsize=4)(self._load_shard)

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _load_shard(self, shard_idx: int) -> Dict[str, np.ndarray]:
        with np.load(self.paths[shard_idx]) as z:
            keys = self.keys or z.files
            return {k: z[k] for k in keys}

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        # grain's MapDataset may pass indices beyond len (its epoch
        # semantics wrap by modulo at the source boundary).
        idx = int(idx) % len(self)
        shard_idx = int(np.searchsorted(self._offsets, idx, "right") - 1)
        local = idx - self._offsets[shard_idx]
        shard = self._shard(shard_idx)
        return {k: v[local] for k, v in shard.items()}


def _stack(examples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples]) for k in keys}


def batches(
    data_dir: str,
    batch_size: int,
    *,
    keys: Optional[Sequence[str]] = None,
    shuffle: bool = False,
    seed: int = 0,
    num_epochs: int = 1,
    drop_remainder: bool = True,
    shard_by_process: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Deterministic, host-sharded, batched iterator over npz shards.

    Uses grain's ``MapDataset`` when available (shuffle windows, prefetch),
    falling back to a plain numpy loop with identical semantics.
    """
    source = NpzShardSource(data_dir, keys)
    shard_idx, shard_cnt = 0, 1
    if shard_by_process:
        import jax
        shard_idx, shard_cnt = jax.process_index(), jax.process_count()

    try:
        # The documented grain pipeline: IndexSampler owns epoch/shuffle/
        # shard semantics; DataLoader drives the source + batching.
        # (A MapDataset.shuffle chain was measured NONDETERMINISTIC across
        # identical iterations and epoch-incorrect with sharded sources —
        # do not switch back without re-running the determinism stress in
        # tests/test_data.py.)
        import grain.python as grain
        sampler = grain.IndexSampler(
            num_records=len(source),
            shuffle=shuffle,
            seed=seed,
            num_epochs=num_epochs,
            shard_options=grain.ShardOptions(
                shard_index=shard_idx, shard_count=shard_cnt,
                drop_remainder=drop_remainder),
        )
        loader = grain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[grain.Batch(batch_size,
                                    drop_remainder=drop_remainder)],
            worker_count=0,
        )
        yield from loader
        return
    except ImportError:
        pass

    # numpy fallback — same ordering contract.
    idx = np.arange(len(source))
    rng = np.random.RandomState(seed)
    for _ in range(num_epochs):
        order = rng.permutation(idx) if shuffle else idx
        order = order[shard_idx::shard_cnt]
        stop = (len(order) - len(order) % batch_size
                if drop_remainder else len(order))
        for start in range(0, stop, batch_size):
            sel = order[start:start + batch_size]
            yield _stack([source[int(i)] for i in sel])
