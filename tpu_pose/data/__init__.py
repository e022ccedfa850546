"""Input pipelines (SURVEY.md §2 row 12 'streaming eval … via grain').

- :mod:`tpu_pose.data.synthetic` — hermetic synthetic pose data (no
  license-gated files, no network): sampled SMPL poses rendered to
  Gaussian-blob images + heatmap/2D/3D targets, for CPM training and
  H3.6M-style eval of the full pipeline.
- :mod:`tpu_pose.data.pipeline` — grain-backed batched loaders over
  on-disk npz shards, host-shardable for multi-process TPU jobs.
"""

from tpu_pose.data import pipeline, synthetic  # noqa: F401
