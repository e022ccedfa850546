"""Parity harness (SURVEY.md §7 hard-parts #1; BASELINE north star #2).

Purpose: make the "MPJPE within 1 mm of the TF reference" target
*certifiable by one command*. The reference mount has been empty since
round 1 (SURVEY.md §0), so :mod:`tpu_pose.parity.oracle` provides a
complete SECOND-IMPLEMENTATION pipeline — TF graph math + a host-side
scipy L-BFGS loop, i.e. the reference lineage's own idioms — that stands
in until the real code appears. The harness interface takes ANY callable
pipeline, so the day `/root/reference` populates, the actual reference
slots in unchanged.

- :mod:`oracle`  — reference-style decode + SMPL + projection + staged fit.
- :mod:`harness` — stagewise parity report + end-to-end fit gap (MPJPE).
- :mod:`sweep`   — auto-sweep of FitConfig to minimize the gap; JSON out.

CLI: ``python scripts/parity_sweep.py`` (certify or sweep modes).
"""

from tpu_pose.parity import harness, oracle, sweep  # noqa: F401
