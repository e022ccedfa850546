"""tpu_pose — TPU-native 2D→3D human pose & shape estimation framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
TF1-era reference ``blzq/3D-pose-estimation`` (see SURVEY.md):

- ``models.cpm``       — Convolutional Pose Machines 2D heatmap network
                         (jitted XLA graph, in-graph preprocessing).
- ``models.smpl``      — pure-JAX SMPL body model (Rodrigues, blend shapes,
                         kinematic chain, linear blend skinning).
- ``models.camera``    — weak-perspective & perspective projection.
- ``fitting``          — SMPLify-style fit as a fully traced on-device
                         optimization loop, vmappable over frames & people.
- ``ops``              — decode / preprocessing ops incl. Pallas TPU kernels.
- ``parallel``         — device-mesh sharding (pjit / shard_map) for
                         video / dataset-scale evaluation.
- ``api``              — public entry points: ``estimate_2d``, ``fit_smpl``,
                         ``estimate_and_fit`` (parity with the reference's
                         entry points; SURVEY.md §2 row 14).

Reference provenance: the reference mount was empty at build time
(SURVEY.md §0); capability scope follows BASELINE.json and the CPM /
SMPL(ify) papers. Citations in docstrings use SURVEY.md section numbers.
"""

__version__ = "0.1.0"

_API_EXPORTS = ("PoseEstimator", "estimate_2d", "fit_smpl",
                "estimate_and_fit", "MultiPersonVideoSession",
                "VideoSession")
_LAZY = {"BatchingServer": "tpu_pose.serving",
         "PoseHTTPServer": "tpu_pose.serving_http"}


def __getattr__(name):
    # Lazy so `import tpu_pose.models.smpl` doesn't pull the full API stack.
    if name in _API_EXPORTS:
        from tpu_pose import api
        return getattr(api, name)
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
