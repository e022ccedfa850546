"""Dataset-scale evaluation entry point (SURVEY.md §3.5; BASELINE config 5).

Streams batches through the fused estimate→fit pipeline sharded over all
visible devices, accumulates MPJPE / PA-MPJPE, and is resumable via a
cursor checkpoint. Runs on Human3.6M-style npz shards (images +
gt_joints3d in the SMPL 24-joint frame) or --synthetic stand-in data.

  python scripts/eval_h36m.py --synthetic_batches 10 --batch 32
  python scripts/eval_h36m.py --data_dir /data/h36m_shards --batch 64 \
      --resume /tmp/eval_cursor.json
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("data_dir", "", "npz-shard dir with images/gt_joints3d")
flags.DEFINE_integer("synthetic_batches", 0, "evaluate N synthetic batches "
                     "instead of reading shards")
flags.DEFINE_integer("batch", 32, "global batch size")
flags.DEFINE_string("cpm_npz", "", "converted CPM weights (synthetic if "
                    "empty)")
flags.DEFINE_string("smpl_pkl", "", "SMPL pickle (synthetic if empty)")
flags.DEFINE_string("gmm_pkl", "", "GMM prior pickle (optional)")
flags.DEFINE_string("gmm_npz", "", "precision-form fitted-prior cache "
                    "(fitting/priors.save_gmm_npz; optional)")
flags.DEFINE_integer("fit_prior", 0, "EM-fit a GMM-8 prior on N sampled "
                     "synthetic corpus poses (fitting/priors.fit_gmm) — "
                     "the informative-prior eval mode; 0 = default prior")
flags.DEFINE_string("resume", "", "cursor-checkpoint path (json)")
flags.DEFINE_boolean("h36m_joints", False, "score in the 17-joint H3.6M "
                     "convention instead of SMPL-24")
flags.DEFINE_integer("restarts", 1, "global-yaw fit hypotheses per frame "
                     "(accuracy mode; >1 costs ~x restarts fit time)")
flags.DEFINE_enum("protocol", "p1", ["p1", "scaled", "pa"],
                  "primary MPJPE protocol: p1 = H3.6M Protocol 1 "
                  "(root-aligned, no scale — use the perspective camera); "
                  "scaled = RMS-extent-matched (non-standard, for "
                  "weak-perspective fits); pa = Procrustes-aligned")
flags.DEFINE_string("camera", "", "override FitConfig.camera_model "
                    "(weak_perspective | perspective)")
flags.DEFINE_float("focal", 0.0, "perspective focal length in NETWORK-"
                   "FRAME pixels (Protocol 1 scores absolute geometry — "
                   "use the dataset's real focal). 0 = auto: the median "
                   "focal_px the shards carry (3DPW adapter records the "
                   "crop-mapped focal), else FitConfig's default")


def main(argv):
    del argv
    import jax

    from tpu_pose.api import PoseEstimator
    from tpu_pose.data import pipeline, synthetic
    from tpu_pose.models import joints as joints_lib
    from tpu_pose.parallel import eval as eval_lib
    from tpu_pose.parallel import mesh as mesh_lib

    from tpu_pose.utils.config import FitConfig

    # Protocol 1 scores absolute (root-relative, unscaled) geometry; the
    # perspective camera is the config that can actually deliver it.
    camera = FLAGS.camera or (
        "perspective" if FLAGS.protocol == "p1" else "weak_perspective")
    focal_kw = {}
    if FLAGS.focal > 0:
        focal_kw["focal"] = FLAGS.focal
    elif camera == "perspective" and FLAGS.data_dir:
        # Auto-focal from the shards (the 3DPW adapter records the
        # crop-mapped focal per sample). focal_px is in SHARD-image
        # pixels; the network frame rescales it by input/S. The stock
        # 368 CPM input is assumed here — pass --focal explicitly for a
        # nonstandard input size.
        import numpy as np
        src0 = pipeline.NpzShardSource(FLAGS.data_dir)
        if len(src0) and "focal_px" in src0[0]:
            n = min(len(src0), 64)
            med = float(np.median([float(src0[i]["focal_px"])
                                   for i in range(n)]))
            s_img = int(src0[0]["images"].shape[0])
            from tpu_pose.utils.config import CPMConfig
            focal_kw["focal"] = med * CPMConfig().input_size / s_img
            print(f"auto focal: median shard focal_px {med:.1f} "
                  f"(image {s_img}px) → {focal_kw['focal']:.1f} px in "
                  f"the network frame")
    fit_cfg = FitConfig(camera_model=camera, **focal_kw)

    prior = None
    if FLAGS.gmm_npz:
        from tpu_pose.fitting import priors as priors_lib
        prior = priors_lib.load_gmm_npz(FLAGS.gmm_npz)
    elif FLAGS.fit_prior:
        import numpy as np
        from tpu_pose.fitting import priors as priors_lib
        th, _ = synthetic.sample_poses(np.random.RandomState(0),
                                       FLAGS.fit_prior)
        prior = priors_lib.fit_gmm(th[:, 3:], num_components=8)

    if FLAGS.cpm_npz and FLAGS.smpl_pkl:
        est = PoseEstimator.from_files(FLAGS.cpm_npz, FLAGS.smpl_pkl,
                                       FLAGS.gmm_pkl or None,
                                       fit_cfg=fit_cfg,
                                       fit_restarts=FLAGS.restarts,
                                       prior=prior)
    else:
        print("note: no weights supplied — synthetic estimator")
        est = PoseEstimator.create_synthetic(seed=0, fit_cfg=fit_cfg,
                                             fit_restarts=FLAGS.restarts,
                                             prior=prior)

    if FLAGS.synthetic_batches:
        batches = synthetic.eval_batches(
            est.smpl_model, FLAGS.batch, FLAGS.synthetic_batches,
            est.cpm_cfg)
    elif FLAGS.data_dir:
        # Stream whatever GT the shards carry: 2D labels add the PCKh
        # accumulator; SMPL params (3DPW-style shards, convert_dataset
        # --dataset 3dpw) switch on the mesh-level PVE/PA-PVE protocol.
        keys = ["images", "gt_joints3d"]
        src = pipeline.NpzShardSource(FLAGS.data_dir)
        if len(src):
            keys += [k for k in ("gt_joints2d", "gt_theta", "gt_beta")
                     if k in src[0]]
        batches = pipeline.batches(FLAGS.data_dir, FLAGS.batch,
                                   keys=tuple(keys))
    else:
        raise app.UsageError("provide --data_dir or --synthetic_batches")

    mesh = mesh_lib.make_mesh() if len(jax.devices()) > 1 else None
    select = None
    if FLAGS.h36m_joints:
        select = joints_lib.select_h36m_joints

        def to_h36m_gt(bs):
            # GT supplied in the SMPL-24 frame (e.g. synthetic batches)
            # must be mapped to the same 17-joint convention as preds.
            for b in bs:
                gt = b["gt_joints3d"]
                if gt.shape[-2] == 24:
                    b = dict(b, gt_joints3d=gt[..., joints_lib.H36M_TO_SMPL,
                                               :])
                yield b

        batches = to_h36m_gt(batches)
    out = eval_lib.evaluate_h36m_style(
        est, batches, mesh=mesh, select_joints=select,
        checkpoint_path=FLAGS.resume or None,
        primary_protocol=FLAGS.protocol)
    line = (f"frames={out['num_frames']}  camera={camera}  "
            f"MPJPE-P1={out['mpjpe_p1'] * 1000:.1f} mm  "
            f"MPJPE-scaled={out['mpjpe_scaled'] * 1000:.1f} mm  "
            f"PA-MPJPE={out['pa_mpjpe'] * 1000:.1f} mm")
    if "pckh" in out:
        line += f"  PCKh@0.5={out['pckh'] * 100:.1f}%"
    if "pve" in out:
        line += (f"  PVE={out['pve'] * 1000:.1f} mm  "
                 f"PA-PVE={out['pa_pve'] * 1000:.1f} mm")
    print(line)


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
