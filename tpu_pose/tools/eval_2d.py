"""2D-detector benchmark: PCKh@t over npz shards from
scripts/convert_dataset.py (MPII/LSP protocol — SURVEY.md §6 CPM
quality rows). Streams the sharded estimate_2d program over all visible
devices with the same 1-deep pipeline + cursor resume as the 3D eval.

  python scripts/eval_2d.py --data_dir /data/mpii_shards \
      --cpm_npz /models/cpm.npz --batch 64
  python scripts/eval_2d.py --synthetic_batches 5 --batch 32   # smoke
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("data_dir", "", "shard dir (images/gt_joints2d/"
                    "conf/headsize)")
flags.DEFINE_integer("synthetic_batches", 0, "evaluate N synthetic "
                     "batches instead of shards (smoke mode)")
flags.DEFINE_integer("batch", 32, "global batch size")
flags.DEFINE_string("cpm_npz", "", "converted CPM weights (synthetic "
                    "if empty)")
flags.DEFINE_string("smpl_pkl", "", "SMPL pickle — optional: the 2D "
                    "eval never runs the fit, so a synthetic stand-in "
                    "model is used when empty")
flags.DEFINE_float("threshold", 0.5, "PCK threshold (0.5 for MPII PCKh@0.5,\n                   0.2 for LSP PCK@0.2)")
flags.DEFINE_enum("norm", "head", ["head", "torso"],
                  "protocol normalizer: head = MPII PCKh (headsize or\n                  head-neck proxy), torso = LSP PCK (l_shoulder-r_hip\n                  diameter)")
flags.DEFINE_enum("protocol", "pck", ["pck", "oks"],
                  "pck = threshold metric under --norm (MPII/LSP); "
                  "oks = COCO OKS with AP@[.50:.05:.95] (uses the "
                  "shards' area key when present)")
flags.DEFINE_string("resume", "", "cursor-checkpoint path (json)")
flags.DEFINE_boolean("refine_center", True, "in-graph person "
                     "localization")
flags.DEFINE_boolean("refine_scale", False, "crop/zoom scale "
                     "normalization second pass")
flags.DEFINE_boolean("flip_tta", False, "horizontal-flip test-time "
                     "augmentation")
flags.DEFINE_list("scale_tta", [], "multi-scale TTA zoom factors, e.g. "
                  "0.8,1.2 (composes with --flip_tta)")


def main(argv):
    del argv
    import jax

    from tpu_pose.api import PoseEstimator
    from tpu_pose.data import pipeline, synthetic
    from tpu_pose.parallel import eval as eval_lib
    from tpu_pose.parallel import mesh as mesh_lib

    kw = dict(refine_center=FLAGS.refine_center,
              refine_scale=FLAGS.refine_scale, flip_tta=FLAGS.flip_tta,
              scale_tta=tuple(float(s) for s in FLAGS.scale_tta))
    if FLAGS.cpm_npz and FLAGS.smpl_pkl:
        est = PoseEstimator.from_files(FLAGS.cpm_npz, FLAGS.smpl_pkl,
                                       **kw)
    elif FLAGS.cpm_npz:
        from tpu_pose.models import smpl_data
        from tpu_pose.utils import tf_converter
        est = PoseEstimator(tf_converter.load_params_npz(FLAGS.cpm_npz),
                            smpl_data.synthetic_smpl(seed=0), **kw)
    else:
        print("note: no weights supplied — synthetic estimator")
        est = PoseEstimator.create_synthetic(seed=0, **kw)

    if FLAGS.synthetic_batches:
        batches = synthetic.eval_batches(
            est.smpl_model, FLAGS.batch, FLAGS.synthetic_batches,
            est.cpm_cfg)
    elif FLAGS.data_dir:
        keys = ["images", "gt_joints2d", "conf"]
        if FLAGS.protocol == "oks":
            # area is optional (COCO shards carry it; LSP/MPII don't —
            # the evaluator falls back to the keypoint-bbox stand-in).
            # Shard-layout knowledge stays in the pipeline's source.
            src = pipeline.NpzShardSource(FLAGS.data_dir)
            if len(src) and "area" in src[0]:
                keys.append("area")
        else:
            keys.append("headsize")
        batches = pipeline.batches(FLAGS.data_dir, FLAGS.batch,
                                   keys=tuple(keys))
    else:
        raise app.UsageError("provide --data_dir or --synthetic_batches")

    mesh = mesh_lib.make_mesh() if len(jax.devices()) > 1 else None
    if FLAGS.protocol == "oks":
        out = eval_lib.evaluate_oks(
            est, batches, mesh=mesh,
            checkpoint_path=FLAGS.resume or None)
        print(f"frames={out['num_frames']}  "
              f"meanOKS={out['mean_oks']:.3f}  "
              f"AP={out['ap'] * 100:.1f}  AP50={out['ap50'] * 100:.1f}  "
              f"AP75={out['ap75'] * 100:.1f}")
        return
    out = eval_lib.evaluate_pckh(
        est, batches, mesh=mesh, threshold=FLAGS.threshold,
        norm=FLAGS.norm, checkpoint_path=FLAGS.resume or None)
    name = "PCKh" if FLAGS.norm == "head" else "PCK(torso)"
    print(f"frames={out['num_frames']}  "
          f"{name}@{FLAGS.threshold}={out['pckh'] * 100:.1f}%  "
          f"AUC(0..{FLAGS.threshold})={out['auc'] * 100:.1f}%")
    for name, v in out["per_joint"].items():
        print(f"  {name:12s} {v * 100:5.1f}%")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
