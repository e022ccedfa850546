"""Convert a public pose dataset's distribution files into the
npz-shard interchange (SURVEY.md §2 row 12; day-one tooling like
scripts/reference_day_one.py — the datasets are license-gated and
absent here, so this runs the moment a user supplies them).

  # LSP / LSPET (auto-detected from the joints.mat layout):
  python scripts/convert_dataset.py --dataset lsp \
      --annotations /data/lsp/joints.mat --images /data/lsp/images \
      --out /data/lsp_shards

  # MPII (one sample per annotated person):
  python scripts/convert_dataset.py --dataset mpii \
      --annotations /data/mpii/mpii_human_pose_v1_u12_1.mat \
      --images /data/mpii/images --out /data/mpii_shards

  # 3DPW (one sequence file; SMPL GT → the mesh-level PVE protocol):
  python scripts/convert_dataset.py --dataset 3dpw \
      --annotations /data/3dpw/sequenceFiles/test/downtown_arguing_00.pkl \
      --images /data/3dpw/imageFiles/downtown_arguing_00 \
      --out /data/3dpw_shards

Then evaluate the 2D detector on the shards:
  python scripts/eval_2d.py --data_dir /data/mpii_shards --cpm_npz ...
or the 3D fit (PVE/PA-PVE switch on automatically for 3dpw shards):
  python scripts/eval_h36m.py --data_dir /data/3dpw_shards --cpm_npz ...
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_enum("dataset", None, ["lsp", "mpii", "coco", "3dpw"],
                  "source dataset format (lsp covers LSPET too; coco takes a\n                  person_keypoints json; 3dpw takes one sequenceFiles pkl)")
flags.DEFINE_string("annotations", None, "annotation file (.mat, "
                    "person_keypoints .json for coco, or a "
                    "sequenceFiles .pkl for 3dpw)")
flags.DEFINE_string("images", None, "image directory (for 3dpw: the "
                    "sequence's imageFiles/<name>/ directory)")
flags.DEFINE_string("out", None, "output shard directory")
flags.DEFINE_integer("size", 368, "output crop size (network input)")
flags.DEFINE_float("margin", 0.0, "crop margin; 0 = dataset default "
                   "(1.5 × joint bbox for LSP, 1.25 × scale·200 for "
                   "MPII)")
flags.DEFINE_integer("shard_size", 256, "samples per npz shard")
flags.DEFINE_integer("limit", 0, "convert only the first N samples "
                     "(0 = all)")
flags.DEFINE_string("gender", "", "3dpw only: keep actors of this "
                    "gender (m|f) — convert per-gender shard dirs for "
                    "the official gendered-GT protocol (pass the "
                    "gendered model as eval's gt_smpl_model)")
flags.mark_flag_as_required("dataset")
flags.mark_flag_as_required("annotations")
flags.mark_flag_as_required("images")
flags.mark_flag_as_required("out")


def main(argv):
    del argv
    from tpu_pose.data import datasets

    limit = FLAGS.limit or None
    if FLAGS.dataset == "lsp":
        paths = datasets.lsp_to_shards(
            FLAGS.annotations, FLAGS.images, FLAGS.out,
            out_size=FLAGS.size, margin=FLAGS.margin or 1.5,
            shard_size=FLAGS.shard_size, limit=limit)
    elif FLAGS.dataset == "3dpw":
        paths = datasets.threedpw_to_shards(
            FLAGS.annotations, FLAGS.images, FLAGS.out,
            out_size=FLAGS.size, margin=FLAGS.margin or 1.3,
            shard_size=FLAGS.shard_size, limit=limit,
            gender=FLAGS.gender or None)
    elif FLAGS.dataset == "coco":
        paths = datasets.coco_to_shards(
            FLAGS.annotations, FLAGS.images, FLAGS.out,
            out_size=FLAGS.size, margin=FLAGS.margin or 1.25,
            shard_size=FLAGS.shard_size, limit=limit)
    else:
        paths = datasets.mpii_to_shards(
            FLAGS.annotations, FLAGS.images, FLAGS.out,
            out_size=FLAGS.size, margin=FLAGS.margin or 1.25,
            shard_size=FLAGS.shard_size, limit=limit)
    from tpu_pose.data import pipeline
    n = len(pipeline.NpzShardSource(FLAGS.out))
    print(f"wrote {len(paths)} shard(s), {n} samples → {FLAGS.out}")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
