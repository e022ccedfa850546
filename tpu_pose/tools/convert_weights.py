"""Convert a TF1 CPM checkpoint to this framework's npz weights
(SURVEY.md §5 'Checkpoint / resume': one-time TF-ckpt → npz converter).

  python scripts/convert_weights.py --ckpt /path/model.ckpt \
      --out cpm_weights.npz

The converter walks the checkpoint's variable names against the known
naming lineages (tf-slim, tf.layers, plain-variable ports) and emits the
flat npz `PoseEstimator.from_files` consumes. Runs only when real
(license-gated) weights are present — this environment ships none.
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("ckpt", None, "TF1 checkpoint path (prefix)")
flags.DEFINE_string("out", "cpm_weights.npz", "output npz path")
flags.DEFINE_integer("num_stages", 6, "CPM stages in the checkpoint")
flags.mark_flag_as_required("ckpt")


def main(argv):
    del argv
    from tpu_pose.models import cpm as cpm_lib
    from tpu_pose.utils import tf_converter
    from tpu_pose.utils.config import CPMConfig

    cfg = CPMConfig(num_stages=FLAGS.num_stages)
    layer_names = [d[0] for d in cpm_lib._layer_defs(cfg)]
    params = tf_converter.convert_tf_checkpoint(FLAGS.ckpt, layer_names)
    tf_converter.save_params_npz(FLAGS.out, params)
    n = sum(v["w"].size + v["b"].size for v in params.values())
    print(f"converted {len(params)} layers ({n / 1e6:.1f} M params) "
          f"→ {FLAGS.out}")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
