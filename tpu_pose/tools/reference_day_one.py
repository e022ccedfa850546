"""One-command day-one reference validation (VERDICT r2 next #5).

The moment `/root/reference/` (or the real license-gated assets)
populate, run:

  python scripts/reference_day_one.py --reference /root/reference \
      [--sweep] [--out /tmp/day_one]

and the whole chain — asset discovery, TF1-ckpt conversion, real
SMPL/GMM loading, stage parity, ≤1 mm fit-gap certification, optional
constant sweep, smoke eval — executes unattended and emits one JSON
verdict (see tpu_pose/parity/day_one.py). tests/test_day_one.py proves
the chain against a fabricated reference-like directory.
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("reference", "/root/reference",
                    "reference mount / asset directory")
flags.DEFINE_string("out", "/tmp/tpu_pose_day_one", "output directory")
flags.DEFINE_integer("frames", 4, "certification probe frames")
flags.DEFINE_boolean("sweep", False, "also auto-sweep fit constants")
flags.DEFINE_integer("sweep_passes", 1, "sweep coordinate-descent passes")
flags.DEFINE_integer("eval_frames", 8, "smoke-eval frames")
flags.DEFINE_float("target_mm", 1.0, "certification target")


def main(argv):
    del argv
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    from tpu_pose.parity import day_one

    verdict = day_one.run_day_one(
        FLAGS.reference, out_dir=FLAGS.out, frames=FLAGS.frames,
        sweep=FLAGS.sweep, sweep_passes=FLAGS.sweep_passes,
        eval_frames=FLAGS.eval_frames, target_mm=FLAGS.target_mm)
    raise SystemExit(0 if verdict["ok"] else 1)


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
