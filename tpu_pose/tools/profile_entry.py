"""Profile an entry point: wall time, XLA cost model, MFU/HBM
fractions, and an optional Perfetto/XProf trace (SURVEY.md §5
"Tracing / profiling" — the ops tool gluing utils/profiling together).

  # time + cost-model the fused path at serving batch, capture a trace:
  python scripts/profile_entry.py --fn estimate_and_fit --batch 128 \
      --quantize --trace_dir /tmp/pose_trace

  # joints-only fit profile:
  python scripts/profile_entry.py --fn fit_smpl --batch 256

Prints ONE JSON line: ms/call, items/s, FLOPs, achieved FLOP/s, MFU,
HBM-bandwidth fraction (v5e peaks; --chip/--dtype override), trace dir.
View traces with XProf/TensorBoard or ui.perfetto.dev.
"""

import json
import os
import sys  # noqa: F401


from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_enum("fn", "estimate_and_fit",
                  ["estimate_2d", "estimate_and_fit",
                   "estimate_and_fit_multi", "estimate_and_fit_video",
                   "fit_smpl"], "entry point to profile")
flags.DEFINE_integer("batch", 32, "batch size (frames for image fns, "
                     "people for fit_smpl, T for video)")
flags.DEFINE_integer("iters", 5, "timed iterations (after 2 warmup)")
flags.DEFINE_string("trace_dir", "", "capture a profiler trace of one "
                    "timed call here (empty = no trace)")
flags.DEFINE_string("cpm_npz", "", "converted CPM weights (synthetic "
                    "if empty)")
flags.DEFINE_string("smpl_pkl", "", "SMPL pickle (synthetic if empty)")
flags.DEFINE_boolean("quantize", False, "int8 CPM path")
flags.DEFINE_string("chip", "tpu v5e", "peak table for MFU accounting")
flags.DEFINE_string("dtype", "bf16", "peak dtype for MFU accounting")


def main(argv):
    del argv
    import numpy as np

    from tpu_pose.api import PoseEstimator
    from tpu_pose.utils import profiling

    if FLAGS.cpm_npz and FLAGS.smpl_pkl:
        est = PoseEstimator.from_files(FLAGS.cpm_npz, FLAGS.smpl_pkl,
                                       quantize=FLAGS.quantize)
    else:
        est = PoseEstimator.create_synthetic(seed=0,
                                             quantize=FLAGS.quantize)

    rng = np.random.RandomState(0)
    b = FLAGS.batch
    size = est.cpm_cfg.input_size
    if FLAGS.fn == "fit_smpl":
        args = (rng.uniform(0, est.fit_cfg.img_size,
                            (b, est.cpm_cfg.num_joints, 2)
                            ).astype(np.float32),
                np.ones((b, est.cpm_cfg.num_joints), np.float32))
    else:
        args = (rng.randint(0, 255, (b, size, size, 3)
                            ).astype(np.uint8),)
    call = getattr(est, FLAGS.fn)

    timer = profiling.Timer(call, *args, warmup=2, iters=FLAGS.iters)
    sec = timer.run()

    # Cost-model the same computation (the jitted impl the call runs).
    try:
        cost = profiling.cost_analysis(lambda *a: call(*a), *args)
    except Exception as e:  # backend without cost analysis
        cost = {}
        print(f"note: cost_analysis unavailable ({e})", flush=True)
    util = profiling.utilization(sec, cost, chip=FLAGS.chip,
                                 dtype=FLAGS.dtype)

    if FLAGS.trace_dir:
        os.makedirs(FLAGS.trace_dir, exist_ok=True)
        with profiling.trace(FLAGS.trace_dir):
            profiling.sync(call(*args))

    record = {
        "fn": FLAGS.fn, "batch": b,
        "ms_per_call": round(sec * 1e3, 3),
        "items_per_s": round(b / sec, 1),
        "flops": cost.get("flops"),
        "flops_per_s": round(util["flops_per_s"], 1),
        "mfu": round(util["mfu"], 4),
        "hbm_frac": round(util["hbm_frac"], 4),
        "trace_dir": FLAGS.trace_dir or None,
    }
    print(json.dumps(record))


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
