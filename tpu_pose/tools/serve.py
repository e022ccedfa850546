"""Serve the fused pipeline over HTTP (tpu_pose/serving_http.py):
micro-batching device dispatch behind POST /predict, with /healthz,
/stats, and Prometheus /metrics. Loads either live weights or an AOT
deployment artifact (scripts/export_deploy.py) — the artifact path
needs no model code or checkpoints on the serving host.

  # artifact-only serving host:
  python scripts/serve.py --artifact /srv/pose_artifact --port 8080

  # live estimator from converted weights:
  python scripts/serve.py --cpm_npz w.npz --smpl_pkl smpl.pkl \
      --quantize --max_batch 128 --port 8080

  # client:
  curl -X POST -H 'Content-Type: image/jpeg' --data-binary @frame.jpg \
      'http://host:8080/predict?fields=joints2d,conf,theta'
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("artifact", "", "AOT artifact directory "
                    "(export_deploy.py); serves from it alone")
flags.DEFINE_string("cpm_npz", "", "converted CPM weights (.npz); "
                    "synthetic if empty and no --artifact")
flags.DEFINE_string("smpl_pkl", "", "SMPL model pickle")
flags.DEFINE_string("gmm_pkl", "", "GMM pose-prior pickle (optional)")
flags.DEFINE_boolean("quantize", False, "int8 CPM weights for large "
                     "batches (batch-conditional policy)")
flags.DEFINE_string("host", "0.0.0.0", "bind address")
flags.DEFINE_integer("port", 8080, "bind port (0 = pick a free one)")
flags.DEFINE_integer("max_batch", 64, "largest device batch")
flags.DEFINE_integer("max_queue", -1, "backpressure bound: shed with "
                     "503 + Retry-After once this many requests are "
                     "queued (-1 = 8*max_batch default, 0 = unbounded)")
flags.DEFINE_float("max_wait_ms", 5.0, "batch-fill wait after the "
                   "first queued request")
flags.DEFINE_enum("fn", "estimate_and_fit",
                  ["estimate_and_fit", "estimate_and_fit_multi",
                   "fit_smpl"],
                  "entry point to serve: the fused single-person path "
                  "(POST /predict), the multi-person hypothesis-slot "
                  "path, or joints-only fitting (POST /fit — external "
                  "2D detectors). Must match --artifact's exported fn.")
flags.DEFINE_boolean("allow_empty", False, "multi-person servers may "
                     "report ZERO people on person-free frames "
                     "(person_mask all-false) instead of always keeping "
                     "the top hypothesis")
flags.DEFINE_integer("max_people", 2, "hypothesis slots for "
                     "--fn estimate_and_fit_multi (live weights only)")
flags.DEFINE_string("fields", "",
                    "comma-separated result fields to serve; empty = a "
                    "per-fn default trimming 'vertices' (~80 KB/frame "
                    "— prefer reconstructing client-side from "
                    "theta/beta), 'all' = everything")
flags.DEFINE_boolean("verbose", False, "log each request")


def main(argv):
    del argv
    from tpu_pose.serving_http import PoseHTTPServer

    if FLAGS.artifact:
        from tpu_pose.export import ServableProgram
        est = ServableProgram(FLAGS.artifact)
        print(f"serving artifact {FLAGS.artifact} "
              f"(fn={est.program.fn}, platforms="
              f"{est.program.platforms})")
    elif FLAGS.cpm_npz and FLAGS.smpl_pkl:
        from tpu_pose.api import PoseEstimator
        est = PoseEstimator.from_files(
            FLAGS.cpm_npz, FLAGS.smpl_pkl, FLAGS.gmm_pkl or None,
            quantize=FLAGS.quantize, letterbox=True)
    else:
        from tpu_pose.api import PoseEstimator
        print("note: no weights supplied — synthetic estimator "
              "(smoke-test mode)")
        est = PoseEstimator.create_synthetic(seed=0, letterbox=True,
                                             quantize=FLAGS.quantize)

    if FLAGS.fields == "all":
        fields = None
    elif FLAGS.fields:
        fields = tuple(f for f in FLAGS.fields.split(",") if f)
    else:
        fields = {
            "estimate_and_fit": ("joints2d", "conf", "theta", "beta",
                                 "cam", "energy"),
            "estimate_and_fit_multi": ("joints2d", "conf",
                                       "person_scores", "person_mask",
                                       "theta", "beta", "cam",
                                       "energy"),
            "fit_smpl": None,   # FitResult is already compact
        }[FLAGS.fn]
    fn_kwargs = ({"max_people": FLAGS.max_people,
                  "allow_empty": FLAGS.allow_empty}
                 if (FLAGS.fn == "estimate_and_fit_multi"
                     and not FLAGS.artifact) else None)
    srv = PoseHTTPServer(est, host=FLAGS.host, port=FLAGS.port,
                         max_batch=FLAGS.max_batch,
                         max_wait_ms=FLAGS.max_wait_ms,
                         max_queue=(None if FLAGS.max_queue < 0
                                    else FLAGS.max_queue),
                         fields=fields, fn=FLAGS.fn,
                         fn_kwargs=fn_kwargs, verbose=FLAGS.verbose)
    route = "/fit" if FLAGS.fn == "fit_smpl" else "/predict"
    print(f"listening on http://{srv.host}:{srv.port}  "
          f"(POST {route}, GET /healthz /stats /metrics)")
    srv.serve_forever()


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
