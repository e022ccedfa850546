"""Build, verify, and smoke-run an AOT deployment artifact
(tpu_pose/export.py): serialize one of the fused entry points —
weights, SMPL model, and prior baked in as constants — then reload it
with no estimator in scope and run frames through it.

Usage:
  # hermetic synthetic estimator, fused single-person path, any batch:
  python scripts/export_deploy.py --out /tmp/pose_artifact

  # real assets, TPU+CPU portable artifact, static serving batch:
  python scripts/export_deploy.py --out /srv/pose --cpm_npz w.npz \
      --smpl_pkl smpl.pkl --fn estimate_and_fit --batch 128 \
      --platforms tpu,cpu

Prints one JSON line with the artifact size, lowering target(s), and the
reload smoke-run timing.
"""

import json
import os
import sys
import time


from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("out", "/tmp/tpu_pose_artifact", "artifact directory")
flags.DEFINE_string("fn", "estimate_and_fit",
                    "estimate_2d | estimate_and_fit | "
                    "estimate_and_fit_multi | estimate_and_fit_video | "
                    "fit_smpl | video_stream | video_multi_stream "
                    "(the last two build streaming-session artifacts; "
                    "--batch is the window chunk)")
flags.DEFINE_string("video_mode", "smooth", "estimate_and_fit_video "
                    "fit mode: smooth | temporal | independent")
flags.DEFINE_integer("n_devices", 0, "0 = single-device program; N = "
                     "batch-sharded multi-chip program over an "
                     "N-device ('data',) mesh")
flags.DEFINE_integer("batch", 0, "static batch size; 0 = symbolic "
                     "(one artifact, any batch)")
flags.DEFINE_string("platforms", "", "comma-separated lowering targets "
                    "(tpu,cpu); empty = current backend")
flags.DEFINE_string("cpm_npz", "", "converted CPM weights (.npz); "
                    "synthetic if empty")
flags.DEFINE_string("smpl_pkl", "", "SMPL model pickle; synthetic if empty")
flags.DEFINE_string("gmm_pkl", "", "GMM pose-prior pickle (optional)")
flags.DEFINE_boolean("quantize", False, "bake int8 CPM weights")
flags.DEFINE_integer("max_people", 2, "slots for estimate_and_fit_multi")
flags.DEFINE_boolean("smoke", True, "reload the artifact and run a "
                     "synthetic batch through it")
flags.DEFINE_string("inspect", "", "inspect an EXISTING artifact dir "
                    "(manifest summary + sha256 verification, one JSON "
                    "line) instead of building one")


def main(argv):
    del argv
    if FLAGS.inspect:
        # Pure file I/O: no estimator, no device, no deserialize.
        from tpu_pose import export as pexport
        info = pexport.inspect_artifact(FLAGS.inspect)
        print(json.dumps(info))
        if not info["ok"]:
            sys.exit(1)
        return
    if set(p for p in FLAGS.platforms.split(",") if p) == {"cpu"}:
        # CPU-only target (CI / build hosts): force the CPU backend
        # BEFORE jax initializes — under the axon plugin the env var
        # alone is ignored and a TPU-less host would hang in device
        # init (CLAUDE.md quirks).
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    from tpu_pose import export as pexport
    from tpu_pose.api import PoseEstimator

    if FLAGS.cpm_npz:
        est = PoseEstimator.from_files(
            FLAGS.cpm_npz, FLAGS.smpl_pkl, FLAGS.gmm_pkl or None,
            quantize=FLAGS.quantize)
    else:
        est = PoseEstimator.create_synthetic(
            seed=0, quantize=FLAGS.quantize)

    platforms = (tuple(p for p in FLAGS.platforms.split(",") if p)
                 or None)
    kw = {}
    if FLAGS.fn == "estimate_and_fit_multi":
        kw["max_people"] = FLAGS.max_people
    elif FLAGS.fn == "estimate_and_fit_video":
        kw["mode"] = FLAGS.video_mode
    t0 = time.perf_counter()
    if FLAGS.fn in ("video_stream", "video_multi_stream"):
        chunk = FLAGS.batch or 64
        if FLAGS.fn == "video_stream":
            meta = pexport.export_video_stream(
                est, FLAGS.out, chunk=chunk, platforms=platforms)
        else:
            meta = pexport.export_video_multi_stream(
                est, FLAGS.out, chunk=chunk, platforms=platforms,
                max_people=FLAGS.max_people)
        export_s = time.perf_counter() - t0
        size = sum(os.path.getsize(os.path.join(FLAGS.out, p))
                   for p in ("program_first.bin",
                             "program_anchored.bin"))
        print(json.dumps({
            "artifact": FLAGS.out, "fn": FLAGS.fn, "chunk": chunk,
            "platforms": meta["platforms"],
            "decode_impl": meta["decode_impl"],
            "program_mb": round(size / 1e6, 2),
            "export_s": round(export_s, 2)}))
        return
    meta = pexport.export_estimator(
        est, FLAGS.out, fn=FLAGS.fn,
        batch=FLAGS.batch or None, platforms=platforms,
        n_devices=FLAGS.n_devices or None, **kw)
    export_s = time.perf_counter() - t0
    size = os.path.getsize(os.path.join(FLAGS.out, "program.bin"))

    record = {"artifact": FLAGS.out, "fn": FLAGS.fn,
              "platforms": meta["platforms"],
              "decode_impl": meta["decode_impl"],
              "batch": meta["input"]["shape"][0],
              "program_mb": round(size / 1e6, 2),
              "export_s": round(export_s, 2)}

    if FLAGS.smoke:
        import jax
        import numpy as np
        if jax.default_backend() in meta["platforms"]:
            prog = pexport.load(FLAGS.out)
            b = FLAGS.batch or 2
            rng = np.random.RandomState(0)
            if FLAGS.fn == "fit_smpl":
                p = meta["inputs"][0]["shape"][1]
                size = est.fit_cfg.img_size
                args = (rng.uniform(0, size, (b, p, 2)).astype(
                            np.float32),
                        np.ones((b, p), np.float32))
            else:
                h, w = meta["input"]["shape"][1:3]
                args = (rng.randint(0, 255, (b, h, w, 3)).astype(
                    np.uint8),)
            t0 = time.perf_counter()
            out = prog(*args)            # includes compile
            record["smoke_compile_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            out = prog(*args)
            record["smoke_run_s"] = round(time.perf_counter() - t0, 4)
            record["smoke_outputs"] = {
                k: list(v.shape) for k, v in sorted(out.items())}
        else:
            record["smoke"] = (f"skipped: backend "
                               f"{jax.default_backend()} not in "
                               f"{meta['platforms']}")
    print(json.dumps(record))


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
