"""Turn-key parity certification + auto-sweep against a reference-style
pipeline (BASELINE north star #2; SURVEY.md §7 hard-parts #1).

Modes:
  --certify         stage parity + matched-constants fit gap vs the
                    TF+scipy oracle on clean synthetic observations;
                    prints the achieved MPJPE gap against the 1 mm target.
  --sweep           treat the oracle's constants as unknown: fit probe
                    frames with BOTH pipelines and greedy-sweep FitConfig
                    (optimizer, iters/lr, λ's, gmof_sigma) to close the
                    output gap. Writes the best config + residual JSON.

Real assets slot in via --smpl_pkl/--gmm_pkl; the moment /root/reference
populates, wrap its fit in the OraclePipeline interface (fit_batch) and
pass it to harness.fit_gap / sweep.auto_sweep unchanged.

  python scripts/parity_sweep.py --certify
  python scripts/parity_sweep.py --sweep --frames 6 --out /tmp/parity.json
"""

import json
import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_boolean("certify", False, "run the ≤1 mm certification")
flags.DEFINE_boolean("sweep", False, "run the config auto-sweep")
flags.DEFINE_integer("frames", 4, "probe frames")
flags.DEFINE_integer("seed", 0, "probe-data seed")
flags.DEFINE_integer("verts", 0, "synthetic model vertex count "
                     "(0 = full 6890)")
flags.DEFINE_string("smpl_pkl", "", "real SMPL pickle (synthetic if empty)")
flags.DEFINE_string("gmm_pkl", "", "real GMM prior pickle (optional)")
flags.DEFINE_string("out", "/tmp/parity_report.json", "JSON report path")
flags.DEFINE_integer("passes", 2, "sweep coordinate-descent passes")
flags.DEFINE_float("target_mm", 1.0, "certification target")
flags.DEFINE_string("oracle_sigma", "", "override the oracle's gmof_sigma "
                    "(simulates unknown reference constants for --sweep)")


def main(argv):
    del argv
    import numpy as np

    from tpu_pose.fitting import priors as priors_lib
    from tpu_pose.models import smpl_data
    from tpu_pose.parity import harness, oracle, sweep

    if FLAGS.smpl_pkl:
        model = smpl_data.load_smpl_pickle(FLAGS.smpl_pkl)
    else:
        model = smpl_data.synthetic_smpl(
            seed=0, **({"num_verts": FLAGS.verts} if FLAGS.verts else {}))
    prior = (priors_lib.load_gmm_pickle(FLAGS.gmm_pkl) if FLAGS.gmm_pkl
             else priors_lib.synthetic_gmm_prior(0))

    report = {}
    if FLAGS.certify or not FLAGS.sweep:
        report["certification"] = harness.certify(
            model, prior=prior, n_frames=FLAGS.frames, seed=FLAGS.seed,
            target_mm=FLAGS.target_mm)
        c = report["certification"]
        print(f"stage parity: {json.dumps(c['stage_parity'])}")
        print(f"fit gap: {c['fit_gap']['mpjpe_gap_mm_mean']:.3f} mm mean / "
              f"{c['fit_gap']['mpjpe_gap_mm_max']:.3f} mm max "
              f"(target ≤{FLAGS.target_mm} mm) → "
              f"{'CERTIFIED' if c['certified'] else 'NOT certified'}")

    if FLAGS.sweep:
        gmm = {"means": np.asarray(prior.means),
               "precisions": np.asarray(prior.precisions),
               "log_consts": np.asarray(prior.log_consts)}
        ocfg = oracle.OracleConfig(**(
            {"gmof_sigma": float(FLAGS.oracle_sigma)}
            if FLAGS.oracle_sigma else {}))
        pipe = oracle.OraclePipeline(model._asdict(), gmm=gmm, cfg=ocfg)
        j2d, conf, _ = harness.make_clean_observations(
            model, FLAGS.frames, ocfg.img_size, seed=FLAGS.seed)
        print("running oracle fits (host scipy loop)...")
        ref_out = pipe.fit_batch(j2d, conf)
        report["sweep"] = sweep.auto_sweep(
            model, ref_out, j2d, conf, prior=prior, passes=FLAGS.passes,
            log=lambda s: print(s, flush=True))
        s = report["sweep"]
        print(f"sweep: best gap {s['best_gap_mm']:.3f} mm after "
              f"{s['evals']} configs; best setting {s['best_setting']}")

    sweep.save_report(FLAGS.out, report)
    print(f"report written to {FLAGS.out}")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
