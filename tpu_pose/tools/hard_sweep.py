"""Hard-benchmark training-scale study + distractor A/B trainer
(VERDICT r3 next #1 and #5).

Round 3 pinned ONE hard-set recipe (2400 steps, 32-batch pool,
reference width) and left open whether the 19.3 px plateau is data-,
capacity-, or task-bound. This tool trains a GRID of configs on the
hard set and evaluates each on the SAME held-out hard frames (plain and
refine_center+flip_tta 2D visible-joint error + PA-MPJPE), saving each
config's weights so downstream benchmarks (track_bench) can A/B them.

Grid syntax: ``--grid
name:steps:pool_batches:distractor_prob[:share_trunk[:features[:union[:max_d]]]]``
(comma-separated; ``union`` 0/1 switches stage-1 supervision to the
UNION heatmaps — see cpm_train.stage_supervision_loss; ``max_d``
samples 1..N distractors per triggered frame), e.g.::

  python scripts/hard_sweep.py --out /tmp/hard_sweep \\
      --grid r3:2400:32:0.0,dis:2400:32:0.35,u2:9600:64:0.35:0:0:1:2

Every config trains from the SAME init (seed 1) on pools drawn with the
SAME seeds, so rows differ only in the axis under study. Training is
the selfcheck recipe: device-resident uint8 pool, warmup-cosine, batch
``--train_batch``.
"""

import json
import os
import time

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("grid", "r3:2400:32:0.0,dis:2400:32:0.35",
                    "comma list of name:steps:pool:distractor[:share_trunk]")
flags.DEFINE_integer("train_batch", 16, "training batch size")
flags.DEFINE_integer("eval_frames", 48, "held-out hard eval frames")
flags.DEFINE_integer("restarts", 2, "fit hypotheses for the PA eval")
flags.DEFINE_string("out", "/tmp/tpu_pose_hard_sweep", "output dir "
                    "(weights per config + sweep.json)")


def main(argv):
    del argv
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    from tpu_pose.api import PoseEstimator
    from tpu_pose.data import synthetic_hard as sh
    from tpu_pose.fitting import priors as priors_lib
    from tpu_pose.models import cpm_train, smpl_data
    from tpu_pose.utils import checkpoint as ckpt_lib
    from tpu_pose.utils import metrics, profiling
    from tpu_pose.utils.config import CPMConfig

    os.makedirs(FLAGS.out, exist_ok=True)
    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:6.0f}s] {msg}", flush=True)

    configs = []
    for item in FLAGS.grid.split(","):
        parts = item.strip().split(":")
        configs.append({
            "name": parts[0], "steps": int(parts[1]),
            "pool": int(parts[2]), "distractor": float(parts[3]),
            "share_trunk": bool(int(parts[4])) if len(parts) > 4
            else False,
            "features": int(parts[5]) if len(parts) > 5 else 0,
            "union": bool(int(parts[6])) if len(parts) > 6 else False,
            "max_d": int(parts[7]) if len(parts) > 7 else 1})

    model = smpl_data.synthetic_smpl(seed=0)
    prior = priors_lib.synthetic_gmm_prior(0)

    # Held-out eval sets are shared by every row (seeds disjoint from
    # the training pool's seed * 9973 + b stream).
    base_cfg = CPMConfig()
    ev = sh.make_hard_examples(model, FLAGS.eval_frames, base_cfg,
                               seed=4321, scale_range=(0.45, 0.95))
    ev_imgs = jnp.asarray(ev["images"])

    def eval_row(params, cfg, tag, **est_kw):
        est = PoseEstimator(params, model, prior=prior, cpm_cfg=cfg,
                            fit_restarts=FLAGS.restarts, **est_kw)
        res = est.estimate_and_fit(ev_imgs)
        profiling.sync(res.theta)
        vis = ev["visibility"] > 0
        d = np.linalg.norm(np.asarray(res.joints2d) - ev["joints2d"],
                           axis=-1)
        px = float(d[vis].mean())
        pa = float(np.mean(metrics.pa_mpjpe_np(
            np.asarray(res.joints3d), ev["gt_joints3d"]))) * 1000
        log(f"  {tag}: {px:.2f} px (visible) | PA {pa:.1f} mm")
        return {"px": round(px, 2), "pa_mm": round(pa, 1)}

    rows = {}
    pools = {}
    for c in configs:
        import dataclasses as _dc
        cfg = base_cfg
        if c["share_trunk"] or c["features"]:
            cfg = _dc.replace(
                base_cfg, share_trunk=c["share_trunk"],
                **({"features": c["features"],
                    "refine_width": c["features"]}
                   if c["features"] else {}))
        pool_key = (c["pool"], c["distractor"], c["union"], c["max_d"])
        if pool_key not in pools:
            log(f"generating pool {pool_key} "
                f"({c['pool']}×{FLAGS.train_batch} frames)...")
            pool = []
            cmap_dev = None
            for b in sh.hard_train_batches(
                    model, FLAGS.train_batch, c["pool"], base_cfg,
                    seed=0, raw_images=True,
                    distractor_prob=c["distractor"],
                    max_distractors=c["max_d"],
                    union_stage1=c["union"]):
                pool.append(jax.tree.map(
                    lambda x: jax.device_put(jnp.asarray(x)), b))
            del cmap_dev
            pools[pool_key] = pool
        pool = pools[pool_key]

        log(f"config {c['name']}: {c['steps']} steps, pool {c['pool']}, "
            f"distractor {c['distractor']}, share_trunk "
            f"{c['share_trunk']}")
        params, opt_state, opt = cpm_train.init_train_state(
            jax.random.PRNGKey(1), cfg, lr=2e-4, total_steps=c["steps"])
        step = cpm_train.make_train_step(cfg, opt)
        for s_i in range(c["steps"]):
            params, opt_state, loss = step(params, opt_state,
                                           pool[s_i % len(pool)])
            if (s_i + 1) % 400 == 0:
                log(f"  step {s_i + 1}: loss {float(loss):.5f}")
        wpath = os.path.join(FLAGS.out, f"cpm_{c['name']}.npz")
        ckpt_lib.save_cpm_params(wpath, jax.tree.map(np.asarray, params))
        row = {"config": dict(c), "final_loss": float(loss),
               "weights": wpath}
        row["plain"] = eval_row(params, cfg, f"{c['name']} plain")
        row["rc_flip"] = eval_row(params, cfg, f"{c['name']} rc+flip",
                                  refine_center=True, flip_tta=True)
        rows[c["name"]] = row
        with open(os.path.join(FLAGS.out, "sweep.json"), "w") as f:
            json.dump(rows, f, indent=2)
    log(f"done → {FLAGS.out}/sweep.json")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
