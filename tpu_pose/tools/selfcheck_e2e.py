"""End-to-end self-check (hermetic, no license-gated assets):

1. Train the full-geometry CPM on synthetic labeled frames.
2. Evaluate the fused estimate→fit pipeline with the trained weights
   (MPJPE / PA-MPJPE vs ground truth), against the random-weight baseline.
3. Compare temporal warm-start video fitting vs independent per-frame fits
   on a smooth synthetic sequence.

This exercises every subsystem in one run: data generation, DP training,
checkpointing, quantization (optional), fused inference+fit, temporal
fitting, metrics. Takes ~45 min on one v5e at the default u64 hard
recipe (mostly the 9600 hard training steps; `--hard_weights` reruns
the eval ladder from a prior run's npz without retraining).

  python scripts/selfcheck_e2e.py --steps 800 --out /tmp/selfcheck
"""

import functools
import json
import os
import sys
import time


from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_integer("steps", 800, "CPM training steps")
flags.DEFINE_integer("train_batch", 16, "training batch size")
flags.DEFINE_integer("eval_frames", 64, "eval frames (fused pipeline)")
flags.DEFINE_integer("video_frames", 32, "temporal-fit sequence length")
flags.DEFINE_integer("restarts", 4, "fit hypotheses for the eval")
flags.DEFINE_integer("hard_steps", 9600, "CPM training steps on the HARD "
                     "set (0 skips the hard section)")
flags.DEFINE_integer("hard_pool", 64, "HARD training pool size in batches "
                     "(scripts/hard_sweep.py is the tool that picks this; "
                     "the selfcheck just re-pins the chosen recipe)")
flags.DEFINE_integer("hard_eval_frames", 48, "hard-set eval frames")
flags.DEFINE_float("hard_distractor_prob", 0.35, "fraction of hard "
                   "training frames that render a second, non-target "
                   "body (the center-map-as-person-SELECTOR training "
                   "signal; 0 reproduces the round-3 recipe)")
flags.DEFINE_integer("hard_max_distractors", 2, "1..N distractors per "
                     "triggered frame (N>1 puts k≥3-person scenes in "
                     "the training distribution)")
flags.DEFINE_boolean("hard_union_stage1", True, "supervise stage 1 "
                     "with the UNION heatmaps on distractor frames "
                     "(detector/selector split — see "
                     "cpm_train.stage_supervision_loss)")
flags.DEFINE_string("hard_weights", "", "load hard-set CPM weights from "
                    "this npz (a prior run's cpm_weights_hard.npz) "
                    "instead of retraining — reruns of the eval ladder "
                    "without the ~9600-step training cost")
flags.DEFINE_string("out", "/tmp/tpu_pose_selfcheck", "output dir")


def main(argv):
    del argv
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tpu_pose.api import PoseEstimator
    from tpu_pose.data import synthetic
    from tpu_pose.fitting import temporal
    from tpu_pose.models import cpm_train, smpl_data
    from tpu_pose.models import smpl as smpl_lib
    from tpu_pose.utils import checkpoint as ckpt_lib
    from tpu_pose.utils import metrics, profiling
    from tpu_pose.utils.config import CPMConfig

    os.makedirs(FLAGS.out, exist_ok=True)
    t0 = time.time()
    results = {}

    def log(msg):
        print(f"[{time.time() - t0:6.0f}s] {msg}", flush=True)

    cfg = CPMConfig()
    model = smpl_data.synthetic_smpl(seed=0)

    # ---- 1. train ------------------------------------------------------
    log("generating training pool...")
    # Device-resident pool: re-shipping a batch every step makes the
    # loop host-link-bound (~2 s/step of pure transfer on the axon
    # tunnel). Ship ONCE, as bytes: uint8 images (normalized in-graph by
    # the train step), one shared center-map array across all batches
    # — ~145 MB total instead of 640 MB of f32.
    cmap_dev = None
    pool = []
    for b in synthetic.cpm_train_batches(model, FLAGS.train_batch, 16,
                                         cfg, seed=0, raw_images=True):
        if cmap_dev is None:
            cmap_dev = jax.device_put(jnp.asarray(b["center_maps"]))
        pool.append({"images": jax.device_put(jnp.asarray(b["images"])),
                     "center_maps": cmap_dev,
                     "heatmaps": jax.device_put(jnp.asarray(b["heatmaps"]))})
    params, opt_state, opt = cpm_train.init_train_state(
        jax.random.PRNGKey(0), cfg, lr=2e-4, total_steps=FLAGS.steps)
    rand_params = params
    step = cpm_train.make_train_step(cfg, opt)
    log(f"training {FLAGS.steps} steps...")
    for s in range(FLAGS.steps):
        params, opt_state, loss = step(params, opt_state,
                                       pool[s % len(pool)])
        if (s + 1) % 100 == 0:
            log(f"step {s + 1}: loss {float(loss):.5f}")
    results["train_final_loss"] = float(loss)
    ckpt_lib.save_cpm_params(os.path.join(FLAGS.out, "cpm_weights.npz"),
                             jax.tree.map(np.asarray, params))

    # ---- 2. fused-pipeline eval: trained vs random weights --------------
    ex = synthetic.make_examples(model, FLAGS.eval_frames, cfg, seed=1234)
    imgs = jnp.asarray(ex["images"])
    gt3d = jnp.asarray(ex["gt_joints3d"])

    def fused_eval(tag, p, **est_kw):
        est = PoseEstimator(p, model, cpm_cfg=cfg,
                            **({"fit_restarts": FLAGS.restarts,
                                "prior": None} | est_kw))
        res = est.estimate_and_fit(imgs)
        profiling.sync(res.theta)
        px_err = float(jnp.mean(jnp.linalg.norm(
            res.joints2d - jnp.asarray(ex["joints2d"]), axis=-1)))
        # scale-aligned MPJPE (monocular scale ambiguity)
        pred, gt = res.joints3d, gt3d
        pred_c = pred - pred.mean(-2, keepdims=True)
        gt_c = gt - gt.mean(-2, keepdims=True)
        s = (jnp.sqrt((gt_c ** 2).sum((-2, -1)))
             / (jnp.sqrt((pred_c ** 2).sum((-2, -1))) + 1e-9))
        mp = float(jnp.mean(jnp.linalg.norm(
            pred_c * s[..., None, None] - gt_c, axis=-1))) * 1000
        pa = float(np.mean(metrics.pa_mpjpe_np(
            np.asarray(pred), np.asarray(gt)))) * 1000
        log(f"{tag}: 2D px err {px_err:.2f} | MPJPE {mp:.1f} mm | "
            f"PA {pa:.1f} mm")
        results[tag] = {"px_err": px_err, "mpjpe_mm": mp, "pa_mpjpe_mm": pa}

    fused_eval("fused_random_weights", rand_params)
    fused_eval("fused_trained_weights", params)

    # ---- 2a. informative pose prior: EM-fitted GMM-8 on the pose corpus
    # (fitting/priors.fit_gmm — the artifact the SMPLify lineage ships as
    # gmm_08.pkl, built here from the synthetic training distribution).
    log("EM-fitting a GMM-8 prior to 4000 corpus poses...")
    from tpu_pose.fitting import priors as priors_lib
    th_corpus, _ = synthetic.sample_poses(np.random.RandomState(7), 4000)
    fitted_prior = priors_lib.fit_gmm(th_corpus[:, 3:], num_components=8)
    fused_eval("fused_fitted_prior", params, prior=fitted_prior)

    # ---- 2b. learned init head: single-start fits, three inits ----------
    # Compares mean-pose init vs learned init vs multistart on the SAME
    # trained CPM (fitting/init_head.py; ROADMAP r1 #2 accuracy lever).
    log("training init head (self-supervised from the SMPL model)...")
    from tpu_pose.fitting import init_head as head_lib
    head, head_losses = head_lib.train_init_head(model, steps=2000,
                                                 batch=256)
    results["init_head_final_loss"] = float(head_losses[-20:].mean())
    fused_eval("fused_meanpose_init", params, fit_restarts=1)
    fused_eval("fused_learned_init", params, fit_restarts=1,
               init_head=head)

    # ---- 3. temporal warm-start vs independent --------------------------
    vex = synthetic.make_video_examples(model, FLAGS.video_frames, cfg,
                                        seed=77)
    est = PoseEstimator(params, model, prior=None, cpm_cfg=cfg)
    e2d = est.estimate_2d(jnp.asarray(vex["images"]))
    gt3d_v = jnp.asarray(vex["gt_joints3d"])

    def video_eval(tag, fn):
        t1 = time.time()
        res = jax.jit(fn)(e2d.joints2d, e2d.conf)
        profiling.sync(res.theta)
        dt = time.time() - t1
        out = jax.jit(smpl_lib.smpl_forward_batch)(model, res.beta,
                                                   res.theta)
        pa = float(np.mean(metrics.pa_mpjpe_np(
            np.asarray(out.joints), np.asarray(gt3d_v)))) * 1000
        log(f"{tag}: PA-MPJPE {pa:.1f} mm ({dt:.1f}s inc. compile)")
        results[tag] = {"pa_mpjpe_mm": pa}

    video_eval("video_temporal", lambda j, c: temporal.fit_video(
        model, j, c, cfg=est.fit_cfg))
    video_eval("video_independent",
               lambda j, c: temporal.fit_video_independent(
                   model, j, c, cfg=est.fit_cfg))
    video_eval("video_smooth",
               lambda j, c: temporal.fit_video_smooth(
                   model, j, c, cfg=est.fit_cfg, prior=fitted_prior))

    # ---- 4. multi-person decode with TRAINED weights ---------------------
    # Compose two half-scale blob-people per frame (left/right), run the
    # multi-person fused path, and score how well the two recovered
    # hypotheses' 2D centroids match the two GT person centroids.
    n_multi = 8
    exA = synthetic.make_examples(model, n_multi, cfg, seed=555)
    exB = synthetic.make_examples(model, n_multi, cfg, seed=556)
    s4 = cfg.input_size // 4
    jA = exA["joints2d"] * 0.5 + np.array([0.0, s4])          # left half
    jB = exB["joints2d"] * 0.5 + np.array([2.0 * s4, s4])     # right half
    frames = np.stack([
        np.maximum(synthetic.render_blob_image(jA[i], cfg.input_size),
                   synthetic.render_blob_image(jB[i], cfg.input_size))
        for i in range(n_multi)])
    est_multi = PoseEstimator(params, model, prior=fitted_prior,
                              cpm_cfg=cfg, fit_restarts=FLAGS.restarts)
    multi = est_multi.estimate_and_fit_multi(jnp.asarray(frames),
                                             max_people=2)
    profiling.sync(multi.theta)
    pred_c = np.asarray(multi.joints2d.mean(-2))              # (N, 2, 2)
    gt_c = np.stack([jA.mean(-2), jB.mean(-2)], axis=1)       # (N, 2, 2)
    # Best assignment of 2 hypotheses to 2 people per frame.
    d_id = np.linalg.norm(pred_c - gt_c, axis=-1).mean(-1)
    d_sw = np.linalg.norm(pred_c - gt_c[:, ::-1], axis=-1).mean(-1)
    center_err = float(np.minimum(d_id, d_sw).mean())
    # Per-person 3D accuracy (VERDICT r2 next #4): PA-MPJPE of each
    # fitted hypothesis vs its assigned GT person, masked by person_mask
    # (the fits now run with the same multistart levers as the
    # single-person path). GT 3D comes from the poses behind exA/exB.
    swap = d_sw < d_id
    pred3d = np.asarray(multi.joints3d)                        # (N,2,24,3)
    gt3d_pair = np.stack([exA["gt_joints3d"][:n_multi],
                          exB["gt_joints3d"][:n_multi]], axis=1)
    mask2 = np.asarray(multi.person_mask)
    pas = []
    for i in range(n_multi):
        order = [1, 0] if swap[i] else [0, 1]
        for slot in range(2):
            if mask2[i, slot]:
                pas.append(float(metrics.pa_mpjpe_np(
                    pred3d[i, slot][None],
                    gt3d_pair[i, order[slot]][None])[0]))
    pa_two_person = float(np.mean(pas)) * 1000
    log(f"multi-person per-person PA-MPJPE {pa_two_person:.1f} mm over "
        f"{len(pas)} masked fits (single-person figure: "
        f"{results['fused_fitted_prior']['pa_mpjpe_mm']:.1f} mm)")
    # Person-COUNT selection (cpm.select_people): two-person frames
    # should keep both hypotheses, single-person frames only one.
    counts2 = np.asarray(multi.person_mask.sum(-1))
    single = est.estimate_and_fit_multi(
        jnp.asarray(exA["images"][:n_multi]), max_people=2)
    profiling.sync(single.person_mask)
    counts1 = np.asarray(single.person_mask.sum(-1))
    count_acc = float(((counts2 == 2).mean() + (counts1 == 1).mean()) / 2)
    log(f"multi-person (trained): mean matched center err "
        f"{center_err:.1f} px over {n_multi} two-person frames; "
        f"count-selection acc {count_acc:.2f} "
        f"(two-person counts {counts2.tolist()}, "
        f"one-person counts {counts1.tolist()})")
    results["multi_person"] = {"center_err_px": center_err,
                               "frames": n_multi,
                               "count_acc": count_acc,
                               "pa_mpjpe_mm_per_person": pa_two_person,
                               "masked_fits": len(pas)}

    # ---- 5. HARD benchmark: mesh-rendered cluttered frames ---------------
    # (data/synthetic_hard.py; VERDICT r2 next #2) Train the CPM on the
    # hard set, then measure (a) the fused ladder on hard frames, (b) the
    # scale-robustness ablation for refine_scale (next #1), (c) hard
    # two-person per-person accuracy.
    if FLAGS.hard_steps > 0:
        from tpu_pose.data import synthetic_hard as sh
        if FLAGS.hard_weights:
            from tpu_pose.utils import tf_converter
            log(f"loading hard-set weights from {FLAGS.hard_weights} "
                "(skipping training)...")
            params_h = jax.tree.map(
                jnp.asarray, tf_converter.load_params_npz(
                    FLAGS.hard_weights))
        else:
            log("generating HARD training pool (mesh render, clutter, "
                "scale/offset jitter, occlusion)...")
            pool_h = []
            # Default recipe = the round-4/5 sweep winner u64
            # (scripts/hard_sweep.py): 64 batches × 9600 steps,
            # distractors 0.35×(1..2), union stage-1 supervision —
            # 17.71 px rc+flip vs 18.4 for p64 and 19.3 for the
            # round-3 32×2400 recipe (PARITY.md hard table).
            for b in sh.hard_train_batches(
                    model, FLAGS.train_batch, FLAGS.hard_pool, cfg,
                    seed=0, raw_images=True,
                    distractor_prob=FLAGS.hard_distractor_prob,
                    max_distractors=FLAGS.hard_max_distractors,
                    union_stage1=FLAGS.hard_union_stage1):
                pool_h.append(jax.tree.map(
                    lambda x: jax.device_put(jnp.asarray(x)), b))
            params_h, opt_state_h, opt_h = cpm_train.init_train_state(
                jax.random.PRNGKey(1), cfg, lr=2e-4,
                total_steps=FLAGS.hard_steps)
            step_h = cpm_train.make_train_step(cfg, opt_h)
            log(f"training {FLAGS.hard_steps} steps on the hard set...")
            for s in range(FLAGS.hard_steps):
                params_h, opt_state_h, loss_h = step_h(
                    params_h, opt_state_h, pool_h[s % len(pool_h)])
                if (s + 1) % 200 == 0:
                    log(f"hard step {s + 1}: loss {float(loss_h):.5f}")
            results["hard_train_final_loss"] = float(loss_h)
            # Save BEFORE the eval ladder so a mid-ladder failure (or a
            # later --hard_weights rerun) never repays the training.
            ckpt_lib.save_cpm_params(
                os.path.join(FLAGS.out, "cpm_weights_hard.npz"),
                jax.tree.map(np.asarray, params_h))
            del pool_h

        def hard_eval(tag, scale_range, truncation=0.0, **est_kw):
            exh = sh.make_hard_examples(
                model, FLAGS.hard_eval_frames, cfg, seed=4321,
                scale_range=scale_range, truncation=truncation)
            esth = PoseEstimator(params_h, model, prior=fitted_prior,
                                 cpm_cfg=cfg,
                                 fit_restarts=FLAGS.restarts, **est_kw)
            res = esth.estimate_and_fit(jnp.asarray(exh["images"]))
            profiling.sync(res.theta)
            vis = exh["visibility"] > 0
            d = np.linalg.norm(np.asarray(res.joints2d)
                               - exh["joints2d"], axis=-1)
            px_err = float(d[vis].mean())
            pa = float(np.mean(metrics.pa_mpjpe_np(
                np.asarray(res.joints3d),
                exh["gt_joints3d"]))) * 1000
            log(f"{tag}: 2D px err {px_err:.2f} (visible joints) | "
                f"PA {pa:.1f} mm")
            results[tag] = {"px_err": px_err, "pa_mpjpe_mm": pa}
            return px_err

        # (a) the hard ladder at the training scale range. (The training
        # pool is flip-augmented by default — hard_train_batches
        # flip_prob=0.5 — which is what makes flip_tta a win instead of
        # a loss.)
        hard_eval("hard_plain", (0.45, 0.95))
        hard_eval("hard_refine_center", (0.45, 0.95), refine_center=True)
        hard_eval("hard_rc_flip_tta", (0.45, 0.95), refine_center=True,
                  flip_tta=True)
        # Multi-scale TTA (the CPM eval protocol's other half) on top of
        # the best single-pass configuration: 6 passes (3 scales × flip).
        hard_eval("hard_rc_flip_scale_tta", (0.45, 0.95),
                  refine_center=True, flip_tta=True,
                  scale_tta=(0.8, 1.25))
        # int8 serving precision on the hard set: the serving-accuracy
        # honesty check (easy-set decode drift was 0.90 px; this is the
        # same question on realistic frames). Calibrated static scales,
        # int8 forced for every batch size.
        cal = sh.make_hard_examples(model, 16, cfg, seed=777,
                                    scale_range=(0.45, 0.95))["images"]
        hard_eval("hard_rc_int8_calibrated", (0.45, 0.95),
                  refine_center=True, quantize=True,
                  calibration_images=jnp.asarray(cal), int8_min_batch=0)
        # Frame-edge truncation (people entering/leaving frame — an
        # out-of-distribution axis: training keeps everyone in frame).
        # Measured 2026-08-19: plain decode collapses (32→51 px) but
        # refine_center absorbs it (visible-joint error within ~1.07×
        # of untruncated) — the geometry hint does not need the whole
        # person.
        hard_eval("hard_truncated_plain", (0.45, 0.95), truncation=0.3)
        hard_eval("hard_truncated_rc_flip", (0.45, 0.95), truncation=0.3,
                  refine_center=True, flip_tta=True)
        # (b) scale robustness: full 0.3–1.0 sweep, fixed-scale baseline,
        # and the crop/zoom second pass (done-criterion: refine_scale
        # within ~1.2× of the fixed-scale baseline).
        px_fixed = hard_eval("hard_fixed_scale", (0.75, 0.85))
        px_naive = hard_eval("hard_scale_sweep_plain", (0.3, 1.0))
        px_rs = hard_eval("hard_scale_sweep_refine_scale", (0.3, 1.0),
                          refine_scale=True)
        results["scale_robustness"] = {
            "fixed_px": px_fixed, "sweep_plain_px": px_naive,
            "sweep_refine_scale_px": px_rs,
            "ratio_vs_fixed": px_rs / max(px_fixed, 1e-6)}
        log(f"scale robustness: refine_scale {px_rs:.2f} px vs fixed "
            f"{px_fixed:.2f} px (ratio {px_rs / max(px_fixed, 1e-6):.2f}"
            f"; naive sweep {px_naive:.2f} px)")

        # (c) hard two-person frames: per-person PA with trained-on-hard
        # weights (depth-ordered compositing → real inter-person
        # occlusion).
        mh = sh.make_hard_multi_examples(model, 8, cfg, seed=99)
        est_mh = PoseEstimator(params_h, model, prior=fitted_prior,
                               cpm_cfg=cfg, fit_restarts=FLAGS.restarts)
        rmh = est_mh.estimate_and_fit_multi(jnp.asarray(mh["images"]),
                                            max_people=2)
        profiling.sync(rmh.theta)
        pc = np.asarray(rmh.joints2d.mean(-2))
        gc = mh["joints2d"].mean(-2)
        d_id = np.linalg.norm(pc - gc, axis=-1).mean(-1)
        d_sw = np.linalg.norm(pc - gc[:, ::-1], axis=-1).mean(-1)
        swap = d_sw < d_id
        maskh = np.asarray(rmh.person_mask)
        pas_h = []
        for i in range(len(pc)):
            order = [1, 0] if swap[i] else [0, 1]
            for slot in range(2):
                if maskh[i, slot]:
                    pas_h.append(float(metrics.pa_mpjpe_np(
                        np.asarray(rmh.joints3d)[i, slot][None],
                        mh["gt_joints3d"][i, order[slot]][None])[0]))
        results["hard_multi_person"] = {
            "center_err_px": float(np.minimum(d_id, d_sw).mean()),
            "pa_mpjpe_mm_per_person": float(np.mean(pas_h)) * 1000,
            "masked_fits": len(pas_h)}
        log(f"hard multi-person: center err "
            f"{results['hard_multi_person']['center_err_px']:.1f} px, "
            f"per-person PA "
            f"{results['hard_multi_person']['pa_mpjpe_mm_per_person']:.1f}"
            f" mm over {len(pas_h)} masked fits")
        # (d) multi-person VIDEO: identity tracking through a crossing
        # (people swap sides mid-sequence, the nearer occluding the
        # farther at the crossing) → per-track smooth fits
        # (api.estimate_and_fit_video_multi / fitting/tracking.py).
        vh = sh.make_hard_multi_video(model, 24, cfg, seed=7,
                                      crossing=True)
        # Recommended k=2 tracking recipe (round-5 10-seed A/B,
        # PARITY.md: crossing id acc 0.9038 vs 0.8615 base): gated
        # appearance-anchor refresh + two smooth→re-decode hint passes.
        rvm = est_mh.estimate_and_fit_video_multi(
            jnp.asarray(vh["images"]), max_people=2,
            track_anchor_refresh=0.3, hint_passes=2)
        profiling.sync(rvm.theta)
        tc = np.asarray(rvm.joints2d).mean(-2)        # (T, 2, 2)
        gc = vh["centers"]
        # Global track→identity matching over the WHOLE sequence, then
        # per-frame identity accuracy under it — an identity swap at the
        # crossing shows up as id_acc dropping toward 0.5.
        d_id = np.linalg.norm(tc - gc, axis=-1).sum()
        d_sw = np.linalg.norm(tc - gc[:, ::-1], axis=-1).sum()
        order = [0, 1] if d_id <= d_sw else [1, 0]
        ga = gc[:, order]
        per_frame = (np.linalg.norm(tc - ga, axis=-1).sum(-1)
                     <= np.linalg.norm(tc - ga[:, ::-1], axis=-1).sum(-1))
        id_acc = float(per_frame.mean())
        center_err_v = float(np.linalg.norm(tc - ga, axis=-1).mean())
        gj = vh["gt_joints3d"][:, order]              # (T, 2, 24, 3)
        pa_v = float(np.mean([
            np.mean(metrics.pa_mpjpe_np(
                np.asarray(rvm.joints3d)[k], gj[:, k]))
            for k in range(2)])) * 1000
        results["hard_multi_video"] = {
            "id_acc": id_acc, "center_err_px": center_err_v,
            "pa_mpjpe_mm_per_person": pa_v}
        log(f"hard multi-video (crossing): id acc {id_acc:.2f}, center "
            f"err {center_err_v:.1f} px, per-person PA {pa_v:.1f} mm")

        # (e) empty-frame operating point (VERDICT r3 next #6): person-
        # evidence top-peak score distributions on person-FREE hard
        # backgrounds vs person frames pick the allow_empty floor; then
        # measure the person/no-person calls at that floor.
        from tpu_pose.models import cpm as cpm_lib
        emp = sh.make_empty_examples(32, cfg, seed=1212)
        per = sh.make_hard_examples(model, 32, cfg, seed=1313,
                                    scale_range=(0.45, 0.95))
        multi2 = jax.jit(functools.partial(
            cpm_lib.estimate_2d_multi, cfg=cfg, max_people=2))
        s_emp = np.asarray(multi2(params_h,
                                  jnp.asarray(emp["images"]))[3])
        s_per = np.asarray(multi2(params_h,
                                  jnp.asarray(per["images"]))[3])
        top_emp, top_per = s_emp[:, 0], s_per[:, 0]
        # Floor: geometric midpoint when the distributions separate,
        # else the empty set's 95th percentile (accepting some FPs).
        lo, hi = float(top_emp.max()), float(top_per.min())
        floor = (float(np.sqrt(max(lo, 1e-6) * hi)) if hi > lo
                 else float(np.quantile(top_emp, 0.95)))
        fp = float((top_emp >= floor).mean())
        tp = float((top_per >= floor).mean())
        # Count accuracy WITH allow_empty at the chosen floor across
        # 0/1/2-person frames (mask from the full multi path).
        est_sel = PoseEstimator(params_h, model, prior=fitted_prior,
                                cpm_cfg=cfg)

        def counts(imgs, dup_joint_frac):
            return np.asarray(est_sel.estimate_and_fit_multi(
                jnp.asarray(imgs), max_people=2,
                min_person_score=floor, allow_empty=True,
                dup_joint_frac=dup_joint_frac).person_mask.sum(-1))

        # Count accuracy at the floor, with the mean-distance dedupe
        # alone vs + the partial-overlap dedupe (dup_joint_frac=0.5 —
        # the round-5 fix for clutter-split duplicate hypotheses that
        # sit 49–84 px part-aligned from the person slot yet share
        # 0.64–1.00 of their joints with it; select_people docstring).
        c0, c1, c2 = (counts(emp["images"][:16], 0.0),
                      counts(per["images"][:16], 0.0),
                      counts(mh["images"], 0.0))
        c0o, c1o, c2o = (counts(emp["images"][:16], 0.5),
                         counts(per["images"][:16], 0.5),
                         counts(mh["images"], 0.5))
        profiling.sync(jnp.asarray(0))
        results["empty_frame_operating_point"] = {
            "floor": floor, "empty_top1_max": lo, "person_top1_min": hi,
            "fp_rate_empty": fp, "tp_retention": tp,
            "count_acc_0p": float((c0 == 0).mean()),
            "count_acc_1p": float((c1 == 1).mean()),
            "count_acc_2p": float((c2 == 2).mean()),
            "count_acc_0p_ovl": float((c0o == 0).mean()),
            "count_acc_1p_ovl": float((c1o == 1).mean()),
            "count_acc_2p_ovl": float((c2o == 2).mean())}
        log(f"empty-frame operating point: floor {floor:.3f} "
            f"(empty max {lo:.3f} vs person min {hi:.3f}) -> FP "
            f"{fp:.2f}, TP {tp:.2f}; allow_empty count acc "
            f"0p {float((c0 == 0).mean()):.2f} / 1p "
            f"{float((c1 == 1).mean()):.2f} / 2p "
            f"{float((c2 == 2).mean()):.2f}; with dup_joint_frac=0.5: "
            f"0p {float((c0o == 0).mean()):.2f} / 1p "
            f"{float((c1o == 1).mean()):.2f} / 2p "
            f"{float((c2o == 2).mean()):.2f}")

        # (f) k=3 crowd stills (VERDICT r3 next #3): per-person PA +
        # count accuracy at max_people=3 (3! = 6 assignment candidates).
        import itertools as it_lib
        m3 = sh.make_hard_multi_examples(model, 8, cfg, seed=303,
                                         num_people=3)
        r3 = est_mh.estimate_and_fit_multi(jnp.asarray(m3["images"]),
                                           max_people=3)
        profiling.sync(r3.theta)
        pc3 = np.asarray(r3.joints2d.mean(-2))            # (N, 3, 2)
        gc3 = m3["joints2d"].mean(-2)
        perms3 = list(it_lib.permutations(range(3)))
        pas3, cents3 = [], []
        mask3 = np.asarray(r3.person_mask)
        for i in range(len(pc3)):
            costs = [np.linalg.norm(pc3[i] - gc3[i, list(pp)],
                                    axis=-1).mean() for pp in perms3]
            order3 = perms3[int(np.argmin(costs))]
            cents3.append(min(costs))
            for slot in range(3):
                if mask3[i, slot]:
                    pas3.append(float(metrics.pa_mpjpe_np(
                        np.asarray(r3.joints3d)[i, slot][None],
                        m3["gt_joints3d"][i, order3[slot]][None])[0]))
        counts3 = mask3.sum(-1)
        results["hard_multi_person_k3"] = {
            "center_err_px": float(np.mean(cents3)),
            "pa_mpjpe_mm_per_person": float(np.mean(pas3)) * 1000,
            "count_acc": float((counts3 == 3).mean()),
            "masked_fits": len(pas3)}
        log(f"hard k=3 stills: center err {np.mean(cents3):.1f} px, "
            f"per-person PA {np.mean(pas3) * 1000:.1f} mm over "
            f"{len(pas3)} masked fits, count acc "
            f"{float((counts3 == 3).mean()):.2f}")
    # ---- 8. deployment artifact round-trip ------------------------------
    # Export the trained fused path (jax.export, weights baked in),
    # reload it with no estimator in scope, and check it against the
    # live program on the SAME eval frames — the ship-an-artifact story
    # exercised with real trained weights on the device.
    log("exporting deployment artifact (trained weights)...")
    from tpu_pose import export as pexport
    art_dir = os.path.join(FLAGS.out, "artifact")
    est_dep = PoseEstimator(params, model, cpm_cfg=cfg, prior=None)
    pexport.export_estimator(est_dep, art_dir, fn="estimate_and_fit",
                             batch=int(imgs.shape[0]))
    prog = pexport.load(art_dir)
    out_art = prog(np.asarray(imgs))
    live = est_dep.estimate_and_fit(imgs)
    profiling.sync(live.theta)
    d_j2d = float(np.max(np.abs(
        out_art["joints2d"] - np.asarray(live.joints2d))))
    d_th = float(np.max(np.abs(out_art["theta"] - np.asarray(live.theta))))
    results["export_artifact"] = {
        "program_mb": round(os.path.getsize(
            os.path.join(art_dir, "program.bin")) / 1e6, 1),
        "max_d_joints2d_px": d_j2d, "max_d_theta": d_th,
        "ok": bool(d_j2d < 0.5 and d_th < 0.05)}
    log(f"artifact round-trip: Δjoints2d {d_j2d:.3g} px, "
        f"Δθ {d_th:.3g} → {'OK' if results['export_artifact']['ok'] else 'MISMATCH'}")

    # ---- 9. dataset-adapter chain (convert → shards → PCK eval) ---------
    # Fabricate an LSP-format dataset (joints.mat in the original
    # (3, 14, N) occluded-flag layout + JPEG images) from labeled
    # synthetic frames, run the REAL conversion path
    # (data/datasets.lsp_to_shards) and the streaming 2D protocol
    # evaluator over the shards with the trained weights — the
    # convert_dataset.py → eval_2d.py chain, end-to-end on device.
    log("dataset-adapter chain (LSP fabrication → convert → PCKh)...")
    import scipy.io
    from PIL import Image

    from tpu_pose.data import datasets as ds_lib
    from tpu_pose.data import pipeline as pipe_lib
    from tpu_pose.parallel import eval as eval_lib

    ds_n = 16
    ex_ds = synthetic.make_examples(model, ds_n, cfg, seed=777)
    inv = np.argsort(ds_lib.LSP_TO_CPM)      # CPM order → LSP order
    lsp_xy = ex_ds["joints2d"][:, inv]        # (N, 14, 2)
    lsp = np.transpose(
        np.concatenate([lsp_xy, np.zeros((ds_n, 14, 1))], -1),
        (2, 1, 0))                            # (3, 14, N), flag 0=visible
    fab = os.path.join(FLAGS.out, "lsp_fab")
    img_dir = os.path.join(fab, "images")
    os.makedirs(img_dir, exist_ok=True)
    scipy.io.savemat(os.path.join(fab, "joints.mat"), {"joints": lsp})
    for i in range(ds_n):
        Image.fromarray(ex_ds["images"][i]).save(
            os.path.join(img_dir, f"im{i + 1:04d}.jpg"), quality=92)
    shard_dir = os.path.join(fab, "shards")
    ds_lib.lsp_to_shards(os.path.join(fab, "joints.mat"), img_dir,
                         shard_dir, out_size=cfg.input_size)
    est_ds = PoseEstimator(params, model, cpm_cfg=cfg,
                           refine_center=True, refine_scale=True)
    out_ds = eval_lib.evaluate_pckh(
        est_ds, pipe_lib.batches(
            shard_dir, 8, keys=("images", "gt_joints2d", "conf",
                                "headsize"), shard_by_process=False))
    # Same shards under the OKS protocol (keypoint-bbox area stand-in —
    # LSP shards carry no segmentation area): the third 2D protocol
    # measured on device.
    out_oks = eval_lib.evaluate_oks(
        est_ds, pipe_lib.batches(
            shard_dir, 8, keys=("images", "gt_joints2d", "conf"),
            shard_by_process=False))
    results["dataset_adapter_chain"] = {
        "num_frames": out_ds["num_frames"],
        "pckh_05": round(out_ds["pckh"], 4),
        "mean_oks": round(out_oks["mean_oks"], 4),
        "oks_ap": round(out_oks["ap"], 4),
        "oks_ap50": round(out_oks["ap50"], 4)}
    log(f"adapter chain: {out_ds['num_frames']} frames through "
        f"convert→shards→eval, PCKh@0.5 {out_ds['pckh'] * 100:.1f}% "
        f"| mean OKS {out_oks['mean_oks']:.3f}, AP "
        f"{out_oks['ap'] * 100:.1f}, AP50 {out_oks['ap50'] * 100:.1f} "
        f"(rc+rs trained weights; crop re-scales the person, JPEG "
        f"noise included)")

    # ---- 10. 3DPW-style chain (SMPL-GT pkl → shards → PVE protocol) ------
    # Fabricate one sequenceFiles pickle whose GT comes from the
    # synthetic SMPL model: world joints at depth z0 behind a real
    # pinhole K (f chosen so the person spans ~0.8 of the source frame,
    # i.e. the training distribution after the adapter's crop), blob
    # frames painted at the K-projected pixels, then the REAL conversion
    # path (datasets.threedpw_to_shards: camera-frame composition, crop
    # affine) and the streaming 3D evaluator — which switches on the
    # mesh-level PVE / PA-PVE protocol from the shards' gt_theta/gt_beta.
    log("3DPW-style chain (SMPL-GT fabrication → convert → PVE)...")
    import pickle as pkl_lib

    from tpu_pose.models.joints import CPM_TO_SMPL
    n3 = 12
    size = cfg.input_size
    z0 = 200.0                        # deep enough that perspective ≈
    #                                   the painter's orthographic view
    # One β per actor is the 3DPW schema; GT joints regenerate with it.
    ex3 = synthetic.make_examples(model, n3, cfg, seed=888)
    theta3 = ex3["theta"]
    beta3 = np.tile(ex3["beta"][0], (n3, 1))
    j3d24 = synthetic._examples_from_params(
        model, theta3, beta3, cfg)["gt_joints3d"]    # (n, 24, 3) meters
    j14 = j3d24[:, np.asarray(CPM_TO_SMPL)]
    world = j3d24 - j14.mean(1, keepdims=True)       # camera at origin
    # f so the median person spans ~0.8 of the source frame — the
    # training scale once the adapter's crop re-normalizes.
    extent = np.abs(j14 - j14.mean(1, keepdims=True)).max(axis=(1, 2))
    f_px = 0.8 / float(np.median(extent)) * (size / 2.0) * z0
    k3 = np.array([[f_px, 0, size / 2.0],
                   [0, f_px, size / 2.0], [0, 0, 1.0]])
    fab3 = os.path.join(FLAGS.out, "threedpw_fab")
    img3 = os.path.join(fab3, "img")
    os.makedirs(img3, exist_ok=True)
    for i in range(n3):
        uvw = (world[i] + [0, 0, z0]) @ k3.T
        px14 = (uvw[:, :2] / uvw[:, 2:3])[np.asarray(CPM_TO_SMPL)]
        Image.fromarray(synthetic.render_blob_image(px14, size)).save(
            os.path.join(img3, f"image_{i:05d}.jpg"), quality=92)
    cam3 = np.zeros((n3, 4, 4))
    cam3[:, :3, :3] = np.eye(3)
    cam3[:, :3, 3] = [0, 0, z0]
    cam3[:, 3, 3] = 1.0
    seq3 = {"sequence": "fab", "cam_intrinsics": k3, "cam_poses": cam3,
            "img_frame_ids": np.arange(n3), "genders": ["n"],
            "poses": [theta3.astype(np.float64)],
            "betas": [beta3[0].astype(np.float64)],
            "trans": [np.zeros((n3, 3))],
            "jointPositions": [world.reshape(n3, 72).astype(np.float64)],
            "campose_valid": [np.ones(n3)]}
    with open(os.path.join(fab3, "seq.pkl"), "wb") as f:
        pkl_lib.dump(seq3, f, protocol=2)
    shard3 = os.path.join(fab3, "shards")
    ds_lib.threedpw_to_shards(os.path.join(fab3, "seq.pkl"), img3,
                              shard3, out_size=size)
    out3 = eval_lib.evaluate_h36m_style(
        est_ds, pipe_lib.batches(
            shard3, 4, keys=("images", "gt_joints3d", "gt_joints2d",
                             "gt_theta", "gt_beta"),
            shard_by_process=False))
    results["threedpw_chain"] = {
        "num_frames": out3["num_frames"],
        "pa_mpjpe_mm": round(out3["pa_mpjpe"] * 1000, 1),
        "pve_mm": round(out3["pve"] * 1000, 1),
        "pa_pve_mm": round(out3["pa_pve"] * 1000, 1)}
    log(f"3DPW chain: {out3['num_frames']} frames, PA-MPJPE "
        f"{out3['pa_mpjpe'] * 1000:.1f} mm, PVE "
        f"{out3['pve'] * 1000:.1f} mm, PA-PVE "
        f"{out3['pa_pve'] * 1000:.1f} mm (mesh-level protocol from "
        f"gt_theta/gt_beta; rc+rs trained weights)")

    with open(os.path.join(FLAGS.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    log(f"done → {FLAGS.out}/results.json")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
