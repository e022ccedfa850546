"""Multi-seed tracked-video benchmark (VERDICT r3 next #1/#2/#3).

Round 3 established that single-video tracking figures are
seed-lottery (id accuracy 0.46–1.00 across seeds of the same
benchmark); every tracked-video number in PARITY.md therefore comes
from THIS harness: N seeds per scenario, means reported with the
per-seed spread.

Scenarios (``--mode``):

- ``crossing``  — two people swap sides behind a mutual-occlusion
  blackout (data/synthetic_hard.make_hard_multi_video, crossing=True):
  the round-3 10-seed benchmark, unchanged, so numbers are comparable
  across rounds.
- ``k3``        — THREE people, every pair crossing (num_people=3):
  the crowd evidence (3! = 6 assignment candidates per frame).
- ``k4``        — FOUR people, every pair crossing (num_people=4):
  4! = 24 assignment candidates per frame — still trivial against the
  documented k ≤ 5 static-enumeration ceiling (fitting/tracking.py).
- ``enterleave``— three identities in a 2-slot world: B exits
  permanently, C enters later (make_hard_enterleave_video); measures
  track birth/death (``--death_frames``), presence-count accuracy, and
  segment identity consistency.

Weights: ``--weights`` (an npz from selfcheck/train_cpm, trained on
the HARD set — random weights make tracking meaningless). Typical:

  python scripts/track_bench.py \\
      --weights /tmp/tpu_pose_selfcheck/cpm_weights_hard.npz \\
      --mode crossing,k3,enterleave --seeds 10 \\
      --out /tmp/track_bench.json
"""

import itertools
import json
import os
import time

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("weights", "", "trained CPM weights npz (REQUIRED)")
flags.DEFINE_string("mode", "crossing", "comma list: crossing,k3,k4,"
                    "enterleave")
flags.DEFINE_integer("seeds", 10, "videos per scenario")
flags.DEFINE_integer("frames", 26, "frames per video")
flags.DEFINE_integer("restarts", 2, "fit yaw hypotheses")
flags.DEFINE_boolean("temporal_hints", True, "hinted second decode")
flags.DEFINE_integer("hint_passes", 1, "smooth→re-decode hint rounds "
                     "(each extra pass costs one CPM forward)")
flags.DEFINE_float("anchor_refresh", 0.0, "gated re-ID anchor EMA rate "
                   "(0 = frozen birth anchors)")
flags.DEFINE_integer("death_frames", 8, "track death (enterleave mode; "
                     "0 disables)")
flags.DEFINE_float("birth_cost", 0.05, "track birth cost (appearance-"
                   "MSE units)")
flags.DEFINE_float("min_person_score", 0.05, "absolute person-evidence "
                   "floor")
flags.DEFINE_float("nms_radius", 96.0, "NMS suppression radius px for "
                   "the person-peak proposals (crowded k=3 scenes sit "
                   "near the 96 px default)")
flags.DEFINE_float("presence_keep_frac", 1.0, "presence hysteresis: a "
                   "track already present stays present while it clears "
                   "the score gates scaled by this fraction (<1 "
                   "enables; births pay the full gate)")
flags.DEFINE_boolean("hint_crop", False, "hint-centered crop/zoom "
                     "re-decode on every hinted pass (decode-placement "
                     "correction; cpm.estimate_2d_multi docstring)")
flags.DEFINE_boolean("hint_crop_all", False, "hint_crop='all': "
                     "unconditional crop substitution (A/B-measured "
                     "worse than the selective default; kept for "
                     "comparison runs)")
flags.DEFINE_float("hint_crop_min_conf", 0.0, "ghost gate for the "
                   "selective hint_crop: substitute the crop decode "
                   "only when its mean conf clears this fraction of "
                   "the frame's best plain-slot conf (0 = no gate)")
flags.DEFINE_boolean("reassociate", False, "re-run the Viterbi "
                     "association on the final hinted decodes "
                     "(track_reassociate; needs temporal_hints)")
flags.DEFINE_float("x_span", 0.0, "override the crossing/k-mode "
                   "START spread (fraction of frame width; 0 = the "
                   "generator default — k4's 69 px adjacent spacing "
                   "sits inside NMS 96, so a fair k4 run pairs e.g. "
                   "--x_span=0.8 with --nms_radius=80)")
flags.DEFINE_integer("slack_slots", 0, "extra proposal/track slots "
                     "beyond the scene's k (crossing/k3/k4 modes): "
                     "max_people=k+slack gives the decoder headroom "
                     "when NMS merges crowded peaks; scoring uses the "
                     "injective σ (spare tracks unscored)")
flags.DEFINE_boolean("stream", False, "run enterleave through "
                     "MultiPersonVideoSession windows (chunk=10) instead "
                     "of one program — exercises the birth/death carry")
flags.DEFINE_string("out", "", "write the result dict as JSON here")


def _best_perm(costs):
    """costs: (k!, ...) summed assignment costs → index of the best."""
    import numpy as np
    return int(np.argmin(costs))


def _match_metrics(res, gt_centers, gt_j3d, metrics_mod):
    """Global σ: track→identity matching over the whole sequence, then
    per-frame identity accuracy under it (a swap shows up as frames
    preferring a different assignment), center error and per-person
    PA-MPJPE under σ. Generalizes selfcheck §7d to any k.

    Round 5: supports MORE tracks than GT identities (slack proposal
    slots, ``max_people > num_people``): σ becomes the best INJECTION
    of GT identities into tracks (n_tracks·P·n_gt candidates); spare
    tracks are unscored — frame_mask is expected to kill them, which
    the enterleave/count metrics (not this one) grade. Square case is
    bit-identical to the round-4 bijection scoring."""
    import numpy as np
    tc = np.asarray(res.joints2d).mean(-2)           # (T, kt, 2)
    kt = tc.shape[1]
    n_gt = gt_centers.shape[1]
    injs = list(itertools.permutations(range(kt), n_gt))
    totals = [np.linalg.norm(tc[:, list(p)] - gt_centers,
                             axis=-1).sum() for p in injs]
    sigma = list(injs[_best_perm(totals)])           # gt id → track
    frame_costs = np.stack(
        [np.linalg.norm(tc[:, list(p)] - gt_centers, axis=-1).sum(-1)
         for p in injs], -1)                         # (T, |injs|)
    ident = injs.index(tuple(sigma))
    id_acc = float((frame_costs.argmin(-1) == ident).mean())
    center_err = float(
        np.linalg.norm(tc[:, sigma] - gt_centers, axis=-1).mean())
    pa = float(np.mean([
        np.mean(metrics_mod.pa_mpjpe_np(
            np.asarray(res.joints3d)[sigma[q]], gt_j3d[:, q]))
        for q in range(n_gt)])) * 1000
    # Decode-PLACEMENT coverage of the FINAL decodes: fraction of
    # frames where SOME injection puts every GT person within 40 px of
    # a distinct track — the direct counterpart of the round-5 pass-1
    # proposal-coverage diagnostic (24% on k3; PARITY.md), so
    # placement fixes (hint_crop) can be graded mechanistically, not
    # just through id_acc.
    d_all = np.stack(
        [np.linalg.norm(tc[:, list(p)] - gt_centers, axis=-1).max(-1)
         for p in injs], -1)                         # (T, |injs|)
    cover40 = float((d_all.min(-1) < 40.0).mean())
    return {"id_acc": id_acc, "center_err_px": center_err,
            "pa_mpjpe_mm": pa, "cover40": cover40}


def _enterleave_metrics(res, el):
    """Presence-count accuracy + per-segment identity consistency for
    the 3-identities / 2-slots world. Per frame, PRESENT identities are
    matched to tracks by an EXCLUSIVE min-cost assignment over the
    track axis (two identities can never claim the same track; tracks
    need not be frame_mask-live to be matched — presence-call errors
    are scored separately by count_acc, not double-counted into id
    accuracy). Per identity SEGMENT, the majority matched track defines
    the identity's track; id_acc is the fraction of present frames
    matched to it."""
    import numpy as np
    tc = np.asarray(res.joints2d).mean(-2)           # (T, k, 2)
    fmask = np.asarray(res.frame_mask)               # (T, k)
    present = el["present"]                          # (T, 3)
    t_frames, k = fmask.shape
    n_id = present.shape[1]
    n_pred = fmask.sum(-1)
    n_gt = present.sum(-1)
    count_acc = float((n_pred == n_gt).mean())
    # Error decomposition (round 5): over- vs under-counts, and whether
    # each error sits within ±1 frame of a GT presence TRANSITION (the
    # 60%-of-joints-in-frame threshold is semi-arbitrary there — the
    # detector legitimately fires a frame early/late on a half-visible
    # person) or in steady state (a real dup/ghost/miss).
    err = n_pred != n_gt
    change = np.zeros(t_frames, bool)
    chg = np.nonzero(np.diff(n_gt) != 0)[0]
    for c in chg:
        change[max(c - 1, 0):min(c + 3, t_frames)] = True
    count_over = float((n_pred > n_gt).mean())
    count_under = float((n_pred < n_gt).mean())
    count_err_transition = float((err & change).mean())
    count_err_steady = float((err & ~change).mean())
    # match[t, ident] = exclusively assigned track (or -1 if absent).
    match = -np.ones((t_frames, n_id), np.int64)
    for t in range(t_frames):
        ids = np.nonzero(present[t] > 0)[0]
        if not len(ids):
            continue
        best, best_cost = None, np.inf
        for pp in itertools.permutations(range(k), len(ids)):
            cost = sum(np.linalg.norm(tc[t, pp[j]]
                                      - el["centers"][t, ids[j]])
                       for j in range(len(ids)))
            if cost < best_cost:
                best, best_cost = pp, cost
        for j, ident in enumerate(ids):
            match[t, ident] = best[j]
    seg_consistency, id_correct, id_total = [], 0, 0
    majority = {}
    for ident in range(n_id):
        on = np.nonzero(present[:, ident] > 0)[0]
        if not len(on):
            continue
        vals, counts = np.unique(match[on, ident], return_counts=True)
        maj = int(vals[counts.argmax()])
        majority[ident] = maj
        ok = match[on, ident] == maj
        seg_consistency.append(float(ok.mean()))
        id_correct += int(ok.sum())
        id_total += len(on)
    # A (identity 0) and whichever of B/C is present must land on
    # DISTINCT tracks; with death enabled, C may reuse B's slot.
    distinct = (majority.get(1, -1) != majority.get(0, -2)
                and majority.get(2, -1) != majority.get(0, -2))
    return {"count_acc": count_acc,
            "count_over": count_over, "count_under": count_under,
            "count_err_transition": count_err_transition,
            "count_err_steady": count_err_steady,
            "id_acc": id_correct / max(id_total, 1),
            "seg_consistency_min": float(min(seg_consistency)),
            "ab_c_distinct_tracks": bool(distinct),
            "c_track_reuses_b_slot": bool(
                majority.get(1) is not None
                and majority.get(1) == majority.get(2))}


def main(argv):
    del argv
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    from tpu_pose.api import MultiPersonVideoSession, PoseEstimator
    from tpu_pose.data import synthetic_hard as sh
    from tpu_pose.fitting import priors as priors_lib
    from tpu_pose.models import smpl_data
    from tpu_pose.utils import metrics, profiling
    from tpu_pose.utils import tf_converter
    from tpu_pose.utils.config import CPMConfig

    if not FLAGS.weights or not os.path.exists(FLAGS.weights):
        raise SystemExit(f"--weights not found: {FLAGS.weights!r} "
                         f"(train via selfcheck_e2e or train_cpm first)")
    cfg = CPMConfig()
    model = smpl_data.synthetic_smpl(seed=0)
    params = tf_converter.load_params_npz(FLAGS.weights)
    prior = priors_lib.synthetic_gmm_prior(0)
    est = PoseEstimator(params, model, prior=prior, cpm_cfg=cfg,
                        fit_restarts=FLAGS.restarts)
    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:6.0f}s] {msg}", flush=True)

    results = {"config": {
        "weights": FLAGS.weights, "seeds": FLAGS.seeds,
        "frames": FLAGS.frames, "restarts": FLAGS.restarts,
        "temporal_hints": FLAGS.temporal_hints,
        "hint_passes": FLAGS.hint_passes,
        "hint_crop": FLAGS.hint_crop,
        "hint_crop_all": FLAGS.hint_crop_all,
        "hint_crop_min_conf": FLAGS.hint_crop_min_conf,
        "reassociate": FLAGS.reassociate,
        "presence_keep_frac": FLAGS.presence_keep_frac,
        "anchor_refresh": FLAGS.anchor_refresh,
        "death_frames": FLAGS.death_frames,
        "birth_cost": FLAGS.birth_cost,
        "nms_radius": FLAGS.nms_radius,
        "x_span": FLAGS.x_span}}
    modes = [m.strip() for m in FLAGS.mode.split(",") if m.strip()]

    for mode in modes:
        per_seed = []
        for seed in range(FLAGS.seeds):
            if mode in ("crossing", "k3", "k4"):
                k = {"crossing": 2, "k3": 3, "k4": 4}[mode]
                vh = sh.make_hard_multi_video(
                    model, FLAGS.frames, cfg, seed=seed, crossing=True,
                    num_people=k, x_span=FLAGS.x_span)
                res = est.estimate_and_fit_video_multi(
                    jnp.asarray(vh["images"]),
                    max_people=k + FLAGS.slack_slots,
                    min_person_score=FLAGS.min_person_score,
                    temporal_hints=FLAGS.temporal_hints,
                    hint_passes=FLAGS.hint_passes,
                    hint_crop=("all" if FLAGS.hint_crop_all
                               else FLAGS.hint_crop),
                    hint_crop_min_conf=FLAGS.hint_crop_min_conf,
                    track_reassociate=FLAGS.reassociate,
                    track_birth_cost=FLAGS.birth_cost,
                    track_anchor_refresh=FLAGS.anchor_refresh,
                    nms_radius_px=FLAGS.nms_radius)
                profiling.sync(res.theta)
                m = _match_metrics(res, vh["centers"],
                                   vh["gt_joints3d"], metrics)
            elif mode == "enterleave":
                el = sh.make_hard_enterleave_video(
                    model, FLAGS.frames, cfg, seed=seed)
                kwargs = dict(
                    max_people=2,
                    min_person_score=FLAGS.min_person_score,
                    temporal_hints=FLAGS.temporal_hints,
                    hint_passes=FLAGS.hint_passes,
                    hint_crop=("all" if FLAGS.hint_crop_all
                               else FLAGS.hint_crop),
                    hint_crop_min_conf=FLAGS.hint_crop_min_conf,
                    track_reassociate=FLAGS.reassociate,
                    presence_keep_frac=FLAGS.presence_keep_frac,
                    allow_empty=False,
                    track_birth_cost=FLAGS.birth_cost,
                    track_death_frames=FLAGS.death_frames,
                    track_anchor_refresh=FLAGS.anchor_refresh)
                if FLAGS.stream:
                    sess = MultiPersonVideoSession(est, chunk=10,
                                                   **kwargs)
                    outs = [r for r in (sess.push(el["images"]),
                                        sess.flush()) if r is not None]
                    from tpu_pose.api import _concat_video_multi
                    res = _concat_video_multi(outs)
                else:
                    res = est.estimate_and_fit_video_multi(
                        jnp.asarray(el["images"]), **kwargs)
                profiling.sync(res.theta)
                m = _enterleave_metrics(res, el)
            else:
                raise SystemExit(f"unknown mode {mode!r}")
            per_seed.append(m)
            log(f"{mode} seed {seed}: " + json.dumps(
                {k_: (round(v, 3) if isinstance(v, float) else v)
                 for k_, v in m.items()}))
        agg = {}
        for key in per_seed[0]:
            vals = [float(m[key]) for m in per_seed]
            agg[key] = {"mean": round(float(np.mean(vals)), 4),
                        "min": round(float(np.min(vals)), 4),
                        "max": round(float(np.max(vals)), 4)}
        results[mode] = {"per_seed": per_seed, "aggregate": agg}
        log(f"{mode} aggregate: " + json.dumps(agg))

    if FLAGS.out:
        with open(FLAGS.out, "w") as f:
            json.dump(results, f, indent=2)
        log(f"wrote {FLAGS.out}")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
