"""Demo entry point (SURVEY.md §1 L6, §3.4): image(s) → 2D joints → SMPL
fit → mesh, mirroring the reference's demo-script flow as one fused TPU
program per batch.

Usage:
  python scripts/demo.py --images img1.png,img2.png --out_dir /tmp/demo
  python scripts/demo.py --synthetic 8 --out_dir /tmp/demo   # no assets

With no real weights supplied (--cpm_npz/--smpl_pkl), runs the hermetic
synthetic estimator — useful for smoke-testing the full path on-device.
Outputs per image: fitted params npz, OBJ mesh, and a 2D-skeleton overlay.
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("images", "", "comma-separated image paths (png/jpg "
                    "via PIL if present, else raw .npy)")
flags.DEFINE_integer("synthetic", 0, "render N synthetic frames instead of "
                     "loading images")
flags.DEFINE_string("out_dir", "/tmp/tpu_pose_demo", "output directory")
flags.DEFINE_string("cpm_npz", "", "converted CPM weights (.npz); synthetic "
                    "weights if empty")
flags.DEFINE_string("smpl_pkl", "", "SMPL model pickle; synthetic model if "
                    "empty")
flags.DEFINE_string("gmm_pkl", "", "GMM pose-prior pickle (optional)")
flags.DEFINE_string("optimizer", "adam", "fit optimizer: adam | lbfgs")
flags.DEFINE_boolean("thorough", False, "use the long fit schedule")
flags.DEFINE_boolean("letterbox", True, "aspect-preserving resize+pad "
                     "preprocessing (recommended for non-square images); "
                     "joints come back in source-image pixels")
flags.DEFINE_boolean("multi", False, "multi-person: fit up to "
                     "--max_people per frame (with --video: "
                     "identity-tracked through occlusions; overlays "
                     "draw every accepted person, meshes export per "
                     "person/track)")
flags.DEFINE_integer("max_people", 2, "person hypothesis slots for "
                     "--multi")
flags.DEFINE_boolean("video", False, "treat the inputs as ONE ordered "
                     "sequence and fit it jointly (shared body shape, "
                     "Viterbi-consistent facing, temporal smoothness — "
                     "api.estimate_and_fit_video) instead of "
                     "independent per-frame fits")


def load_images(paths):
    import numpy as np
    out = []
    for p in paths:
        if p.endswith(".npy"):
            out.append(np.load(p))
        else:
            from PIL import Image
            out.append(np.asarray(Image.open(p).convert("RGB")))
    return np.stack(out)


def main(argv):
    del argv
    import numpy as np

    from tpu_pose.api import PoseEstimator
    from tpu_pose.utils import checkpoint as ckpt_lib
    from tpu_pose.utils import viz
    from tpu_pose.utils.config import FitConfig, THOROUGH_STAGES

    fit_cfg = FitConfig(
        optimizer=FLAGS.optimizer,
        **({"stages": THOROUGH_STAGES} if FLAGS.thorough else {}))

    # Synthetic frames are generated pre-cropped at network size, so the
    # letterbox would be a no-op there; real images get the aspect-
    # preserving path (joints returned in source-image pixels).
    letterbox = FLAGS.letterbox and not FLAGS.synthetic
    if FLAGS.cpm_npz and FLAGS.smpl_pkl:
        est = PoseEstimator.from_files(
            FLAGS.cpm_npz, FLAGS.smpl_pkl, FLAGS.gmm_pkl or None,
            fit_cfg=fit_cfg, letterbox=letterbox)
    else:
        print("note: no weights supplied — synthetic estimator "
              "(smoke-test mode)")
        est = PoseEstimator.create_synthetic(seed=0, fit_cfg=fit_cfg,
                                             letterbox=letterbox)

    if FLAGS.synthetic:
        from tpu_pose.data import synthetic
        ex = synthetic.make_examples(est.smpl_model, FLAGS.synthetic,
                                     est.cpm_cfg, seed=0)
        images = ex["images"]
    elif FLAGS.images:
        images = load_images(FLAGS.images.split(","))
    else:
        raise app.UsageError("provide --images or --synthetic N")

    if FLAGS.multi:
        return _run_multi(est, images, letterbox)
    res = (est.estimate_and_fit_video(images) if FLAGS.video
           else est.estimate_and_fit(images))

    os.makedirs(FLAGS.out_dir, exist_ok=True)
    ckpt_lib.save_fit_results(
        os.path.join(FLAGS.out_dir, "fits.npz"),
        res.theta, res.beta, res.cam, energy=res.energy,
        extra={"joints2d": np.asarray(res.joints2d),
               "conf": np.asarray(res.conf)})
    # Letterboxed joints are already in source-image pixels; square-resize
    # joints live in the network frame and rescale at this edge.
    h0, w0 = images.shape[1:3]
    if letterbox:
        s = np.array([1.0, 1.0], np.float32)
    else:
        s = np.array([w0 / est.cpm_cfg.input_size,
                      h0 / est.cpm_cfg.input_size], np.float32)
    for i in range(len(images)):
        viz.save_obj(os.path.join(FLAGS.out_dir, f"mesh_{i:03d}.obj"),
                     np.asarray(res.vertices[i]),
                     np.asarray(est.smpl_model.faces))
        viz.save_skeleton_overlay(
            os.path.join(FLAGS.out_dir, f"pose2d_{i:03d}.png"),
            images[i], np.asarray(res.joints2d[i]) * s,
            np.asarray(res.conf[i]))
        affine = None
        if letterbox:
            from tpu_pose.ops import preprocess as pre
            affine = pre.letterbox_affine(h0, w0, est.cpm_cfg.input_size)
        viz.save_mesh_overlay(
            os.path.join(FLAGS.out_dir, f"mesh2d_{i:03d}.png"),
            images[i], np.asarray(res.vertices[i]),
            np.asarray(res.cam[i]), est.fit_cfg.img_size,
            faces=np.asarray(est.smpl_model.faces), affine=affine)
    print(f"wrote {len(images)} fits to {FLAGS.out_dir} "
          f"(mean energy {float(np.mean(np.asarray(res.energy))):.4f})")


def _run_multi(est, images, letterbox):
    """--multi rendering: every accepted person per frame on one
    overlay, one OBJ per (frame, person) — per (track, frame) with
    --video, where person/track k keeps one color across frames."""
    import numpy as np

    from tpu_pose.utils import checkpoint as ckpt_lib
    from tpu_pose.utils import viz

    if FLAGS.video:
        res = est.estimate_and_fit_video_multi(
            images, max_people=FLAGS.max_people)
        # Track-major (K, T, ...) → frame-major views for rendering.
        mask = np.asarray(res.frame_mask)             # (T, K)
        joints = np.asarray(res.joints2d)             # (T, K, P, 2)
        conf = np.asarray(res.conf)
        verts = np.transpose(np.asarray(res.vertices), (1, 0, 2, 3))
        cams = np.transpose(np.asarray(res.cam), (1, 0, 2))
    else:
        res = est.estimate_and_fit_multi(images,
                                         max_people=FLAGS.max_people)
        mask = np.asarray(res.person_mask)            # (B, K)
        joints = np.asarray(res.joints2d)
        conf = np.asarray(res.conf)
        verts = np.asarray(res.vertices)              # (B, K, V, 3)
        cams = np.asarray(res.cam)

    os.makedirs(FLAGS.out_dir, exist_ok=True)
    extra = {"joints2d": joints, "conf": conf,
             "person_mask": mask.astype(np.float32)}
    if FLAGS.video:
        extra["perm"] = np.asarray(res.perm)
    ckpt_lib.save_fit_results(
        os.path.join(FLAGS.out_dir, "fits.npz"),
        np.asarray(res.theta), np.asarray(res.beta),
        np.asarray(res.cam), energy=np.asarray(res.energy), extra=extra)

    h0, w0 = images.shape[1:3]
    s = (np.array([1.0, 1.0], np.float32) if letterbox else
         np.array([w0 / est.cpm_cfg.input_size,
                   h0 / est.cpm_cfg.input_size], np.float32))
    for i in range(len(images)):
        img = np.array(images[i], copy=True)
        for k in range(joints.shape[1]):
            if not mask[i, k]:
                continue
            img = viz.draw_skeleton(img, joints[i, k] * s, conf[i, k])
            viz.save_obj(
                os.path.join(FLAGS.out_dir, f"mesh_{i:03d}_p{k}.obj"),
                verts[i, k], np.asarray(est.smpl_model.faces))
        viz.save_image(
            os.path.join(FLAGS.out_dir, f"pose2d_{i:03d}.png"), img)
    n_people = (int(np.asarray(res.track_mask).sum()) if FLAGS.video
                else int(mask.sum()))
    what = "tracks" if FLAGS.video else "person fits"
    print(f"wrote {len(images)} frames, {n_people} {what} "
          f"to {FLAGS.out_dir}")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
