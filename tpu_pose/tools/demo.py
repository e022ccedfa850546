"""Demo entry point (SURVEY.md §1 L6, §3.4): image(s) → 2D joints → SMPL
fit → mesh, mirroring the reference's demo-script flow as one fused TPU
program per batch.

Usage:
  python scripts/demo.py --images img1.png,img2.png --out_dir /tmp/demo
  python scripts/demo.py --synthetic 8 --out_dir /tmp/demo   # no assets
  # A video FILE is a frame source (cv2; mp4 needs an FFmpeg cv2 build,
  # MJPG .avi decodes everywhere). --video still selects the JOINT
  # sequence fit; --video_out writes a skeleton-overlay video:
  python scripts/demo.py --images clip.mp4 --video --stride 2 \
      --video_out /tmp/demo/overlay.avi
  # Long files: bounded memory through the online session API
  # (api.VideoSession / MultiPersonVideoSession), window by window:
  python scripts/demo.py --images clip.mp4 --video --stream_chunk 64 \
      --video_out /tmp/demo/overlay.avi

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
flags.DEFINE_integer("stride", 1, "video-file input: keep every "
                     "stride-th frame")
flags.DEFINE_integer("max_frames", 0, "video-file input: cap the kept "
                     "frames (0 = all)")
flags.DEFINE_string("video_out", "", "write a skeleton-overlay video "
                    "here (.avi = MJPG, works on every cv2 build; .mp4 "
                    "needs FFmpeg cv2); fps follows the source over "
                    "--stride (30 for image inputs)")
flags.DEFINE_integer("stream_chunk", 0, "with --video and a video-file "
                     "input: process through the online session API in "
                     "fixed windows — bounded memory for long files; "
                     "writes --video_out + fits.npz (no per-frame "
                     "obj/png)")


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

    fps_out = 30.0
    if FLAGS.synthetic:
        from tpu_pose.data import synthetic
        ex = synthetic.make_examples(est.smpl_model, FLAGS.synthetic,
                                     est.cpm_cfg, seed=0)
        images = ex["images"]
    elif FLAGS.images:
        paths = FLAGS.images.split(",")
        from tpu_pose.utils import videoio
        if len(paths) == 1 and videoio.is_video_path(paths[0]):
            src_fps = videoio.video_info(paths[0])["fps"] or 30.0
            fps_out = src_fps / max(FLAGS.stride, 1)
            if FLAGS.stream_chunk:
                if not FLAGS.video:
                    raise app.UsageError("--stream_chunk needs --video")
                return _run_stream(est, paths[0], letterbox, fps_out)
            images = videoio.read_video(paths[0], stride=FLAGS.stride,
                                        limit=FLAGS.max_frames)
            print(f"read {len(images)} frames from {paths[0]} "
                  f"(stride {FLAGS.stride})")
        else:
            images = load_images(paths)
    else:
        raise app.UsageError("provide --images or --synthetic N")

    if FLAGS.stream_chunk:
        # Only the video-file branch consumes it (and returned above).
        raise app.UsageError("--stream_chunk needs a single video-file "
                             "input (got images/synthetic frames)")
    if FLAGS.multi:
        return _run_multi(est, images, letterbox, fps_out)
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
    vwriter = _open_video_out(fps_out)
    for i in range(len(images)):
        viz.save_obj(os.path.join(FLAGS.out_dir, f"mesh_{i:03d}.obj"),
                     np.asarray(res.vertices[i]),
                     np.asarray(est.smpl_model.faces))
        overlay = viz.draw_skeleton(images[i],
                                    np.asarray(res.joints2d[i]) * s,
                                    np.asarray(res.conf[i]))
        viz.save_image(os.path.join(FLAGS.out_dir, f"pose2d_{i:03d}.png"),
                       overlay)
        if vwriter is not None:
            vwriter.write(overlay)
        affine = None
        if letterbox:
            from tpu_pose.ops import preprocess as pre
            affine = pre.letterbox_affine(h0, w0, est.cpm_cfg.input_size)
        viz.save_mesh_overlay(
            os.path.join(FLAGS.out_dir, f"mesh2d_{i:03d}.png"),
            images[i], np.asarray(res.vertices[i]),
            np.asarray(res.cam[i]), est.fit_cfg.img_size,
            faces=np.asarray(est.smpl_model.faces), affine=affine)
    _close_video_out(vwriter)
    print(f"wrote {len(images)} fits to {FLAGS.out_dir} "
          f"(mean energy {float(np.mean(np.asarray(res.energy))):.4f})")


def _open_video_out(fps):
    if not FLAGS.video_out:
        return None
    from tpu_pose.utils import videoio
    os.makedirs(FLAGS.out_dir, exist_ok=True)
    return videoio.VideoWriter(FLAGS.video_out, fps=fps)


def _close_video_out(vwriter):
    if vwriter is not None:
        vwriter.close()
        print(f"wrote {vwriter.frames_written}-frame overlay video "
              f"→ {vwriter.path}")


def _run_stream(est, video_path, letterbox, fps_out):
    """--stream_chunk: a video FILE through the online session API —
    utils/videoio.iter_video feeds fixed windows to api.VideoSession /
    MultiPersonVideoSession exactly like a camera would, results render
    as each window completes, and the overlay video writes
    incrementally. Memory is bounded by the window for ANY file length
    (per-frame obj/png output is skipped; fits.npz accumulates the
    small parameter arrays)."""
    import numpy as np

    from tpu_pose import api as api_lib
    from tpu_pose.utils import checkpoint as ckpt_lib
    from tpu_pose.utils import videoio
    from tpu_pose.utils import viz

    os.makedirs(FLAGS.out_dir, exist_ok=True)
    chunk = FLAGS.stream_chunk
    sess = (api_lib.MultiPersonVideoSession(
                est, max_people=FLAGS.max_people, chunk=chunk)
            if FLAGS.multi else api_lib.VideoSession(est, chunk=chunk))
    vwriter = _open_video_out(fps_out)
    thetas, betas, cams, energies = [], [], [], []
    n_frames = 0

    def render(win_frames, res):
        nonlocal n_frames
        h0, w0 = win_frames.shape[1:3]
        s = (np.array([1.0, 1.0], np.float32) if letterbox else
             np.array([w0 / est.cpm_cfg.input_size,
                       h0 / est.cpm_cfg.input_size], np.float32))
        joints = np.asarray(res.joints2d)
        conf = np.asarray(res.conf)
        t_win = joints.shape[0]
        mask = (np.asarray(res.frame_mask)[:t_win] if FLAGS.multi
                else None)
        for i in range(min(t_win, len(win_frames))):
            img = win_frames[i]
            if FLAGS.multi:
                for k in range(joints.shape[1]):
                    if mask[i, k]:
                        img = viz.draw_skeleton(img, joints[i, k] * s,
                                                conf[i, k])
            else:
                img = viz.draw_skeleton(img, joints[i] * s, conf[i])
            if vwriter is not None:
                vwriter.write(img)
        thetas.append(np.asarray(res.theta))
        betas.append(np.asarray(res.beta))
        cams.append(np.asarray(res.cam))
        energies.append(np.asarray(res.energy))
        n_frames += min(t_win, len(win_frames))

    # Push exactly chunk-sized windows so each push completes one window
    # and its frames can render + free immediately.
    leftover = None
    for frames in videoio.iter_video(video_path, chunk,
                                     stride=FLAGS.stride,
                                     limit=FLAGS.max_frames):
        res = sess.push(frames)
        if res is not None:
            render(frames, res)
        else:
            leftover = frames
    res = sess.flush()
    if res is not None and leftover is not None:
        render(leftover, res)

    _close_video_out(vwriter)
    if not thetas:
        raise app.UsageError(f"no decodable frames in {video_path!r}")
    # Multi results are track-major: time is axis 1 (theta (K, T, 72)).
    t_axis = 1 if FLAGS.multi else 0
    ckpt_lib.save_fit_results(
        os.path.join(FLAGS.out_dir, "fits.npz"),
        np.concatenate(thetas, axis=t_axis),
        np.concatenate(betas, axis=t_axis),
        np.concatenate(cams, axis=t_axis),
        energy=np.concatenate(
            [np.atleast_1d(e) for e in energies], axis=0))
    print(f"streamed {n_frames} frames in {len(thetas)} window(s) "
          f"→ {FLAGS.out_dir}")


def _run_multi(est, images, letterbox, fps_out=30.0):
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
    vwriter = _open_video_out(fps_out)
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
        if vwriter is not None:
            vwriter.write(img)
    _close_video_out(vwriter)
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
