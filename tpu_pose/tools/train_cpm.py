"""CPM training entry point (SURVEY.md §2 row 3 training path; L6 script).

Data-parallel over all visible devices (shard_map + grad-pmean over ICI),
orbax-checkpointed, resumable. Trains on npz shards (see
tpu_pose/data/pipeline.py) or, with --synthetic, on generated data —
hermetic end-to-end without the license-gated Caffe/TF checkpoint.

  python scripts/train_cpm.py --synthetic --steps 200 --batch 32 \
      --ckpt_dir /tmp/cpm_ckpt --export /tmp/cpm_weights.npz
"""

import os
import sys  # noqa: F401

from absl import app, flags  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_float("rot_aug", 0.0, "rotation augmentation: uniform "
                   "±N degrees about the crop center for painted-target "
                   "shards (the standard MPII recipe uses ~30)")
flags.DEFINE_float("scale_aug", 0.0, "scale-jitter augmentation: "
                   "uniform 1±N zoom about the crop center for "
                   "painted-target shards (standard ~0.25)")
flags.DEFINE_float("flip_aug", 0.5, "horizontal-flip augmentation "
                   "probability for painted-target shards (removes "
                   "chirality bias so flip TTA helps; CPM_FLIP_PERM "
                   "relabeling)")
flags.DEFINE_float("heatmap_sigma", 3.0, "target Gaussian sigma "
                   "(stride-cells) for painted-target shards")
flags.DEFINE_string("data_dir", "", "npz-shard dir with images/center_maps/"
                    "heatmaps arrays")
flags.DEFINE_boolean("synthetic", False, "train on generated synthetic data")
flags.DEFINE_integer("steps", 1000, "total optimizer steps")
flags.DEFINE_integer("batch", 32, "global batch size")
flags.DEFINE_float("lr", 1e-4, "adam learning rate")
flags.DEFINE_string("ckpt_dir", "", "orbax checkpoint dir (resume if "
                    "present)")
flags.DEFINE_integer("ckpt_every", 200, "checkpoint interval (steps)")
flags.DEFINE_string("export", "", "write final weights npz here")
flags.DEFINE_integer("input_size", 368, "CPM input resolution")
flags.DEFINE_integer("log_every", 20, "loss log interval")
flags.DEFINE_boolean("qat", False, "quantization-aware training: run "
                     "the forward on straight-through fake-quantized "
                     "weights so the net trains where int8 serving "
                     "rounds it (cpm_train.fake_quant_params)")


def _rot_scale(img, joints, rng, rot_deg, scale_jit):
    """Random rotation/zoom about the crop center (the standard MPII
    augmentation recipe): image via one PIL inverse-affine resample,
    joints via the forward affine p' = s·R·(p−c) + c."""
    import numpy as np
    from PIL import Image

    size = img.shape[0]
    ang = np.deg2rad(rng.uniform(-rot_deg, rot_deg)) if rot_deg else 0.0
    s = 1.0 + (rng.uniform(-scale_jit, scale_jit) if scale_jit else 0.0)
    if ang == 0.0 and s == 1.0:
        return img, joints
    c = (size - 1) / 2.0
    cos, sin = np.cos(ang), np.sin(ang)
    fwd = np.array([[cos, -sin], [sin, cos]]) * s
    inv = np.linalg.inv(fwd)
    # PIL transform maps OUTPUT → INPUT: x_in = a·x' + b·y' + off.
    # PIL's coordinates are in the half-integer CORNER convention
    # (pixel i spans [i, i+1), sampled at i+0.5), so the rotation
    # center there is c + 0.5 = size/2 — while the joints below rotate
    # about c = (size−1)/2 in the integer pixel-center convention.
    # Using c for both misaligned image vs joints by (fwd−I)·(½,½) px
    # (~0.37 px at 30°): the same half-pixel convention class as
    # cpm.crop_index_translation, verified the same delta-marker way.
    cp = np.array([c + 0.5, c + 0.5])
    off = cp - inv @ cp
    coeffs = (inv[0, 0], inv[0, 1], off[0], inv[1, 0], inv[1, 1], off[1])
    out = np.asarray(Image.fromarray(img).transform(
        (size, size), Image.AFFINE, coeffs, resample=Image.BILINEAR,
        fillcolor=(128, 128, 128)))
    j = (joints - c) @ fwd.T + c
    return out, j.astype(np.float32)


def _painted_batches(data_dir, batch, cfg, flip_prob=0.5, sigma=3.0,
                     rot_deg=0.0, scale_jit=0.0, seed=0):
    """Dataset-adapter shards (images/gt_joints2d/conf — the
    convert_dataset.py schema) → CPM train batches: paints the stride-
    resolution Gaussian targets + the standard center map, supervises
    only annotated joints (joint_mask; MPII people are partially
    labeled), flip-augments with CPM_FLIP_PERM relabeling (the
    hard-training recipe — a chirally-biased net degrades under flip
    TTA, docs/DESIGN.md §9), and optionally rotation/scale-jitters
    about the crop center (``rot_deg``/``scale_jit``; joints pushed
    off-frame keep their Gaussian targets, which decay to ~zero maps —
    the standard treatment)."""
    import numpy as np

    from tpu_pose.data import pipeline, synthetic
    from tpu_pose.models import joints as joints_lib
    from tpu_pose.ops import preprocess as pre

    cmap = np.asarray(pre.gaussian_center_map(cfg.input_size,
                                              cfg.center_sigma))
    rng = np.random.RandomState(seed)
    size = cfg.input_size
    for b in pipeline.batches(data_dir, batch,
                              keys=("images", "gt_joints2d", "conf"),
                              shuffle=True, num_epochs=10_000):
        imgs = np.array(b["images"])
        joints = np.array(b["gt_joints2d"], np.float32)
        conf = np.array(b["conf"], np.float32)
        n = len(imgs)
        for i in range(n):
            if flip_prob > 0.0 and rng.rand() < flip_prob:
                imgs[i] = imgs[i][:, ::-1]
                joints[i] = joints[i][joints_lib.CPM_FLIP_PERM]
                joints[i, :, 0] = size - 1.0 - joints[i, :, 0]
                conf[i] = conf[i][joints_lib.CPM_FLIP_PERM]
            if rot_deg or scale_jit:
                imgs[i], joints[i] = _rot_scale(
                    imgs[i], joints[i], rng, rot_deg, scale_jit)
        hms = np.stack([
            synthetic.gaussian_heatmaps(joints[i], size, cfg.stride,
                                        sigma=sigma) for i in range(n)])
        mask = np.concatenate(
            [(conf > 0).astype(np.float32), np.ones((n, 1), np.float32)],
            axis=1)
        yield {"images": imgs,
               "center_maps": np.broadcast_to(
                   cmap, (n, *cmap.shape)).copy(),
               "heatmaps": hms, "joint_mask": mask}


def main(argv):
    del argv
    import itertools

    import jax
    import numpy as np

    from tpu_pose.data import pipeline, synthetic
    from tpu_pose.models import cpm_train, smpl_data
    from tpu_pose.parallel import mesh as mesh_lib
    from tpu_pose.utils import checkpoint as ckpt_lib
    from tpu_pose.utils import profiling
    from tpu_pose.utils.config import CPMConfig

    cfg = CPMConfig(input_size=FLAGS.input_size)
    mesh = mesh_lib.make_mesh() if len(jax.devices()) > 1 else None

    params, opt_state, opt = cpm_train.init_train_state(
        jax.random.PRNGKey(0), cfg, lr=FLAGS.lr, total_steps=FLAGS.steps)
    start_step = 0
    if FLAGS.ckpt_dir and ckpt_lib.latest_step(FLAGS.ckpt_dir) is not None:
        start_step, params, opt_state = ckpt_lib.restore_train_state(
            FLAGS.ckpt_dir, params, opt_state)
        print(f"resumed from step {start_step}")

    step_fn = cpm_train.make_train_step(cfg, opt, mesh=mesh,
                                        fake_quant=FLAGS.qat)
    if mesh is not None:
        params = mesh_lib.replicate(params, mesh)
        opt_state = mesh_lib.replicate(opt_state, mesh)

    if FLAGS.synthetic:
        model = smpl_data.synthetic_smpl(seed=0)
        batches = itertools.chain.from_iterable(
            synthetic.cpm_train_batches(model, FLAGS.batch, 10_000, cfg,
                                        seed=e) for e in itertools.count())
    elif FLAGS.data_dir:
        src = pipeline.NpzShardSource(FLAGS.data_dir)
        with np.load(src.paths[0]) as z:
            stored_targets = "heatmaps" in z.files
        if stored_targets:
            batches = pipeline.batches(
                FLAGS.data_dir, FLAGS.batch,
                keys=("images", "center_maps", "heatmaps"),
                shuffle=True, num_epochs=10_000)
        else:
            # convert_dataset.py shards (images/gt_joints2d/conf):
            # paint stride-res targets on the fly, mask unannotated
            # joints, flip-augment.
            print("painting CPM targets from gt_joints2d "
                  f"(flip_aug={FLAGS.flip_aug})")
            batches = _painted_batches(
                FLAGS.data_dir, FLAGS.batch, cfg,
                flip_prob=FLAGS.flip_aug, sigma=FLAGS.heatmap_sigma,
                rot_deg=FLAGS.rot_aug, scale_jit=FLAGS.scale_aug)
    else:
        raise app.UsageError("provide --data_dir or --synthetic")

    loss = float("nan")
    for step, batch in enumerate(batches, start=start_step):
        if step >= FLAGS.steps:
            break
        if mesh is not None:
            batch = mesh_lib.shard_batch(batch, mesh)
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if (step + 1) % FLAGS.log_every == 0:
            print(f"step {step + 1}: loss {float(loss):.6f}")
        if FLAGS.ckpt_dir and (step + 1) % FLAGS.ckpt_every == 0:
            ckpt_lib.save_train_state(FLAGS.ckpt_dir, step + 1, params,
                                      opt_state)

    profiling.sync(loss)
    if FLAGS.ckpt_dir:
        ckpt_lib.save_train_state(FLAGS.ckpt_dir, FLAGS.steps, params,
                                  opt_state)
    if FLAGS.export:
        ckpt_lib.save_cpm_params(
            FLAGS.export, jax.tree.map(np.asarray, params))
        print(f"exported weights to {FLAGS.export}")
    print(f"done: {FLAGS.steps} steps, final loss {float(loss):.6f}")


def run():
    """Console entry point (pyproject.toml [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    run()
