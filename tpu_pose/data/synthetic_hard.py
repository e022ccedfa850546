"""Hard synthetic benchmark: mesh-rendered people on cluttered frames
(VERDICT r2 next #2 — the honest version of every accuracy claim).

The easy set (data/synthetic.py) paints one Gaussian blob per joint with
the JOINT INDEX encoded in RGB — a nearly linearly-separable task, fixed
person scale 0.8, always centered. This module renders the synthetic
SMPL BODY ITSELF into frames the network must actually invert:

- **Body render**: painter's-algorithm vertex splatting of the posed
  SMPL vertex cloud (far→near z-ordering gives real self-occlusion),
  depth-cue shading, per-vertex static texture noise, and per-frame
  random clothing-region colors (regions = dominant-LBS-joint groups, so
  appearance correlates with body parts the way clothing does — but the
  colors change every frame, so no fixed color→joint code exists).
- **Scale/offset jitter**: person extent uniform in ``scale_range``
  (default 0.45–0.95 of half-frame; the scale-robustness eval sweeps
  0.3–1.0), center offset uniform within the in-frame margin.
- **Backgrounds**: smooth low-frequency color fields + clutter (random
  rectangles and Gaussian blobs, some skin-like → confusable).
- **Occlusion**: with probability ``occlusion_prob`` a random rectangle
  is drawn OVER the person (per-joint visibility recorded; heatmap
  targets keep the occluded joints — CPM trains to infer them).
- **Two-person frames**: two bodies with depth-ordered painter
  compositing for the multi-person per-person 3D accuracy measurement.

Everything is host numpy (input pipeline ≠ TPU work), vectorized per
frame (no per-face loops): ~5–10 ms/frame at 368².
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

from tpu_pose.data import synthetic
from tpu_pose.models import joints as joints_lib
from tpu_pose.utils.config import CPMConfig

# Clothing-region grouping of SMPL joints (indices into the 24-joint
# kintree): shirts cover the torso+arm chain, pants the leg chain, skin
# the head/hands/feet. Region colors redraw EVERY frame.
_REGION_OF_JOINT = np.array([
    1,           # 0 pelvis → pants
    1, 1,        # 1,2 hips
    0,           # 3 spine1
    1, 1,        # 4,5 knees
    0,           # 6 spine2
    1, 1,        # 7,8 ankles
    0,           # 9 spine3
    2, 2,        # 10,11 feet → skin
    0,           # 12 neck
    0, 0,        # 13,14 collars
    2,           # 15 head → skin
    0, 0,        # 16,17 shoulders
    0, 0,        # 18,19 elbows
    2, 2,        # 20,21 wrists → skin
    2, 2,        # 22,23 hands
], np.int64)


def _vertex_regions(model) -> np.ndarray:
    """(V,) region id per vertex = region of its dominant LBS joint."""
    w = np.asarray(model.weights)
    dom = np.argmax(w, axis=1)
    table = _REGION_OF_JOINT
    if len(table) < w.shape[1]:  # tiny test models
        table = np.resize(table, w.shape[1])
    return table[dom]


def random_background(rng: np.random.RandomState, size: int,
                      clutter: int = 6) -> np.ndarray:
    """(size, size, 3) float [0,1]: low-frequency color field + clutter
    rectangles/blobs (some skin-toned — confusable with the person)."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.empty((size, size, 3), np.float32)
    for c in range(3):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        base = rng.uniform(0.15, 0.75)
        amp = rng.uniform(0.05, 0.25)
        img[..., c] = base + amp * np.sin(2 * np.pi * fx * xs + px) \
            * np.cos(2 * np.pi * fy * ys + py)
    for _ in range(clutter):
        color = (_random_skin(rng) if rng.rand() < 0.3
                 else rng.uniform(0.05, 0.95, 3))
        if rng.rand() < 0.5:  # rectangle
            w = rng.randint(size // 12, size // 3)
            h = rng.randint(size // 12, size // 3)
            x0 = rng.randint(0, size - w)
            y0 = rng.randint(0, size - h)
            a = rng.uniform(0.5, 1.0)
            img[y0:y0 + h, x0:x0 + w] = (
                (1 - a) * img[y0:y0 + h, x0:x0 + w] + a * color)
        else:  # Gaussian blob (CPM-heatmap-like decoy)
            cx, cy = rng.uniform(0, size, 2)
            sig = rng.uniform(size / 40, size / 10)
            g = np.exp(-((xs * size - cx) ** 2 + (ys * size - cy) ** 2)
                       / (2 * sig * sig))
            img += g[..., None] * (color - img) * rng.uniform(0.4, 0.9)
    return np.clip(img, 0.0, 1.0)


def _random_skin(rng) -> np.ndarray:
    t = rng.uniform(0.35, 0.85)
    return np.array([t, t * rng.uniform(0.68, 0.82),
                     t * rng.uniform(0.5, 0.66)], np.float32)


def _region_colors(rng) -> np.ndarray:
    """(3 regions, 3) per-frame clothing colors: shirt, pants, skin."""
    return np.stack([rng.uniform(0.1, 0.95, 3),
                     rng.uniform(0.05, 0.8, 3),
                     _random_skin(rng)]).astype(np.float32)


def splat_person(img: np.ndarray, verts_px: np.ndarray, depth: np.ndarray,
                 vert_colors: np.ndarray, radius: int) -> np.ndarray:
    """Painter's-algorithm vertex splatting, fully vectorized: vertices
    sorted far→near, square splats of ``radius`` scattered with numpy
    fancy assignment (duplicate indices keep the LAST write = the
    NEAREST vertex — correct hidden-surface behavior for a dense cloud).
    Returns the coverage mask. ``img`` is modified in place ([0,1] f32)."""
    size = img.shape[0]
    order = np.argsort(-depth, kind="stable")        # far first
    xs = np.round(verts_px[order, 0]).astype(np.int64)
    ys = np.round(verts_px[order, 1]).astype(np.int64)
    cols = vert_colors[order]
    mask = np.zeros(img.shape[:2], bool)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy > radius * radius + 0.5:
                continue
            x = np.clip(xs + dx, 0, size - 1)
            y = np.clip(ys + dy, 0, size - 1)
            ok = ((xs + dx >= 0) & (xs + dx < size)
                  & (ys + dy >= 0) & (ys + dy < size))
            img[y[ok], x[ok]] = cols[ok]
            mask[y[ok], x[ok]] = True
    return mask


def _occlude(rng, img: np.ndarray, center_px: np.ndarray,
             extent_px: float) -> Tuple[np.ndarray, np.ndarray]:
    """Draw one random occluder rectangle over the person region.
    Returns (x0y0, x1y1) of the occluded box in pixels."""
    size = img.shape[0]
    w = int(extent_px * rng.uniform(0.25, 0.55))
    h = int(extent_px * rng.uniform(0.25, 0.55))
    cx = center_px[0] + extent_px * rng.uniform(-0.6, 0.6)
    cy = center_px[1] + extent_px * rng.uniform(-0.6, 0.6)
    x0 = int(np.clip(cx - w / 2, 0, size - 2))
    y0 = int(np.clip(cy - h / 2, 0, size - 2))
    x1 = int(np.clip(x0 + w, x0 + 1, size - 1))
    y1 = int(np.clip(y0 + h, y0 + 1, size - 1))
    img[y0:y1, x0:x1] = rng.uniform(0.05, 0.95, 3)
    return np.array([x0, y0], np.float32), np.array([x1, y1], np.float32)


class _BodyCache:
    """Per-model render constants (vertex regions, static texture)."""

    def __init__(self, model, seed: int = 0):
        rng = np.random.RandomState(seed + 12345)
        self.regions = _vertex_regions(model)
        self.weights = np.asarray(model.weights, np.float32)
        v = np.asarray(model.v_template)
        self.texture = rng.uniform(0.85, 1.15, (len(v), 1)).astype(
            np.float32)


def render_person(img: np.ndarray, rng: np.random.RandomState,
                  cache: _BodyCache, verts3d: np.ndarray,
                  joints3d: np.ndarray,
                  center3d: np.ndarray, scale_px: float,
                  center_px: np.ndarray,
                  contract: float = 0.35) -> np.ndarray:
    """Render one posed body into ``img`` (in place); returns the
    boolean coverage mask (which pixels the body splatted — used to mark
    target joints a FOREGROUND distractor person covers as occluded).

    verts3d: (V, 3) posed SMPL vertices (model/camera space, +z away).
    The x/y mapping matches the joint projection in
    :func:`make_hard_examples`: px = (v − center3d) · scale_px + center_px.

    ``contract`` pulls each vertex toward its LBS-weighted joint position
    before splatting: the SYNTHETIC model's template is a broad Gaussian
    ellipsoid whose spread dwarfs the joint skeleton, so rendering it raw
    gives a frame-filling haze; contracted, the mass forms limb-localized
    clusters that articulate with the pose — a coherent capsule-ish body.
    (With a real SMPL file, contract=1.0 renders the true surface.)
    """
    jw = cache.weights @ joints3d                     # (V, 3) bone anchor
    verts3d = jw + (verts3d - jw) * contract
    v = (verts3d - center3d) * scale_px
    px = v[:, :2] + center_px
    z = v[:, 2]
    # Depth-cue shading (nearer = brighter) — the pose-dependent signal a
    # Lambert term would carry, without needing coherent mesh normals.
    zr = z.max() - z.min() + 1e-6
    shade = (0.55 + 0.45 * (z.max() - z) / zr)[:, None] * cache.texture
    colors = _region_colors(rng)[cache.regions] * shade
    colors = np.clip(colors, 0.0, 1.0)
    radius = max(1, int(round(scale_px / 80.0)))
    return splat_person(img, px, z, colors, radius)


def make_hard_examples(model, n: int, cfg: CPMConfig = CPMConfig(),
                       seed: int = 0,
                       scale_range: Tuple[float, float] = (0.45, 0.95),
                       occlusion_prob: float = 0.4,
                       clutter: int = 6,
                       heatmap_sigma: float = 3.0,
                       theta: np.ndarray | None = None,
                       beta: np.ndarray | None = None,
                       flip_prob: float = 0.0,
                       truncation: float = 0.0,
                       distractor_prob: float = 0.0,
                       max_distractors: int = 1,
                       union_stage1: bool = False
                       ) -> Dict[str, np.ndarray]:
    """n hard frames. Returns the data/synthetic.py example schema PLUS:
    ``centers`` (n, 2) person center px, ``scales`` (n,) person scale as
    the joint-extent fraction of half-frame, ``visibility`` (n, 14) — 0
    where an occluder covers the joint.

    ``scales``/``centers`` use the SAME convention as the easy set: the
    14 CPM joints' centered extent maps to ``scale·(size/2)`` px around
    ``center`` (easy set ≡ scale 0.8, center = frame center).

    ``flip_prob``: probability of mirroring an example (image columns
    reversed; joint x → size−1−x; left/right channels swapped per
    joints.CPM_FLIP_PERM; heatmaps painted AFTER the flip so labels
    stay exact). The classic CPM training augmentation — without it a
    net trained on chirally-biased data degrades under flip TTA
    (measured: TTA +2–3.5 px WORSE on a flip_prob=0 net). Default 0 so
    existing eval sets stay bit-identical.

    ``truncation``: lets the center offset push the person up to this
    fraction of its OWN extent beyond the frame edge (real footage has
    people entering/leaving frame); joints landing outside the frame
    are marked invisible in ``visibility``, matching the occluder
    convention. Default 0 keeps every prior set bit-identical.

    ``distractor_prob``: probability of rendering a SECOND, non-target
    body into the frame (random pose/scale, placed away from the target
    center, randomly in front of or behind the target; a foreground
    distractor marks the target joints it covers as occluded). The GT
    center map / heatmaps / joints stay the TARGET person's only — the
    Caffe-CPM training convention (VERDICT r3 next #1): the center map
    must learn to SELECT the hinted person among people, not merely
    locate the only one. All distractor randomness comes from a
    SEPARATE rng stream, so the target content of every frame is
    bit-identical to the distractor_prob=0 set (clean A/B) and prior
    eval sets are unchanged. Extra returns when enabled:
    ``has_distractor`` (n,) 0/1 and ``distractor_centers`` (n, 2)
    (NaN rows where absent).

    ``max_distractors``: with ``max_distractors > 1`` a triggered frame
    renders 1..max_distractors non-target bodies (count from the same
    rng_d stream), so k≥3-person scenes exist in the training
    distribution (round-4 k=3 crowd evidence). ``max_distractors=1``
    keeps the rng_d call order of the original single-distractor sets
    bit-identical.

    ``union_stage1``: also return ``heatmaps_stage1`` — belief targets
    whose joint channels are the UNION (pointwise max) over the target
    AND every rendered distractor. Round-4 measured rationale: person
    proposals come from STAGE-1 evidence (`cpm.person_evidence`), and
    stage 1 has no center-map input, so supervising it with target-only
    heatmaps on distractor frames trains it to suppress people it
    cannot possibly distinguish — the 9600-step selector recipe
    measurably degraded 3-person proposals (k3 id-acc 0.60 → 0.48)
    while 2-person crossing improved. Union stage-1 targets restore the
    Caffe-CPM split: stage 1 detects EVERYONE (it sees only the image),
    the center-hinted refinement stages select the target
    (target-only supervision, unchanged). Wire via
    ``cpm_train.stage_supervision_loss(stage1_heatmaps=...)``."""
    rng = np.random.RandomState(seed)
    if theta is None:
        theta, beta = synthetic.sample_poses(rng, n)
    j3d = synthetic._smpl_joints_np(model, theta, beta)
    j3d14 = j3d[:, joints_lib.CPM_TO_SMPL]

    import jax

    from tpu_pose.models import smpl as smpl_lib
    verts = np.asarray(jax.jit(smpl_lib.smpl_forward_batch)(
        model, beta, theta).vertices)

    rng_d = np.random.RandomState(seed * 31 + 555777)
    has_distractor = np.zeros((n,), np.float32)
    num_distractors = np.zeros((n,), np.int64)
    distractor_centers = np.full((n, 2), np.nan, np.float32)
    d_sets = []
    if distractor_prob > 0.0:
        # One pose set per distractor slot, all sampled up front so the
        # per-frame rng_d sequence is position-independent (and, at
        # max_distractors=1, bit-identical to the original sets).
        for _ in range(max(1, max_distractors)):
            theta_d, beta_d = synthetic.sample_poses(rng_d, n)
            j3d_d = synthetic._smpl_joints_np(model, theta_d, beta_d)
            verts_d = np.asarray(jax.jit(smpl_lib.smpl_forward_batch)(
                model, beta_d, theta_d).vertices)
            d_sets.append((j3d_d, verts_d))

    size = cfg.input_size
    cache = _BodyCache(model)
    images = np.zeros((n, size, size, 3), np.uint8)
    heatmaps = np.zeros((n, size // cfg.stride, size // cfg.stride,
                         cfg.num_joints + 1), np.float32)
    heatmaps_s1 = (np.zeros_like(heatmaps) if union_stage1 else None)
    joints2d = np.zeros((n, 14, 2), np.float32)
    centers = np.zeros((n, 2), np.float32)
    scales = np.zeros((n,), np.float32)
    visibility = np.ones((n, 14), np.float32)

    for i in range(n):
        c3d = j3d14[i].mean(0)
        extent = np.abs(j3d14[i] - c3d).max()
        s_frac = rng.uniform(*scale_range)
        scale_px = s_frac * (size / 2.0) / max(extent, 1e-3)
        margin = (max(0.0, (0.98 - s_frac)) * (size / 2.0)
                  + truncation * s_frac * (size / 2.0))
        center_px = (size / 2.0
                     + rng.uniform(-margin, margin, 2)).astype(np.float32)

        img = random_background(rng, size, clutter=clutter)

        # Distractor people (independent rng stream — see docstring).
        d_renders = []
        d_px = []
        if distractor_prob > 0.0 and rng_d.rand() < distractor_prob:
            nd = (1 if max_distractors <= 1
                  else int(rng_d.randint(1, max_distractors + 1)))
            placed = [(center_px, s_frac)]
            for di in range(nd):
                j3d_d, verts_d = d_sets[di]
                j14_d = j3d_d[i][joints_lib.CPM_TO_SMPL]
                c3d_d = j14_d.mean(0)
                ext_d = np.abs(j14_d - c3d_d).max()
                sf_d = rng_d.uniform(*scale_range)
                scale_px_d = sf_d * (size / 2.0) / max(ext_d, 1e-3)
                # Place away from the target AND earlier distractors:
                # ≥ 0.55 × the summed extents apart (partial overlap
                # allowed — that's the hard case the selector must
                # survive); fall back to the least-crowded candidate
                # when the frame can't satisfy it.
                cands = rng_d.uniform(0.08 * size, 0.92 * size, (20, 2))
                margin = np.min(np.stack([
                    np.linalg.norm(cands - pc[None], axis=1)
                    - 0.55 * (ps + sf_d) * (size / 2.0)
                    for pc, ps in placed]), axis=0)
                ok = np.nonzero(margin >= 0.0)[0]
                c_d = (cands[ok[0]] if len(ok)
                       else cands[np.argmax(margin)]).astype(np.float32)
                in_front = rng_d.rand() < 0.5
                d_renders.append((verts_d[i], j3d_d[i], c3d_d, scale_px_d,
                                  c_d, in_front))
                d_px.append((j14_d - c3d_d)[:, :2] * scale_px_d + c_d)
                placed.append((c_d, sf_d))
            has_distractor[i] = 1.0
            num_distractors[i] = nd
            distractor_centers[i] = d_renders[0][4]
            for dr in d_renders:
                if not dr[5]:                       # behind the target
                    render_person(img, rng_d, cache, *dr[:5])

        render_person(img, rng, cache, verts[i], j3d[i], c3d, scale_px,
                      center_px)

        px = (j3d14[i] - c3d)[:, :2] * scale_px + center_px
        visibility[i, ((px < 0.0) | (px > size - 1.0)).any(axis=1)] = 0.0

        for dr in d_renders:
            if dr[5]:                               # distractor in front
                d_mask = render_person(img, rng_d, cache, *dr[:5])
                xi = np.clip(np.round(px[:, 0]), 0,
                             size - 1).astype(np.int64)
                yi = np.clip(np.round(px[:, 1]), 0,
                             size - 1).astype(np.int64)
                visibility[i, d_mask[yi, xi]] = 0.0  # covered → occluded

        if rng.rand() < occlusion_prob:
            extent_px = s_frac * (size / 2.0)
            lo, hi = _occlude(rng, img, center_px, extent_px)
            inside = ((px >= lo) & (px <= hi)).all(axis=1)
            visibility[i, inside] = 0.0

        if flip_prob > 0.0 and rng.rand() < flip_prob:
            img = img[:, ::-1]
            px = px[joints_lib.CPM_FLIP_PERM]
            px[:, 0] = size - 1.0 - px[:, 0]
            visibility[i] = visibility[i][joints_lib.CPM_FLIP_PERM]
            center_px = np.array(
                [size - 1.0 - center_px[0], center_px[1]], np.float32)
            if has_distractor[i]:
                distractor_centers[i, 0] = (size - 1.0
                                            - distractor_centers[i, 0])
                d_px = [p[joints_lib.CPM_FLIP_PERM] for p in d_px]
                for p in d_px:
                    p[:, 0] = size - 1.0 - p[:, 0]

        images[i] = (img * 255).astype(np.uint8)
        joints2d[i] = px
        centers[i] = center_px
        scales[i] = s_frac
        heatmaps[i] = synthetic.gaussian_heatmaps(px, size, cfg.stride,
                                                  heatmap_sigma)
        if union_stage1:
            hm_u = heatmaps[i].copy()
            for p in d_px:
                hm_d = synthetic.gaussian_heatmaps(p, size, cfg.stride,
                                                   heatmap_sigma)
                hm_u[..., :-1] = np.maximum(hm_u[..., :-1],
                                            hm_d[..., :-1])
            hm_u[..., -1] = 1.0 - hm_u[..., :-1].max(-1)
            heatmaps_s1[i] = hm_u
    out = {
        "images": images, "heatmaps": heatmaps, "joints2d": joints2d,
        "gt_joints3d": j3d.astype(np.float32),
        "theta": theta, "beta": beta,
        "centers": centers, "scales": scales, "visibility": visibility,
    }
    if distractor_prob > 0.0:
        out["has_distractor"] = has_distractor
        out["num_distractors"] = num_distractors
        out["distractor_centers"] = distractor_centers
    if union_stage1:
        out["heatmaps_stage1"] = heatmaps_s1
    return out


def make_hard_multi_examples(model, n: int, cfg: CPMConfig = CPMConfig(),
                             seed: int = 0,
                             scale_range: Tuple[float, float] = (0.4, 0.55),
                             clutter: int = 4,
                             num_people: int = 2) -> Dict[str, np.ndarray]:
    """k-person hard frames for the per-person 3D accuracy measurement
    (VERDICT r2 next #4; r3 next #3 adds k>2): ``num_people`` bodies at
    separated centers with jitter, depth-ordered compositing (the nearer
    person occludes). ``num_people=2`` reproduces the round-3 two-person
    set bit-identically (same rng call order).

    Returns images (n,S,S,3) u8 + per-person GT stacked on axis 1:
    joints2d (n,k,14,2), gt_joints3d (n,k,24,3), centers (n,k,2),
    theta/beta (n,k,...)."""
    k = num_people
    rng = np.random.RandomState(seed)
    parts = [synthetic.sample_poses(rng, n) for _ in range(k)]
    theta = np.concatenate([t for t, _ in parts])
    beta = np.concatenate([b for _, b in parts])
    j3d = synthetic._smpl_joints_np(model, theta, beta)

    import jax

    from tpu_pose.models import smpl as smpl_lib
    verts = np.asarray(jax.jit(smpl_lib.smpl_forward_batch)(
        model, beta, theta).vertices)

    size = cfg.input_size
    xfracs = ((0.28, 0.72) if k == 2
              else tuple(np.linspace(0.16, 0.84, k)))
    cache = _BodyCache(model)
    images = np.zeros((n, size, size, 3), np.uint8)
    joints2d = np.zeros((n, k, 14, 2), np.float32)
    centers = np.zeros((n, k, 2), np.float32)

    for i in range(n):
        img = random_background(rng, size, clutter=clutter)
        # Spread placement with jitter; random depth order (far first).
        if k == 2:
            order = [0, 1] if rng.rand() < 0.5 else [1, 0]
        else:
            order = rng.permutation(k)
        for slot in order:
            idx = i + slot * n
            j14 = j3d[idx][joints_lib.CPM_TO_SMPL]
            c3d = j14.mean(0)
            extent = np.abs(j14 - c3d).max()
            s_frac = rng.uniform(*scale_range)
            scale_px = s_frac * (size / 2.0) / max(extent, 1e-3)
            cx = size * xfracs[slot] + rng.uniform(-0.05, 0.05) * size
            cy = size * 0.5 + rng.uniform(-0.1, 0.1) * size
            center_px = np.array([cx, cy], np.float32)
            render_person(img, rng, cache, verts[idx], j3d[idx], c3d,
                          scale_px, center_px)
            joints2d[i, slot] = (j14 - c3d)[:, :2] * scale_px + center_px
            centers[i, slot] = center_px
        images[i] = (img * 255).astype(np.uint8)

    stack_k = lambda a: np.stack(  # noqa: E731
        [a[p * n:(p + 1) * n] for p in range(k)], axis=1)
    return {
        "images": images, "joints2d": joints2d, "centers": centers,
        "gt_joints3d": stack_k(j3d).astype(np.float32),
        "theta": stack_k(theta), "beta": stack_k(beta),
    }


def make_hard_multi_video(model, num_frames: int,
                          cfg: CPMConfig = CPMConfig(), seed: int = 0,
                          scale_range: Tuple[float, float] = (0.4, 0.55),
                          clutter: int = 4, crossing: bool = True,
                          keyframe_every: int = 8,
                          num_people: int = 2,
                          x_span: float = 0.0) -> Dict[str, np.ndarray]:
    """Two-person hard VIDEO for the track-association benchmark
    (api.estimate_and_fit_video_multi / fitting/tracking.py).

    Each person gets a smooth pose sequence (keyframe sampling + cosine
    ease, same recipe as synthetic.make_video_examples) and a linear
    center path; with ``crossing`` the paths swap sides mid-sequence, so
    around the crossing frames the nearer person (identity 0, rendered
    last) genuinely occludes the farther one AND any center-only
    association would swap identities — the scenario the joints-feature
    tracker must survive. One static background per sequence (it is a
    video), per-frame occluders off.

    ``num_people`` (r3 next #3): k people on spread linear paths; with
    ``crossing`` every person walks to the mirror position (person p:
    slot p → slot k−1−p), so all pairs cross near the middle — k
    simultaneous identity hazards. k=2 reproduces the round-3 crossing
    benchmark bit-identically (same rng call order). Each person's
    clothing colors are frame-constant and person-distinct (render rng
    seeded per person), so appearance re-ID has a real signal.

    ``x_span`` > 0 overrides the horizontal START spread: people start
    at ``linspace(0.5 − x_span/2, 0.5 + x_span/2, k)`` of the frame.
    The default layout puts k=4 adjacent people 69 px apart — inside
    the 96 px NMS radius before anyone moves, which measures the NMS
    geometry, not tracking (round-5 k4 figure 0.169). A fair k≥4 run
    uses e.g. ``x_span=0.8`` (adjacent ≈98 px) with a matched
    ``nms_radius_px``. 0 keeps every earlier benchmark bit-identical.

    Returns images (T,S,S,3) u8 + GT in stable PERSON-IDENTITY order on
    axis 1 (the whole point of the benchmark): joints2d (T,k,14,2),
    gt_joints3d (T,k,24,3), centers (T,k,2), theta (T,k,72),
    beta (T,k,10)."""
    k = num_people
    rng = np.random.RandomState(seed)
    size = cfg.input_size
    t_idx = np.arange(num_frames, dtype=np.float64)
    n_keys = max(2, num_frames // keyframe_every + 2)
    theta = np.zeros((num_frames, k, 72), np.float32)
    beta = np.zeros((num_frames, k, 10), np.float32)
    for p in range(k):
        k_theta, k_beta = synthetic.sample_poses(rng, n_keys)
        t = t_idx / keyframe_every
        i0 = np.minimum(t.astype(np.int64), n_keys - 2)
        w = (1.0 - np.cos(np.pi * (t - i0))) / 2.0
        theta[:, p] = ((1.0 - w)[:, None] * k_theta[i0]
                       + w[:, None] * k_theta[i0 + 1])
        beta[:, p] = k_beta[0]

    import jax

    from tpu_pose.models import smpl as smpl_lib
    flat_t = theta.reshape(num_frames * k, 72)
    flat_b = beta.reshape(num_frames * k, 10)
    out = jax.jit(smpl_lib.smpl_forward_batch)(model, flat_b, flat_t)
    verts = np.asarray(out.vertices).reshape(num_frames, k, -1, 3)
    j3d = synthetic._smpl_joints_np(model, flat_t, flat_b).reshape(
        num_frames, k, -1, 3)

    # Linear center paths; crossing walks each person to the mirror
    # slot over the sequence, so every pair swaps sides.
    u = t_idx / max(num_frames - 1, 1)                 # 0→1
    if x_span > 0:
        pos = np.linspace(0.5 - x_span / 2.0, 0.5 + x_span / 2.0, k)
    else:
        pos = np.array((0.28, 0.72) if k == 2
                       else np.linspace(0.22, 0.78, k))
    xs_path = []
    for p in range(k):
        x_from, x_to = pos[p], (pos[k - 1 - p] if crossing else pos[p])
        xs_path.append(x_from + (x_to - x_from) * u)
    ys_path = [0.5 + 0.06 * np.sin(2 * np.pi * u + rng.uniform(0, 6.3))
               for _ in range(k)]
    cx = np.stack(xs_path, 1) * size                   # (T, k)
    cy = np.stack(ys_path, 1) * size
    s_frac = rng.uniform(*scale_range, size=k)

    cache = _BodyCache(model)
    background = random_background(rng, size, clutter=clutter)
    images = np.zeros((num_frames, size, size, 3), np.uint8)
    joints2d = np.zeros((num_frames, k, 14, 2), np.float32)
    centers = np.zeros((num_frames, k, 2), np.float32)
    for i in range(num_frames):
        img = background.copy()
        for p in range(k - 1, -1, -1):                 # far (k−1) first
            j14 = j3d[i, p][joints_lib.CPM_TO_SMPL]
            c3d = j14.mean(0)
            extent = np.abs(j14 - c3d).max()
            scale_px = s_frac[p] * (size / 2.0) / max(extent, 1e-3)
            center_px = np.array([cx[i, p], cy[i, p]], np.float32)
            render_person(img, np.random.RandomState(seed + 7 * p),
                          cache, verts[i, p], j3d[i, p], c3d, scale_px,
                          center_px)
            joints2d[i, p] = (j14 - c3d)[:, :2] * scale_px + center_px
            centers[i, p] = center_px
        images[i] = (img * 255).astype(np.uint8)

    return {
        "images": images, "joints2d": joints2d, "centers": centers,
        "gt_joints3d": j3d.astype(np.float32),
        "theta": theta, "beta": beta,
    }


def hard_train_batches(model, batch_size: int, num_batches: int,
                       cfg: CPMConfig = CPMConfig(), seed: int = 0,
                       raw_images: bool = False,
                       scale_range: Tuple[float, float] = (0.45, 0.95),
                       occlusion_prob: float = 0.4,
                       flip_prob: float = 0.5,
                       distractor_prob: float = 0.0,
                       max_distractors: int = 1,
                       union_stage1: bool = False
                       ) -> Iterator[Dict[str, np.ndarray]]:
    """Training batches on the hard set (schema of
    synthetic.cpm_train_batches). Center maps paint at each frame's GT
    person center — the Caffe CPM training convention (GT centering at
    train time; in-graph refine_center supplies it at inference).
    ``flip_prob=0.5`` mirrors half the examples (see make_hard_examples)
    — removes the chirality bias so flip TTA helps instead of hurts.
    ``distractor_prob`` renders a second non-target body into that
    fraction of frames with the targets still selecting ONLY the
    centered person (see make_hard_examples) — the training signal that
    teaches the center map to be a person SELECTOR, the Caffe-CPM
    convention (VERDICT r3 next #1). ``max_distractors`` > 1 samples
    1..N distractors per triggered frame (k≥3 training scenes);
    ``union_stage1`` adds ``heatmaps_stage1`` union targets for the
    hint-less stage 1 (see make_hard_examples — feed to
    ``stage_supervision_loss(stage1_heatmaps=...)``)."""
    from tpu_pose.ops import preprocess as pre
    for b in range(num_batches):
        ex = make_hard_examples(model, batch_size, cfg,
                                seed=seed * 9973 + b,
                                scale_range=scale_range,
                                occlusion_prob=occlusion_prob,
                                flip_prob=flip_prob,
                                distractor_prob=distractor_prob,
                                max_distractors=max_distractors,
                                union_stage1=union_stage1)
        cmaps = np.stack([
            np.asarray(pre.gaussian_center_map(
                cfg.input_size, cfg.center_sigma, center=c))
            for c in ex["centers"]])
        batch = {
            "images": (ex["images"] if raw_images
                       else ex["images"].astype(np.float32) / 256.0 - 0.5),
            "center_maps": cmaps.astype(np.float32),
            "heatmaps": ex["heatmaps"],
        }
        if union_stage1:
            batch["heatmaps_stage1"] = ex["heatmaps_stage1"]
        yield batch


def hard_eval_batches(model, batch_size: int, num_batches: int,
                      cfg: CPMConfig = CPMConfig(), seed: int = 1000,
                      **kw) -> Iterator[Dict[str, np.ndarray]]:
    """Eval batches on the hard set (schema of synthetic.eval_batches)."""
    for b in range(num_batches):
        ex = make_hard_examples(model, batch_size, cfg,
                                seed=seed * 9973 + b, **kw)
        yield {"images": ex["images"], "gt_joints3d": ex["gt_joints3d"],
               "gt_joints2d": ex["joints2d"]}


def make_empty_examples(n: int, cfg: CPMConfig = CPMConfig(),
                        seed: int = 0, clutter: int = 6,
                        occluder_prob: float = 0.4) -> Dict[str, np.ndarray]:
    """Person-FREE hard frames: the same background distribution as
    :func:`make_hard_examples` (low-frequency fields, skin-toned clutter
    rectangles, Gaussian decoy blobs, optional occluder rectangle) with
    NO body rendered — the negative class for the empty-frame operating
    point (VERDICT r3 next #6: ``select_people(allow_empty=True)``'s
    false-positive person rate is measured on these).

    Returns {"images": (n, S, S, 3) uint8}."""
    rng = np.random.RandomState(seed)
    size = cfg.input_size
    images = np.zeros((n, size, size, 3), np.uint8)
    for i in range(n):
        img = random_background(rng, size, clutter=clutter)
        if rng.rand() < occluder_prob:
            _occlude(rng, img,
                     np.array([size / 2.0, size / 2.0], np.float32),
                     0.7 * (size / 2.0))
        images[i] = (img * 255).astype(np.uint8)
    return {"images": images}


def make_hard_enterleave_video(model, num_frames: int,
                               cfg: CPMConfig = CPMConfig(), seed: int = 0,
                               scale_range: Tuple[float, float] = (0.4, 0.55),
                               clutter: int = 4, keyframe_every: int = 8,
                               leave_at: float = 0.45,
                               enter_at: float = 0.6
                               ) -> Dict[str, np.ndarray]:
    """Enter/leave hard video for the track birth/death benchmark
    (VERDICT r3 next #2): THREE identities share a 2-slot world —

    - person A stays in frame the whole sequence (gentle wander);
    - person B starts in frame and walks OUT the right edge, fully gone
      by ``leave_at``·T (then stays gone — a permanent exit);
    - person C walks IN from the left edge starting at ``enter_at``·T —
      a mid-sequence entrance with DIFFERENT clothing colors than B
      (per-person render rng), so a tracker must BIRTH a new identity,
      not resurrect B's.

    A correct tracker with ``max_people=2`` and track death enabled
    re-uses B's slot for C after B's death; GT is returned per IDENTITY
    (axis 1 size 3) with a ``present`` (T, 3) flag (a person counts
    present while ≥60% of its 14 joints are in frame), and the
    benchmark script maps identities to slots segment-wise.

    Returns images (T,S,S,3) u8, joints2d (T,3,14,2) (off-frame
    positions included — they are the GT paths), centers (T,3,2),
    gt_joints3d (T,3,24,3), theta (T,3,72), beta (T,3,10),
    present (T,3) float 0/1."""
    n_id = 3
    rng = np.random.RandomState(seed)
    size = cfg.input_size
    t_idx = np.arange(num_frames, dtype=np.float64)
    n_keys = max(2, num_frames // keyframe_every + 2)
    theta = np.zeros((num_frames, n_id, 72), np.float32)
    beta = np.zeros((num_frames, n_id, 10), np.float32)
    for p in range(n_id):
        k_theta, k_beta = synthetic.sample_poses(rng, n_keys)
        t = t_idx / keyframe_every
        i0 = np.minimum(t.astype(np.int64), n_keys - 2)
        w = (1.0 - np.cos(np.pi * (t - i0))) / 2.0
        theta[:, p] = ((1.0 - w)[:, None] * k_theta[i0]
                       + w[:, None] * k_theta[i0 + 1])
        beta[:, p] = k_beta[0]

    import jax

    from tpu_pose.models import smpl as smpl_lib
    flat_t = theta.reshape(num_frames * n_id, 72)
    flat_b = beta.reshape(num_frames * n_id, 10)
    out = jax.jit(smpl_lib.smpl_forward_batch)(model, flat_b, flat_t)
    verts = np.asarray(out.vertices).reshape(num_frames, n_id, -1, 3)
    j3d = synthetic._smpl_joints_np(model, flat_t, flat_b).reshape(
        num_frames, n_id, -1, 3)

    u = t_idx / max(num_frames - 1, 1)                  # 0→1
    # A wanders around x=0.3; B exits right (fully off by leave_at);
    # C enters left (fully off before enter_at). "Off" = 0.25 frames
    # beyond the edge — more than a person half-width at these scales.
    xa = 0.30 + 0.05 * np.sin(2 * np.pi * u + rng.uniform(0, 6.3))
    ub = np.clip(u / max(leave_at, 1e-6), 0.0, 1.0)
    xb = 0.70 + (1.25 - 0.70) * ub
    uc = np.clip((u - enter_at) / max(1.0 - enter_at, 1e-6), 0.0, 1.0)
    xc = -0.25 + (0.62 - (-0.25)) * uc
    ys = [0.5 + 0.05 * np.sin(2 * np.pi * u + rng.uniform(0, 6.3))
          for _ in range(n_id)]
    cx = np.stack([xa, xb, xc], 1) * size               # (T, 3)
    cy = np.stack(ys, 1) * size
    s_frac = rng.uniform(*scale_range, size=n_id)

    cache = _BodyCache(model)
    background = random_background(rng, size, clutter=clutter)
    images = np.zeros((num_frames, size, size, 3), np.uint8)
    joints2d = np.zeros((num_frames, n_id, 14, 2), np.float32)
    centers = np.zeros((num_frames, n_id, 2), np.float32)
    present = np.zeros((num_frames, n_id), np.float32)
    for i in range(num_frames):
        img = background.copy()
        for p in range(n_id - 1, -1, -1):               # far first
            j14 = j3d[i, p][joints_lib.CPM_TO_SMPL]
            c3d = j14.mean(0)
            extent = np.abs(j14 - c3d).max()
            scale_px = s_frac[p] * (size / 2.0) / max(extent, 1e-3)
            center_px = np.array([cx[i, p], cy[i, p]], np.float32)
            px = (j14 - c3d)[:, :2] * scale_px + center_px
            joints2d[i, p] = px
            centers[i, p] = center_px
            in_frame = ((px >= 0.0) & (px <= size - 1.0)).all(axis=1)
            present[i, p] = float(in_frame.mean() >= 0.6)
            if in_frame.any():                          # partially visible
                render_person(img, np.random.RandomState(seed + 7 * p),
                              cache, verts[i, p], j3d[i, p], c3d,
                              scale_px, center_px)
        images[i] = (img * 255).astype(np.uint8)

    return {
        "images": images, "joints2d": joints2d, "centers": centers,
        "gt_joints3d": j3d.astype(np.float32),
        "theta": theta, "beta": beta, "present": present,
    }
