"""Hard synthetic benchmark (data/synthetic_hard.py — VERDICT r2 next
#2): mesh-rendered people over cluttered backgrounds with scale/offset
jitter and occlusion. These tests pin the GT contracts the accuracy
measurements depend on."""

import numpy as np
import pytest

from tpu_pose.data import synthetic_hard as sh
from tpu_pose.models import joints as joints_lib
from tpu_pose.models import smpl_data
from tpu_pose.utils.config import CPMConfig

CFG = CPMConfig(input_size=128)  # small frames keep the suite fast


@pytest.fixture(scope="module")
def model():
    return smpl_data.synthetic_smpl(seed=0)


@pytest.fixture(scope="module")
def ex(model):
    return sh.make_hard_examples(model, 6, CFG, seed=3,
                                 scale_range=(0.4, 1.0),
                                 occlusion_prob=0.5)


def test_schema_and_shapes(ex):
    assert ex["images"].shape == (6, 128, 128, 3)
    assert ex["images"].dtype == np.uint8
    assert ex["heatmaps"].shape == (6, 16, 16, 15)
    assert ex["joints2d"].shape == (6, 14, 2)
    assert ex["centers"].shape == (6, 2)
    assert ex["scales"].shape == (6,)
    assert ex["visibility"].shape == (6, 14)


def test_determinism(model):
    a = sh.make_hard_examples(model, 2, CFG, seed=7)
    b = sh.make_hard_examples(model, 2, CFG, seed=7)
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["joints2d"], b["joints2d"])


def test_gt_geometry_convention(ex):
    """joints2d must equal the scale/offset mapping of the SMPL joints:
    centered 14-joint extent → scales·(size/2) px around centers — the
    SAME convention the easy set uses at fixed scale 0.8/center."""
    j3d14 = ex["gt_joints3d"][:, joints_lib.CPM_TO_SMPL]
    for i in range(len(j3d14)):
        c3d = j3d14[i].mean(0)
        extent = np.abs(j3d14[i] - c3d).max()
        px_extent = np.abs(ex["joints2d"][i] - ex["centers"][i]).max()
        # The projected L∞ extent uses only x/y, so it is ≤ the 3D bound
        # but must reach a sane fraction of it.
        bound = ex["scales"][i] * (CFG.input_size / 2.0)
        assert px_extent <= bound + 1e-3
        assert px_extent >= 0.3 * bound
        # Re-project explicitly.
        want = ((j3d14[i] - c3d)[:, :2] * (bound / extent)
                + ex["centers"][i])
        np.testing.assert_allclose(ex["joints2d"][i], want, atol=1e-3)


def test_heatmaps_peak_at_joints(ex):
    """Target heatmaps follow the cell-corner convention at the GT
    joints (a +stride/2 drift here would bake a train/decode bias)."""
    hm = ex["heatmaps"][0]
    for j in range(14):
        iy, ix = np.unravel_index(np.argmax(hm[..., j]), hm.shape[:2])
        px = ex["joints2d"][0, j]
        assert abs(ix * CFG.stride - px[0]) <= CFG.stride
        assert abs(iy * CFG.stride - px[1]) <= CFG.stride


def test_person_is_rendered_near_joints(ex):
    """The rendered body must actually occupy the joint region: image
    content inside the person bbox differs strongly from a pure
    background render with the same seed-independent stats (we check
    variance, not exact pixels)."""
    for i in range(3):
        lo = np.clip(ex["joints2d"][i].min(0).astype(int) - 4, 0, 127)
        hi = np.clip(ex["joints2d"][i].max(0).astype(int) + 4, 1, 128)
        patch = ex["images"][i, lo[1]:hi[1], lo[0]:hi[0]]
        assert patch.size > 0
        assert patch.std() > 10.0  # textured body, not flat background


def test_occlusion_marks_visibility(model):
    ex = sh.make_hard_examples(model, 12, CFG, seed=11,
                               occlusion_prob=1.0)
    assert (ex["visibility"] == 0).any()  # some joints got covered
    assert ex["visibility"].mean() > 0.5  # but not everything


def test_multi_person_schema_and_separation(model):
    m = sh.make_hard_multi_examples(model, 4, CFG, seed=5)
    assert m["images"].shape == (4, 128, 128, 3)
    assert m["joints2d"].shape == (4, 2, 14, 2)
    assert m["gt_joints3d"].shape == (4, 2, 24, 3)
    # Left/right placement: person 0 center left of person 1.
    assert (m["centers"][:, 0, 0] < m["centers"][:, 1, 0]).all()


def test_train_batches_schema(model):
    # flip_prob pinned to 0: the center comparison below is against the
    # UNFLIPPED example set (the default 0.5 mirrors a random subset —
    # the flip-augmentation training recipe; mirrored-center convention
    # asserted separately at flip_prob=1).
    b = next(sh.hard_train_batches(model, 3, 1, CFG, seed=0,
                                   raw_images=True, flip_prob=0.0))
    assert b["images"].dtype == np.uint8
    assert b["images"].shape == (3, 128, 128, 3)
    assert b["center_maps"].shape == (3, 128, 128, 1)
    assert b["heatmaps"].shape == (3, 16, 16, 15)
    # Center maps peak at each frame's GT person center, not the frame
    # center (the GT-centered training convention).
    ex = sh.make_hard_examples(model, 3, CFG, seed=0)
    for i in range(3):
        iy, ix = np.unravel_index(np.argmax(b["center_maps"][i, ..., 0]),
                                  (128, 128))
        np.testing.assert_allclose([ix, iy], ex["centers"][i], atol=1.0)
    # Flip-augmented batches mirror the center hint with the image:
    # peak x → (size−1) − x under jnp.flip's cell-center convention.
    # (Only example 0 is stream-comparable: the per-example flip draw
    # shifts every subsequent example's rng stream.)
    bf = next(sh.hard_train_batches(model, 3, 1, CFG, seed=0,
                                    raw_images=True, flip_prob=1.0))
    iy, ix = np.unravel_index(np.argmax(bf["center_maps"][0, ..., 0]),
                              (128, 128))
    np.testing.assert_allclose([127 - ix, iy], ex["centers"][0], atol=1.0)


def test_truncation_marks_out_of_frame_joints(model):
    """truncation>0 lets the person slide partially off-frame; joints
    outside the frame are marked invisible (the occluder convention),
    and truncation=0 stays bit-identical to the pre-flag sets."""
    size = CFG.input_size
    base = sh.make_hard_examples(model, 8, CFG, seed=9,
                                 scale_range=(0.5, 0.9))
    again = sh.make_hard_examples(model, 8, CFG, seed=9,
                                  scale_range=(0.5, 0.9), truncation=0.0)
    np.testing.assert_array_equal(base["images"], again["images"])
    tr = sh.make_hard_examples(model, 8, CFG, seed=9,
                               scale_range=(0.5, 0.9), truncation=0.6)
    out = ((tr["joints2d"] < 0.0)
           | (tr["joints2d"] > size - 1.0)).any(-1)
    assert out.any(), "truncation=0.6 should push some joints off-frame"
    assert (tr["visibility"][out] == 0.0).all()
    assert np.isfinite(tr["heatmaps"]).all()


def test_distractor_keeps_target_gt_and_changes_pixels(model):
    """distractor_prob renders a second body from an INDEPENDENT rng
    stream: target GT (joints/centers/heatmaps/scales) is bit-identical
    to the distractor-free set, frames differ exactly where a
    distractor was drawn, and a foreground distractor can only REMOVE
    visibility (never add)."""
    base = sh.make_hard_examples(model, 8, CFG, seed=2,
                                 occlusion_prob=0.0)
    d = sh.make_hard_examples(model, 8, CFG, seed=2, occlusion_prob=0.0,
                              distractor_prob=0.7)
    for k in ("joints2d", "centers", "scales", "heatmaps",
              "gt_joints3d"):
        np.testing.assert_array_equal(base[k], d[k])
    has = d["has_distractor"]
    assert has.sum() >= 2 and has.sum() < 8        # ~0.7 of 8
    for i in range(8):
        same = np.array_equal(base["images"][i], d["images"][i])
        assert same == (has[i] == 0)
        assert np.isfinite(d["distractor_centers"][i]).all() == bool(
            has[i])
    assert (d["visibility"] <= base["visibility"]).all()


def test_multi_examples_k3_schema_and_separation(model):
    m = sh.make_hard_multi_examples(model, 4, CFG, seed=1, num_people=3)
    assert m["images"].shape == (4, 128, 128, 3)
    assert m["joints2d"].shape == (4, 3, 14, 2)
    assert m["gt_joints3d"].shape == (4, 3, 24, 3)
    assert m["centers"].shape == (4, 3, 2)
    # Spread placement: centers pairwise separated.
    c = m["centers"]
    for i in range(4):
        d01 = np.linalg.norm(c[i, 0] - c[i, 1])
        d12 = np.linalg.norm(c[i, 1] - c[i, 2])
        assert d01 > 20 and d12 > 20
    # Identity ordering: joints cluster around their own center.
    d = np.linalg.norm(m["joints2d"].mean(2) - c, axis=-1)
    assert d.max() < 24.0


def test_multi_video_k3_everyone_crosses(model):
    v = sh.make_hard_multi_video(model, 10, CFG, seed=1, crossing=True,
                                 num_people=3)
    assert v["joints2d"].shape == (10, 3, 14, 2)
    cx = v["centers"][..., 0]
    # Person p ends at the mirror slot: order reverses start → end.
    assert cx[0, 0] < cx[0, 1] < cx[0, 2]
    assert cx[-1, 0] > cx[-1, 1] > cx[-1, 2]


def test_empty_examples_have_no_person(model):
    e = sh.make_empty_examples(6, CFG, seed=0)
    assert e["images"].shape == (6, 128, 128, 3)
    assert set(e) == {"images"}
    # Deterministic per seed, distinct across seeds.
    e2 = sh.make_empty_examples(6, CFG, seed=0)
    np.testing.assert_array_equal(e["images"], e2["images"])
    assert not np.array_equal(
        e["images"], sh.make_empty_examples(6, CFG, seed=1)["images"])


def test_enterleave_presence_semantics(model):
    el = sh.make_hard_enterleave_video(model, 16, CFG, seed=0)
    p = el["present"]
    assert p.shape == (16, 3)
    assert p[:, 0].all()                           # A never leaves
    assert p[0, 1] == 1 and p[-1, 1] == 0          # B leaves for good
    # B's exit is monotone: once gone, never back.
    gone = np.nonzero(p[:, 1] == 0)[0]
    assert (p[gone[0]:, 1] == 0).all()
    assert p[0, 2] == 0 and p[-1, 2] == 1          # C enters mid-way
    came = np.nonzero(p[:, 2] == 1)[0]
    assert (p[came[0]:, 2] == 1).all()
    # B and C never overlap (a 2-slot world with 3 identities).
    assert (p[:, 1] + p[:, 2] <= 1).all()
    # Present people's joints sit near their centers (render convention).
    for i in range(16):
        for q in range(3):
            if p[i, q]:
                d = np.linalg.norm(
                    el["joints2d"][i, q].mean(0) - el["centers"][i, q])
                assert d < 24.0

def test_union_stage1_targets(model):
    """union_stage1 adds stage-1 UNION heatmaps: identical to the
    target-only maps on distractor-free frames, pointwise ≥ them on
    joint channels everywhere, with the extra mass concentrated at the
    distractor — and everything else bit-identical to the same call
    without the flag."""
    d = sh.make_hard_examples(model, 8, CFG, seed=2, occlusion_prob=0.0,
                              distractor_prob=0.7)
    u = sh.make_hard_examples(model, 8, CFG, seed=2, occlusion_prob=0.0,
                              distractor_prob=0.7, union_stage1=True)
    for k in d:
        np.testing.assert_array_equal(d[k], u[k])
    hs1 = u["heatmaps_stage1"]
    assert hs1.shape == u["heatmaps"].shape
    has = u["has_distractor"]
    for i in range(8):
        if has[i]:
            # Joint channels only gain mass; background only loses.
            assert (hs1[i, ..., :-1] >= u["heatmaps"][i, ..., :-1]
                    - 1e-6).all()
            assert (hs1[i, ..., -1] <= u["heatmaps"][i, ..., -1]
                    + 1e-6).all()
            extra = (hs1[i, ..., :-1] - u["heatmaps"][i, ..., :-1]).max(-1)
            yx = np.unravel_index(np.argmax(extra), extra.shape)
            peak_px = np.array([yx[1], yx[0]], np.float32) * CFG.stride
            # The strongest extra mass sits on the distractor's body
            # (within its ~scale·size/2 extent of its center).
            dist = np.linalg.norm(peak_px - u["distractor_centers"][i])
            assert extra.max() > 0.5
            assert dist < 0.75 * CFG.input_size
        else:
            np.testing.assert_array_equal(hs1[i], u["heatmaps"][i])
    # Background channel stays the 1 − max convention.
    np.testing.assert_allclose(
        hs1[..., -1], 1.0 - hs1[..., :-1].max(-1), atol=1e-6)


def test_union_stage1_flip_mirrors_distractor_mass(model):
    """With flip_prob=1 every frame mirrors; the union map's EXTRA mass
    (distractor) must mirror with it — catching a painter that flips
    the target but paints the distractor unmirrored."""
    # flip_prob must be >0 in BOTH calls so the per-frame flip draw is
    # consumed and the rng streams stay aligned; 1e-12 never triggers.
    u0 = sh.make_hard_examples(model, 6, CFG, seed=5, occlusion_prob=0.0,
                               distractor_prob=1.0, union_stage1=True,
                               flip_prob=1e-12)
    u1 = sh.make_hard_examples(model, 6, CFG, seed=5, occlusion_prob=0.0,
                               distractor_prob=1.0, union_stage1=True,
                               flip_prob=1.0)
    size = CFG.input_size
    for i in range(6):
        # distractor_centers mirror exactly.
        np.testing.assert_allclose(
            u1["distractor_centers"][i, 0],
            size - 1.0 - u0["distractor_centers"][i, 0], atol=1e-5)
        np.testing.assert_allclose(u1["distractor_centers"][i, 1],
                                   u0["distractor_centers"][i, 1])
        e0 = (u0["heatmaps_stage1"][i, ..., :-1]
              - u0["heatmaps"][i, ..., :-1]).max(-1)
        e1 = (u1["heatmaps_stage1"][i, ..., :-1]
              - u1["heatmaps"][i, ..., :-1]).max(-1)
        # Compare the extra-mass CENTER OF MASS (argmax is brittle: the
        # mirrored grid is offset by (size−1) mod stride, so ties
        # between joints resolve differently). Cell-corner convention:
        # pixel = col·stride.
        ys, xs = np.mgrid[0:e0.shape[0], 0:e0.shape[1]]
        com = lambda e: (np.sum(e * xs) / e.sum() * CFG.stride,  # noqa: E731
                         np.sum(e * ys) / e.sum() * CFG.stride)
        cx0, cy0 = com(e0)
        cx1, cy1 = com(e1)
        assert abs(cx1 - (size - 1.0 - cx0)) <= CFG.stride
        assert abs(cy1 - cy0) <= CFG.stride


def test_max_distractors_two(model):
    """max_distractors=2 samples 1..2 bodies per triggered frame from
    the same independent stream; target GT stays bit-identical and the
    2-distractor frames differ from the 1-distractor set's pixels."""
    base = sh.make_hard_examples(model, 10, CFG, seed=2,
                                 occlusion_prob=0.0)
    d1 = sh.make_hard_examples(model, 10, CFG, seed=2,
                               occlusion_prob=0.0, distractor_prob=0.9)
    d2 = sh.make_hard_examples(model, 10, CFG, seed=2,
                               occlusion_prob=0.0, distractor_prob=0.9,
                               max_distractors=2)
    for k in ("joints2d", "centers", "scales", "heatmaps"):
        np.testing.assert_array_equal(base[k], d2[k])
    nd = d2["num_distractors"]
    assert set(np.unique(nd[nd > 0])) <= {1, 2}
    assert (nd == 2).any()                        # ~0.45 of 10 frames
    assert (nd == 1).any()
    # num_distractors consistent with has_distractor within the set.
    np.testing.assert_array_equal(nd > 0, d2["has_distractor"] > 0)
    # (The nd draw consumes rng_d, so the TRIGGER pattern is allowed to
    # differ from the max_distractors=1 set — only max_distractors=1
    # preserves bit-identity with it; d1 is here for that contract:)
    assert d1["num_distractors"].max() == 1


def test_train_batches_union_schema(model):
    b = next(iter(sh.hard_train_batches(
        model, 4, 1, CFG, seed=0, raw_images=True, distractor_prob=1.0,
        union_stage1=True, max_distractors=2)))
    assert b["heatmaps_stage1"].shape == b["heatmaps"].shape
    assert (b["heatmaps_stage1"][..., :-1]
            >= b["heatmaps"][..., :-1] - 1e-6).all()


def test_multi_video_x_span_controls_start_spread(model):
    """x_span>0 overrides the horizontal start layout (fair-k4 knob);
    0 keeps the default layout bit-identical (benchmark continuity)."""
    v0 = sh.make_hard_multi_video(model, 4, CFG, seed=2, crossing=True,
                                  num_people=4)
    v0b = sh.make_hard_multi_video(model, 4, CFG, seed=2, crossing=True,
                                   num_people=4, x_span=0.0)
    np.testing.assert_array_equal(v0["images"], v0b["images"])
    vw = sh.make_hard_multi_video(model, 4, CFG, seed=2, crossing=True,
                                  num_people=4, x_span=0.8)
    cx0 = np.sort(v0["centers"][0, :, 0])
    cxw = np.sort(vw["centers"][0, :, 0])
    gap0 = np.diff(cx0).min() / 128.0
    gapw = np.diff(cxw).min() / 128.0
    # Default adjacent spacing 0.56/3 ≈ 0.187; x_span=0.8 → 0.8/3 ≈ 0.267.
    assert abs(gap0 - 0.56 / 3) < 0.02
    assert abs(gapw - 0.8 / 3) < 0.02
    # Mirror-crossing still holds under the override.
    cx = vw["centers"][..., 0]
    assert cx[0, 0] < cx[0, -1] and cx[-1, 0] > cx[-1, -1]
