"""Public-dataset adapter tests (tpu_pose/data/datasets.py).

The real LSP/MPII/H3.6M files are license-gated and absent (SURVEY.md
§0), so — same discipline as tests/test_asset_loaders.py — each test
FABRICATES a file with the dataset's exact on-disk schema (Matlab
struct layouts included) and proves the parser reads it correctly:
joint-order permutations, visibility-flag conventions, head-size
normalizers, and content-level crop mapping (a painted marker must land
where the mapped coordinates say).
"""

import os

import numpy as np
import pytest

from tpu_pose.data import datasets, pipeline


# -- LSP -------------------------------------------------------------------

def _lsp_mat(tmp_path, layout, n=3, seed=0):
    import scipy.io
    rng = np.random.RandomState(seed)
    xy = rng.uniform(10, 90, (n, 14, 2))
    flag = rng.randint(0, 2, (n, 14)).astype(float)
    if layout == "lsp":          # (3, 14, N), flag 1 = occluded
        arr = np.transpose(
            np.concatenate([xy, flag[..., None]], -1), (2, 1, 0))
    else:                        # LSPET (14, 3, N), flag 1 = visible
        arr = np.transpose(
            np.concatenate([xy, flag[..., None]], -1), (1, 2, 0))
    path = str(tmp_path / f"joints_{layout}.mat")
    scipy.io.savemat(path, {"joints": arr})
    return path, xy, flag


def test_lsp_layout_and_flag_inversion(tmp_path):
    """Original LSP (3,14,N): flag 1 means OCCLUDED → conf = 1 − flag.
    LSPET (14,3,N): flag 1 means VISIBLE → conf = flag. Same xy/flags
    through both layouts must produce identical joints and INVERTED
    confidences."""
    p1, xy, flag = _lsp_mat(tmp_path, "lsp")
    p2, _, _ = _lsp_mat(tmp_path, "lspet")
    j1, c1 = datasets.load_lsp(p1)
    j2, c2 = datasets.load_lsp(p2)
    np.testing.assert_allclose(j1, j2, atol=1e-6)
    np.testing.assert_allclose(c1, 1.0 - c2, atol=1e-6)
    perm = datasets.LSP_TO_CPM
    np.testing.assert_allclose(j1, xy[:, perm], atol=1e-5)
    np.testing.assert_allclose(c1, 1.0 - flag[:, perm], atol=1e-6)


def test_lsp_joint_order_semantics(tmp_path):
    """LSP slot 13 is head top and slot 0 is the right ankle; after the
    permutation they must sit at CPM slots 0 (head) and 10 (r_ankle)."""
    p, xy, _ = _lsp_mat(tmp_path, "lsp")
    j, _ = datasets.load_lsp(p)
    np.testing.assert_allclose(j[:, 0], xy[:, 13], atol=1e-5)   # head
    np.testing.assert_allclose(j[:, 10], xy[:, 0], atol=1e-5)   # r_ankle
    np.testing.assert_allclose(j[:, 1], xy[:, 12], atol=1e-5)   # neck


def test_lsp_visibility_override(tmp_path):
    p, _, flag = _lsp_mat(tmp_path, "lsp")
    _, c = datasets.load_lsp(p, visibility="visible_flag")
    np.testing.assert_allclose(c, flag[:, datasets.LSP_TO_CPM])
    with pytest.raises(ValueError, match="visibility"):
        datasets.load_lsp(p, visibility="nope")


def test_lsp_rejects_bad_schema(tmp_path):
    import scipy.io
    bad = str(tmp_path / "bad.mat")
    scipy.io.savemat(bad, {"joints": np.zeros((4, 4, 4))})
    with pytest.raises(ValueError, match="neither"):
        datasets.load_lsp(bad)
    other = str(tmp_path / "other.mat")
    scipy.io.savemat(other, {"stuff": np.zeros(3)})
    with pytest.raises(ValueError, match="joints"):
        datasets.load_lsp(other)


# -- MPII ------------------------------------------------------------------

def _mpii_mat(tmp_path):
    """Fabricate mpii_human_pose_v1_u12_1.mat's RELEASE schema: nested
    struct arrays (annolist → image.name / annorect → objpos, scale,
    head rect x1..y2, annopoints.point → x,y,id,is_visible), img_train
    flags, a test-set image without annotations, and a second person on
    image 0. scipy round-trips dicts as 1x1 structs — the same shape
    squeeze_me collapses in the real file."""
    import scipy.io

    def point(x, y, pid, vis):
        return {"x": float(x), "y": float(y), "id": int(pid),
                "is_visible": (np.array([], dtype=np.uint8)
                               if vis is None else int(vis))}

    def rect(cx, cy, scale, pts, head=(10.0, 20.0, 30.0, 44.0)):
        r = {"objpos": {"x": float(cx), "y": float(cy)},
             "scale": float(scale),
             "annopoints": {"point": np.array([point(*p) for p in pts],
                                              dtype=object)}}
        if head is not None:
            r.update(x1=head[0], y1=head[1], x2=head[2], y2=head[3])
        return r

    # Person A: all 16 MPII ids annotated at x=10·id, y=5·id.
    pts_a = [(10.0 * i, 5.0 * i, i, 1) for i in range(16)]
    # Person B: only 3 joints (r_wrist 10, head_top 9, upper_neck 8),
    # one with the empty-array is_visible MPII uses for "unspecified".
    pts_b = [(200.0, 50.0, 10, 0), (210.0, 20.0, 9, None),
             (212.0, 40.0, 8, 1)]
    anno_train = {
        "image": {"name": "037454012.jpg"},
        "annorect": np.array(
            [rect(80, 90, 2.0, pts_a), rect(205, 40, 1.5, pts_b)],
            dtype=object),
    }
    anno_test = {"image": {"name": "test_img.jpg"}}   # no annorect
    release = {
        "annolist": np.array([anno_train, anno_test], dtype=object),
        "img_train": np.array([1, 0]),
        "single_person": np.array([np.array([1]), np.array([])],
                                  dtype=object),
        "version": "12",
    }
    path = str(tmp_path / "mpii_human_pose_v1_u12_1.mat")
    scipy.io.savemat(path, {"RELEASE": release})
    return path


def test_mpii_parse_people_and_fields(tmp_path):
    path = _mpii_mat(tmp_path)
    recs = datasets.load_mpii(path)
    assert len(recs) == 2                      # two annotated people
    a, b = recs
    assert a["image"] == "037454012.jpg"
    assert a["scale"] == 2.0
    np.testing.assert_allclose(a["center"], [80, 90])
    # MPII id 9 (head_top) → CPM slot 0; id 0 (r_ankle) → CPM slot 10.
    np.testing.assert_allclose(a["joints2d"][0], [90.0, 45.0])
    np.testing.assert_allclose(a["joints2d"][10], [0.0, 0.0])
    assert a["conf"].sum() == 14               # all CPM joints annotated
    # Official PCKh normalizer: 0.6 × head-rect diagonal.
    np.testing.assert_allclose(
        a["headsize"], 0.6 * np.hypot(30 - 10, 44 - 20), rtol=1e-6)


def test_mpii_partial_annotation_and_visibility(tmp_path):
    path = _mpii_mat(tmp_path)
    b = datasets.load_mpii(path)[1]
    # Only head (id 9), neck (id 8), r_wrist (id 10) are annotated.
    assert b["conf"][0] == 1 and b["conf"][1] == 1 and b["conf"][4] == 1
    assert b["conf"].sum() == 3
    np.testing.assert_allclose(b["joints2d"][4], [200.0, 50.0])  # r_wrist
    # Empty-array is_visible (head) defaults to visible; the explicit
    # 0 on r_wrist survives.
    assert b["visible"][0] == 1.0
    assert b["visible"][4] == 0.0


def test_mpii_test_set_skipped_unless_requested(tmp_path):
    path = _mpii_mat(tmp_path)
    # The test image has no annotations at all, so even with
    # train_only=False it yields no person records — but the parser must
    # not crash on its missing annorect.
    assert len(datasets.load_mpii(path, train_only=False)) == 2


# -- COCO ------------------------------------------------------------------

def _coco_json(tmp_path):
    import json
    # Person: nose + both shoulders/elbows/wrists/hips/knees/ankles
    # labeled; left ear unlabeled; right wrist occluded (v=1).
    kp = np.zeros((17, 3), np.float32)
    kp[0] = (50, 20, 2)                       # nose
    for i, (x, y) in zip(range(5, 17), [(60, 40), (40, 40), (65, 60),
                                        (35, 60), (70, 80), (30, 80),
                                        (55, 90), (45, 90), (56, 130),
                                        (44, 130), (57, 170), (43, 170)]):
        kp[i] = (x, y, 2)
    kp[10, 2] = 1                             # r_wrist occluded
    ann = {"id": 7, "image_id": 3, "category_id": 1,
           "num_keypoints": int((kp[:, 2] > 0).sum()),
           "keypoints": [float(v) for v in kp.ravel()],
           "bbox": [25.0, 10.0, 50.0, 170.0]}
    crowd = {"id": 8, "image_id": 3, "category_id": 1,
             "num_keypoints": 0, "keypoints": [0.0] * 51,
             "bbox": [0, 0, 10, 10]}
    notperson = {"id": 9, "image_id": 3, "category_id": 2,
                 "num_keypoints": 5, "keypoints": [1.0] * 51,
                 "bbox": [0, 0, 10, 10]}
    data = {"images": [{"id": 3, "file_name": "000000000003.jpg",
                        "width": 120, "height": 200}],
            "annotations": [ann, crowd, notperson],
            "categories": [{"id": 1, "name": "person"}]}
    path = str(tmp_path / "person_keypoints_val.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path, kp


def test_coco_parse_and_synthesized_joints(tmp_path):
    path, kp = _coco_json(tmp_path)
    recs = datasets.load_coco(path)
    assert len(recs) == 1              # crowd + non-person skipped
    r = recs[0]
    assert r["image"] == "000000000003.jpg"
    # neck = shoulder midpoint of COCO 5/6; head = nose.
    np.testing.assert_allclose(r["joints2d"][1], [50, 40])
    np.testing.assert_allclose(r["joints2d"][0], [50, 20])
    # r_shoulder (CPM 2) = COCO 6 (RIGHT shoulder, x=40).
    np.testing.assert_allclose(r["joints2d"][2], [40, 40])
    np.testing.assert_allclose(r["joints2d"][5], [60, 40])
    # occluded r_wrist (COCO 10 → CPM 4): labeled but not visible.
    assert r["conf"][4] == 1.0 and r["visible"][4] == 0.0
    assert r["conf"].sum() == 14
    np.testing.assert_allclose(r["center"], [50, 95])
    np.testing.assert_allclose(r["scale"], 170.0 / 200.0)
    np.testing.assert_allclose(r["headsize"], 20.0)   # nose→neck
    with pytest.raises(ValueError, match="COCO"):
        import json
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"foo": 1}))
        datasets.load_coco(str(bad))


def test_coco_to_shards_roundtrip(tmp_path):
    from PIL import Image
    path, _ = _coco_json(tmp_path)
    d = tmp_path / "coco_images"
    d.mkdir()
    Image.fromarray(np.zeros((200, 120, 3), np.uint8)).save(
        d / "000000000003.jpg")
    out = str(tmp_path / "coco_shards")
    datasets.coco_to_shards(path, str(d), out, out_size=64)
    src = pipeline.NpzShardSource(out)
    assert len(src) == 1
    rec = src[0]
    # crop side = 1.25·170 = 212.5 → 212 px at center (50, 95).
    zoom = 64 / 212.0
    exp = datasets.crop_point_map(
        np.array([50.0, 20.0]), np.array([50, 95]) - 106, zoom)
    np.testing.assert_allclose(rec["gt_joints2d"][0], exp, atol=0.25)
    np.testing.assert_allclose(rec["headsize"], 20.0 * zoom, rtol=1e-4)


# -- Human3.6M -------------------------------------------------------------

def test_h36m_npz_32_to_17(tmp_path):
    rng = np.random.RandomState(0)
    pos32 = rng.randn(5, 32, 3).astype(np.float32)
    pos17 = rng.randn(4, 17, 3).astype(np.float32)
    path = str(tmp_path / "data_3d_h36m.npz")
    np.savez_compressed(
        path, positions_3d=np.array(
            {"S1": {"Walking": pos32}, "S9": {"Sitting": pos17}},
            dtype=object))
    out = datasets.load_h36m_3d_npz(path)
    assert out["S1"]["Walking"].shape == (5, 17, 3)
    np.testing.assert_allclose(
        out["S1"]["Walking"], pos32[:, datasets.H36M_32_TO_17])
    np.testing.assert_allclose(out["S9"]["Sitting"], pos17)


def test_h36m_npz_rejects_wrong_schema(tmp_path):
    path = str(tmp_path / "bad.npz")
    np.savez(path, other=np.zeros(3))
    with pytest.raises(ValueError, match="positions_3d"):
        datasets.load_h36m_3d_npz(path)


# -- cropping --------------------------------------------------------------

def test_crop_person_content_mapping(tmp_path):
    """Content-level check (same discipline as test_letterbox): paint a
    4×4 marker at a known source pixel, crop, and assert the marker's
    centroid lands at the affine-mapped coordinate within a pixel."""
    img = np.zeros((120, 160, 3), np.uint8)
    # marker occupies index rows 68..71 / cols 98..101 → its centroid in
    # index space (pixel centers at integers) is (99.5, 69.5).
    src_idx = np.array([99.5, 69.5])
    img[68:72, 98:102] = 255
    crop, origin, zoom = datasets.crop_person(img, (90, 60), 64.0, 128)
    mapped = datasets.crop_point_map(src_idx, origin, zoom)
    ys, xs = np.nonzero(crop[..., 0] > 127)
    centroid = np.array([xs.mean(), ys.mean()])
    # crop_point_map carries PIL's half-pixel resize term (0.5·zoom−0.5,
    # here +0.5 at zoom 2): the raw (p−origin)·zoom map misses by it.
    np.testing.assert_allclose(centroid, mapped, atol=0.6)
    assert crop.shape == (128, 128, 3)


def test_crop_person_pads_outside(tmp_path):
    img = np.full((50, 50, 3), 200, np.uint8)
    crop, origin, zoom = datasets.crop_person(img, (0, 0), 40.0, 40)
    assert zoom == 1.0
    # Top-left quadrant of the crop window is outside the image → zeros.
    assert crop[:19, :19].max() == 0
    assert crop[25:, 25:].min() == 200


# -- shard conversion end-to-end ------------------------------------------

def _write_lsp_images(tmp_path, joints, size=(110, 130)):
    from PIL import Image
    d = tmp_path / "images"
    d.mkdir()
    for i in range(len(joints)):
        img = np.zeros(size + (3,), np.uint8)
        img[:] = (i * 20 % 255, 30, 60)
        Image.fromarray(img).save(d / f"im{i + 1:04d}.jpg")
    return str(d)


def test_lsp_to_shards_roundtrip(tmp_path):
    mat, xy, _ = _lsp_mat(tmp_path, "lsp", n=3)
    images_dir = _write_lsp_images(tmp_path, xy)
    out = str(tmp_path / "shards")
    paths = datasets.lsp_to_shards(mat, images_dir, out, out_size=64,
                                   shard_size=2)
    assert len(paths) == 2                      # 3 samples, shard_size 2
    src = pipeline.NpzShardSource(out)
    assert len(src) == 3
    rec = src[0]
    assert rec["images"].shape == (64, 64, 3)
    assert rec["gt_joints2d"].shape == (14, 2)
    assert rec["conf"].shape == (14,)
    # Joints must land inside the crop (the crop box covers their bbox).
    assert (rec["gt_joints2d"] >= -1).all()
    assert (rec["gt_joints2d"] <= 65).all()
    # headsize = head–neck distance in crop pixels, > 0.
    assert rec["headsize"] > 0


def test_mpii_to_shards_roundtrip(tmp_path):
    from PIL import Image
    mat = _mpii_mat(tmp_path)
    d = tmp_path / "mpii_images"
    d.mkdir()
    img = np.zeros((300, 400, 3), np.uint8)
    img[:] = (10, 120, 40)
    Image.fromarray(img).save(d / "037454012.jpg")
    out = str(tmp_path / "mpii_shards")
    datasets.mpii_to_shards(mat, str(d), out, out_size=64)
    src = pipeline.NpzShardSource(out)
    assert len(src) == 2                        # both annotated people
    rec = src[0]
    # Person A: crop side = 1.25·scale·200 = 500 px at (80, 90); zoom =
    # 64/500. head_top source (90, 45) → crop frame:
    zoom = 64 / 500.0
    exp = datasets.crop_point_map(
        np.array([90.0, 45.0]), np.array([80, 90]) - 250, zoom)
    np.testing.assert_allclose(rec["gt_joints2d"][0], exp, atol=0.25)
    np.testing.assert_allclose(
        rec["headsize"], 0.6 * np.hypot(20, 24) * zoom, rtol=1e-4)


def test_sequences_to_shards_alignment_check(tmp_path):
    with pytest.raises(ValueError, match="align"):
        datasets.sequences_to_shards(
            np.zeros((3, 8, 8, 3), np.uint8), np.zeros((2, 17, 3)),
            str(tmp_path / "x"))


# -- PCKh protocol extensions (headsize / mask) ---------------------------

def test_pckh_with_headsize_and_mask():
    from tpu_pose.utils import metrics
    gt = np.zeros((2, 14, 2))
    pred = gt.copy()
    pred[:, 0, 0] = 10.0            # head joint off by 10 px
    hs = np.array([30.0, 10.0])     # thresh·hs = 15 / 5 px
    out = metrics.pckh_np(pred, gt, threshold=0.5, headsize=hs)
    np.testing.assert_allclose(out, [1.0, 13.0 / 14.0])
    # Masking out the head joint removes the miss entirely.
    mask = np.ones((2, 14)); mask[:, 0] = 0
    out_m = metrics.pckh_np(pred, gt, threshold=0.5, headsize=hs,
                            mask=mask)
    np.testing.assert_allclose(out_m, [1.0, 1.0])
    # jnp twin agrees.
    import jax.numpy as jnp
    out_j = metrics.pckh(jnp.asarray(pred), jnp.asarray(gt),
                         threshold=0.5, headsize=jnp.asarray(hs),
                         mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_j), out_m, atol=1e-6)


# -- 2D streaming eval over converted shards ------------------------------

def test_evaluate_pckh_streaming(tmp_path):
    """End-to-end: LSP-style shards → evaluate_pckh with a synthetic
    estimator; PCKh is finite, per-joint table covers the 14 names, and
    the cursor resume skips accumulated batches."""
    from tpu_pose.api import PoseEstimator
    from tpu_pose.parallel import eval as eval_lib
    from tpu_pose.utils.config import CPMConfig

    mat, xy, _ = _lsp_mat(tmp_path, "lsp", n=4)
    images_dir = _write_lsp_images(tmp_path, xy)
    out = str(tmp_path / "shards")
    datasets.lsp_to_shards(mat, images_dir, out, out_size=64,
                           shard_size=4)
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=CPMConfig(input_size=64, features=8,
                                  stage1_head_width=16, refine_width=8,
                                  num_stages=2))

    def batches():
        src = pipeline.NpzShardSource(out)
        for start in (0, 2):
            idx = range(start, start + 2)
            yield {k: np.stack([src[i][k] for i in idx])
                   for k in ("images", "gt_joints2d", "conf", "headsize")}

    ckpt = str(tmp_path / "cursor.json")
    res = eval_lib.evaluate_pckh(est, batches(), checkpoint_path=ckpt,
                                 save_every=1)
    assert res["num_frames"] == 4
    assert 0.0 <= res["pckh"] <= 1.0
    assert set(res["per_joint"]) == set(
        __import__("tpu_pose.models.joints",
                   fromlist=["CPM_JOINT_NAMES"]).CPM_JOINT_NAMES)
    # Resume: state says all 4 accumulated; a rerun adds nothing.
    res2 = eval_lib.evaluate_pckh(est, batches(), checkpoint_path=ckpt)
    assert res2["num_frames"] == 4
    np.testing.assert_allclose(res2["pckh"], res["pckh"])

    # Sharded over the 8-fake-device mesh (uneven batch of 2 → padded to
    # 8, sliced back) == single-device.
    from tpu_pose.parallel import mesh as mesh_lib
    res_mesh = eval_lib.evaluate_pckh(est, batches(),
                                      mesh=mesh_lib.make_mesh())
    assert res_mesh["num_frames"] == 4
    np.testing.assert_allclose(res_mesh["pckh"], res["pckh"], atol=1e-5)


def test_mpii_single_rect_single_point_squeeze(tmp_path):
    """squeeze_me collapses 1-element struct arrays to scalars — the
    classic MPII parsing trap: one annorect with one annotated point
    must still parse (np.atleast_1d at both levels)."""
    import scipy.io
    anno = {
        "image": {"name": "solo.jpg"},
        "annorect": {
            "objpos": {"x": 30.0, "y": 40.0}, "scale": 1.0,
            "x1": 0.0, "y1": 0.0, "x2": 10.0, "y2": 10.0,
            "annopoints": {"point": {"x": 33.0, "y": 44.0, "id": 9,
                                     "is_visible": 1}},
        },
    }
    release = {"annolist": np.array([anno], dtype=object),
               "img_train": np.array([1]),
               "single_person": np.array([np.array([1])], dtype=object)}
    path = str(tmp_path / "solo.mat")
    scipy.io.savemat(path, {"RELEASE": release})
    recs = datasets.load_mpii(path)
    assert len(recs) == 1
    r = recs[0]
    np.testing.assert_allclose(r["joints2d"][0], [33.0, 44.0])  # head
    assert r["conf"].sum() == 1
    np.testing.assert_allclose(r["headsize"],
                               0.6 * np.hypot(10, 10), rtol=1e-6)


def test_coco_skips_unmappable_only_annotation(tmp_path):
    """Review finding: a bbox-less annotation whose only labeled
    keypoints have no CPM mapping (eyes/ears) must be skipped, not crash
    the conversion."""
    import json
    kp = np.zeros((17, 3), np.float32)
    kp[1] = (10, 10, 2)   # l_eye
    kp[4] = (12, 10, 2)   # r_ear
    ann = {"id": 1, "image_id": 1, "category_id": 1,
           "num_keypoints": 2,
           "keypoints": [float(v) for v in kp.ravel()]}
    data = {"images": [{"id": 1, "file_name": "a.jpg"}],
            "annotations": [ann]}
    path = str(tmp_path / "eyes_only.json")
    with open(path, "w") as f:
        json.dump(data, f)
    assert datasets.load_coco(path) == []


def test_evaluate_pck_torso_norm(tmp_path):
    """LSP protocol: norm='torso' normalizes by the l_shoulder-r_hip
    diameter; a checkpoint written under one protocol does not resume
    under the other."""
    from tpu_pose.parallel import eval as eval_lib

    class FakeEst:
        def estimate_2d(self, images):
            b = images.shape[0]
            pred = np.tile(gt_row[None], (b, 1, 1)).astype(np.float32)
            pred[:, 3, 0] += 12.0      # one joint off by 12 px
            return None, pred, np.ones((b, 14), np.float32)

    gt_row = np.zeros((14, 2), np.float32)
    gt_row[0] = (0, 0)                 # head
    gt_row[1] = (0, 10)                # neck → head segment 10 px
    gt_row[5] = (0, 30)                # l_shoulder
    gt_row[8] = (40, 60)               # r_hip → torso 50 px
    batch = {"images": np.zeros((2, 8, 8, 3), np.uint8),
             "gt_joints2d": np.tile(gt_row[None], (2, 1, 1))}
    # head norm @0.5: thresh 5 px < 12 → miss (13/14); torso norm
    # @0.5: thresh 25 px > 12 → all hit.
    out_h = eval_lib.evaluate_pckh(FakeEst(), iter([batch]),
                                   threshold=0.5, norm="head")
    out_t = eval_lib.evaluate_pckh(FakeEst(), iter([batch]),
                                   threshold=0.5, norm="torso")
    np.testing.assert_allclose(out_h["pckh"], 13.0 / 14.0)
    np.testing.assert_allclose(out_t["pckh"], 1.0)
    with pytest.raises(ValueError, match="norm"):
        eval_lib.evaluate_pckh(FakeEst(), iter([batch]), norm="nope")
    # Protocol-change resume guard: a head-norm checkpoint restarts
    # fresh under torso (not mixed).
    ckpt = str(tmp_path / "c.json")
    eval_lib.evaluate_pckh(FakeEst(), iter([batch]), norm="head",
                           checkpoint_path=ckpt)
    out = eval_lib.evaluate_pckh(FakeEst(), iter([batch]), norm="torso",
                                 checkpoint_path=ckpt)
    assert out["num_frames"] == 2          # re-accumulated, not skipped
    np.testing.assert_allclose(out["pckh"], 1.0)


def test_coco_area_through_crop_affine(tmp_path):
    """The COCO annotation's OKS area rides into the shards scaled by
    the crop Jacobian (zoom²); without an 'area' field the bbox stand-in
    0.53·w·h is used. LSP/MPII shards carry NO area key."""
    from PIL import Image
    path, _ = _coco_json(tmp_path)
    recs = datasets.load_coco(path)
    # Fixture annotation has no segmentation area → 0.53·50·170 bbox
    # stand-in (documented fallback).
    np.testing.assert_allclose(recs[0]["area"], 0.53 * 50 * 170,
                               rtol=1e-6)
    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(np.zeros((200, 120, 3), np.uint8)).save(
        d / "000000000003.jpg")
    out = str(tmp_path / "shards_area")
    datasets.coco_to_shards(path, str(d), out, out_size=64)
    rec = pipeline.NpzShardSource(out)[0]
    zoom = 64 / 212.0
    np.testing.assert_allclose(rec["area"],
                               0.53 * 50 * 170 * zoom * zoom, rtol=1e-4)

    # Explicit segmentation area wins over the bbox stand-in.
    import json
    with open(path) as f:
        data = json.load(f)
    data["annotations"][0]["area"] = 1234.5
    path2 = str(tmp_path / "with_area.json")
    with open(path2, "w") as f:
        json.dump(data, f)
    np.testing.assert_allclose(datasets.load_coco(path2)[0]["area"],
                               1234.5)


def test_evaluate_oks_streaming(tmp_path):
    """OKS protocol end-to-end over shards: finite mean OKS, the AP
    ladder is monotone (ap50 ≥ ap ≥ ap95), cursor resume is a no-op on
    a finished eval, and the 8-fake-device mesh matches single-device."""
    from tpu_pose.api import PoseEstimator
    from tpu_pose.parallel import eval as eval_lib
    from tpu_pose.utils.config import CPMConfig

    mat, xy, _ = _lsp_mat(tmp_path, "lsp_oks", n=4)
    images_dir = _write_lsp_images(tmp_path, xy)
    out = str(tmp_path / "shards_oks")
    datasets.lsp_to_shards(mat, images_dir, out, out_size=64,
                           shard_size=4)
    est = PoseEstimator.create_synthetic(
        seed=0, cpm_cfg=CPMConfig(input_size=64, features=8,
                                  stage1_head_width=16, refine_width=8,
                                  num_stages=2))

    def batches():
        src = pipeline.NpzShardSource(out)
        for start in (0, 2):
            idx = range(start, start + 2)
            yield {k: np.stack([src[i][k] for i in idx])
                   for k in ("images", "gt_joints2d", "conf")}

    ckpt = str(tmp_path / "oks_cursor.json")
    res = eval_lib.evaluate_oks(est, batches(), checkpoint_path=ckpt,
                                save_every=1)
    assert res["num_frames"] == 4
    assert 0.0 <= res["mean_oks"] <= 1.0
    assert res["ap50"] >= res["ap"] >= res["per_threshold"][0.95]
    assert set(res["per_threshold"]) == set(eval_lib.OKS_THRESHOLDS)
    res2 = eval_lib.evaluate_oks(est, batches(), checkpoint_path=ckpt)
    assert res2["num_frames"] == 4
    np.testing.assert_allclose(res2["mean_oks"], res["mean_oks"])

    from tpu_pose.parallel import mesh as mesh_lib
    res_mesh = eval_lib.evaluate_oks(est, batches(),
                                     mesh=mesh_lib.make_mesh())
    assert res_mesh["num_frames"] == 4
    np.testing.assert_allclose(res_mesh["mean_oks"], res["mean_oks"],
                               atol=1e-5)

    # A perfect decode scores OKS 1 / AP 1: feed the GT joints straight
    # through a stub estimator.
    class _Perfect:
        def estimate_2d(self, images):
            b = batches_list[_Perfect.i]
            _Perfect.i += 1
            return (None, b["gt_joints2d"], np.ones(
                b["gt_joints2d"].shape[:2], np.float32))
        i = 0
    batches_list = list(batches())
    res_p = eval_lib.evaluate_oks(_Perfect(), iter(batches_list))
    assert res_p["mean_oks"] == 1.0 and res_p["ap"] == 1.0


def test_evaluate_pck_torso_norm_requires_endpoint_joints(tmp_path):
    """Samples whose torso-normalizer endpoints (l_shoulder CPM 5 /
    r_hip CPM 8) are unannotated are EXCLUDED under norm='torso' — an
    unlabeled endpoint sits at the loader's (0, 0) sentinel and would
    produce a garbage diameter. Head norm still scores them."""
    from tpu_pose.parallel import eval as eval_lib

    gt_row = np.zeros((14, 2), np.float32)
    gt_row[0] = (0, 0)
    gt_row[1] = (0, 10)
    gt_row[5] = (0, 30)
    gt_row[8] = (40, 60)
    gt = np.tile(gt_row[None], (3, 1, 1))
    conf = np.ones((3, 14), np.float32)
    conf[1, 8] = 0.0                    # sample 1: r_hip unlabeled
    conf[2, 5] = 0.0                    # sample 2: l_shoulder unlabeled

    class FakeEst:
        def estimate_2d(self, images):
            pred = gt.copy()
            pred[:, 3, 0] += 12.0       # inside torso thresh, outside head
            return None, pred, np.ones((3, 14), np.float32)

    batch = {"images": np.zeros((3, 8, 8, 3), np.uint8),
             "gt_joints2d": gt, "conf": conf}
    out_t = eval_lib.evaluate_pckh(FakeEst(), iter([batch]),
                                   threshold=0.5, norm="torso")
    assert out_t["num_frames"] == 1      # only the fully-normalizable one
    np.testing.assert_allclose(out_t["pckh"], 1.0)
    out_h = eval_lib.evaluate_pckh(FakeEst(), iter([batch]),
                                   threshold=0.5, norm="head")
    assert out_h["num_frames"] == 3      # head norm keeps all samples


def test_coco_to_cpm_detector_conversion():
    """joints.coco_to_cpm: direct slots map per the shared
    correspondence table, neck = shoulder midpoint with min-conf,
    head = nose; numpy and jnp agree; batched shapes pass through."""
    import jax.numpy as jnp

    from tpu_pose.models import joints as joints_lib

    rng = np.random.RandomState(11)
    j17 = rng.rand(2, 3, 17, 2).astype(np.float32) * 100
    c17 = rng.rand(2, 3, 17).astype(np.float32)
    j, c = joints_lib.coco_to_cpm(j17, c17)
    assert j.shape == (2, 3, 14, 2) and c.shape == (2, 3, 14)
    for cpm_i, coco_i in joints_lib.COCO_TO_CPM_DIRECT.items():
        np.testing.assert_allclose(j[..., cpm_i, :], j17[..., coco_i, :])
        np.testing.assert_allclose(c[..., cpm_i], c17[..., coco_i])
    np.testing.assert_allclose(
        j[..., 1, :], (j17[..., 5, :] + j17[..., 6, :]) / 2.0)
    np.testing.assert_allclose(
        c[..., 1], np.minimum(c17[..., 5], c17[..., 6]))
    np.testing.assert_allclose(j[..., 0, :], j17[..., 0, :])  # head=nose

    jj, jc = joints_lib.coco_to_cpm(jnp.asarray(j17), jnp.asarray(c17))
    np.testing.assert_allclose(np.asarray(jj), j, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jc), c, atol=1e-6)

    with pytest.raises(ValueError, match="17"):
        joints_lib.coco_to_cpm(j17[..., :16, :], c17[..., :16])

    # The annotation adapter and the detector converter share the same
    # correspondence: fully-visible fixture keypoints agree on every
    # direct slot.
    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = np.arange(17) * 3.0
    kp[:, 1] = np.arange(17) * 5.0
    kp[:, 2] = 2.0
    jd, _ = joints_lib.coco_to_cpm(kp[None, :, :2], kp[None, :, 2])
    # load_coco path on the same keypoints
    rec_j = np.zeros((14, 2), np.float32)
    for cpm_i, coco_i in joints_lib.COCO_TO_CPM_DIRECT.items():
        rec_j[cpm_i] = kp[coco_i, :2]
    np.testing.assert_allclose(jd[0, 2:], rec_j[2:])


def test_client_coco_twin_matches_joints_module():
    """PoseClient.coco_to_cpm (numpy, jax-free client hosts) stays
    equivalent to models.joints.coco_to_cpm — the drift guard for the
    duplicated correspondence."""
    from tpu_pose.client import PoseClient
    from tpu_pose.models import joints as joints_lib

    rng = np.random.RandomState(12)
    j17 = rng.rand(4, 17, 2).astype(np.float32) * 64
    c17 = rng.rand(4, 17).astype(np.float32)
    j_a, c_a = joints_lib.coco_to_cpm(j17, c17)
    j_b, c_b = PoseClient.coco_to_cpm(j17, c17)
    np.testing.assert_allclose(j_a, j_b)
    np.testing.assert_allclose(c_a, c_b)


def test_evaluate_pckh_curve_and_auc(tmp_path):
    """The PCK curve is monotone nondecreasing in the threshold, its
    last point equals the headline @threshold figure exactly, and the
    AUC is their mean."""
    from tpu_pose.parallel import eval as eval_lib

    gt_row = np.zeros((14, 2), np.float32)
    gt_row[0] = (0, 0)
    gt_row[1] = (0, 10)                 # head segment 10 px
    gt = np.tile(gt_row[None], (2, 1, 1))

    class FakeEst:
        def estimate_2d(self, images):
            pred = gt.copy()
            pred[:, 3, 0] += 3.0        # inside @0.5 (5 px), outside @0.25
            return None, pred, np.ones((2, 14), np.float32)

    batch = {"images": np.zeros((2, 8, 8, 3), np.uint8),
             "gt_joints2d": gt}
    out = eval_lib.evaluate_pckh(FakeEst(), iter([batch]), threshold=0.5)
    vals = [out["per_threshold"][k]
            for k in sorted(out["per_threshold"])]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    np.testing.assert_allclose(vals[-1], out["pckh"])
    np.testing.assert_allclose(out["auc"], np.mean(vals))
    # 3 px displaced joint: hits at t·10 ≥ 3 → thresholds 0.3..0.5 score
    # 14/14, below score 13/14.
    np.testing.assert_allclose(out["per_threshold"][0.3], 1.0)
    np.testing.assert_allclose(out["per_threshold"][0.25], 13.0 / 14.0)


# -- 3DPW ------------------------------------------------------------------

def _fabricate_3dpw(tmp_path, t_total=4, n_actors=2, seed=3):
    """Fabricate one sequenceFiles pkl with the official schema: world
    SMPL poses/joints, (T,4,4) world->camera extrinsics, (3,3) K, and
    the matching imageFiles/<seq>/image_%05d.jpg directory."""
    import pickle
    from PIL import Image
    from scipy.spatial.transform import Rotation
    rng = np.random.RandomState(seed)
    k_mat = np.array([[500.0, 0, 80.0], [0, 500.0, 60.0], [0, 0, 1.0]])
    cam_poses = np.zeros((t_total, 4, 4))
    for t in range(t_total):
        r = Rotation.from_rotvec(rng.randn(3) * 0.1).as_matrix()
        cam_poses[t, :3, :3] = r
        cam_poses[t, :3, 3] = [0.05 * t, -0.02 * t, 0.1]
        cam_poses[t, 3, 3] = 1.0
    seq = {
        "sequence": "fab_seq", "cam_intrinsics": k_mat,
        "cam_poses": cam_poses,
        "img_frame_ids": np.arange(t_total),
        "genders": ["m"] * n_actors,
        "poses": [], "betas": [], "trans": [], "jointPositions": [],
        "campose_valid": [],
    }
    for a in range(n_actors):
        seq["poses"].append(rng.randn(t_total, 72) * 0.2)
        seq["betas"].append(rng.randn(12))        # SMPL-1.1-style >10
        seq["trans"].append(rng.randn(t_total, 3) * 0.1)
        # World joints in front of every fabricated camera: z ~ 4 m.
        jp = rng.randn(t_total, 24, 3) * 0.3
        jp[..., 2] += 4.0
        jp[..., 0] += a * 1.0
        seq["jointPositions"].append(jp.reshape(t_total, 72))
        valid = np.ones(t_total)
        if a == 1:
            valid[0] = 0                          # one invalid frame
        seq["campose_valid"].append(valid)
    pkl = tmp_path / "fab_seq.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(seq, f, protocol=2)           # py2-era protocol
    img_dir = tmp_path / "imageFiles" / "fab_seq"
    img_dir.mkdir(parents=True)
    for t in range(t_total):
        img = np.zeros((120, 160, 3), np.uint8)
        img[:] = (t * 30 % 255, 40, 70)
        Image.fromarray(img).save(img_dir / f"image_{t:05d}.jpg")
    return str(pkl), str(img_dir), seq


def test_3dpw_load_schema(tmp_path):
    pkl, _, raw = _fabricate_3dpw(tmp_path)
    seq = datasets.load_3dpw(pkl)
    assert seq["sequence"] == "fab_seq"
    assert seq["cam_poses"].shape == (4, 4, 4)
    assert seq["cam_intrinsics"].shape == (3, 3)
    assert len(seq["actors"]) == 2
    a0 = seq["actors"][0]
    assert a0["poses"].shape == (4, 72)
    assert a0["betas"].shape == (10,)             # 12 trimmed to 10
    assert a0["joint_positions"].shape == (4, 24, 3)
    assert a0["valid"].all()
    assert not seq["actors"][1]["valid"][0]
    np.testing.assert_allclose(
        a0["joint_positions"],
        np.asarray(raw["jointPositions"][0]).reshape(4, 24, 3))


def test_3dpw_load_rejects_bad_schema(tmp_path):
    import pickle
    bad = tmp_path / "bad.pkl"
    with open(bad, "wb") as f:
        pickle.dump({"poses": [], "betas": []}, f)
    with pytest.raises(ValueError, match="3DPW"):
        datasets.load_3dpw(str(bad))


def test_3dpw_to_shards_camera_frame_and_theta(tmp_path):
    """The shards carry camera-frame GT: joints3d = R·j_world + t, the
    global orient composed with the camera rotation, 2D joints =
    K-projection mapped through the crop affine, and the SMPL params
    that switch on the evaluator's PVE protocol."""
    from scipy.spatial.transform import Rotation
    from tpu_pose.models.joints import CPM_TO_SMPL
    pkl, img_dir, raw = _fabricate_3dpw(tmp_path)
    out = str(tmp_path / "shards")
    datasets.threedpw_to_shards(pkl, img_dir, out, out_size=64,
                                shard_size=16)
    src = pipeline.NpzShardSource(out)
    assert len(src) == 4 + 3                      # actor1 frame0 invalid
    rec = src[0]                                  # actor 0, frame 0
    assert rec["images"].shape == (64, 64, 3)
    assert rec["gt_theta"].shape == (72,)
    assert rec["gt_beta"].shape == (10,)
    rot = raw["cam_poses"][0, :3, :3]
    tvec = raw["cam_poses"][0, :3, 3]
    j_world = np.asarray(raw["jointPositions"][0]).reshape(4, 24, 3)[0]
    j_cam = j_world @ rot.T + tvec
    np.testing.assert_allclose(rec["gt_joints3d"], j_cam, atol=1e-5)
    # Global orient: R(theta_out[:3]) == R_cam · R(theta_in[:3]); body
    # joints pass through untouched.
    th_in = np.asarray(raw["poses"][0])[0]
    np.testing.assert_allclose(
        Rotation.from_rotvec(rec["gt_theta"][:3]).as_matrix(),
        rot @ Rotation.from_rotvec(th_in[:3]).as_matrix(), atol=1e-5)
    np.testing.assert_allclose(rec["gt_theta"][3:], th_in[3:], atol=1e-6)
    # 2D GT: K-projection of the 14 CPM-mapped joints through the crop
    # affine (the shard loses origin/zoom, so recompute the crop).
    uvw = j_cam @ raw["cam_intrinsics"].T
    px14 = (uvw[:, :2] / uvw[:, 2:3])[np.asarray(CPM_TO_SMPL)]
    lo, hi = px14.min(0), px14.max(0)
    side = float(max(hi[0] - lo[0], hi[1] - lo[1], 8.0)) * 1.3
    img = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            os.path.join(img_dir, "image_00000.jpg")))
    _, origin, zoom = datasets.crop_person(img, (lo + hi) / 2.0, side, 64)
    np.testing.assert_allclose(
        rec["gt_joints2d"],
        datasets.crop_point_map(px14, origin, zoom), atol=1e-4)
    assert rec["conf"].shape == (14,) and (rec["conf"] == 1).all()
    # Effective focal maps through the crop zoom (fx = 500 in the
    # fixture's K): f_crop = fx · zoom.
    np.testing.assert_allclose(rec["focal_px"],
                               raw["cam_intrinsics"][0, 0] * zoom,
                               rtol=1e-5)


def test_3dpw_gender_codes_and_filter(tmp_path):
    pkl, img_dir, _ = _fabricate_3dpw(tmp_path)
    out_all = str(tmp_path / "all")
    datasets.threedpw_to_shards(pkl, img_dir, out_all, out_size=64)
    src = pipeline.NpzShardSource(out_all)
    assert all(src[i]["gt_gender"] == 1 for i in range(len(src)))  # 'm'
    # Filter: no 'f' actors in the fixture → empty conversion errors.
    with pytest.raises(ValueError, match="no valid"):
        datasets.threedpw_to_shards(pkl, img_dir,
                                    str(tmp_path / "f"), out_size=64,
                                    gender="f")
    out_m = str(tmp_path / "m")
    datasets.threedpw_to_shards(pkl, img_dir, out_m, out_size=64,
                                gender="m")
    assert len(pipeline.NpzShardSource(out_m)) == len(src)


def test_mpii_to_cpm_detector_conversion_and_twins():
    """models.joints.mpii_to_cpm is the pure MPII16_TO_CPM permutation;
    the dataset adapter's table and the jax-free PoseClient twin stay
    equivalent to it (drift guards for the duplicated correspondence);
    jnp input round-trips through the jax path."""
    import jax.numpy as jnp
    from tpu_pose.client import PoseClient
    from tpu_pose.data import datasets as ds
    from tpu_pose.models import joints as joints_lib

    np.testing.assert_array_equal(joints_lib.MPII16_TO_CPM,
                                  ds.MPII_TO_CPM)
    rng = np.random.RandomState(21)
    j16 = rng.rand(3, 16, 2).astype(np.float32) * 64
    c16 = rng.rand(3, 16).astype(np.float32)
    j_a, c_a = joints_lib.mpii_to_cpm(j16, c16)
    j_b, c_b = PoseClient.mpii_to_cpm(j16, c16)
    np.testing.assert_allclose(j_a, j_b)
    np.testing.assert_allclose(c_a, c_b)
    j_c, c_c = joints_lib.mpii_to_cpm(jnp.asarray(j16), jnp.asarray(c16))
    np.testing.assert_allclose(np.asarray(j_c), j_a, atol=1e-6)
    # Semantic spot checks: CPM 0 = MPII head-top 9, CPM 10 = r_ankle 0.
    np.testing.assert_allclose(j_a[:, 0], j16[:, 9])
    np.testing.assert_allclose(j_a[:, 10], j16[:, 0])
    with np.testing.assert_raises(ValueError):
        joints_lib.mpii_to_cpm(j16[:, :15], c16[:, :15])
