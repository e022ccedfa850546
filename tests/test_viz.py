"""Visualization/export helpers (SURVEY.md §2 row 13)."""

import os

import numpy as np

from tpu_pose.utils import viz


def test_draw_skeleton_marks_joints():
    img = np.zeros((64, 64, 3), np.uint8)
    joints = np.array([[10, 10], [20, 20]] + [[30, 30]] * 12, np.float32)
    out = viz.draw_skeleton(img, joints)
    assert out[10, 10].tolist() == [255, 0, 0]   # joint marker
    assert out.shape == img.shape
    assert img.sum() == 0                        # input untouched


def test_draw_skeleton_respects_confidence():
    img = np.zeros((64, 64, 3), np.uint8)
    joints = np.full((14, 2), 32, np.float32)
    conf = np.zeros(14)
    out = viz.draw_skeleton(img, joints, conf)
    assert out.sum() == 0                        # nothing above threshold


def test_export_obj_roundtrip(tmp_path):
    path = str(tmp_path / "m.obj")
    verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    faces = np.array([[0, 1, 2]])
    viz.export_obj(path, verts, faces)
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"


def test_project_vertices_weak_perspective():
    # s=1, t=0: origin → image center.
    pts = viz.project_vertices_weak_perspective(
        np.zeros((1, 3)), np.array([1.0, 0.0, 0.0]), img_size=368)
    np.testing.assert_allclose(pts[0], [184.0, 184.0])
    # (1,0,z) with s=0.5 → +0.5 normalized = 3/4 across.
    pts = viz.project_vertices_weak_perspective(
        np.array([[1.0, 0.0, 5.0]]), np.array([0.5, 0.0, 0.0]), 368)
    np.testing.assert_allclose(pts[0], [276.0, 184.0])


def test_mesh_overlay_blends_pixels(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    verts = np.random.RandomState(0).randn(100, 3) * 0.3
    path = str(tmp_path / "overlay.png")
    viz.save_mesh_overlay(path, img, verts, np.array([1.0, 0.0, 0.0]), 64)
    assert os.path.exists(path) or os.path.exists(path + ".npy")


def test_rasterize_mesh_hidden_surface():
    """Z-buffer correctness (VERDICT r1 item 7): where two triangles
    overlap, the CLOSER one (smaller depth) owns the pixels."""
    img = np.zeros((32, 32, 3), np.uint8)
    # Two large triangles covering the same center region.
    verts = np.array([
        [2.0, 2.0], [30.0, 2.0], [2.0, 30.0],      # tri A (near, z=1)
        [30.0, 30.0], [2.0, 30.0], [30.0, 2.0],    # tri B (far, z=5)
    ])
    depth = np.array([1.0, 1.0, 1.0, 5.0, 5.0, 5.0])
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    # Shade faces differently via their 3D normals: tilt face B.
    v3 = np.concatenate([verts, depth[:, None]], axis=1).astype(np.float64)
    v3[3, 2] += 3.0  # tilt → |n_z| < 1 → darker shade
    out = viz.rasterize_mesh(img, verts, depth, faces, vertices3d=v3,
                             color=(255, 255, 255), alpha=1.0)
    # A pixel inside tri A only (top-left) and the overlap band both carry
    # tri A's full-brightness shade; a pixel inside tri B only is darker.
    a_only = out[4, 4, 0]
    b_only = out[28, 28, 0]
    assert a_only == 255, a_only
    assert 0 < b_only < 255, b_only
    # The shared diagonal band: the z-buffer must keep tri A's value.
    mid = out[15, 15, 0]
    assert mid == a_only, (mid, a_only)
    # Background untouched.
    assert out[0, 31].tolist() == [0, 0, 0]


def test_rasterize_mesh_offscreen_faces_safe():
    img = np.full((16, 16, 3), 10, np.uint8)
    verts = np.array([[-40.0, -40.0], [-30.0, -40.0], [-40.0, -30.0],
                      [4.0, 4.0], [12.0, 4.0], [4.0, 12.0]])
    depth = np.ones(6)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    out = viz.rasterize_mesh(img, verts, depth, faces)
    assert out.shape == img.shape
    assert (out[5:8, 5:8] != 10).any()       # on-screen face rendered


def test_mesh_overlay_with_faces_and_affine(tmp_path):
    """save_mesh_overlay letterbox path: the affine inverse places the
    body inside the unpadded source region."""
    img = np.zeros((45, 90, 3), np.uint8)
    rng = np.random.RandomState(1)
    verts = rng.randn(50, 3) * 0.2
    faces = rng.randint(0, 50, (60, 3))
    affine = np.array([0.5, 0.5, -0.25, 10.0], np.float32)
    path = str(tmp_path / "overlay_lb.png")
    viz.save_mesh_overlay(path, img, verts, np.array([1.0, 0.0, 0.0]),
                          64, faces=faces, affine=affine)
    assert os.path.exists(path) or os.path.exists(path + ".npy")


def test_tile_heatmaps_shape():
    hm = np.random.RandomState(0).rand(8, 8, 15).astype(np.float32)
    sheet = viz.tile_heatmaps(hm, cols=5)
    assert sheet.shape == (3 * 8, 5 * 8)
    assert sheet.dtype == np.uint8
