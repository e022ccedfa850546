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


def test_tile_heatmaps_shape():
    hm = np.random.RandomState(0).rand(8, 8, 15).astype(np.float32)
    sheet = viz.tile_heatmaps(hm, cols=5)
    assert sheet.shape == (3 * 8, 5 * 8)
    assert sheet.dtype == np.uint8
