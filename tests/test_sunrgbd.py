"""SUN-RGBD pipeline tests against generated .mat/depth fixtures."""

import os

import numpy as np
import pytest

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import sunrgbd

CFG = bins_lib.SUNRGBD

K = np.array([[520.0, 0, 320.0], [0, 520.0, 240.0], [0, 0, 1]])


def test_frame_conversions_roundtrip():
    rng = np.random.RandomState(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    back = sunrgbd.camera_to_upright(sunrgbd.upright_to_camera(pts))
    np.testing.assert_allclose(back, pts)


def test_heading_conversion_consistency():
    """Rotating a box axis in upright coords must match rotating the
    converted axis by the converted heading in camera coords."""
    from transferable3d_tpu.core.geometry import rotate_points_y_np
    for theta in np.linspace(-np.pi, np.pi, 13):
        axis_up = np.array([np.cos(theta), np.sin(theta), 0.0])
        axis_cam_direct = sunrgbd.upright_to_camera(axis_up[None])[0]
        h = sunrgbd.heading_upright_to_camera(theta)
        axis_cam_rot = rotate_points_y_np(
            np.array([[[1.0, 0.0, 0.0]]]), np.float32(h))[0, 0]
        np.testing.assert_allclose(axis_cam_direct, axis_cam_rot, atol=1e-6)


def test_depth_decode():
    raw = np.array([[8 << 3, 1000 << 3, 0]], np.uint16)
    d = sunrgbd.decode_depth(raw)
    assert d[0, 0] == pytest.approx(0.008)
    assert d[0, 1] == pytest.approx(1.0)
    assert d[0, 2] == 0.0


def test_depth_lifting_geometry():
    """A flat wall at depth 2m must lift to y(fwd)=2 plane (Rtilt=I)."""
    depth = np.full((480, 640), 2.0, np.float32)
    pts, uv = sunrgbd.depth_to_upright_points(depth, K, np.eye(3))
    assert pts.shape == (480 * 640, 3)
    np.testing.assert_allclose(pts[:, 1], 2.0, atol=1e-5)
    # Principal point lifts to x=0, z=0.
    center_idx = np.where((uv[:, 0] == 320) & (uv[:, 1] == 240))[0][0]
    np.testing.assert_allclose(pts[center_idx], [0, 2, 0], atol=1e-2)
    # +u maps to +x, +v maps to -z (z up).
    right_idx = np.where((uv[:, 0] == 480) & (uv[:, 1] == 240))[0][0]
    assert pts[right_idx, 0] > 0.5
    down_idx = np.where((uv[:, 0] == 320) & (uv[:, 1] == 400))[0][0]
    assert pts[down_idx, 2] < -0.5


def _write_fixture_mat(path, frames):
    """Emulate SUNRGBDMeta.mat v7 structure via scipy.io.savemat."""
    import scipy.io as sio

    metas = []
    for fr in frames:
        boxes = []
        for b in fr["boxes"]:
            theta = b["heading"]
            basis = np.array([
                [np.cos(theta), np.sin(theta), 0],
                [-np.sin(theta), np.cos(theta), 0],
                [0, 0, 1.0]])
            boxes.append({
                "basis": basis,
                "coeffs": np.array([b["size"][0] / 2, b["size"][1] / 2,
                                    b["size"][2] / 2]),
                "centroid": b["centroid"],
                "classname": b["classname"],
                "gtBb2D": np.array([b["box2d"][0], b["box2d"][1],
                                    b["box2d"][2] - b["box2d"][0],
                                    b["box2d"][3] - b["box2d"][1]]),
            })
        metas.append({
            "sequenceName": fr["id"],
            "K": K, "Rtilt": np.eye(3),
            "depthpath": fr["depthpath"], "rgbpath": "",
            "groundtruth3DBB": np.array(
                [(b["basis"], b["coeffs"], b["centroid"], b["classname"],
                  b["gtBb2D"]) for b in boxes],
                dtype=[("basis", "O"), ("coeffs", "O"), ("centroid", "O"),
                       ("classname", "O"), ("gtBb2D", "O")]),
        })
    arr = np.array(
        [(m["sequenceName"], m["K"], m["Rtilt"], m["depthpath"],
          m["rgbpath"], m["groundtruth3DBB"]) for m in metas],
        dtype=[("sequenceName", "O"), ("K", "O"), ("Rtilt", "O"),
               ("depthpath", "O"), ("rgbpath", "O"),
               ("groundtruth3DBB", "O")])
    sio.savemat(path, {"SUNRGBDMeta": arr})


def test_meta_parsing_and_extraction(tmp_path):
    """Full fixture: .mat meta + synthetic depth -> frustum records."""
    # Scene: a chair-sized box at (0.5, 3.0, 0.4) upright, heading 0.4.
    box = {
        "centroid": np.array([0.5, 3.0, 0.4]),
        "size": np.array([0.6, 0.55, 0.8]),
        "heading": 0.4,
        "classname": "chair",
    }
    # 2D box = projected extent of the object (so the crop keeps it all).
    rng0 = np.random.RandomState(42)
    local0 = rng0.uniform(-0.5, 0.5, (200, 3)) * box["size"]
    t0 = box["heading"]
    rot0 = np.array([[np.cos(t0), np.sin(t0), 0],
                     [-np.sin(t0), np.cos(t0), 0], [0, 0, 1.0]])
    obj0 = sunrgbd.upright_to_camera(
        (local0 @ rot0 + box["centroid"]).astype(np.float32))
    uv0 = np.stack([K[0, 0] * obj0[:, 0] / obj0[:, 2] + K[0, 2],
                    K[1, 1] * obj0[:, 1] / obj0[:, 2] + K[1, 2]], axis=1)
    box["box2d"] = np.array([uv0[:, 0].min() - 5, uv0[:, 1].min() - 5,
                             uv0[:, 0].max() + 5, uv0[:, 1].max() + 5])
    meta_path = str(tmp_path / "meta.mat")
    _write_fixture_mat(meta_path, [{
        "id": "scene0", "depthpath": "unused", "boxes": [box]}])

    frames = sunrgbd.load_meta(meta_path)
    assert len(frames) == 1
    fr = frames[0]
    assert fr.frame_id == "scene0"
    assert len(fr.boxes) == 1
    parsed = fr.boxes[0]
    assert parsed.classname == "chair"
    np.testing.assert_allclose(parsed.centroid, box["centroid"], atol=1e-6)
    np.testing.assert_allclose(parsed.size, box["size"], atol=1e-6)
    assert parsed.heading == pytest.approx(0.4)
    np.testing.assert_allclose(parsed.box2d, box["box2d"], atol=1e-6)

    # Build a synthetic cloud: box-interior points + background wall; give
    # each point the uv of its true projection so extraction can crop.
    rng = np.random.RandomState(0)
    local = rng.uniform(-0.5, 0.5, (400, 3)) * box["size"]
    t = box["heading"]
    rot = np.array([[np.cos(t), np.sin(t), 0],
                    [-np.sin(t), np.cos(t), 0], [0, 0, 1.0]])
    obj_up = local @ rot + box["centroid"]
    wall_up = np.stack([rng.uniform(-3, 3, 500),
                        np.full(500, 6.0),
                        rng.uniform(-1, 2, 500)], axis=1)
    pts_up = np.concatenate([obj_up, wall_up]).astype(np.float32)
    # Project upright -> camera -> pixels for uv.
    cam = sunrgbd.upright_to_camera(pts_up)
    uv = np.stack([K[0, 0] * cam[:, 0] / cam[:, 2] + K[0, 2],
                   K[1, 1] * cam[:, 1] / cam[:, 2] + K[1, 2]], axis=1)

    recs = sunrgbd.extract_frustum_records(fr, pts_up, uv, CFG)
    assert len(recs) == 1
    r = recs[0]
    assert r.class_idx == CFG.class_index("chair")
    # Object points dominate and are labeled 1.
    assert r.seg.sum() >= 350
    # GT box in camera frame: verify against direct conversion.
    c, s, h = parsed.to_camera()
    np.testing.assert_allclose(r.center, c, atol=1e-5)
    np.testing.assert_allclose(r.size, s, atol=1e-5)
    # Seg labels consistent: every point marked 1 is inside the GT box.
    from transferable3d_tpu.core import box_np
    from transferable3d_tpu.core.geometry import box_corners_np
    corners = box_corners_np(c, s, h)
    inside = box_np.in_hull_np(r.points[:, :3], corners)
    np.testing.assert_array_equal(inside, r.seg.astype(bool))


def test_extraction_feeds_provider(tmp_path):
    from transferable3d_tpu.data.provider import FrustumDataset

    box = {
        "centroid": np.array([0.0, 2.5, 0.3]),
        "size": np.array([2.0, 1.6, 0.9]),
        "heading": -0.7,
        "classname": "bed",
        "box2d": np.array([100.0, 100.0, 540.0, 440.0]),
    }
    meta_path = str(tmp_path / "meta.mat")
    _write_fixture_mat(meta_path, [{
        "id": "s1", "depthpath": "unused", "boxes": [box]}])
    fr = sunrgbd.load_meta(meta_path)[0]

    rng = np.random.RandomState(1)
    local = rng.uniform(-0.5, 0.5, (300, 3)) * box["size"]
    t = box["heading"]
    rot = np.array([[np.cos(t), np.sin(t), 0],
                    [-np.sin(t), np.cos(t), 0], [0, 0, 1.0]])
    pts_up = (local @ rot + box["centroid"]).astype(np.float32)
    cam = sunrgbd.upright_to_camera(pts_up)
    uv = np.stack([K[0, 0] * cam[:, 0] / cam[:, 2] + K[0, 2],
                   K[1, 1] * cam[:, 1] / cam[:, 2] + K[1, 2]], axis=1)
    recs = sunrgbd.extract_frustum_records(fr, pts_up, uv, CFG)
    ds = FrustumDataset(recs, CFG, npoints=128)
    item = ds[0]
    assert item["points"].shape == (128, 3)
    # After rotate-to-center, the GT center is near the +Z axis.
    assert abs(item["center"][0]) < 0.3
