"""KITTI reader/extraction tests against a generated on-disk fixture."""

import os

import numpy as np
import pytest

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core.geometry import box_corners_np
from transferable3d_tpu.data import kitti, kitti_prep, pickle_io
from transferable3d_tpu.data.provider import FrustumDataset

# A simple valid calibration: identity extrinsics with a plausible pinhole.
CALIB_TXT = """P2: 700.0 0.0 620.0 0.0 0.0 700.0 190.0 0.0 0.0 0.0 1.0 0.0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""
# velo (x fwd, y left, z up) -> cam (x right, y down, z fwd):
# cam_x = -velo_y ; cam_y = -velo_z ; cam_z = velo_x.


def _make_fixture(root, rng, n_frames=2):
    """Write velodyne bins + calib + labels for synthetic car scenes."""
    for sub in ["velodyne", "calib", "label_2"]:
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    frames = []
    for fi in range(n_frames):
        idx = f"{fi:06d}"
        # One car per frame at a known rect-frame pose.
        center = np.array([rng.uniform(-3, 3), 0.8, rng.uniform(8, 20)],
                          np.float32)
        size = np.array([3.9, 1.6, 1.5], np.float32)
        heading = np.float32(rng.uniform(-np.pi, np.pi))

        # Object points inside the box + ground clutter, in rect frame.
        local = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        local[:, 0] *= size[0]
        local[:, 1] *= size[2]
        local[:, 2] *= size[1]
        from transferable3d_tpu.core.geometry import rotate_points_y_np
        obj = rotate_points_y_np(local[None], heading)[0] + center
        ground = np.stack([
            rng.uniform(-15, 15, 600), np.full(600, 1.6),
            rng.uniform(4, 40, 600)], axis=1).astype(np.float32)
        rect = np.concatenate([obj, ground])
        # rect -> velo: velo_x = cam_z, velo_y = -cam_x, velo_z = -cam_y.
        velo = np.stack([rect[:, 2], -rect[:, 0], -rect[:, 1]], axis=1)
        scan = np.concatenate(
            [velo, rng.uniform(0, 1, (velo.shape[0], 1)).astype(np.float32)],
            axis=1).astype(np.float32)
        scan.tofile(os.path.join(root, "training", "velodyne",
                                 f"{idx}.bin"))
        with open(os.path.join(root, "training", "calib",
                               f"{idx}.txt"), "w") as f:
            f.write(CALIB_TXT)

        # 2D box from projected 3D corners; KITTI label line.
        calib = kitti.Calibration.from_file(
            os.path.join(root, "training", "calib", f"{idx}.txt"))
        corners = box_corners_np(center, size, heading)
        uv = calib.project_rect_to_image(corners.astype(np.float64))
        box2d = [uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(),
                 uv[:, 1].max()]
        bottom = center + np.array([0, size[2] / 2, 0])
        with open(os.path.join(root, "training", "label_2",
                               f"{idx}.txt"), "w") as f:
            f.write(
                f"Car 0.0 0 0.0 {box2d[0]:.2f} {box2d[1]:.2f} "
                f"{box2d[2]:.2f} {box2d[3]:.2f} "
                f"{size[2]:.2f} {size[1]:.2f} {size[0]:.2f} "
                f"{bottom[0]:.2f} {bottom[1]:.2f} {bottom[2]:.2f} "
                f"{heading:.4f}\n")
        frames.append((idx, center, size, heading, np.asarray(box2d)))
    return frames


def test_calibration_roundtrips(tmp_path):
    rng = np.random.RandomState(0)
    _make_fixture(str(tmp_path), rng, n_frames=1)
    calib = kitti.Calibration.from_file(
        str(tmp_path / "training" / "calib" / "000000.txt"))
    velo = rng.uniform(-10, 10, (50, 3))
    velo[:, 0] = np.abs(velo[:, 0]) + 5  # in front
    rect = calib.project_velo_to_rect(velo)
    back = calib.project_rect_to_velo(rect)
    np.testing.assert_allclose(back, velo, atol=1e-6)
    # image -> rect -> image round trip at given depth.
    uv_depth = np.stack([rng.uniform(0, 1242, 20), rng.uniform(0, 375, 20),
                         rng.uniform(5, 40, 20)], axis=1)
    rect2 = calib.project_image_to_rect(uv_depth)
    uv2 = calib.project_rect_to_image(rect2)
    np.testing.assert_allclose(uv2, uv_depth[:, :2], atol=1e-6)
    np.testing.assert_allclose(rect2[:, 2], uv_depth[:, 2], atol=1e-9)


def test_label_parsing_and_conversion(tmp_path):
    rng = np.random.RandomState(1)
    frames = _make_fixture(str(tmp_path), rng, n_frames=1)
    idx, center, size, heading, _ = frames[0]
    ds = kitti.KittiObjectDataset(str(tmp_path))
    objs = ds.get_label_objects(idx)
    assert len(objs) == 1 and objs[0].type == "Car"
    c, s, h = objs[0].center_size_heading()
    np.testing.assert_allclose(c, center, atol=0.01)
    np.testing.assert_allclose(s, size, atol=0.01)
    assert abs(h - heading) < 1e-3


def test_frustum_extraction(tmp_path):
    rng = np.random.RandomState(2)
    frames = _make_fixture(str(tmp_path), rng)
    ds = kitti.KittiObjectDataset(str(tmp_path))
    for idx, center, size, heading, box2d in frames:
        recs = kitti.extract_frustum_records(ds, idx)
        assert len(recs) == 1
        r = recs[0]
        assert r.points.shape[1] == 4
        # All frustum points project inside the 2D box.
        calib = ds.get_calibration(idx)
        uv = calib.project_rect_to_image(r.points[:, :3].astype(np.float64))
        assert (uv[:, 0] >= box2d[0] - 1e-3).all()
        assert (uv[:, 0] <= box2d[2] + 1e-3).all()
        # Most points are the object (box2d is tight around the car).
        assert r.seg.mean() > 0.5
        # GT box carried through in our convention.
        np.testing.assert_allclose(r.center, center, atol=0.01)
        # Frustum angle sane: rotating the center ray to +Z.
        assert abs(r.frustum_angle) < np.pi / 2


def test_extraction_with_jitter_augment(tmp_path):
    rng = np.random.RandomState(3)
    _make_fixture(str(tmp_path), rng, n_frames=1)
    ds = kitti.KittiObjectDataset(str(tmp_path))
    recs = kitti.extract_frustum_records(
        ds, "000000", perturb_box2d=True, augment_x=4,
        rng=np.random.RandomState(0))
    assert len(recs) == 4
    # Jittered boxes differ from the original.
    assert any(not np.allclose(recs[0].box2d, r.box2d) for r in recs[1:])


def test_prepare_cli_pipeline(tmp_path):
    """prepare -> pickle -> provider -> train-ready batch."""
    rng = np.random.RandomState(4)
    _make_fixture(str(tmp_path), rng)
    out = str(tmp_path / "frustum")
    n = kitti_prep.prepare_split(str(tmp_path), f"{out}/train.pkl", None,
                                 perturb=True, augment_x=2)
    assert n >= 2
    recs = pickle_io.load_records(f"{out}/train.pkl", cfg=bins_lib.KITTI)
    provider = FrustumDataset(recs, bins_lib.KITTI, npoints=128)
    batch = provider.get_batch(list(range(len(recs))))
    assert batch["points"].shape[1:] == (128, 4)
    assert np.isfinite(batch["points"]).all()
    # Heading/size labels decode back to the GT.
    from transferable3d_tpu.core import bins
    size = bins.class_to_size_np(batch["size_class"],
                                 batch["size_residual"], bins_lib.KITTI)
    np.testing.assert_allclose(size[0], recs[0].size, atol=1e-4)


def test_detection_frustums(tmp_path):
    rng = np.random.RandomState(5)
    frames = _make_fixture(str(tmp_path), rng, n_frames=1)
    idx, _, _, _, box2d = frames[0]
    det_file = str(tmp_path / "dets.txt")
    with open(det_file, "w") as f:
        f.write(f"{idx} Car 0.93 {box2d[0]:.1f} {box2d[1]:.1f} "
                f"{box2d[2]:.1f} {box2d[3]:.1f}\n")
    out = str(tmp_path / "frustum")
    n = kitti_prep.prepare_from_detections(str(tmp_path),
                                           f"{out}/val_rgb.pkl", det_file)
    assert n == 1
    recs = pickle_io.load_records(f"{out}/val_rgb.pkl", cfg=bins_lib.KITTI)
    assert recs[0].seg is None
    assert recs[0].score == pytest.approx(0.93)
