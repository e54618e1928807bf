"""Golden tests for the native C++ KITTI evaluator.

Note on expectations: the devkit protocol samples precision at 41 recall
points whose thresholds come from the sorted TP scores — with only a
handful of GT boxes most slots stay empty and even a perfect detector
scores 100 * k/11. Tests therefore use ~50+ frames so the threshold set
fills the recall axis (like real KITTI where n_gt is in the thousands).
"""

import os

import numpy as np
import pytest

from transferable3d_tpu.eval import kitti_offline

N_FRAMES = 50


def _write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def _gt_line(cls="Car", trunc=0.0, occ=0, box2d=(100, 100, 300, 200),
             hwl=(1.5, 1.6, 3.9), xyz=(0, 1.5, 10), ry=0.0):
    return (f"{cls} {trunc} {occ} 0.0 "
            f"{box2d[0]} {box2d[1]} {box2d[2]} {box2d[3]} "
            f"{hwl[0]} {hwl[1]} {hwl[2]} {xyz[0]} {xyz[1]} {xyz[2]} {ry}")


def _det_line(score, **kw):
    return _gt_line(**kw) + f" {score}"


def _scene(i, rng):
    center = (float(rng.uniform(-5, 5)), 1.5, float(rng.uniform(8, 40)))
    ry = float(rng.uniform(-np.pi, np.pi))
    return center, ry


@pytest.fixture(scope="module")
def binary():
    return kitti_offline.build_binary()


def test_binary_builds(binary):
    assert os.path.exists(binary)


def test_perfect_detections_high_ap(tmp_path, binary):
    rng = np.random.RandomState(0)
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    for i in range(N_FRAMES):
        c, ry = _scene(i, rng)
        _write(f"{gt_dir}/{i:06d}.txt", [_gt_line(xyz=c, ry=ry)])
        _write(f"{res_dir}/data/{i:06d}.txt",
               [_det_line(rng.uniform(0.5, 1.0), xyz=c, ry=ry)])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    for metric in ["2d", "bev", "3d"]:
        for dif in ["easy", "moderate", "hard"]:
            assert aps[("Car", metric, dif)] > 95.0, (metric, dif, aps)
    assert os.path.exists(f"{res_dir}/stats_car_ap.txt")
    # Devkit-style PR-curve data (SURVEY N4 "writes plots/stats"):
    # 41 recall sample rows x (recall + easy/moderate/hard precision).
    for metric in ["2d", "bev", "3d"]:
        curve = np.loadtxt(f"{res_dir}/plot/car_{metric}.txt")
        assert curve.shape == (41, 4), curve.shape
        assert curve[0, 0] == 0.0 and curve[-1, 0] == 1.0
        # Perfect detections: precision ~1 along the whole curve.
        assert curve[:, 1:].min() > 0.95


def test_no_detections_ap0(tmp_path, binary):
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    for i in range(5):
        _write(f"{gt_dir}/{i:06d}.txt", [_gt_line()])
        _write(f"{res_dir}/data/{i:06d}.txt", [])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    assert aps[("Car", "3d", "moderate")] == 0.0


def test_shifted_detection_fails_3d_keeps_2d(tmp_path, binary):
    """2m-lateral shift: same 2D box (AP high) but 3D/BEV IoU < 0.7."""
    rng = np.random.RandomState(1)
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    for i in range(N_FRAMES):
        c, ry = _scene(i, rng)
        _write(f"{gt_dir}/{i:06d}.txt", [_gt_line(xyz=c, ry=0.0)])
        _write(f"{res_dir}/data/{i:06d}.txt",
               [_det_line(rng.uniform(0.5, 1.0),
                          xyz=(c[0] + 2.0, c[1], c[2]), ry=0.0)])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    assert aps[("Car", "2d", "easy")] > 95.0
    assert aps[("Car", "3d", "easy")] == 0.0
    assert aps[("Car", "bev", "easy")] == 0.0


def test_difficulty_filtering(tmp_path, binary):
    """Small (30px) GT is ignored at easy; detecting it is not an easy FP."""
    rng = np.random.RandomState(2)
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    small = dict(box2d=(100, 100, 160, 130), xyz=(5.0, 1.5, 30.0))
    for i in range(N_FRAMES):
        c, ry = _scene(i, rng)
        _write(f"{gt_dir}/{i:06d}.txt",
               [_gt_line(xyz=c, ry=ry), _gt_line(**small)])
        _write(f"{res_dir}/data/{i:06d}.txt",
               [_det_line(rng.uniform(0.5, 1.0), xyz=c, ry=ry),
                _det_line(rng.uniform(0.5, 1.0), **small)])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    assert aps[("Car", "3d", "easy")] > 95.0       # small GT ignored
    assert aps[("Car", "3d", "moderate")] > 95.0   # small GT valid + found


def test_van_ignored_for_car(tmp_path, binary):
    rng = np.random.RandomState(3)
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    for i in range(N_FRAMES):
        c, ry = _scene(i, rng)
        van = (c[0] + 8, c[1], c[2] + 5)
        _write(f"{gt_dir}/{i:06d}.txt",
               [_gt_line(xyz=c, ry=ry),
                _gt_line(cls="Van", xyz=van, ry=ry)])
        # Car detections on both the car and the van.
        _write(f"{res_dir}/data/{i:06d}.txt",
               [_det_line(rng.uniform(0.5, 1.0), xyz=c, ry=ry),
                _det_line(rng.uniform(0.5, 1.0), cls="Car", xyz=van,
                          ry=ry)])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    assert aps[("Car", "3d", "easy")] > 95.0


def test_false_positives_halve_precision(tmp_path, binary):
    rng = np.random.RandomState(4)
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    for i in range(N_FRAMES):
        c, ry = _scene(i, rng)
        far = (c[0] + 60, c[1], c[2] + 60)
        _write(f"{gt_dir}/{i:06d}.txt", [_gt_line(xyz=c, ry=ry)])
        _write(f"{res_dir}/data/{i:06d}.txt",
               [_det_line(rng.uniform(0.5, 1.0), xyz=c, ry=ry),
                _det_line(rng.uniform(0.5, 1.0), xyz=far,
                          box2d=(500, 100, 700, 200), ry=ry)])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    # TP and FP scores interleave uniformly -> precision ~0.5 throughout.
    assert 40.0 < aps[("Car", "3d", "easy")] < 62.0


def test_rotation_invariance_square_box(tmp_path, binary):
    """Square-footprint box rotated 90 deg must still match exactly."""
    rng = np.random.RandomState(5)
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    sq = dict(hwl=(1.5, 2.0, 2.0))
    for i in range(N_FRAMES):
        c, _ = _scene(i, rng)
        _write(f"{gt_dir}/{i:06d}.txt", [_gt_line(xyz=c, ry=0.0, **sq)])
        _write(f"{res_dir}/data/{i:06d}.txt",
               [_det_line(rng.uniform(0.5, 1.0), xyz=c,
                          ry=float(np.pi / 2), **sq)])
    aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
    assert aps[("Car", "bev", "easy")] > 95.0
    assert aps[("Car", "3d", "easy")] > 95.0


def test_cpp_bev_iou_matches_python(tmp_path, binary):
    """IoU boundary agreement: offsets straddling the 0.7 threshold
    classify identically in C++ (via AP 100/0) and python box_np."""
    from transferable3d_tpu.core import box_np

    rng = np.random.RandomState(6)
    size = np.array([3.9, 1.6, 1.5], np.float32)  # l, w, h
    for offset, ry in [(0.3, 0.0), (0.8, 0.0), (0.5, 0.4), (1.5, 1.0)]:
        gt_dir = str(tmp_path / f"gt_{offset}_{ry}")
        res_dir = str(tmp_path / f"res_{offset}_{ry}")
        centers = []
        for i in range(N_FRAMES):
            c, _ = _scene(i, rng)
            centers.append(c)
            _write(f"{gt_dir}/{i:06d}.txt", [_gt_line(xyz=c, ry=0.0)])
            _write(f"{res_dir}/data/{i:06d}.txt",
                   [_det_line(rng.uniform(0.5, 1.0),
                              xyz=(c[0] + offset, c[1], c[2]), ry=ry)])
        aps = kitti_offline.evaluate_offline(gt_dir, res_dir)
        # Python IoU for the same configuration (any frame; same offset).
        c = centers[0]
        c_ours = np.array([c[0], c[1] - size[2] / 2, c[2]], np.float32)
        iou3d, _ = box_np.box3d_iou_params_np(
            c_ours, size, 0.0,
            c_ours + np.array([offset, 0, 0], np.float32), size, ry)
        if iou3d >= 0.705:
            assert aps[("Car", "3d", "easy")] > 95.0, (offset, ry, iou3d)
        elif iou3d <= 0.695:
            assert aps[("Car", "3d", "easy")] < 5.0, (offset, ry, iou3d)
