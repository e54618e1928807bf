"""Full SUN-RGBD path integration (VERDICT r02 item 8): committed-style
.mat + depth-image fixtures -> t3d-prepare-sunrgbd -> pickles -> train
-> t3d-test evaluate -> result lists + VOC AP, all through the real CLI
surfaces. Mirrors tests/test_kitti_end_to_end.py for the SUN-RGBD leg
(SURVEY.md C3/N5, BASELINE config 2).
"""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.dirname(__file__))
from test_sunrgbd import K, _write_fixture_mat  # noqa: E402

from transferable3d_tpu.core import bins as bins_lib  # noqa: E402
from transferable3d_tpu.core.geometry import box_corners_np  # noqa: E402
from transferable3d_tpu.data import sunrgbd, sunrgbd_prep  # noqa: E402
from transferable3d_tpu.data.depth_pipeline import (  # noqa: E402
    render_box_depth)
from transferable3d_tpu.train import config as config_lib  # noqa: E402
from transferable3d_tpu.train import test as test_lib  # noqa: E402
from transferable3d_tpu.train import train_sup  # noqa: E402

CFG = bins_lib.SUNRGBD
H, W = 480, 640


def _make_scene(rng, classname):
    """One upright-frame box with plausible pose + its 2D projection."""
    k = CFG.class_index(classname)
    size = np.asarray(CFG.mean_sizes[k], np.float32) * rng.uniform(
        0.9, 1.1, 3).astype(np.float32)
    # Upright: x right, y forward (depth), z up.
    centroid = np.array([rng.uniform(-0.8, 0.8), rng.uniform(2.5, 4.0),
                         rng.uniform(-0.3, 0.3)], np.float32)
    heading = float(rng.uniform(-np.pi, np.pi))
    box = {"centroid": centroid, "size": size, "heading": heading,
           "classname": classname}

    # Camera-frame twin for rendering + the 2D box.
    parsed = sunrgbd.SunRgbdBox3d(classname=classname, centroid=centroid,
                                  size=size, heading=heading,
                                  box2d=np.zeros(4))
    c_cam, s_cam, h_cam = parsed.to_camera()
    corners = box_corners_np(c_cam, s_cam, np.float32(h_cam))
    uv = np.stack([K[0, 0] * corners[:, 0] / corners[:, 2] + K[0, 2],
                   K[1, 1] * corners[:, 1] / corners[:, 2] + K[1, 2]],
                  axis=1)
    box["box2d"] = np.array(
        [max(uv[:, 0].min() - 4, 0), max(uv[:, 1].min() - 4, 0),
         min(uv[:, 0].max() + 4, W - 1), min(uv[:, 1].max() + 4, H - 1)],
        np.float32)
    return box, (c_cam, s_cam, h_cam)


def test_sunrgbd_pipeline_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    classes = ["chair", "bed", "table"]
    frames = []
    for fi in range(3):
        box, (c_cam, s_cam, h_cam) = _make_scene(rng, classes[fi])
        # Render the physical surface slightly inside the amodal GT box
        # (as real scans are); exactly-on-surface points would straddle
        # the in-hull test under the 1 mm depth quantization below.
        depth_m = render_box_depth(H, W, K, c_cam, s_cam * 0.96, h_cam,
                                   background_depth=6.0)
        # Real SUN-RGBD uint16 encoding (depth-in-mm shifted left 3).
        raw = (np.clip(depth_m, 0, 7.9) * 1000).astype(np.uint16) << 3
        depth_path = str(tmp_path / f"depth_{fi}.png")
        assert cv2.imwrite(depth_path, raw)
        frames.append({"id": f"scene{fi}", "depthpath": depth_path,
                       "boxes": [box]})

    meta_path = str(tmp_path / "SUNRGBDMeta.mat")
    _write_fixture_mat(meta_path, frames)

    # 1. Prepare pickles through the CLI-backing function (train = val).
    frustum_dir = tmp_path / "frustum"
    os.makedirs(frustum_dir)
    n = sunrgbd_prep.prepare(meta_path, "", str(frustum_dir / "train.pkl"),
                             perturb=True, augment_x=2, use_rgb=False)
    n_val = sunrgbd_prep.prepare(meta_path, "",
                                 str(frustum_dir / "val.pkl"),
                                 perturb=False, augment_x=1,
                                 use_rgb=False)
    assert n >= 6 and n_val == 3

    # Prep sanity: every record found its object points.
    from transferable3d_tpu.data import pickle_io
    recs = pickle_io.load_records(str(frustum_dir / "val.pkl"))
    assert [r.class_idx for r in recs] == [CFG.class_index(c)
                                          for c in classes]
    assert all(r.seg.sum() >= 30 for r in recs)

    # 2. Train a few steps on the pickles (real driver).
    cfg = config_lib.TrainConfig(
        model="frustum_pointnets_v1", dataset="sunrgbd",
        data_path=str(frustum_dir), num_point=128, num_channels=3,
        batch_size=4, max_epoch=2, max_steps=4, num_devices=1,
        log_dir=str(tmp_path / "log"), eval_every_epochs=100,
        ckpt_every_epochs=1, random_shift=False)
    train_sup.train(cfg)

    # 3. Inference -> SUN-RGBD result lists + VOC AP via the real driver.
    result_dir = str(tmp_path / "result")
    aps = test_lib.evaluate(cfg, result_dir)
    assert np.isfinite(aps["mAP"])
    for c in classes:
        assert c in aps

    # Result list round-trips through the reference-format writer/reader.
    path = os.path.join(result_dir, "detections.txt")
    assert os.path.exists(path)
    dets = test_lib.read_sunrgbd_results(path)
    assert len(dets) == 3
    assert {d.frame_id for d in dets} == {f"scene{fi}" for fi in range(3)}
    for d in dets:
        assert np.isfinite(d.score)
        assert d.center.shape == (3,) and d.size.shape == (3,)
        assert (d.size > 0).all()
