"""Full KITTI path integration: fixture scenes -> prep -> train -> test
-> KITTI detection files -> native C++ offline AP evaluator."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_kitti import _make_fixture  # noqa: E402

from transferable3d_tpu.data import kitti_prep  # noqa: E402
from transferable3d_tpu.eval import kitti_offline  # noqa: E402
from transferable3d_tpu.train import config as config_lib  # noqa: E402
from transferable3d_tpu.train import test as test_lib  # noqa: E402
from transferable3d_tpu.train import train_sup  # noqa: E402


def test_kitti_pipeline_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    kitti_root = str(tmp_path / "kitti")
    _make_fixture(kitti_root, rng, n_frames=3)

    # 1. Prepare frustum pickles (train = val here; tiny smoke).
    frustum_dir = str(tmp_path / "frustum")
    n = kitti_prep.prepare_split(kitti_root, f"{frustum_dir}/train.pkl",
                                 None, perturb=True, augment_x=2)
    kitti_prep.prepare_split(kitti_root, f"{frustum_dir}/val.pkl", None,
                             perturb=False, augment_x=1)
    assert n >= 3

    # 2. Train a few steps.
    cfg = config_lib.TrainConfig(
        model="frustum_pointnets_v1", dataset="kitti",
        data_path=frustum_dir, num_point=128, num_channels=4,
        batch_size=4, max_epoch=2, max_steps=4, num_devices=1, log_dir=str(tmp_path / "log"),
        eval_every_epochs=100, ckpt_every_epochs=1, random_shift=False)
    train_sup.train(cfg)

    # 3. Inference -> KITTI label files -> native evaluator.
    result_dir = str(tmp_path / "result")
    os.environ["T3D_KITTI_GT_DIR"] = os.path.join(kitti_root, "training",
                                                  "label_2")
    try:
        aps = test_lib.evaluate(cfg, result_dir)
    finally:
        del os.environ["T3D_KITTI_GT_DIR"]

    # Python AP computed and finite.
    assert np.isfinite(aps["mAP"])
    # KITTI files written, one per frame, parseable by the C++ tool.
    data_dir = os.path.join(result_dir, "data")
    files = sorted(os.listdir(data_dir))
    assert len(files) == 3
    for f in files:
        lines = open(os.path.join(data_dir, f)).read().strip().splitlines()
        assert lines and lines[0].split()[0] == "Car"
        assert len(lines[0].split()) == 16
    # Native evaluator ran inside evaluate() (stats file artifact) and
    # also runs standalone on the same dirs.
    assert os.path.exists(os.path.join(result_dir, "stats_car_ap.txt"))
    offline = kitti_offline.evaluate_offline(
        os.path.join(kitti_root, "training", "label_2"), result_dir)
    assert ("Car", "3d", "moderate") in offline
    assert all(0.0 <= v <= 100.0 for v in offline.values())
