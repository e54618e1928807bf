"""Config/CLI surface tests + checkpoint save/resume round trip."""

import argparse
import dataclasses

import jax
import numpy as np

from transferable3d_tpu.train import config as config_lib


def _parse(argv):
    p = argparse.ArgumentParser()
    config_lib.add_cli_args(p)
    return config_lib.config_from_args(p.parse_args(argv))


def test_default_config():
    cfg = _parse([])
    assert cfg.model == "frustum_pointnets_v1"
    assert cfg.batch_size == 32
    assert cfg.bin_config().num_classes == 10


def test_preset_and_override():
    cfg = _parse(["--preset", "config1_boxonly_chair",
                  "--batch_size", "8", "--classes", "chair,table"])
    assert cfg.model == "box_estimation_v1"
    assert cfg.num_point == 512
    assert cfg.batch_size == 8
    assert cfg.classes == ("chair", "table")


def test_all_presets_valid():
    for name, preset in config_lib.PRESETS.items():
        assert preset.batch_size > 0, name
        assert preset.bin_config().num_classes > 0, name
        # model must exist in the registry
        from transferable3d_tpu.models import registry
        assert preset.model in registry.available(), (name, preset.model)


def test_kitti_dataset_selection():
    cfg = _parse(["--dataset", "kitti"])
    assert cfg.bin_config().classes[0] == "Car"


def test_train_smoke_and_resume(tmp_path):
    """Tiny end-to-end train() run + checkpoint resume (box-only model)."""
    from transferable3d_tpu.train import train_sup

    cfg = config_lib.TrainConfig(
        model="box_estimation_v1", dataset="sunrgbd", num_point=64,
        num_channels=4, batch_size=8, max_epoch=2, max_steps=3,
        synthetic_train=16, synthetic_val=8, log_dir=str(tmp_path),
        eval_every_epochs=1, ckpt_every_epochs=1)
    out = train_sup.train(cfg)
    assert np.isfinite(out["total_loss"])

    # Resume: a second run must pick up the checkpoint (step > 0).
    from transferable3d_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(f"{cfg.log_dir}/ckpt")
    assert mgr.latest_step() == 3
    mgr.close()

    cfg2 = dataclasses.replace(cfg, max_steps=5)
    out2 = train_sup.train(cfg2)
    mgr = CheckpointManager(f"{cfg.log_dir}/ckpt")
    assert mgr.latest_step() == 5
    mgr.close()
    assert np.isfinite(out2["total_loss"])
    # Log artifacts exist.
    assert (tmp_path / "log_train.txt").exists()
    assert (tmp_path / "metrics_train.csv").exists()
