"""Supervised training driver (CLI: `t3d-train`).

Capability parity target: the reference's `train/train.py` (SURVEY.md C9,
call stack §3.2): model selected by name, epoch loop with train/eval
passes, staircase LR + BN-decay schedules, periodic checkpoints, metric
logging — rebuilt around one fused jit step with DP sharding over the
device mesh and orbax auto-resume.

Dataset selection:
  --data_path <pickles>   real frustum pickles (SUN-RGBD / KITTI prep)
  (no data_path)          synthetic frustums (smoke/benchmarks)
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset
from transferable3d_tpu.models import registry
from transferable3d_tpu.parallel import mesh as mesh_lib
from transferable3d_tpu.train import config as config_lib
from transferable3d_tpu.train import schedules, train_loop
from transferable3d_tpu.utils.checkpoint import CheckpointManager
from transferable3d_tpu.utils.logging import Logger


def build_datasets(cfg: config_lib.TrainConfig):
    bins_cfg = cfg.bin_config()
    if cfg.data_path:
        from transferable3d_tpu.data import pickle_io
        train_recs = pickle_io.load_records(
            cfg.data_path, split="train", classes=cfg.classes or None)
        val_recs = pickle_io.load_records(
            cfg.data_path, split="val", classes=cfg.classes or None)
    else:
        class_idx = (bins_cfg.class_index(cfg.classes[0])
                     if cfg.classes else None)
        train_recs = synthetic.make_dataset(
            cfg.synthetic_train, bins_cfg, seed=cfg.seed,
            hard=cfg.synthetic_hard,
            class_idx=class_idx,
            extra_channels=cfg.num_channels - 3)
        val_recs = synthetic.make_dataset(
            cfg.synthetic_val, bins_cfg, seed=cfg.seed + 10_000,
            hard=cfg.synthetic_hard,
            class_idx=class_idx,
            extra_channels=cfg.num_channels - 3)
    train_ds = FrustumDataset(
        train_recs, bins_cfg, npoints=cfg.num_point,
        rotate_to_center=True, random_flip=cfg.random_flip,
        random_shift=cfg.random_shift, seed=cfg.seed)
    val_ds = FrustumDataset(
        val_recs, bins_cfg, npoints=cfg.num_point, rotate_to_center=True,
        seed=cfg.seed)
    return train_ds, val_ds


def train(cfg: config_lib.TrainConfig) -> dict:
    if cfg.multihost:
        # Multi-host DCN mesh (SURVEY.md §2.3/§5.8): coordinator address
        # etc. come from the standard JAX_COORDINATOR_* / TPU env vars.
        jax.distributed.initialize()
    logger = Logger(cfg.log_dir)
    logger.log_string(f"config: {dataclasses.asdict(cfg)}")
    bins_cfg = cfg.bin_config()
    train_ds, val_ds = build_datasets(cfg)
    logger.log_string(
        f"datasets: train={len(train_ds)} val={len(val_ds)} "
        f"classes={bins_cfg.classes}")

    devices = (jax.devices()[:cfg.num_devices] if cfg.num_devices
               else jax.devices())
    mesh = mesh_lib.data_parallel_mesh(devices)
    assert cfg.batch_size % len(devices) == 0, (
        f"batch {cfg.batch_size} not divisible by {len(devices)} devices")

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = registry.get_model(cfg.model, bins_cfg, dtype=dtype)

    lr_sched = schedules.exponential_staircase_lr(
        cfg.learning_rate, cfg.lr_decay_rate, cfg.lr_decay_samples,
        cfg.batch_size, cfg.min_lr)
    bn_sched = schedules.bn_momentum_schedule(
        cfg.bn_init_decay, cfg.bn_decay_rate, cfg.bn_decay_samples,
        cfg.batch_size, cfg.bn_decay_clip)
    tx = train_loop.make_optimizer(
        lr_sched, grad_accum_steps=cfg.grad_accum_steps)

    sample = train_ds.get_batch(list(range(min(cfg.batch_size,
                                               len(train_ds)))))
    state = train_loop.create_train_state(model, bins_cfg, tx, sample,
                                          seed=cfg.seed)

    ckpt = CheckpointManager(f"{cfg.log_dir}/ckpt")
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state = restored
        logger.log_string(f"resumed from step {int(state.step)}")
    state = mesh_lib.replicate(state, mesh)

    step_cfg = train_loop.StepConfig(
        box_loss_weight=cfg.box_loss_weight,
        corner_loss_weight=cfg.corner_loss_weight)
    train_step = train_loop.make_train_step(model, bins_cfg, tx, lr_sched,
                                            bn_sched, step_cfg)
    eval_step = train_loop.make_eval_step(model, bins_cfg, step_cfg)

    # Optional HBM-resident dataset: per-step sampling/augmentation runs
    # on device (data/device_dataset.py) — removes the host provider from
    # the step critical path entirely.
    device_iter = None
    if cfg.device_data:
        from transferable3d_tpu.data import device_dataset
        dev_data = device_dataset.build_device_dataset(
            train_ds.records, bins_cfg, max_points=cfg.max_points_device)
        device_iter = device_dataset.DeviceEpochIterator(
            dev_data, bins_cfg, cfg.batch_size, cfg.num_point,
            seed=cfg.seed, random_flip=cfg.random_flip,
            random_shift=cfg.random_shift)
        logger.log_string(
            f"device-resident dataset: {dev_data.num_records} records x "
            f"{cfg.max_points_device} pts in HBM")

    # Failure handling (SURVEY.md §5.3): checkpoint on SIGTERM/SIGINT so a
    # preemption resumes from the current step instead of the last epoch.
    import signal

    interrupted = {"flag": False}

    def _on_signal(signum, frame):
        interrupted["flag"] = True
        logger.log_string(f"signal {signum}: checkpointing and stopping")

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not in the main thread

    last_eval = {}
    stop = False
    for epoch in range(cfg.max_epoch):
        if stop:
            break
        t0, seen = time.time(), 0
        if device_iter is not None:
            batches = device_iter.epoch()
        else:
            from transferable3d_tpu.utils.prefetch import prefetch
            batches = prefetch(
                train_ds.epoch_batches(cfg.batch_size),
                device_put=lambda b: mesh_lib.shard_batch(b, mesh))
        for batch in batches:
            state, metrics = train_step(state, batch)
            seen += cfg.batch_size
            if interrupted["flag"] or (
                    cfg.max_steps and int(state.step) >= cfg.max_steps):
                stop = True
                break
        # Sync before reading the clock: dispatch is async, so without
        # this the frustums/s counter measures enqueue time, not compute.
        jax.block_until_ready(metrics["total_loss"])
        dt = time.time() - t0
        host_m = {k: float(v) for k, v in metrics.items()}
        logger.log_metrics(int(state.step), host_m, "train")
        logger.log_string(
            f"epoch {epoch}: step={int(state.step)} "
            f"loss={host_m['total_loss']:.4f} "
            f"seg_acc={host_m.get('seg_accuracy', float('nan')):.3f} "
            f"iou3d={host_m.get('iou3d_mean', float('nan')):.3f} "
            f"({seen / max(dt, 1e-9):.1f} frustums/s)")

        if epoch % cfg.eval_every_epochs == 0 or stop:
            agg = []
            for batch in val_ds.epoch_batches(cfg.batch_size,
                                              shuffle=False):
                agg.append({k: float(v) for k, v in eval_step(
                    state, mesh_lib.shard_batch(batch, mesh)).items()})
            if agg:
                last_eval = {k: float(np.mean([m[k] for m in agg]))
                             for k in agg[0]}
                logger.log_metrics(int(state.step), last_eval, "val")
                logger.log_string(
                    f"  val: loss={last_eval['total_loss']:.4f} "
                    f"iou3d_ge_05={last_eval.get('iou3d_ge_05', 0):.3f} "
                    f"iou3d_ge_07={last_eval.get('iou3d_ge_07', 0):.3f}")

        if epoch % cfg.ckpt_every_epochs == 0 or stop:
            ckpt.save(int(state.step), jax.device_get(state))

    ckpt.wait()
    ckpt.close()
    logger.close()
    return last_eval


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    config_lib.add_cli_args(parser)
    cfg = config_lib.config_from_args(parser.parse_args())
    train(cfg)


if __name__ == "__main__":
    main()
