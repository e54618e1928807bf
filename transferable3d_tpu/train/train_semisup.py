"""Cross-category semi-supervised training driver (CLI: `t3d-train-semisup`).

Capability parity target: the reference's semi-supervised driver
(SURVEY.md C14, BASELINE.json config 4): strong classes carry full 3D
supervision, weak classes only 2D boxes + class labels; the BoxPC net
pretrained on strong classes transfers 3D box quality supervision to the
weak classes.

Phases:
  A. pretrain BoxPC on the strong split (perturbed GT boxes, in-graph);
  B. train the detector on interleaved (strong, weak) batch pairs with
     the fused semi-supervised step (train/semisup.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset
from transferable3d_tpu.models import registry
from transferable3d_tpu.models.boxpc import BoxPCFitNet
from transferable3d_tpu.parallel import mesh as mesh_lib
from transferable3d_tpu.train import config as config_lib
from transferable3d_tpu.train import schedules, semisup, train_loop
from transferable3d_tpu.utils.checkpoint import CheckpointManager
from transferable3d_tpu.utils.logging import Logger

DEFAULT_STRONG = ("bed", "table", "sofa", "chair")
DEFAULT_WEAK = ("toilet", "desk", "dresser", "night_stand", "bookshelf",
                "bathtub")


@dataclasses.dataclass
class SemisupConfig(config_lib.TrainConfig):
    strong_classes: Tuple[str, ...] = DEFAULT_STRONG
    weak_classes: Tuple[str, ...] = DEFAULT_WEAK
    boxpc_epochs: int = 20
    # Joint cloud+box anisotropic rescale in BoxPC phase A (log-scale
    # range; 0 disables). Default ON: fixes the bookshelf fit-head
    # extrapolation floor (see semisup.anisotropic_shape_aug).
    boxpc_aniso_aug: float = 0.8
    weak_weight: float = 1.0
    # Linear warmup of the weak losses (steps); 0 disables. See
    # semisup.make_semisup_train_step.
    weak_warmup_steps: int = 0
    boxpc_restore: str = ""
    # Per-term weak-loss weights (ablation knobs; scripts/transfer_study.py).
    weak_fit: float = 1.0
    weak_refine: float = 1.0
    weak_reproj: float = 1.0
    weak_size_prior: float = 0.5
    weak_size_cls: float = 0.0
    # BoxPC trust-region gating (semisup.WeakLossWeights.trust_gate).
    weak_trust_gate: bool = True
    # Per-class weak-loss diagnostics: log [num_classes] vectors of the
    # gate pass rate, gated fit/refine losses, and gate-component
    # magnitudes as diag_*_<i> CSV columns (semisup.weak_losses).
    per_class_diag: bool = False


def _filter(records, cfg: bins_lib.BinConfig, classes: Sequence[str]):
    keep = {cfg.class_index(c) for c in classes}
    return [r for r in records if r.class_idx in keep]


def build_semisup_datasets(cfg: SemisupConfig):
    bins_cfg = cfg.bin_config()
    if cfg.data_path:
        from transferable3d_tpu.data import pickle_io
        train_recs = pickle_io.load_records(cfg.data_path, split="train")
        val_recs = pickle_io.load_records(cfg.data_path, split="val")
    else:
        train_recs = synthetic.make_dataset(
            cfg.synthetic_train, bins_cfg, seed=cfg.seed,
            hard=cfg.synthetic_hard,
            extra_channels=cfg.num_channels - 3)
        val_recs = synthetic.make_dataset(
            cfg.synthetic_val, bins_cfg, seed=cfg.seed + 10_000,
            hard=cfg.synthetic_hard,
            extra_channels=cfg.num_channels - 3)

    def ds(records, train=True):
        return FrustumDataset(
            records, bins_cfg, npoints=cfg.num_point,
            rotate_to_center=True,
            random_flip=cfg.random_flip and train,
            random_shift=cfg.random_shift and train, seed=cfg.seed)

    strong_train = ds(_filter(train_recs, bins_cfg, cfg.strong_classes))
    weak_train = ds(_filter(train_recs, bins_cfg, cfg.weak_classes))
    # Weak-class val keeps its 3D labels for AP evaluation only.
    weak_val = ds(_filter(val_recs, bins_cfg, cfg.weak_classes),
                  train=False)
    return strong_train, weak_train, weak_val


def pretrain_boxpc(cfg: SemisupConfig, strong_ds: FrustumDataset,
                   logger: Logger):
    bins_cfg = cfg.bin_config()
    model = BoxPCFitNet(cfg=bins_cfg)
    lr_sched = schedules.exponential_staircase_lr(
        cfg.learning_rate, cfg.lr_decay_rate, cfg.lr_decay_samples,
        cfg.batch_size, cfg.min_lr)
    bn_sched = schedules.bn_momentum_schedule(
        cfg.bn_init_decay, cfg.bn_decay_rate, cfg.bn_decay_samples,
        cfg.batch_size, cfg.bn_decay_clip)
    tx = train_loop.make_optimizer(lr_sched)
    sample = strong_ds.get_batch(
        list(range(min(cfg.batch_size, len(strong_ds)))))
    state = semisup.create_boxpc_state(model, bins_cfg, tx, sample,
                                       seed=cfg.seed)
    ckpt = CheckpointManager(f"{cfg.log_dir}/boxpc_ckpt")
    restored = ckpt.restore_latest(state)
    if restored is not None:
        logger.log_string(
            f"boxpc: resumed from step {int(restored.step)}")
        state = restored
    step = semisup.make_boxpc_train_step(model, bins_cfg, tx, bn_sched,
                                         aniso_aug=cfg.boxpc_aniso_aug)

    steps_done = int(state.step)
    target_steps = cfg.boxpc_epochs * max(
        len(strong_ds) // cfg.batch_size, 1)
    epoch = 0
    while steps_done < target_steps:
        for batch in strong_ds.epoch_batches(cfg.batch_size):
            state, metrics = step(state, batch)
            steps_done = int(state.step)
            if steps_done >= target_steps:
                break
        logger.log_string(
            f"boxpc epoch {epoch}: step={steps_done} "
            f"loss={float(metrics['total_loss']):.4f} "
            f"fit_acc={float(metrics['fit_accuracy']):.3f} "
            f"pos={float(metrics['pos_fraction']):.2f}")
        epoch += 1
    ckpt.save(steps_done, jax.device_get(state))
    ckpt.wait()
    ckpt.close()
    return model, state


def train(cfg: SemisupConfig) -> dict:
    logger = Logger(cfg.log_dir)
    logger.log_string(f"semisup config: {dataclasses.asdict(cfg)}")
    bins_cfg = cfg.bin_config()
    strong_ds, weak_ds, weak_val = build_semisup_datasets(cfg)
    logger.log_string(
        f"strong={len(strong_ds)} weak={len(weak_ds)} "
        f"weak_val={len(weak_val)}")

    # Phase A.
    boxpc_model, boxpc_state = pretrain_boxpc(cfg, strong_ds, logger)

    # Phase B.
    devices = (jax.devices()[:cfg.num_devices] if cfg.num_devices
               else jax.devices())
    mesh = mesh_lib.data_parallel_mesh(devices)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    detector = registry.get_model(cfg.model, bins_cfg, dtype=dtype)
    lr_sched = schedules.exponential_staircase_lr(
        cfg.learning_rate, cfg.lr_decay_rate, cfg.lr_decay_samples,
        cfg.batch_size, cfg.min_lr)
    bn_sched = schedules.bn_momentum_schedule(
        cfg.bn_init_decay, cfg.bn_decay_rate, cfg.bn_decay_samples,
        cfg.batch_size, cfg.bn_decay_clip)
    tx = train_loop.make_optimizer(lr_sched)
    sample = strong_ds.get_batch(
        list(range(min(cfg.batch_size, len(strong_ds)))))
    det_state = train_loop.create_train_state(detector, bins_cfg, tx,
                                              sample, seed=cfg.seed)
    state = semisup.SemisupState(
        detector=det_state, boxpc_params=boxpc_state.params,
        boxpc_batch_stats=boxpc_state.batch_stats)
    state = mesh_lib.replicate(state, mesh)
    step = semisup.make_semisup_train_step(
        detector, boxpc_model, bins_cfg, tx, lr_sched, bn_sched,
        weak_weight=cfg.weak_weight,
        weights=semisup.WeakLossWeights(
            fit=cfg.weak_fit, refine=cfg.weak_refine,
            reprojection=cfg.weak_reproj,
            size_prior=cfg.weak_size_prior,
            size_cls=cfg.weak_size_cls,
            trust_gate=cfg.weak_trust_gate),
        weak_warmup_steps=cfg.weak_warmup_steps,
        diag_classes=bins_cfg.num_classes if cfg.per_class_diag else 0)
    eval_step = train_loop.make_eval_step(detector, bins_cfg)

    ckpt = CheckpointManager(f"{cfg.log_dir}/ckpt")

    # Optional HBM-resident datasets: per-step sampling on device for
    # both streams (see data/device_dataset.py).
    strong_dev = weak_dev = None
    if cfg.device_data:
        from transferable3d_tpu.data import device_dataset
        strong_dev = device_dataset.DeviceEpochIterator(
            device_dataset.build_device_dataset(
                strong_ds.records, bins_cfg,
                max_points=cfg.max_points_device),
            bins_cfg, cfg.batch_size, cfg.num_point, seed=cfg.seed,
            random_flip=cfg.random_flip, random_shift=cfg.random_shift)
        weak_dev = device_dataset.DeviceEpochIterator(
            device_dataset.build_device_dataset(
                weak_ds.records, bins_cfg,
                max_points=cfg.max_points_device),
            bins_cfg, cfg.batch_size, cfg.num_point, seed=cfg.seed + 1,
            random_flip=cfg.random_flip, random_shift=cfg.random_shift)
        logger.log_string("device-resident strong/weak datasets in HBM")

    last_eval = {}
    stop = False
    for epoch in range(cfg.max_epoch):
        if stop:
            break
        t0, seen = time.time(), 0
        weak_rng = np.random.RandomState(cfg.seed + epoch)

        def next_weak(it):
            if weak_dev is not None:
                try:
                    return it, next(it)
                except StopIteration:
                    it = iter(weak_dev.epoch())
                    return it, next(it)
            # Weak splits can be smaller than a batch (few weak-class
            # frustums): fall back to sampling with replacement.
            if len(weak_ds) < cfg.batch_size:
                idxs = weak_rng.randint(0, len(weak_ds), cfg.batch_size)
                return it, weak_ds.get_batch(list(idxs))
            try:
                return it, next(it)
            except StopIteration:
                it = iter(weak_ds.epoch_batches(cfg.batch_size))
                return it, next(it)

        weak_iter = iter(weak_dev.epoch() if weak_dev is not None
                         else weak_ds.epoch_batches(cfg.batch_size))
        strong_batches = (strong_dev.epoch() if strong_dev is not None
                          else strong_ds.epoch_batches(cfg.batch_size))
        for strong_batch in strong_batches:
            weak_iter, weak_batch = next_weak(weak_iter)
            state, metrics = step(
                state, mesh_lib.shard_batch(strong_batch, mesh),
                mesh_lib.shard_batch(weak_batch, mesh))
            seen += 2 * cfg.batch_size
            if cfg.max_steps and int(state.detector.step) >= cfg.max_steps:
                stop = True
                break
        dt = time.time() - t0
        m = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                m[k] = float(arr)
            else:  # per-class diagnostic vectors -> indexed columns
                m.update({f"{k}_{i}": float(x)
                          for i, x in enumerate(arr)})
        logger.log_metrics(int(state.detector.step), m, "train")
        logger.log_string(
            f"epoch {epoch}: step={int(state.detector.step)} "
            f"sup={m['total_loss']:.3f} weak={m['weak_total_loss']:.3f} "
            f"fit_prob={m['weak_fit_prob']:.3f} "
            f"trust={m.get('weak_trust_frac', 1.0):.2f} "
            f"({seen / max(dt, 1e-9):.1f} frustums/s)")

        if epoch % cfg.eval_every_epochs == 0 or stop:
            agg = []
            for batch in weak_val.epoch_batches(cfg.batch_size,
                                                shuffle=False):
                agg.append({k: float(v) for k, v in eval_step(
                    state.detector,
                    mesh_lib.shard_batch(batch, mesh)).items()})
            if agg:
                last_eval = {k: float(np.mean([x[k] for x in agg]))
                             for k in agg[0]}
                logger.log_metrics(int(state.detector.step), last_eval,
                                   "weak_val")
                logger.log_string(
                    f"  weak-val: iou3d_ge_025="
                    f"{last_eval.get('iou3d_ge_025', 0):.3f} "
                    f"iou3d={last_eval.get('iou3d_mean', 0):.3f}")
        if epoch % cfg.ckpt_every_epochs == 0 or stop:
            ckpt.save(int(state.detector.step),
                      jax.device_get(state.detector))
    ckpt.wait()
    ckpt.close()
    logger.close()
    return last_eval


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    config_lib.add_cli_args(parser)
    parser.add_argument("--strong_classes",
                        default=",".join(DEFAULT_STRONG))
    parser.add_argument("--weak_classes", default=",".join(DEFAULT_WEAK))
    parser.add_argument("--boxpc_epochs", type=int, default=20)
    parser.add_argument("--weak_weight", type=float, default=1.0)
    args = parser.parse_args()
    base = config_lib.config_from_args(args)
    cfg = SemisupConfig(
        **dataclasses.asdict(base),
        strong_classes=tuple(args.strong_classes.split(",")),
        weak_classes=tuple(args.weak_classes.split(",")),
        boxpc_epochs=args.boxpc_epochs,
        weak_weight=args.weak_weight)
    train(cfg)


if __name__ == "__main__":
    main()
