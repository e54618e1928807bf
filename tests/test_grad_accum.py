"""Gradient accumulation: k microbatches == 1 big batch (SGD exactness)."""

import dataclasses

import jax
import numpy as np
import optax

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset
from transferable3d_tpu.models.frustum_pointnet_v1 import FrustumPointNetV1
from transferable3d_tpu.train import schedules, train_loop

CFG = bins_lib.SUNRGBD


def test_multisteps_accumulates():
    recs = synthetic.make_dataset(8, CFG, seed=0, n_object=100,
                                  n_clutter=40)
    ds = FrustumDataset(recs, CFG, npoints=64, rotate_to_center=True,
                        seed=0)
    batch = ds.get_batch(list(range(8)))

    model = FrustumPointNetV1(cfg=CFG, num_object_point=32)
    lr = schedules.exponential_staircase_lr(batch_size=8)
    bn = schedules.bn_momentum_schedule(batch_size=8)
    tx = train_loop.make_optimizer(lr, grad_accum_steps=2)
    state = train_loop.create_train_state(model, CFG, tx, batch, seed=0)
    step = train_loop.make_train_step(
        model, CFG, tx, lr, bn,
        step_cfg=train_loop.StepConfig(compute_iou_metrics=False))

    params0 = jax.device_get(state.params)
    # First microbatch: params must NOT change (accumulating).
    state, _ = step(state, batch)
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(params0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)
    # Second microbatch: update applied.
    state, _ = step(state, batch)
    p2 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(params0), p2))
    assert changed


def test_cli_flag_plumbs_through(tmp_path):
    from transferable3d_tpu.train import config as config_lib
    from transferable3d_tpu.train import train_sup

    cfg = config_lib.TrainConfig(
        model="box_estimation_v1", num_point=64, num_channels=4,
        batch_size=8, max_epoch=1, max_steps=2, synthetic_train=16,
        synthetic_val=8, log_dir=str(tmp_path), grad_accum_steps=2,
        eval_every_epochs=100, ckpt_every_epochs=100)
    out = train_sup.train(cfg)
    assert out == {} or np.isfinite(out.get("total_loss", 0.0))
