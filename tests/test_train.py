"""Training loop tests: smoke convergence on synthetic data, DP invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset
from transferable3d_tpu.models.frustum_pointnet_v1 import FrustumPointNetV1
from transferable3d_tpu.parallel import mesh as mesh_lib
from transferable3d_tpu.train import schedules, train_loop

CFG = bins_lib.SUNRGBD


def _setup(batch, npoints=128, lr=1e-3, sgd=False):
    model = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    lr_sched = schedules.exponential_staircase_lr(
        base_lr=lr, batch_size=batch["points"].shape[0])
    bn_sched = schedules.bn_momentum_schedule(
        batch_size=batch["points"].shape[0])
    # Adam's first-step update is ~sign(g)*lr, which amplifies benign fp
    # reassociation noise to 2*lr — use SGD for exact-invariance tests.
    tx = (optax.sgd(lr_sched) if sgd
          else train_loop.make_optimizer(lr_sched))
    state = train_loop.create_train_state(model, CFG, tx, batch, seed=0)
    step = train_loop.make_train_step(model, CFG, tx, lr_sched, bn_sched)
    return model, state, step


def _data(n=64, npoints=128, batch_size=16, seed=0):
    recs = synthetic.make_dataset(n, CFG, seed=seed, n_object=150,
                                  n_clutter=80)
    ds = FrustumDataset(recs, CFG, npoints=npoints, rotate_to_center=True,
                        seed=seed)
    return ds


def test_loss_decreases_on_synthetic():
    ds = _data()
    batches = [ds.get_batch(list(range(i * 16, (i + 1) * 16)))
               for i in range(4)]
    _, state, step = _setup(batches[0])

    first_losses, last_losses = [], []
    n_epochs = 12
    for epoch in range(n_epochs):
        for b in batches:
            state, metrics = step(state, b)
            if epoch < 2:
                first_losses.append(float(metrics["total_loss"]))
            if epoch >= n_epochs - 2:
                last_losses.append(float(metrics["total_loss"]))
    assert np.isfinite(last_losses).all()
    assert np.mean(last_losses) < 0.55 * np.mean(first_losses), (
        np.mean(first_losses), np.mean(last_losses))
    # IoU metric should be nonzero and seg accuracy should beat chance.
    assert float(metrics["seg_accuracy"]) > 0.6
    assert float(metrics["iou3d_mean"]) > 0.05


def test_dp_invariance_1_vs_8_devices():
    """Same batch, same init: sharded 8-way step == single-device step.

    SURVEY.md §4 item 4 — the core multi-chip correctness test, runnable
    on the virtual CPU mesh.
    """
    assert jax.device_count() >= 8, "conftest should force 8 CPU devices"
    ds = _data(n=16, seed=1)
    batch = ds.get_batch(list(range(16)))

    # Single device run (SGD: update proportional to gradient, so param
    # agreement directly tests gradient all-reduce correctness).
    _, state1, step1 = _setup(batch, sgd=True)
    state1, m1 = step1(state1, batch)
    state1, m1 = step1(state1, batch)

    # 8-way data parallel run: same init (seed 0), batch sharded.
    mesh = mesh_lib.data_parallel_mesh(jax.devices()[:8])
    _, state8, step8 = _setup(batch, sgd=True)
    state8 = mesh_lib.replicate(state8, mesh)
    state8, m8 = step8(state8, mesh_lib.shard_batch(batch, mesh))
    state8, m8 = step8(state8, mesh_lib.shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-4)
    # Parameters after 2 steps must agree to fp-reassociation tolerance:
    # BN scale/bias grads are ~1e7-element fp32 reductions whose shard-wise
    # association differs between mesh sizes (error ~ sqrt(n)*eps*|x|,
    # further scaled by the x20 loss weights), so exact equality is not
    # achievable; 5e-3 catches real sharding bugs (which produce O(1/8)
    # mean-vs-sum errors) while tolerating reassociation noise.
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_eval_and_predict_steps():
    ds = _data(n=16, seed=2)
    batch = ds.get_batch(list(range(16)))
    model, state, step = _setup(batch)
    state, _ = step(state, batch)

    eval_step = train_loop.make_eval_step(model, CFG)
    metrics = eval_step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))

    predict = train_loop.make_predict_step(model, CFG)
    out = predict(state, batch)
    assert out["center"].shape == (16, 3)
    assert out["size"].shape == (16, 3)
    assert out["heading"].shape == (16,)
    assert np.isfinite(np.asarray(out["center"])).all()
    assert (np.asarray(out["seg_conf"]) >= 0).all()


def test_schedules_match_tf1_semantics():
    lr = schedules.exponential_staircase_lr(
        base_lr=1e-3, decay_rate=0.7, decay_samples=1000, batch_size=10)
    assert float(lr(0)) == pytest.approx(1e-3)
    assert float(lr(99)) == pytest.approx(1e-3)   # 990 samples < 1000
    assert float(lr(100)) == pytest.approx(7e-4)  # staircase kicks in
    assert float(lr(100000)) == pytest.approx(1e-5)  # clipped at min

    bn = schedules.bn_momentum_schedule(decay_samples=1000, batch_size=10)
    assert float(bn(0)) == pytest.approx(0.5)    # 1 - 0.5
    assert float(bn(100)) == pytest.approx(0.75)  # 1 - 0.25
    assert float(bn(100000)) == pytest.approx(0.99)  # clipped


def test_dp_invariance_v2_1_vs_8_devices():
    """v2 (PointNet++) under the same 1-vs-8 DP-invariance check as v1
    (round-1 verdict item 9): validates sharded FPS, ball-query
    grouping, SA/FP stacks and their gradients on the virtual mesh."""
    from transferable3d_tpu.models.frustum_pointnet_v2 import (
        FrustumPointNetV2)

    assert jax.device_count() >= 8
    ds = _data(n=8, seed=3)
    batch = ds.get_batch(list(range(8)))

    def setup():
        model = FrustumPointNetV2(cfg=CFG, num_object_point=64)
        lr_sched = schedules.exponential_staircase_lr(base_lr=1e-3,
                                                      batch_size=8)
        bn_sched = schedules.bn_momentum_schedule(batch_size=8)
        tx = optax.sgd(lr_sched)
        state = train_loop.create_train_state(model, CFG, tx, batch,
                                              seed=0)
        step = train_loop.make_train_step(
            model, CFG, tx, lr_sched, bn_sched,
            step_cfg=train_loop.StepConfig(compute_iou_metrics=False))
        return state, step

    state1, step1 = setup()
    state1, m1 = step1(state1, batch)

    mesh = mesh_lib.data_parallel_mesh(jax.devices()[:8])
    state8, step8 = setup()
    state8 = mesh_lib.replicate(state8, mesh)
    state8, m8 = step8(state8, mesh_lib.shard_batch(batch, mesh))

    # v2's loss reduces over far more BN statistics than v1's; shard-wise
    # reassociation moves the total by ~1e-4 relative (a real DP bug
    # produces O(1/n_devices) errors).
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-3)
    # BN batch statistics reassociate across shards (~1e-7 relative);
    # through v2's deep chain that flips occasional relu/max gates, so
    # per-element grads are chaotic at the 1e-3 level. Check the
    # tree-wide relative L2 instead: a real sharding bug (mean-vs-sum
    # gradients) is an O(1) relative error, reassociation chaos ~1e-3.
    num = den = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        num += float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
        den += float(np.sum(np.asarray(a) ** 2))
    assert (num / den) ** 0.5 < 2e-2, (num / den) ** 0.5


def test_valid_weight_masking():
    """StepConfig.use_valid_weights: padded frustums (valid=False) must
    not contribute to the loss or gradients (the on-device depth
    pipeline emits fixed-shape frame batches with padding boxes)."""
    ds = _data(n=8, seed=5)
    batch = dict(ds.get_batch(list(range(8))))
    model = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    lr_sched = schedules.exponential_staircase_lr(base_lr=1e-3,
                                                  batch_size=8)
    bn_sched = schedules.bn_momentum_schedule(batch_size=8)
    tx = optax.sgd(lr_sched)
    state = train_loop.create_train_state(model, CFG, tx, batch, seed=0)
    step = train_loop.make_train_step(
        model, CFG, tx, lr_sched, bn_sched,
        step_cfg=train_loop.StepConfig(compute_iou_metrics=False,
                                       use_valid_weights=True))

    batch_a = dict(batch)
    batch_a["valid"] = np.ones(8, bool)
    # Corrupt the last 4 examples' labels AND mark them invalid: the
    # loss must be identical to the clean all-valid run on the first 4.
    batch_b = {k: np.array(v, copy=True) for k, v in batch.items()}
    batch_b["seg"][4:] = 1 - batch_b["seg"][4:]
    batch_b["center"][4:] += 50.0
    batch_b["valid"] = np.array([True] * 4 + [False] * 4)

    batch_a_half = {k: np.array(v, copy=True) for k, v in batch.items()}
    batch_a_half["valid"] = np.array([True] * 4 + [False] * 4)

    # The step donates its state; use a fresh (identical, seed-0) state
    # per invocation.
    mk_state = lambda: train_loop.create_train_state(model, CFG, tx,
                                                     batch, seed=0)
    _, m_clean = step(mk_state(), batch_a_half)
    _, m_corrupt = step(mk_state(), batch_b)
    np.testing.assert_allclose(float(m_clean["total_loss"]),
                               float(m_corrupt["total_loss"]),
                               rtol=1e-5)
    # And an invalid-label batch must not blow the loss up vs all-valid.
    _, m_all = step(mk_state(), batch_a)
    assert np.isfinite(float(m_all["total_loss"]))
