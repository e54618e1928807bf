"""Points-axis (sequence-parallel analog) sharding test (SURVEY.md §5.7).

Same init + batch: a (data=2, points=4) mesh step must match the
single-device step — XLA inserts the pmax/psum collectives for the
max-pool and BN statistics from the sharding annotations alone.
"""

import jax
import numpy as np
import optax

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset
from transferable3d_tpu.models.frustum_pointnet_v1 import FrustumPointNetV1
from transferable3d_tpu.parallel import mesh as mesh_lib
from transferable3d_tpu.train import schedules, train_loop

CFG = bins_lib.SUNRGBD


def test_data_points_mesh_invariance():
    assert jax.device_count() >= 8
    recs = synthetic.make_dataset(8, CFG, seed=0, n_object=150,
                                  n_clutter=60)
    ds = FrustumDataset(recs, CFG, npoints=128, rotate_to_center=True,
                        seed=0)
    batch = ds.get_batch(list(range(8)))

    def setup():
        model = FrustumPointNetV1(cfg=CFG, num_object_point=64)
        lr = schedules.exponential_staircase_lr(batch_size=8)
        bn = schedules.bn_momentum_schedule(batch_size=8)
        tx = optax.sgd(lr)
        state = train_loop.create_train_state(model, CFG, tx, batch,
                                              seed=0)
        step = train_loop.make_train_step(
            model, CFG, tx, lr, bn,
            step_cfg=train_loop.StepConfig(compute_iou_metrics=False))
        return state, step

    state1, step1 = setup()
    state1, m1 = step1(state1, batch)

    mesh = mesh_lib.data_points_mesh(2, 4, jax.devices()[:8])
    state2, step2 = setup()
    state2 = mesh_lib.replicate(state2, mesh)
    sharded = mesh_lib.shard_batch(batch, mesh)
    # Points arrays sharded on both axes, labels DP-only.
    assert sharded["points"].sharding.spec == jax.sharding.PartitionSpec(
        "data", "points")
    assert sharded["center"].sharding.spec == jax.sharding.PartitionSpec(
        "data")
    state2, m2 = step2(state2, sharded)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)
