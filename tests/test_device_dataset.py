"""Device-resident dataset tests: sampling, augmentation, label parity."""

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import device_dataset, synthetic
from transferable3d_tpu.data.provider import FrustumDataset

CFG = bins_lib.SUNRGBD


def _records(n=8, seed=0):
    return synthetic.make_dataset(n, CFG, seed=seed, n_object=150,
                                  n_clutter=60)


def test_build_and_label_parity_with_host_provider():
    recs = _records()
    data = device_dataset.build_device_dataset(recs, CFG, max_points=512)
    host = FrustumDataset(recs, CFG, npoints=128, rotate_to_center=True)
    for i in range(len(recs)):
        item = host[i]
        # Same rotated GT and bin labels as the host provider.
        np.testing.assert_allclose(np.asarray(data.center[i]),
                                   item["center"], atol=1e-5)
        hcls, hres = bins_lib.angle_to_class_np(
            float(data.heading[i]), CFG.num_heading_bin)
        assert hcls == item["heading_class"]
        assert abs(hres - item["heading_residual"]) < 1e-5
        assert int(data.class_idx[i]) == item["class_idx"]


def test_sample_batch_contents():
    recs = _records()
    data = device_dataset.build_device_dataset(recs, CFG, max_points=512)
    idxs = jnp.asarray([0, 1, 2, 3])
    batch = device_dataset.sample_batch(
        data, jax.random.PRNGKey(0), idxs, 128, CFG,
        random_flip=False, random_shift=False)
    assert batch["points"].shape == (4, 128, 4)
    assert batch["seg"].shape == (4, 128)
    # Sampled points come from the record's valid prefix.
    for j, i in enumerate([0, 1, 2, 3]):
        m = int(data.count[i])
        src = np.asarray(data.points[i, :m])
        sampled = np.asarray(batch["points"][j])
        src_set = {tuple(np.round(p, 4)) for p in src}
        hits = sum(tuple(np.round(p, 4)) in src_set for p in sampled)
        assert hits == 128
    # Labels identical to the stored (unaugmented) GT.
    np.testing.assert_allclose(np.asarray(batch["center"]),
                               np.asarray(data.center[:4]), atol=1e-6)


def test_flip_consistency():
    recs = _records()
    data = device_dataset.build_device_dataset(recs, CFG, max_points=512)
    idxs = jnp.arange(8)
    batch = device_dataset.sample_batch(
        data, jax.random.PRNGKey(3), idxs, 64, CFG,
        random_flip=True, random_shift=False)
    # Rotated-to-center records have center x ~ 0, so detect the flip via
    # the sampled POINTS (x values present in the source prefix vs their
    # negation), then check the heading transformed consistently.
    n_flipped = 0
    for j in range(8):
        pts = np.asarray(batch["points"][j])
        m = int(data.count[j])
        src_x = np.round(
            np.asarray(data.points[j, :m, 0], np.float64), 4)
        x64 = np.asarray(pts[:, 0], np.float64)
        direct = np.isin(np.round(x64, 4), src_x).mean()
        mirrored = np.isin(np.round(-x64, 4), src_x).mean()
        flipped = mirrored > direct
        n_flipped += flipped
        h0 = float(data.heading[j])
        h = bins_lib.class_to_angle_np(
            int(batch["heading_class"][j]),
            float(batch["heading_residual"][j]))
        want = np.pi - h0 if flipped else h0
        diff = np.angle(np.exp(1j * (h - want)))
        assert abs(diff) < 1e-4, (j, flipped, h, h0)
    # Both branches occur across the batch (p(all same) = 2^-7).
    assert 0 < n_flipped < 8


def test_trains_with_device_batches():
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)
    from transferable3d_tpu.train import schedules, train_loop

    recs = _records(n=16, seed=1)
    data = device_dataset.build_device_dataset(recs, CFG, max_points=256)
    it = device_dataset.DeviceEpochIterator(data, CFG, batch_size=8,
                                            npoints=128, seed=0)
    batches = list(it.epoch())
    assert len(batches) == 2

    model = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    lr = schedules.exponential_staircase_lr(batch_size=8)
    bn = schedules.bn_momentum_schedule(batch_size=8)
    tx = train_loop.make_optimizer(lr)
    state = train_loop.create_train_state(model, CFG, tx, batches[0],
                                          seed=0)
    step = train_loop.make_train_step(
        model, CFG, tx, lr, bn,
        step_cfg=train_loop.StepConfig(compute_iou_metrics=False))
    losses = []
    for _ in range(6):
        for b in it.epoch():
            state, m = step(state, b)
            losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
