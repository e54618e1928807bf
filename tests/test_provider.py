"""Provider tests: sampling, rotate-to-center, label encoding, batching."""

import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset

CFG = bins_lib.SUNRGBD


def test_shapes_and_batching():
    recs = synthetic.make_dataset(10, CFG, seed=0)
    ds = FrustumDataset(recs, CFG, npoints=128)
    item = ds[0]
    assert item["points"].shape == (128, 4)
    assert item["seg"].shape == (128,)
    assert item["one_hot"].shape == (CFG.num_classes,)
    batch = ds.get_batch([0, 1, 2])
    assert batch["points"].shape == (3, 128, 4)
    assert batch["center"].shape == (3, 3)
    batches = list(ds.epoch_batches(4))
    assert len(batches) == 2  # 10 // 4, drop_last


def test_rotate_to_center_puts_ray_on_z():
    recs = synthetic.make_dataset(20, CFG, seed=1)
    ds = FrustumDataset(recs, CFG, npoints=256, rotate_to_center=True)
    for i in range(20):
        item = ds[i]
        # Synthetic frustum angle comes from the box center ray, so the
        # rotated GT center must sit on the +Z axis (x ~ 0).
        assert abs(item["center"][0]) < 1e-4, item["center"]
        assert item["center"][2] > 0


def test_label_encoding_roundtrip():
    recs = synthetic.make_dataset(20, CFG, seed=2)
    ds = FrustumDataset(recs, CFG, npoints=256, rotate_to_center=True)
    for i in range(20):
        rec, item = recs[i], ds[i]
        ang = bins_lib.class_to_angle_np(item["heading_class"],
                                         item["heading_residual"])
        want = rec.heading + rec.frustum_angle
        diff = np.angle(np.exp(1j * (ang - want)))
        assert abs(diff) < 1e-5
        size = bins_lib.class_to_size_np(item["size_class"],
                                         item["size_residual"], CFG)
        np.testing.assert_allclose(size, rec.size, atol=1e-5)
        assert item["size_class"] == rec.class_idx


def test_seg_labels_follow_points():
    recs = synthetic.make_dataset(5, CFG, seed=3)
    ds = FrustumDataset(recs, CFG, npoints=512, rotate_to_center=False)
    for i in range(5):
        item = ds[i]
        # Seg fraction should roughly match the record's object fraction.
        frac_rec = recs[i].seg.mean()
        frac_item = item["seg"].mean()
        assert abs(frac_rec - frac_item) < 0.15


def test_flip_augmentation_consistency():
    recs = synthetic.make_dataset(1, CFG, seed=4)
    base = FrustumDataset(recs, CFG, npoints=256, random_flip=False)[0]
    # Run flip many times; whenever center x flips sign, the heading label
    # must decode to pi - original (mod 2pi).
    want_angle = bins_lib.class_to_angle_np(base["heading_class"],
                                            base["heading_residual"])
    flipped_seen = False
    for seed in range(10):
        ds = FrustumDataset(recs, CFG, npoints=256, random_flip=True,
                            seed=seed)
        item = ds[0]
        ang = bins_lib.class_to_angle_np(item["heading_class"],
                                         item["heading_residual"])
        if item["center"][0] * base["center"][0] < 0 or (
                base["center"][0] != 0 and item["center"][0] == 0):
            flipped_seen = True
            diff = np.angle(np.exp(1j * (ang - (np.pi - want_angle))))
            assert abs(diff) < 1e-4
    assert flipped_seen


def test_synthetic_seg_quality():
    # Object points should dominate the in-box mask.
    recs = synthetic.make_dataset(5, CFG, seed=5, n_object=300, n_clutter=100)
    for r in recs:
        assert r.seg.sum() >= 290  # nearly all object points labeled 1
        assert r.seg.sum() <= 340  # clutter rarely falls inside
