"""Round-trip tests for heading/size bin codecs (SURVEY.md §4 item 1)."""

import numpy as np
import pytest

from transferable3d_tpu.core import bins


def test_heading_roundtrip_np():
    rng = np.random.RandomState(0)
    angles = rng.uniform(-4 * np.pi, 4 * np.pi, size=1000)
    cls, res = bins.angle_to_class_np(angles)
    rec = bins.class_to_angle_np(cls, res)
    # Compare on the circle.
    diff = np.angle(np.exp(1j * (rec - angles)))
    np.testing.assert_allclose(diff, 0.0, atol=1e-5)
    assert cls.min() >= 0 and cls.max() < bins.NUM_HEADING_BIN
    # Residuals bounded by half a bin width.
    w = 2 * np.pi / bins.NUM_HEADING_BIN
    assert np.abs(res).max() <= w / 2 + 1e-6


def test_heading_roundtrip_jax_matches_np():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    angles = rng.uniform(-np.pi, np.pi, size=256).astype(np.float32)
    cls_np, res_np = bins.angle_to_class_np(angles)
    cls_j, res_j = bins.angle_to_class(jnp.asarray(angles))
    np.testing.assert_array_equal(np.asarray(cls_j), cls_np)
    np.testing.assert_allclose(np.asarray(res_j), res_np, atol=1e-5)
    rec = bins.class_to_angle(cls_j, res_j)
    diff = np.angle(np.exp(1j * (np.asarray(rec) - angles)))
    np.testing.assert_allclose(diff, 0.0, atol=1e-5)


def test_heading_bin_centers():
    # Bin k center is exactly k * (2pi/NB): residual 0 there.
    w = 2 * np.pi / bins.NUM_HEADING_BIN
    centers = np.arange(bins.NUM_HEADING_BIN) * w
    cls, res = bins.angle_to_class_np(centers)
    np.testing.assert_array_equal(cls, np.arange(bins.NUM_HEADING_BIN))
    np.testing.assert_allclose(res, 0.0, atol=1e-6)


@pytest.mark.parametrize("cfg", [bins.SUNRGBD, bins.KITTI])
def test_size_roundtrip(cfg):
    rng = np.random.RandomState(2)
    n = 100
    labels = rng.randint(0, cfg.num_classes, size=n)
    sizes = (cfg.mean_size_array()[labels]
             * rng.uniform(0.7, 1.3, size=(n, 3))).astype(np.float32)
    cluster, res = bins.size_to_class_np(sizes, labels, cfg)
    rec = bins.class_to_size_np(cluster, res, cfg)
    np.testing.assert_allclose(rec, sizes, atol=1e-5)
    np.testing.assert_array_equal(cluster, labels)


def test_config_shapes():
    assert bins.SUNRGBD.num_classes == 10
    assert bins.SUNRGBD.num_size_cluster == 10
    assert bins.SUNRGBD.box_output_dim == 3 + 24 + 40
    assert bins.KITTI.num_size_cluster == 8
    # Hashable (usable as a jit static arg).
    hash(bins.SUNRGBD)


def test_mean_size_recompute():
    rng = np.random.RandomState(3)
    labels = np.repeat(np.arange(3), 50)
    sizes = np.stack([labels + 1.0, labels + 2.0, labels + 3.0], axis=1)
    sizes = sizes + rng.normal(0, 1e-3, sizes.shape)
    cfg = bins.BinConfig.from_boxes(["a", "b", "c"], labels, sizes)
    means = cfg.mean_size_array()
    np.testing.assert_allclose(means[:, 0], [1, 2, 3], atol=1e-3)
