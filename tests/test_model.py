"""Model forward/loss tests: shapes, finiteness, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.models import model_util
from transferable3d_tpu.models.frustum_pointnet_v1 import (
    BoxEstimationOnly, FrustumPointNetV1)

CFG = bins_lib.SUNRGBD
B, N, C = 4, 256, 4


def _batch(rng):
    points = rng.normal(size=(B, N, C)).astype(np.float32)
    one_hot = np.eye(CFG.num_classes, dtype=np.float32)[
        rng.randint(0, CFG.num_classes, B)]
    labels = model_util.Labels(
        seg=rng.randint(0, 2, (B, N)).astype(np.int64),
        center=rng.normal(size=(B, 3)).astype(np.float32),
        heading_class=rng.randint(0, CFG.num_heading_bin, B).astype(np.int64),
        heading_residual=rng.uniform(-0.1, 0.1, B).astype(np.float32),
        size_class=rng.randint(0, CFG.num_size_cluster, B).astype(np.int64),
        size_residual=rng.uniform(-0.1, 0.1, (B, 3)).astype(np.float32),
    )
    return points, one_hot, labels


def test_forward_shapes_and_loss():
    rng = np.random.RandomState(0)
    points, one_hot, labels = _batch(rng)
    model = FrustumPointNetV1(cfg=CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, one_hot, train=False)

    end_points = model.apply(variables, points, one_hot, train=False)
    assert end_points["seg_logits"].shape == (B, N, 2)
    assert end_points["center"].shape == (B, 3)
    assert end_points["heading_scores"].shape == (B, CFG.num_heading_bin)
    assert end_points["size_residuals"].shape == (B, CFG.num_size_cluster, 3)

    losses = model_util.get_loss(end_points, labels, CFG)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total_loss"]) > 0

    metrics = model_util.compute_metrics(end_points, labels, CFG)
    assert 0.0 <= float(metrics["seg_accuracy"]) <= 1.0
    assert np.isfinite(float(metrics["iou3d_mean"]))


def test_train_mode_updates_batch_stats():
    rng = np.random.RandomState(1)
    points, one_hot, _ = _batch(rng)
    model = FrustumPointNetV1(cfg=CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, one_hot, train=False)
    _, updates = model.apply(
        variables, points, one_hot, train=True, bn_momentum=0.9,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    # Running stats must move away from init (zeros/ones).
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf), 0.0)


def test_gradients_flow_everywhere():
    rng = np.random.RandomState(2)
    points, one_hot, labels = _batch(rng)
    model = FrustumPointNetV1(cfg=CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, one_hot, train=False)

    def loss_fn(params):
        ep, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, one_hot, train=True, bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"])
        return model_util.get_loss(ep, labels, CFG)["total_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero_paths = [jax.tree_util.keystr(p) for p, g in flat
                  if float(jnp.max(jnp.abs(g))) == 0.0]
    # Every submodule must receive gradient (seg_net via seg loss; tnet and
    # box_net via box losses). BN biases of dead relus could be zero by
    # chance, so only require that no whole module is cut off.
    for mod in ["seg_net", "tnet", "box_net"]:
        mod_paths = [jax.tree_util.keystr(p) for p, _ in flat
                     if mod in jax.tree_util.keystr(p)]
        dead = [p for p in mod_paths if p in zero_paths]
        assert len(dead) < len(mod_paths), f"{mod} got no gradient"


def test_masking_matches_numpy_semantics():
    rng = np.random.RandomState(3)
    points = rng.normal(size=(2, 64, 3)).astype(np.float32)
    logits = rng.normal(size=(2, 64, 2)).astype(np.float32)
    out = model_util.point_cloud_masking(
        jnp.asarray(points), jnp.asarray(logits), num_object_point=32)

    for b in range(2):
        mask = logits[b, :, 1] > logits[b, :, 0]
        idx = np.where(mask)[0]
        centroid = (points[b][idx].mean(axis=0) if len(idx)
                    else np.zeros(3))
        np.testing.assert_allclose(np.asarray(out.mask_centroid[b]),
                                   centroid, atol=1e-5)
        got = np.asarray(out.object_points[b]) + centroid
        want = points[b][idx[:32]] if len(idx) else None
        if want is not None:
            m = min(32, len(idx))
            np.testing.assert_allclose(got[:m], want[:m], atol=1e-5)
            # Padding cycles through the masked points (resample w/ repl.).
            if m < 32:
                expect = points[b][idx[np.arange(m, 32) % m]]
                np.testing.assert_allclose(got[m:], expect, atol=1e-5)


def test_masking_empty_mask_no_nan():
    points = jnp.ones((1, 16, 3))
    logits = jnp.stack([jnp.ones((1, 16)), -jnp.ones((1, 16))], axis=-1)
    out = model_util.point_cloud_masking(points, logits, num_object_point=8)
    assert np.isfinite(np.asarray(out.object_points)).all()
    np.testing.assert_allclose(np.asarray(out.mask_centroid), 0.0)


def test_box_estimation_only_model():
    rng = np.random.RandomState(4)
    points, one_hot, labels = _batch(rng)
    model = BoxEstimationOnly(cfg=CFG)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           points, one_hot, train=False)
    ep = model.apply(variables, points, one_hot, train=False)
    losses = model_util.get_loss(ep, labels, CFG)
    assert np.isfinite(float(losses["total_loss"]))


def test_decode_box_roundtrip_perfect_logits():
    """If the network output encodes the GT exactly, decode must recover it."""
    rng = np.random.RandomState(5)
    _, _, labels = _batch(rng)
    nh, ns = CFG.num_heading_bin, CFG.num_size_cluster
    out = np.zeros((B, CFG.box_output_dim), np.float32)
    out[:, 0:3] = labels.center
    for i in range(B):
        out[i, 3 + labels.heading_class[i]] = 10.0  # winning bin
        out[i, 3 + nh + labels.heading_class[i]] = (
            labels.heading_residual[i] / (np.pi / nh))
        out[i, 3 + 2 * nh + labels.size_class[i]] = 10.0
        mean = CFG.mean_size_array()[labels.size_class[i]]
        out[i, 3 + 2 * nh + ns + labels.size_class[i] * 3:
            3 + 2 * nh + ns + labels.size_class[i] * 3 + 3] = (
                labels.size_residual[i] / mean)
    ep = model_util.parse_box_output(jnp.asarray(out), CFG)
    ep["center"] = ep["center_delta"]
    center, size, heading, hcls, scls = model_util.decode_box(ep, CFG)
    np.testing.assert_allclose(np.asarray(center), labels.center, atol=1e-5)
    gt_size = bins_lib.class_to_size_np(labels.size_class,
                                        labels.size_residual, CFG)
    np.testing.assert_allclose(np.asarray(size), gt_size, atol=1e-5)
    gt_heading = bins_lib.class_to_angle_np(labels.heading_class,
                                            labels.heading_residual)
    diff = np.angle(np.exp(1j * (np.asarray(heading) - gt_heading)))
    np.testing.assert_allclose(diff, 0, atol=1e-5)


def test_perfect_prediction_gives_small_loss():
    """Loss at a perfect box prediction ~ 0 for all box terms."""
    rng = np.random.RandomState(6)
    points, _, labels = _batch(rng)
    nh, ns = CFG.num_heading_bin, CFG.num_size_cluster
    out = np.zeros((B, CFG.box_output_dim), np.float32)
    out[:, 0:3] = labels.center
    for i in range(B):
        out[i, 3 + labels.heading_class[i]] = 100.0
        out[i, 3 + nh + labels.heading_class[i]] = (
            labels.heading_residual[i] / (np.pi / nh))
        out[i, 3 + 2 * nh + labels.size_class[i]] = 100.0
        mean = CFG.mean_size_array()[labels.size_class[i]]
        out[i, 3 + 2 * nh + ns + labels.size_class[i] * 3:
            3 + 2 * nh + ns + labels.size_class[i] * 3 + 3] = (
                labels.size_residual[i] / mean)
    ep = model_util.parse_box_output(jnp.asarray(out), CFG)
    ep["center"] = ep["center_delta"]
    ep["stage1_center"] = ep["center"]
    ep["seg_logits"] = jnp.stack(
        [1 - 2.0 * labels.seg, 2.0 * labels.seg - 1], axis=-1) * 100.0
    losses = model_util.get_loss(ep, labels, CFG)
    for k in ["center_loss", "stage1_center_loss", "heading_class_loss",
              "heading_residual_loss", "size_class_loss",
              "size_residual_loss", "corner_loss", "seg_loss"]:
        assert float(losses[k]) < 1e-3, (k, float(losses[k]))

    metrics = model_util.compute_metrics(ep, labels, CFG)
    assert float(metrics["seg_accuracy"]) == 1.0
    assert float(metrics["iou3d_ge_07"]) == 1.0
