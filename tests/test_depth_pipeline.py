"""On-device depth-to-training pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core import geometry
from transferable3d_tpu.data import depth_pipeline

CFG = bins_lib.SUNRGBD


def test_render_box_depth_geometry():
    K = np.array([[130.0, 0, 80], [0, 130.0, 60], [0, 0, 1]])
    center = np.array([0, 0, 4.0], np.float32)
    size = np.array([1.5, 1.5, 1.5], np.float32)
    depth = depth_pipeline.render_box_depth(120, 160, K, center, size, 0.0)
    # Center pixel hits the box front face at z = 4 - 0.75.
    assert abs(depth[60, 80] - 3.25) < 1e-3
    # Far corner pixel hits the background wall.
    assert depth[0, 0] == 8.0


def test_scene_to_train_batch_shapes_and_labels():
    rng = np.random.RandomState(0)
    scene, K = depth_pipeline.make_depth_scene(rng, CFG, n_frames=2,
                                               boxes_per_frame=2)
    batch = depth_pipeline.scene_to_train_batch(
        scene, jax.random.PRNGKey(0), 256, CFG)
    assert batch["points"].shape == (4, 256, 3)
    assert batch["seg"].shape == (4, 256)
    assert bool(batch["valid"].all())
    assert (np.asarray(batch["count"]) > 50).all()

    # Seg labels: a nontrivial fraction of each frustum is the object
    # (exact fraction is scene-dependent — a near box can almost fill its
    # tight 2D crop; geometric consistency is asserted separately below).
    seg_frac = np.asarray(batch["seg"]).mean(axis=1)
    assert (seg_frac > 0.1).all(), seg_frac

    # Size/heading encodings decode back to the GT.
    size = bins_lib.class_to_size_np(np.asarray(batch["size_class"]),
                                     np.asarray(batch["size_residual"]),
                                     CFG)
    np.testing.assert_allclose(size, np.asarray(scene.size).reshape(4, 3),
                               atol=1e-4)
    hcls = np.asarray(batch["heading_class"])
    hres = np.asarray(batch["heading_residual"])
    dec = bins_lib.class_to_angle_np(hcls, hres)
    want = (np.asarray(scene.heading).reshape(4)
            + np.asarray(batch["frustum_angle"]))
    diff = np.angle(np.exp(1j * (dec - want)))
    np.testing.assert_allclose(diff, 0, atol=1e-4)

    # GT center rotated into the frustum frame sits near the +Z axis.
    c = np.asarray(batch["center"])
    assert (np.abs(c[:, 0]) < 0.6).all()
    assert (c[:, 2] > 2.0).all()


def test_seg_labels_consistent_with_geometry():
    """Every seg=1 point must be inside the GT box (in-graph test vs the
    host in_hull)."""
    from transferable3d_tpu.core import box_np

    rng = np.random.RandomState(1)
    scene, _ = depth_pipeline.make_depth_scene(rng, CFG, n_frames=1,
                                               boxes_per_frame=1)
    batch = depth_pipeline.scene_to_train_batch(
        scene, jax.random.PRNGKey(1), 128, CFG)
    pts = np.asarray(batch["points"][0, :, :3])
    center = np.asarray(batch["center"][0])
    size = bins_lib.class_to_size_np(int(batch["size_class"][0]),
                                     np.asarray(batch["size_residual"][0]),
                                     CFG)
    heading = bins_lib.class_to_angle_np(int(batch["heading_class"][0]),
                                         float(batch["heading_residual"][0]))
    corners = geometry.box_corners_np(center, size, np.float32(heading))
    inside = box_np.in_hull_np(pts, corners)
    seg = np.asarray(batch["seg"][0]).astype(bool)
    # Allow boundary-epsilon mismatches only.
    assert (seg == inside).mean() > 0.98


def test_end_to_end_training_from_depth():
    """Raw depth -> compiled preprocessing -> train step; loss drops."""
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)
    from transferable3d_tpu.train import schedules, train_loop

    rng = np.random.RandomState(2)
    scene, _ = depth_pipeline.make_depth_scene(rng, CFG, n_frames=4,
                                               boxes_per_frame=2)
    npoints = 128
    batch = depth_pipeline.scene_to_train_batch(
        scene, jax.random.PRNGKey(0), npoints, CFG)
    model = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    lr = schedules.exponential_staircase_lr(batch_size=8)
    bn = schedules.bn_momentum_schedule(batch_size=8)
    tx = train_loop.make_optimizer(lr)
    state = train_loop.create_train_state(model, CFG, tx, batch, seed=0)
    step = train_loop.make_train_step(
        model, CFG, tx, lr, bn,
        step_cfg=train_loop.StepConfig(compute_iou_metrics=False))

    losses = []
    for i in range(12):
        batch = depth_pipeline.scene_to_train_batch(
            scene, jax.random.PRNGKey(i), npoints, CFG)
        state, metrics = step(state, {k: batch[k] for k in [
            "points", "seg", "center", "heading_class", "heading_residual",
            "size_class", "size_residual", "one_hot"]})
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
