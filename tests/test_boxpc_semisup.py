"""BoxPC fit net + semi-supervised transfer training tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data import synthetic
from transferable3d_tpu.data.provider import FrustumDataset
from transferable3d_tpu.models import boxpc as boxpc_lib
from transferable3d_tpu.models.boxpc import BoxPCFitNet, BoxParams
from transferable3d_tpu.train import schedules, semisup, train_loop

CFG = bins_lib.SUNRGBD


def _strong_batch(n=8, npoints=128, seed=0):
    recs = synthetic.make_dataset(n, CFG, seed=seed, n_object=150,
                                  n_clutter=60)
    ds = FrustumDataset(recs, CFG, npoints=npoints, rotate_to_center=True,
                        seed=seed)
    return ds.get_batch(list(range(n)))


def test_canonicalize_inside_indicator():
    rng = np.random.RandomState(0)
    center = jnp.asarray(rng.uniform(-2, 2, (2, 3)).astype(np.float32))
    size = jnp.asarray(np.array([[2.0, 1.0, 1.0], [1.0, 3.0, 2.0]],
                                np.float32))
    heading = jnp.asarray(np.array([0.3, -1.2], np.float32))
    box = BoxParams(center, size, heading)
    # Points exactly at centers -> inside; far away -> outside.
    pts = jnp.stack([
        jnp.stack([center[0], center[0] + 100.0]),
        jnp.stack([center[1], center[1] + 100.0])])
    feats = boxpc_lib.canonicalize_points(pts, box)
    assert feats.shape == (2, 2, 7)
    inside = np.asarray(feats[..., 6])
    np.testing.assert_array_equal(inside, [[1, 0], [1, 0]])
    # Center maps to the box-frame origin.
    np.testing.assert_allclose(np.asarray(feats[:, 0, :3]), 0.0, atol=1e-5)


def test_perturbation_targets_exactness():
    """apply_deltas(perturbed, targets) must reproduce the GT box."""
    rng = np.random.RandomState(1)
    n = 16
    gt = BoxParams(
        center=jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32)),
        size=jnp.asarray(rng.uniform(0.5, 3, (n, 3)).astype(np.float32)),
        heading=jnp.asarray(
            rng.uniform(-np.pi, np.pi, n).astype(np.float32)))
    pert = boxpc_lib.sample_perturbed_boxes(jax.random.PRNGKey(0), gt)
    targets = boxpc_lib.boxpc_targets(pert, gt)
    restored = boxpc_lib.apply_deltas(pert, {
        "delta_center": targets["delta_center"],
        "delta_heading": targets["delta_heading"],
        "delta_size": targets["delta_size"]})
    np.testing.assert_allclose(np.asarray(restored.center),
                               np.asarray(gt.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(restored.size),
                               np.asarray(gt.size), atol=1e-4)
    np.testing.assert_allclose(np.asarray(restored.heading),
                               np.asarray(gt.heading), atol=1e-4)
    # Fit labels: identical boxes are positive.
    t_same = boxpc_lib.boxpc_targets(gt, gt)
    np.testing.assert_array_equal(np.asarray(t_same["fit_label"]), 1.0)


def test_anisotropic_shape_aug_consistency():
    """Joint cloud+box rescale: the inside-box mask and the
    box-half-size-normalized (canonicalized) coordinates are invariant;
    the box size actually changes."""
    rng = np.random.RandomState(5)
    n, npts = 8, 64
    gt = BoxParams(
        center=jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32)),
        size=jnp.asarray(rng.uniform(0.5, 3, (n, 3)).astype(np.float32)),
        heading=jnp.asarray(
            rng.uniform(-np.pi, np.pi, n).astype(np.float32)))
    pts = jnp.asarray(rng.uniform(-4, 4, (n, npts, 4)).astype(np.float32))
    new_pts, new_gt = semisup.anisotropic_shape_aug(
        jax.random.PRNGKey(0), pts, gt, log_range=0.8, frac=1.0)
    f0 = boxpc_lib.canonicalize_points(pts[..., :3], gt)
    f1 = boxpc_lib.canonicalize_points(new_pts[..., :3], new_gt)
    # normalized coords + inside mask invariant (channels 0:3 and 6)
    np.testing.assert_allclose(np.asarray(f1[..., :3]),
                               np.asarray(f0[..., :3]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(f1[..., 6]),
                                  np.asarray(f0[..., 6]))
    # extra channels untouched, sizes actually changed
    np.testing.assert_array_equal(np.asarray(new_pts[..., 3]),
                                  np.asarray(pts[..., 3]))
    assert float(jnp.max(jnp.abs(jnp.log(new_gt.size / gt.size)))) > 0.1
    # and a self-fit target is still a positive label
    t = boxpc_lib.boxpc_targets(new_gt, new_gt)
    np.testing.assert_array_equal(np.asarray(t["fit_label"]), 1.0)


def test_boxpc_trains_and_learns_fit():
    batch = _strong_batch(n=16)
    model = BoxPCFitNet(cfg=CFG)
    lr = schedules.exponential_staircase_lr(base_lr=1e-3, batch_size=16)
    bn = schedules.bn_momentum_schedule(batch_size=16)
    tx = train_loop.make_optimizer(lr)
    state = semisup.create_boxpc_state(model, CFG, tx, batch, seed=0)
    step = semisup.make_boxpc_train_step(model, CFG, tx, bn)

    first, last = None, None
    for i in range(40):
        state, metrics = step(state, batch)
        if i < 3:
            first = float(metrics["total_loss"]) if first is None else first
        last = float(metrics["total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    # Positive fraction should be sane (perturbations straddle the
    # fit threshold).
    assert 0.02 < float(metrics["pos_fraction"]) < 0.98


def test_weak_losses_shapes_and_grads():
    batch = _strong_batch(n=8)
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)

    detector = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    det_vars = detector.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["points"], batch["one_hot"], train=False)

    boxpc_model = BoxPCFitNet(cfg=CFG)
    gt = semisup.gt_boxes_from_batch(batch, CFG)
    boxpc_vars = boxpc_model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        batch["points"], gt, train=False)

    def weak_total(params):
        ep = detector.apply(
            {"params": params, "batch_stats": det_vars["batch_stats"]},
            batch["points"], batch["one_hot"], train=False)
        losses = semisup.weak_losses(ep, batch, boxpc_model, boxpc_vars,
                                     CFG)
        return losses["weak_total_loss"], losses

    (total, losses), grads = jax.value_and_grad(
        weak_total, has_aux=True)(det_vars["params"])
    assert np.isfinite(float(total))
    for k in ["weak_fit_loss", "weak_refine_loss", "weak_reproj_loss",
              "weak_size_prior_loss"]:
        assert np.isfinite(float(losses[k])), k
    # Gradient must reach the box head (weak supervision flows).
    box_grads = jax.tree_util.tree_leaves(grads["box_net"])
    assert any(float(jnp.abs(g).max()) > 0 for g in box_grads)
    # BoxPC itself received no gradient (it is frozen by construction —
    # not part of the differentiated params).

    # Per-class diagnostics (round-3 verdict item 9): vectors of the
    # right shape whose count-weighted means reproduce the batch
    # scalars exactly.
    ep = detector.apply(det_vars, batch["points"], batch["one_hot"],
                        train=False)
    diag = semisup.weak_losses(ep, batch, boxpc_model, boxpc_vars, CFG,
                               diag_classes=CFG.num_classes)
    nc = CFG.num_classes
    cnt = np.asarray(diag["diag_count"])
    assert cnt.shape == (nc,) and cnt.sum() == len(batch["class_idx"])
    for key, scalar in [("diag_trust_frac", "weak_trust_frac"),
                        ("diag_fit_loss", "weak_fit_loss"),
                        ("diag_refine_loss", "weak_refine_loss")]:
        v = np.asarray(diag[key])
        assert v.shape == (nc,), key
        np.testing.assert_allclose(
            (v * cnt).sum() / cnt.sum(), float(diag[scalar]),
            rtol=1e-5, err_msg=key)
    for key in ["diag_dc_mag", "diag_ds_mag", "diag_dh_mag",
                "diag_prior_dev"]:
        assert np.asarray(diag[key]).shape == (nc,), key


def test_semisup_step_runs_and_decreases():
    strong = _strong_batch(n=8, seed=3)
    weak = _strong_batch(n=8, seed=4)
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)

    detector = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    boxpc_model = BoxPCFitNet(cfg=CFG)
    lr = schedules.exponential_staircase_lr(base_lr=1e-3, batch_size=8)
    bn = schedules.bn_momentum_schedule(batch_size=8)
    tx = train_loop.make_optimizer(lr)
    det_state = train_loop.create_train_state(detector, CFG, tx, strong,
                                              seed=0)
    boxpc_state = semisup.create_boxpc_state(
        boxpc_model, CFG, train_loop.make_optimizer(lr), strong, seed=1)
    boxpc_params_before = jax.device_get(boxpc_state.params)
    state = semisup.SemisupState(
        detector=det_state, boxpc_params=boxpc_state.params,
        boxpc_batch_stats=boxpc_state.batch_stats)
    step = semisup.make_semisup_train_step(
        detector, boxpc_model, CFG, tx, lr, bn,
        step_cfg=train_loop.StepConfig(compute_iou_metrics=False))

    losses = []
    for _ in range(15):
        state, metrics = step(state, strong, weak)
        losses.append(float(metrics["combined_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.detector.step) == 15
    # BoxPC stayed frozen (compare to the pre-step host snapshot; the
    # originals were donated).
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.boxpc_params)[0]),
        jax.tree_util.tree_leaves(boxpc_params_before)[0])


def test_semisup_step_v2_backbone():
    """The fused semisup step through the v2 (PointNet++) detector —
    the backbone the round-4 transfer study runs (verdict item 6); only
    v1 had ever taken the semisup path end-to-end."""
    strong = _strong_batch(n=8, seed=5)
    weak = _strong_batch(n=8, seed=6)
    from transferable3d_tpu.models.frustum_pointnet_v2 import (
        FrustumPointNetV2)

    detector = FrustumPointNetV2(cfg=CFG, num_object_point=64)
    boxpc_model = BoxPCFitNet(cfg=CFG)
    lr = schedules.exponential_staircase_lr(base_lr=1e-3, batch_size=8)
    bn = schedules.bn_momentum_schedule(batch_size=8)
    tx = train_loop.make_optimizer(lr)
    det_state = train_loop.create_train_state(detector, CFG, tx, strong,
                                              seed=0)
    boxpc_state = semisup.create_boxpc_state(
        boxpc_model, CFG, train_loop.make_optimizer(lr), strong, seed=1)
    state = semisup.SemisupState(
        detector=det_state, boxpc_params=boxpc_state.params,
        boxpc_batch_stats=boxpc_state.batch_stats)
    step = semisup.make_semisup_train_step(
        detector, boxpc_model, CFG, tx, lr, bn,
        step_cfg=train_loop.StepConfig(compute_iou_metrics=False),
        diag_classes=CFG.num_classes)
    for _ in range(2):
        state, metrics = step(state, strong, weak)
    assert np.isfinite(float(metrics["combined_loss"]))
    assert np.isfinite(float(metrics["weak_total_loss"]))
    assert np.asarray(metrics["diag_trust_frac"]).shape == (
        CFG.num_classes,)
    assert int(state.detector.step) == 2


def test_semisup_driver_smoke(tmp_path):
    from transferable3d_tpu.train import train_semisup

    cfg = train_semisup.SemisupConfig(
        model="frustum_pointnets_v1", num_point=64, num_channels=4,
        batch_size=8, max_epoch=1, max_steps=2, boxpc_epochs=1,
        synthetic_train=32, synthetic_val=16, log_dir=str(tmp_path),
        eval_every_epochs=1, ckpt_every_epochs=1,
        strong_classes=("bed", "table", "sofa", "chair"),
        weak_classes=("toilet", "desk"), per_class_diag=True)
    out = train_semisup.train(cfg)
    assert np.isfinite(out.get("total_loss", 0.0))
    assert (tmp_path / "log_train.txt").exists()
    # per_class_diag expands [num_classes] vectors into indexed CSV
    # columns (verdict item 9 instrumentation).
    header = (tmp_path / "metrics_train.csv").read_text().splitlines()[0]
    assert "diag_trust_frac_0" in header
    assert f"diag_count_{CFG.num_classes - 1}" in header


def test_semisup_driver_device_data(tmp_path):
    from transferable3d_tpu.train import train_semisup

    cfg = train_semisup.SemisupConfig(
        model="frustum_pointnets_v1", num_point=64, num_channels=4,
        batch_size=8, max_epoch=1, max_steps=2, boxpc_epochs=1,
        synthetic_train=48, synthetic_val=16, log_dir=str(tmp_path),
        eval_every_epochs=1, ckpt_every_epochs=1, device_data=True,
        max_points_device=256,
        strong_classes=("bed", "table", "sofa", "chair"),
        weak_classes=("toilet", "desk", "dresser"))
    out = train_semisup.train(cfg)
    assert np.isfinite(out.get("total_loss", 0.0))


def test_boxpc_refinement_improves_perturbed_boxes():
    """A briefly trained BoxPC must move perturbed boxes toward GT
    (VERDICT round-1 item 4: refinement used at the inference surface)."""
    from transferable3d_tpu.core import geometry

    batch = _strong_batch(n=64, seed=7)
    model = BoxPCFitNet(cfg=CFG)
    lr = schedules.exponential_staircase_lr(base_lr=1e-3, batch_size=64)
    bn = schedules.bn_momentum_schedule(batch_size=64)
    tx = train_loop.make_optimizer(lr)
    state = semisup.create_boxpc_state(model, CFG, tx, batch, seed=0)
    step = semisup.make_boxpc_train_step(model, CFG, tx, bn)
    # The delta head needs real training to beat the identity refinement
    # (measured: 120 steps degrades IoU, 500+ improves it by >0.08).
    for _ in range(500):
        state, metrics = step(state, batch)

    gt = semisup.gt_boxes_from_batch(batch, CFG)
    pert = boxpc_lib.sample_perturbed_boxes(jax.random.PRNGKey(5), gt,
                                            small_frac=0.5)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    from transferable3d_tpu.train.test import make_boxpc_refine_step
    refine = make_boxpc_refine_step(model, iterations=1)
    c, s, h, fit = refine(variables, batch["points"], pert.center,
                          pert.size, pert.heading)

    iou_before, _ = geometry.box3d_iou_batched(
        pert.center, pert.size, pert.heading,
        gt.center, gt.size, gt.heading)
    iou_after, _ = geometry.box3d_iou_batched(
        c, s, h, gt.center, gt.size, gt.heading)
    assert np.isfinite(np.asarray(c)).all()
    assert float(jnp.mean(iou_after)) > float(jnp.mean(iou_before)) + 0.02, (
        float(jnp.mean(iou_before)), float(jnp.mean(iou_after)))
    assert np.asarray(fit).shape == (64,)


def test_run_inference_with_boxpc_refinement():
    """The inference surface accepts the BoxPC and produces refined,
    finite detections that differ from the unrefined ones."""
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)
    from transferable3d_tpu.train import test as test_lib

    recs = synthetic.make_dataset(8, CFG, seed=9, n_object=150,
                                  n_clutter=60)
    ds = FrustumDataset(recs, CFG, npoints=128, rotate_to_center=True,
                        seed=9)
    batch = ds.get_batch(list(range(8)))

    detector = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    lr = schedules.exponential_staircase_lr(base_lr=1e-3, batch_size=8)
    tx = train_loop.make_optimizer(lr)
    det_state = train_loop.create_train_state(detector, CFG, tx, batch,
                                              seed=0)
    boxpc_model = BoxPCFitNet(cfg=CFG)
    bp_state = semisup.create_boxpc_state(
        boxpc_model, CFG, train_loop.make_optimizer(lr), batch, seed=1)
    bp_vars = {"params": bp_state.params,
               "batch_stats": bp_state.batch_stats}

    base = test_lib.run_inference(detector, det_state, ds, CFG,
                                  batch_size=8)
    refined = test_lib.run_inference(
        detector, det_state, ds, CFG, batch_size=8,
        boxpc_model=boxpc_model, boxpc_variables=bp_vars, boxpc_steps=2)
    assert len(base) == len(refined) == 8
    assert all(np.isfinite(d.center).all() and np.isfinite(d.size).all()
               for d in refined)
    deltas = [np.abs(b.center - r.center).max()
              for b, r in zip(base, refined)]
    assert max(deltas) > 0  # the refinement actually moved something


def test_calib_reprojection_residual():
    """Calib-exact reprojection: zero at the true box, positive when the
    box moves, and consistent under the frustum rotation."""
    from transferable3d_tpu.core import geometry

    rng = np.random.RandomState(3)
    b = 6
    f, cu, cv = 700.0, 620.0, 190.0
    P = np.zeros((b, 3, 4), np.float32)
    P[:, 0, 0] = f
    P[:, 1, 1] = f
    P[:, 0, 2] = cu
    P[:, 1, 2] = cv
    P[:, 2, 2] = 1.0
    P[:, 0, 3] = rng.uniform(-40, 40, b)  # stereo baseline term

    center = np.stack([rng.uniform(-4, 4, b), rng.uniform(-0.5, 1.0, b),
                       rng.uniform(8, 30, b)], -1).astype(np.float32)
    size = rng.uniform(0.8, 3.0, (b, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, b).astype(np.float32)
    corners_rect = np.asarray(geometry.box_corners(
        jnp.asarray(center), jnp.asarray(size), jnp.asarray(heading)))

    # Exact 2D bounds by plain numpy projection.
    hom = np.concatenate([corners_rect, np.ones((b, 8, 1))], -1)
    uvw = np.einsum("bnc,bdc->bnd", hom, P)
    uv = uvw[..., :2] / uvw[..., 2:3]
    box2d = np.concatenate([uv.min(1), uv.max(1)], -1).astype(np.float32)

    # Corners arrive in the frustum frame: rotate by +angle, pass angle.
    ang = rng.uniform(-0.5, 0.5, b).astype(np.float32)
    corners_frustum = np.asarray(geometry.rotate_points_y(
        jnp.asarray(corners_rect), jnp.asarray(ang)))

    res = semisup.calib_reprojection_residual(
        jnp.asarray(corners_frustum), jnp.asarray(ang), jnp.asarray(P),
        jnp.asarray(box2d))
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-4)

    # A shifted box projects elsewhere -> positive residual; grads flow.
    def loss(c):
        corners = geometry.box_corners(c, jnp.asarray(size),
                                       jnp.asarray(heading))
        corners = geometry.rotate_points_y(corners, jnp.asarray(ang))
        return jnp.sum(semisup.calib_reprojection_residual(
            corners, jnp.asarray(ang), jnp.asarray(P),
            jnp.asarray(box2d)))

    shifted = jnp.asarray(center + np.array([1.0, 0.0, 0.0], np.float32))
    assert float(loss(shifted)) > 1e-3
    g = jax.grad(loss)(shifted)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_provider_calib_gate_and_weak_losses_use_it():
    """has_calib=1 for unaugmented calib records; augmentation zeroes it;
    weak_losses consumes the calib fields without error."""
    from transferable3d_tpu.data.provider import FrustumDataset, FrustumRecord
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)

    rng = np.random.RandomState(0)
    P = np.array([[700, 0, 620, 0], [0, 700, 190, 0], [0, 0, 1, 0]],
                 np.float32)
    recs = [FrustumRecord(
        points=rng.normal(0, 1, (200, 4)).astype(np.float32) + [0, 0, 12, 0],
        seg=rng.randint(0, 2, 200).astype(np.int64), class_idx=1,
        frustum_angle=0.1, center=np.array([0, 0, 12], np.float32),
        size=np.array([2.0, 1.0, 1.5], np.float32), heading=0.3,
        box2d=np.array([500, 150, 700, 260], np.float32), calib_p=P)
        for _ in range(8)]

    plain = FrustumDataset(recs, CFG, npoints=64)
    batch = plain.get_batch(list(range(8)))
    np.testing.assert_array_equal(batch["has_calib"], 1.0)
    np.testing.assert_allclose(batch["calib_p"][0], P)

    shifted = FrustumDataset(recs, CFG, npoints=64, random_shift=True)
    batch_aug = shifted.get_batch(list(range(8)))
    np.testing.assert_array_equal(batch_aug["has_calib"], 0.0)

    # weak_losses runs with the calib fields present.
    detector = FrustumPointNetV1(cfg=CFG, num_object_point=64)
    det_vars = detector.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["points"], batch["one_hot"], train=False)
    boxpc_model = BoxPCFitNet(cfg=CFG)
    gt = semisup.gt_boxes_from_batch(batch, CFG)
    boxpc_vars = boxpc_model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        batch["points"], gt, train=False)
    ep = detector.apply(det_vars, batch["points"], batch["one_hot"],
                        train=False)
    losses = semisup.weak_losses(ep, batch, boxpc_model, boxpc_vars, CFG)
    assert np.isfinite(float(losses["weak_reproj_loss"]))


def test_boxpc_trust_gate_zeroes_ood_examples():
    """The trust gate (round 3) must zero the BoxPC-derived losses for
    examples whose predicted delta exits the perturbation-sampler's
    support — the round-2 collapse mechanism (fit_prob -> 1.0 with
    runaway refine_loss) relied on exactly those gradients."""
    w = semisup.WeakLossWeights()
    box = BoxParams(center=jnp.zeros((4, 3)),
                    size=jnp.ones((4, 3)),
                    heading=jnp.zeros((4,)))
    out = {
        "fit_logit": jnp.zeros((4,)),
        # ex0 in-domain; ex1 huge center delta; ex2 huge size delta;
        # ex3 huge heading delta.
        "delta_center": jnp.asarray(
            [[0.1, 0.0, 0.0], [5.0, 0.0, 0.0], [0.1, 0, 0], [0.1, 0, 0]]),
        "delta_size": jnp.asarray(
            [[0.1, 0, 0], [0.1, 0, 0], [1.8, 0, 0], [0.1, 0, 0]]),
        "delta_heading": jnp.asarray([0.2, 0.2, 0.2, 2.5]),
    }
    gate = semisup.boxpc_trust_gate(out, box, w)
    np.testing.assert_array_equal(np.asarray(gate), [1.0, 0.0, 0.0, 0.0])

    # Gating off -> all ones.
    w_off = dataclasses.replace(w, trust_gate=False)
    gate_off = semisup.boxpc_trust_gate(out, box, w_off)
    np.testing.assert_array_equal(np.asarray(gate_off), [1.0] * 4)

    # No gradient leaks through the gate.
    def f(dc):
        g = semisup.boxpc_trust_gate({**out, "delta_center": dc}, box, w)
        return jnp.sum(g)

    grads = jax.grad(f)(out["delta_center"])
    np.testing.assert_array_equal(np.asarray(grads), 0.0)


def test_boxpc_trust_gate_prior_size_window():
    """Round-3 collapse mode (b): a box whose size has left the log
    window around the class prior must have its BoxPC losses gated to
    zero, even when BoxPC's own deltas look in-domain — the shrink
    feedback loop presents exactly that signature (tiny box, confident
    frozen net)."""
    w = semisup.WeakLossWeights()
    # ex0 at the prior; ex1 shrunk to 2 cm (log ratio ~ -3.9); ex2
    # inflated 4x (log ratio ~ 1.39 > 1.0).
    box = BoxParams(center=jnp.zeros((3, 3)),
                    size=jnp.asarray([[1.0, 1.0, 1.0],
                                      [0.02, 1.0, 1.0],
                                      [4.0, 1.0, 1.0]]),
                    heading=jnp.zeros((3,)))
    out = {
        "fit_logit": jnp.zeros((3,)),
        "delta_center": jnp.full((3, 3), 0.05),
        "delta_size": jnp.full((3, 3), 0.05),
        "delta_heading": jnp.full((3,), 0.05),
    }
    prior = jnp.ones((3, 3))
    gate = semisup.boxpc_trust_gate(out, box, w, prior=prior)
    np.testing.assert_array_equal(np.asarray(gate), [1.0, 0.0, 0.0])
    # Without the prior the same examples pass the delta-only gate.
    gate_np = semisup.boxpc_trust_gate(out, box, w)
    np.testing.assert_array_equal(np.asarray(gate_np), [1.0, 1.0, 1.0])


def test_refine_size_gradient_bounded_as_box_shrinks():
    """The refine size term must keep a BOUNDED gradient as the box
    shrinks (the log-space form's 1/size gradient powered the shrink
    feedback loop). Prior-normalized linear huber: |d loss / d size| is
    <= 1/prior regardless of how small the box gets."""
    prior = jnp.asarray([2.0])

    def refine_size_term(size, refined):
        a = jnp.abs((size - refined) / prior)
        q = jnp.minimum(a, 1.0)
        return jnp.sum(0.5 * q ** 2 + (a - q))

    refined = jnp.asarray([1.9])
    for s in (1.0, 0.1, 0.01, 1e-4):
        g = jax.grad(refine_size_term)(jnp.asarray([s]), refined)
        assert abs(float(g[0])) <= 1.0 / float(prior[0]) + 1e-6, s


def test_size_floor_is_straight_through():
    """The 1 cm size floor must pass gradient THROUGH (straight-through
    clip). With a hard maximum(), a residual pushed below the floor had
    ZERO restoring gradient from the size prior — a one-way trap: the
    round-3 study's collapsed seed showed the true slot's dim-0 at
    exactly 0.01 for 5/6 weak classes while every weak loss was blind to
    it. Forward value stays clipped; gradients see the raw size."""
    nh = CFG.num_heading_bin
    ns = CFG.num_size_cluster
    cls = jnp.asarray([0, 1], jnp.int32)
    mean_sizes = jnp.asarray(CFG.mean_size_array())

    def loss_of(res):
        end_points = {
            "center": jnp.zeros((2, 3)),
            "heading_scores": jnp.zeros((2, nh)),
            "heading_residuals": jnp.zeros((2, nh)),
            "size_residuals": res,
        }
        box = semisup.differentiable_box(end_points, CFG, class_idx=cls)
        prior = mean_sizes[cls]
        return jnp.sum(((box.size - prior) / prior) ** 2), box

    res = np.zeros((2, ns, 3), np.float32)
    res[0, 0, :] = -10.0  # raw size of example 0 far below the floor
    (_, box), g = jax.value_and_grad(loss_of, has_aux=True)(
        jnp.asarray(res))
    # Forward clipped (atol covers f32 cancellation in raw + (clip-raw)).
    assert np.allclose(np.asarray(box.size[0]), 0.01, atol=1e-5)
    g = np.asarray(g)
    # Restoring gradient at the floored slot: descent INCREASES the size.
    assert np.all(g[0, 0] < -1e-3)
    # Healthy example at its prior: no spurious gradient.
    assert np.allclose(g[1], 0.0, atol=1e-6)


def test_semisup_dp_invariance_1_vs_8_devices():
    """1-vs-8-device invariance for the fused semisup step (VERDICT r02
    item 7): the two-model, two-batch-stream step must give the same
    loss and parameters when both streams are sharded over the mesh."""
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)
    from transferable3d_tpu.parallel import mesh as mesh_lib
    import optax

    assert jax.device_count() >= 8, "conftest should force 8 CPU devices"
    strong = _strong_batch(n=16, seed=5)
    weak = _strong_batch(n=16, seed=6)

    def build():
        detector = FrustumPointNetV1(cfg=CFG, num_object_point=64)
        boxpc_model = BoxPCFitNet(cfg=CFG)
        lr = schedules.exponential_staircase_lr(base_lr=1e-3,
                                                batch_size=16)
        bn = schedules.bn_momentum_schedule(batch_size=16)
        # SGD: update proportional to gradient, so param agreement
        # directly tests the gradient all-reduce (same rationale as
        # test_train.test_dp_invariance_1_vs_8_devices).
        tx = optax.sgd(lr)
        det_state = train_loop.create_train_state(detector, CFG, tx,
                                                  strong, seed=0)
        boxpc_state = semisup.create_boxpc_state(
            boxpc_model, CFG, optax.sgd(lr), strong, seed=1)
        state = semisup.SemisupState(
            detector=det_state, boxpc_params=boxpc_state.params,
            boxpc_batch_stats=boxpc_state.batch_stats)
        step = semisup.make_semisup_train_step(
            detector, boxpc_model, CFG, tx, lr, bn,
            step_cfg=train_loop.StepConfig(compute_iou_metrics=False))
        return state, step

    state1, step1 = build()
    for _ in range(2):
        state1, m1 = step1(state1, strong, weak)

    mesh = mesh_lib.data_parallel_mesh(jax.devices()[:8])
    state8, step8 = build()
    state8 = mesh_lib.replicate(state8, mesh)
    sh_strong = mesh_lib.shard_batch(strong, mesh)
    sh_weak = mesh_lib.shard_batch(weak, mesh)
    for _ in range(2):
        state8, m8 = step8(state8, sh_strong, sh_weak)

    np.testing.assert_allclose(float(m1["combined_loss"]),
                               float(m8["combined_loss"]), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(state1.detector.params)
    flat8 = jax.tree_util.tree_leaves(state8.detector.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)
