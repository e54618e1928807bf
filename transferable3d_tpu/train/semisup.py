"""Semi-supervised transfer training: BoxPC pretraining + weak-class losses.

Capability parity target: SURVEY.md C14 / call stack §3.5 — the
Transferable3D mechanism:

  phase A: pretrain the BoxPC fit net on strong classes with perturbed
           GT boxes (in-graph sampler, models/boxpc.py);
  phase B: train the detector with
             strong batches -> full supervised loss (§3.3), and
             weak batches (2D box + class only) ->
               * BoxPC fit-score maximization on the predicted box,
               * BoxPC-refined box as a pseudo-label (stop-gradient),
               * 2D reprojection consistency — expressed frustum-natively:
                 the frustum cloud spans exactly the 2D box's angular
                 extent, so matching the predicted corners' angular span
                 (x/z, y/z bounds) to the cloud's span IS the projection
                 constraint, no intrinsics needed,
               * per-class mean-size prior.

Both phases are single fused jit steps; BoxPC is frozen (stop_gradient +
never updated) during phase B.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core import geometry
from transferable3d_tpu.models import boxpc as boxpc_lib
from transferable3d_tpu.models import model_util
from transferable3d_tpu.train import train_loop


# ---------------------------------------------------------------------------
# Phase A: BoxPC pretraining
# ---------------------------------------------------------------------------

def gt_boxes_from_batch(batch: Dict, cfg: bins_lib.BinConfig
                        ) -> boxpc_lib.BoxParams:
    heading = bins_lib.class_to_angle(
        batch["heading_class"], batch["heading_residual"],
        cfg.num_heading_bin)
    size = bins_lib.class_to_size(
        batch["size_class"], batch["size_residual"], cfg)
    return boxpc_lib.BoxParams(center=batch["center"], size=size,
                               heading=heading)


def create_boxpc_state(model, cfg: bins_lib.BinConfig, tx,
                       sample_batch: Dict, seed: int = 0
                       ) -> train_loop.TrainState:
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    gt = gt_boxes_from_batch(sample_batch, cfg)

    @jax.jit
    def init_fn(points, gt):
        return model.init({"params": p_rng, "dropout": d_rng},
                          points, gt, train=False)

    variables = init_fn(sample_batch["points"], gt)
    return train_loop.TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=s_rng)


def anisotropic_shape_aug(rng: jax.Array, points: jnp.ndarray,
                          gt: boxpc_lib.BoxParams,
                          log_range: float = 0.8, frac: float = 0.5
                          ) -> Tuple[jnp.ndarray, boxpc_lib.BoxParams]:
    """Jointly rescale cloud + GT box per-dim in the box frame.

    Round-4 bookshelf forensics (transfer_diag_bookshelf.json +
    artifacts/diag_transfer_s*_metrics.csv): the weak-class floor was
    NOT trust-gate starvation — bookshelf's gate pass rate is 0.90-0.99
    on every seed — but the frozen fit head carrying its worst fit loss
    of all weak classes on every seed (1.14/1.30/2.07 vs weak means
    ~0.5-1.0). Mechanism: phase A trains BoxPC only on STRONG-class
    clouds (aspect <= ~1.8:1); bookshelf at (0.405, 1.071, 1.689) is
    ~4:1, so the head scores its geometry by extrapolation. The
    perturbation sampler's wide arm already covers thin BOXES around
    strong clouds (negatives), but no thin CLOUD with a well-fitting box
    (positives) ever appears. Scaling the cloud and the box together in
    the box frame manufactures exactly those positives: the IoU-labeled
    targets stay consistent by construction, and canonicalized coords
    are invariant, so only the scale-context channels (tanh(rel),
    log-size) carry the new information — the head learns "fit" is
    shape-relative, not strong-class-silhouette-shaped.

    `frac` of the batch is augmented with per-dim log-uniform scales in
    +-`log_range` (e^0.8 ~ 2.2x per dim, enough to reach 4:1 aspect
    from any strong class); the rest keeps the natural distribution.
    """
    b = gt.center.shape[0]
    r1, r2 = jax.random.split(rng)
    s = jnp.exp(jax.random.uniform(r1, (b, 3), minval=-log_range,
                                   maxval=log_range))
    on = (jax.random.uniform(r2, (b,)) < frac)[:, None]
    s = jnp.where(on, s, 1.0)
    xyz = points[..., :3]
    rel = geometry.rotate_points_y(xyz - gt.center[:, None, :],
                                   -gt.heading)
    # box frame: x spans l = size[0], y spans h = size[2],
    # z spans w = size[1] (see boxpc.canonicalize_points).
    rel = rel * jnp.stack([s[:, 0], s[:, 2], s[:, 1]],
                          axis=-1)[:, None, :]
    xyz = geometry.rotate_points_y(rel, gt.heading) + gt.center[:, None, :]
    points = jnp.concatenate([xyz, points[..., 3:]], axis=-1)
    gt = boxpc_lib.BoxParams(center=gt.center, size=gt.size * s,
                             heading=gt.heading)
    return points, gt


def make_boxpc_train_step(model, cfg: bins_lib.BinConfig, tx,
                          bn_schedule: Callable,
                          fit_iou_thresh: float = 0.5,
                          aniso_aug: float = 0.8):
    """Fused BoxPC step: sample perturbations, label via in-graph IoU,
    forward, loss, update. `aniso_aug` > 0 enables the joint
    cloud+box anisotropic rescale (see anisotropic_shape_aug)."""

    def step_fn(state: train_loop.TrainState, batch: Dict):
        gt = gt_boxes_from_batch(batch, cfg)
        rng = jax.random.fold_in(state.rng, state.step)
        sample_rng, dropout_rng, aug_rng = jax.random.split(rng, 3)
        points = batch["points"]
        if aniso_aug > 0:
            points, gt = anisotropic_shape_aug(aug_rng, points, gt,
                                               log_range=aniso_aug)
            batch = dict(batch, points=points)
        perturbed = boxpc_lib.sample_perturbed_boxes(sample_rng, gt)
        targets = boxpc_lib.boxpc_targets(perturbed, gt, fit_iou_thresh)
        bn_momentum = bn_schedule(state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"], perturbed, train=True,
                bn_momentum=bn_momentum, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            losses = boxpc_lib.boxpc_loss(out, targets)
            return losses["total_loss"], (losses, updates)

        grads, (losses, updates) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        new_state = train_loop.TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=updates["batch_stats"], opt_state=new_opt,
            rng=state.rng)
        return new_state, losses

    return jax.jit(step_fn, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Phase B: weak-class losses
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WeakLossWeights:
    fit: float = 1.0
    refine: float = 1.0
    reprojection: float = 1.0
    size_prior: float = 0.5
    # Size-class CE from the 2D class label. SUN-RGBD uses one size
    # cluster per class, so a weak example's size CLASS is known even
    # without 3D GT. Motivated by a collapse mode (weak-class mAP ~0
    # with healthy strong-class metrics, argmax(size_scores) locked on
    # a wrong cluster) — but the seeded A/B showed it LOWERED the
    # stable seeds' mAP (0.60/0.67 -> 0.25/0.38 at weight 1.0) without
    # fixing the collapsing seed, so it defaults OFF; available for
    # tuning on real data.
    size_cls: float = 0.0
    # BoxPC trust region (round 3). The round-2 8v8 study collapsed on
    # 2/8 seeds via a runaway feedback loop: once the predicted box
    # leaves the neighborhood BoxPC was trained on (perturbed GT boxes,
    # models/boxpc.sample_perturbed_boxes: |dc| ~< size, |log ds| <= 1,
    # |dh| ~< 1.5), the frozen net's fit logit is unconstrained —
    # fit-maximization finds adversarial OOD boxes (observed fit_prob
    # -> 1.0 while weak-val IoU -> 0) and the refine loss chases its
    # own moving pseudo-label (refine_loss 0.02 -> 8 monotonically).
    # The OOD signature is BoxPC's own output: a huge predicted delta
    # alongside a high fit logit is internally inconsistent. Gate the
    # BoxPC-derived losses (fit, refine) per example to zero whenever
    # the predicted delta magnitude exits the sampler's support; the
    # geometric losses (reprojection, size prior) stay ungated.
    trust_gate: bool = True
    trust_center: float = 0.7   # |delta_center| / max(size)
    trust_size: float = 0.7     # max |log-size delta|
    trust_heading: float = 1.0  # |heading delta| (rad)
    # Round-3 second collapse mode (after the class-conditioned size
    # decode): 2/8 seeds still hit mAP 0 with the TRUE size slot's
    # dim-0 residual driven to the 1 cm floor. Mechanism: the original
    # refine term huber(log(size/refined)) has d/d(size) ~ 1/size —
    # unbounded as the box shrinks — so a frozen BoxPC with a small
    # systematic shrink bias beats the linear-gradient size prior in a
    # feedback loop and rides the size to zero. Two measures: (a) the
    # refine size term is prior-normalized LINEAR huber (bounded
    # gradient, same minimum); (b) the gate also zeroes BoxPC losses
    # whenever the predicted size leaves a log window around the known
    # class prior — the prior is then the only force and restores the
    # box (no hysteresis).
    trust_prior_logsize: float = 1.0  # max |log(size / class prior)|


def differentiable_box(end_points: Dict, cfg: bins_lib.BinConfig,
                       class_idx=None) -> boxpc_lib.BoxParams:
    """Predicted box with gradients through center + residuals.

    Bin *selection* is argmax (stop-grad, straight-through style): the
    scores are trained by the strong-class CE; weak losses shape the
    residuals and center. When `class_idx` is given, the size cluster
    uses the known semantic class instead of the score argmax (see
    model_util.decode_box: cluster == class in this lineage, and the
    class is an input). For weak classes this routes the weak-loss
    gradients into the residual slot the eval decode actually reads —
    the round-2 collapse drove a *wrong* locked slot's residual
    degenerate while the true slot stayed untrained.
    """
    nh = cfg.num_heading_bin
    hcls = jax.lax.stop_gradient(
        jnp.argmax(end_points["heading_scores"], axis=-1))
    hres = jnp.take_along_axis(end_points["heading_residuals"],
                               hcls[:, None], axis=1)[:, 0]
    heading = hcls.astype(jnp.float32) * (2 * jnp.pi / nh) + hres
    if class_idx is not None:
        scls = class_idx.astype(jnp.int32)
    else:
        scls = jax.lax.stop_gradient(
            jnp.argmax(end_points["size_scores"], axis=-1))
    sres = jnp.take_along_axis(end_points["size_residuals"],
                               scls[:, None, None], axis=1)[:, 0]
    mean_sizes = jnp.asarray(cfg.mean_size_array())
    raw = mean_sizes[scls] + sres
    # Straight-through floor: forward value is clipped (downstream
    # corner/IoU math needs positive extents) but gradients see the raw
    # size. A hard maximum() has ZERO gradient below the floor, which
    # turned the 1 cm clip into a one-way trap: a transient early shrink
    # past the floor (BoxPC warmup push, pre-trust-gate) left the
    # residual with no restoring gradient from the size prior — the
    # round-3 study's collapse signature was the true slot's dim-0 at
    # exactly 0.01 for 5/6 weak classes while every weak loss was blind
    # to it.
    size = raw + jax.lax.stop_gradient(jnp.maximum(raw, 0.01) - raw)
    return boxpc_lib.BoxParams(center=end_points["center"], size=size,
                               heading=heading)


def angular_span_residual(corners: jnp.ndarray, points: jnp.ndarray
                          ) -> jnp.ndarray:
    """Per-example 2D-reprojection surrogate in frustum coordinates.

    corners [B, 8, 3] of the predicted box; points [B, N, C] the frustum
    cloud. Matches the (x/z, y/z) angular bounds — a projection-like
    constraint valid when the cloud fills the 2D box exactly; the
    calib-exact form below replaces it whenever the batch carries a
    camera matrix. Returns the mean absolute span error [B].
    """
    def spans(xyz):
        z = jnp.maximum(xyz[..., 2], 0.5)  # frustums look down +Z
        az = xyz[..., 0] / z
        el = xyz[..., 1] / z
        return (jnp.min(az, axis=1), jnp.max(az, axis=1),
                jnp.min(el, axis=1), jnp.max(el, axis=1))

    ca = spans(corners)
    pa = spans(points[..., :3])
    return sum(jnp.abs(c - p) for c, p in zip(ca, pa)) / 4.0


def calib_reprojection_residual(corners: jnp.ndarray,
                                frustum_angle: jnp.ndarray,
                                calib_p: jnp.ndarray,
                                box2d: jnp.ndarray) -> jnp.ndarray:
    """Calib-exact 2D reprojection error (SURVEY.md §3.5: "project 8
    corners with calib -> match given 2D box").

    corners [B, 8, 3] in the FRUSTUM frame; frustum_angle [B] undoes the
    rotate-to-center normalization; calib_p [B, 3, 4] is the rect->image
    projection (KITTI P2); box2d [B, 4] = (xmin, ymin, xmax, ymax).
    Returns the mean absolute bound error [B], normalized by the 2D box
    size (scale invariance across near/far objects).
    """
    rect = geometry.rotate_points_y(corners, -frustum_angle)  # [B, 8, 3]
    hom = jnp.concatenate(
        [rect, jnp.ones((*rect.shape[:2], 1), rect.dtype)], axis=-1)
    uvw = jnp.einsum("bnc,bdc->bnd", hom, calib_p)  # [B, 8, 3]
    w = jnp.maximum(uvw[..., 2], 0.1)  # guard degenerate depths
    u, v = uvw[..., 0] / w, uvw[..., 1] / w
    pred = jnp.stack([jnp.min(u, axis=1), jnp.min(v, axis=1),
                      jnp.max(u, axis=1), jnp.max(v, axis=1)], axis=-1)
    wh = jnp.maximum(box2d[:, 2:4] - box2d[:, 0:2], 1.0)  # [B, 2]
    norm = jnp.concatenate([wh, wh], axis=-1)
    return jnp.mean(jnp.abs(pred - box2d) / norm, axis=-1)


def boxpc_trust_gate(out: Dict, box: boxpc_lib.BoxParams,
                     weights: "WeakLossWeights",
                     prior: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-example gate [B] on the BoxPC-derived losses (fit, refine).

    1.0 iff BoxPC's own predicted delta stays inside the perturbation
    sampler's support (see WeakLossWeights.trust_gate for the collapse
    mechanism this interrupts) AND, when the per-class mean-size `prior`
    [B, 3] is given, the predicted size stays inside a log window around
    it (WeakLossWeights.trust_prior_logsize — interrupts the shrink
    feedback loop: outside the window only the size prior acts, which
    restores the box). The consumer multiplies per-example losses by the
    gate under an ABSOLUTE mean (over the batch, not over gated
    examples): an out-of-domain box contributes exactly zero gradient
    rather than re-weighting its neighbors.
    """
    if not weights.trust_gate:
        return jnp.ones_like(out["fit_logit"])
    comp = trust_gate_components(out, box, prior)
    ok = ((comp["dc_mag"] <= weights.trust_center)
          & (comp["ds_mag"] <= weights.trust_size)
          & (comp["dh_mag"] <= weights.trust_heading))
    if prior is not None:
        ok = ok & (comp["prior_dev"] <= weights.trust_prior_logsize)
    return jax.lax.stop_gradient(ok.astype(jnp.float32))


def trust_gate_components(out: Dict, box: boxpc_lib.BoxParams,
                          prior: jnp.ndarray | None = None) -> Dict:
    """Per-example [B] magnitudes the trust gate thresholds on.

    Exposed separately for the per-class diagnostics (round-3 verdict
    item 9: which component starves a weak class of BoxPC gradient)."""
    scale = jnp.maximum(jnp.max(box.size, axis=-1), 0.1)
    comp = {
        "dc_mag": jnp.linalg.norm(out["delta_center"], axis=-1) / scale,
        "ds_mag": jnp.max(jnp.abs(out["delta_size"]), axis=-1),
        "dh_mag": jnp.abs(out["delta_heading"]),
    }
    if prior is not None:
        comp["prior_dev"] = jnp.max(
            jnp.abs(jnp.log(jnp.maximum(box.size, 1e-3) / prior)),
            axis=-1)
    return comp


def weak_losses(end_points: Dict, batch: Dict, boxpc_model,
                boxpc_variables, cfg: bins_lib.BinConfig,
                weights: WeakLossWeights = WeakLossWeights(),
                diag_classes: int = 0) -> Dict[str, jnp.ndarray]:
    """Transferable supervision for weak (2D-only) examples.

    `diag_classes > 0` adds per-class `[diag_classes]` vectors (mean
    over each class's batch members) of the gate pass rate, the gated
    fit/refine losses, and every gate-component magnitude — the
    instrumentation for diagnosing a weak class the gate starves
    (round-3 verdict item 9: bookshelf)."""
    box = differentiable_box(end_points, cfg,
                             class_idx=batch.get("class_idx"))
    frozen = jax.lax.stop_gradient(boxpc_variables)
    out = boxpc_model.apply(frozen, batch["points"], box, train=False)

    mean_sizes = jnp.asarray(cfg.mean_size_array())
    prior = mean_sizes[batch["class_idx"]]  # [B, 3]
    gate = boxpc_trust_gate(out, box, weights, prior=prior)

    # (a) maximize BoxPC fit probability of the predicted box.
    logit = out["fit_logit"]
    fit_ex = gate * jax.nn.softplus(-logit)  # -log sigmoid, [B]
    fit_loss = jnp.mean(fit_ex)

    # (b) BoxPC-refined box as pseudo-label.
    refined = jax.lax.stop_gradient(boxpc_lib.apply_deltas(box, out))

    def huber(x, d=1.0):
        a = jnp.abs(x)
        q = jnp.minimum(a, d)
        return 0.5 * q ** 2 + d * (a - q)

    def huber_ex(x, d=1.0):
        """Per-example huber: mean over trailing dims, keep batch."""
        h = huber(x, d)
        return h if h.ndim == 1 else jnp.mean(h, axis=-1)

    # Size term is PRIOR-normalized linear huber, not log-space: the
    # log form's d/d(size) ~ 1/size explodes as the box shrinks, which
    # let a frozen BoxPC with a small shrink bias overpower the linear
    # size prior and ride the size to the floor (round-3 collapse mode
    # (b) — see WeakLossWeights.trust_prior_logsize). Same minimum
    # (size == refined), bounded gradient (<= 1/prior).
    refine_ex = gate * (
        huber_ex(box.center - refined.center)
        + huber_ex(box.heading - refined.heading)
        + huber_ex((box.size - refined.size) / prior))
    refine_loss = jnp.mean(refine_ex)

    # (c) 2D reprojection consistency: calib-exact corner projection for
    # examples that carry a camera matrix (KITTI; has_calib==1), the
    # angular-span surrogate otherwise (SUN-RGBD pickles / augmented
    # draws, where the recorded box2d no longer matches the cloud).
    corners = geometry.box_corners(box.center, box.size, box.heading)
    span_res = angular_span_residual(corners, batch["points"])
    if "calib_p" in batch:
        calib_res = calib_reprojection_residual(
            corners, batch["frustum_angle"], batch["calib_p"],
            batch["box2d"])
        has_calib = batch["has_calib"]
        err = jnp.where(has_calib > 0, calib_res, span_res)
    else:
        err = span_res
    d = 1.0
    q = jnp.minimum(err, d)
    reproj_loss = jnp.mean(0.5 * q ** 2 + d * (err - q))

    # (d) per-class mean-size prior (normalized; `prior` computed above
    # for the gate).
    size_prior_loss = jnp.mean(huber((box.size - prior) / prior))

    # (e) size-class CE from the known 2D class label (see
    # WeakLossWeights.size_cls).
    logp = jax.nn.log_softmax(end_points["size_scores"], axis=-1)
    size_cls_loss = -jnp.mean(
        jnp.take_along_axis(logp, batch["class_idx"][:, None],
                            axis=1)[:, 0])

    total = (weights.fit * fit_loss + weights.refine * refine_loss
             + weights.reprojection * reproj_loss
             + weights.size_prior * size_prior_loss
             + weights.size_cls * size_cls_loss)
    losses = {
        "weak_total_loss": total,
        "weak_size_cls_loss": size_cls_loss,
        "weak_fit_loss": fit_loss,
        "weak_refine_loss": refine_loss,
        "weak_reproj_loss": reproj_loss,
        "weak_size_prior_loss": size_prior_loss,
        "weak_fit_prob": jnp.mean(jax.nn.sigmoid(logit)),
        "weak_trust_frac": jnp.mean(gate),
    }
    if diag_classes:
        oh = jax.nn.one_hot(batch["class_idx"], diag_classes,
                            dtype=jnp.float32)  # [B, C]
        cnt = jnp.maximum(jnp.sum(oh, axis=0), 1.0)  # [C]

        def per_class(x):
            return jnp.einsum("b,bc->c", x, oh) / cnt

        comp = trust_gate_components(out, box, prior=prior)
        losses.update(
            diag_count=jnp.sum(oh, axis=0),
            diag_trust_frac=per_class(gate),
            diag_fit_loss=per_class(fit_ex),
            diag_refine_loss=per_class(refine_ex),
            **{f"diag_{k}": per_class(v) for k, v in comp.items()})
    return losses


# ---------------------------------------------------------------------------
# Phase B: fused semi-supervised train step
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class SemisupState:
    detector: train_loop.TrainState
    boxpc_params: Any
    boxpc_batch_stats: Any


def make_semisup_train_step(detector_model, boxpc_model,
                            cfg: bins_lib.BinConfig, tx,
                            lr_schedule: Callable, bn_schedule: Callable,
                            weak_weight: float = 1.0,
                            weights: WeakLossWeights = WeakLossWeights(),
                            step_cfg: train_loop.StepConfig =
                            train_loop.StepConfig(),
                            weak_warmup_steps: int = 0,
                            diag_classes: int = 0):
    """One jit: supervised loss on the strong batch + weak losses on the
    weak batch, single gradient step on the detector.

    `weak_warmup_steps` ramps the weak-loss weight linearly from 0: at
    step 0 the detector's weak-class box predictions are noise, so the
    BoxPC-fit / reprojection terms push against garbage and can hurt
    (measured: transfer < control at toy scale without a ramp). The
    ramp defers transfer pressure until the strong-supervised detector
    produces meaningful boxes."""

    def step_fn(state: SemisupState, strong: Dict, weak: Dict
                ) -> Tuple[SemisupState, Dict]:
        det = state.detector
        labels = train_loop.labels_from_batch(strong)
        bn_momentum = bn_schedule(det.step)
        rng = jax.random.fold_in(det.rng, det.step)
        r_strong, r_weak = jax.random.split(rng)
        boxpc_vars = {"params": state.boxpc_params,
                      "batch_stats": state.boxpc_batch_stats}

        def loss_fn(params):
            ep_s, upd = detector_model.apply(
                {"params": params, "batch_stats": det.batch_stats},
                strong["points"], strong["one_hot"], train=True,
                bn_momentum=bn_momentum, rngs={"dropout": r_strong},
                mutable=["batch_stats"])
            sup = model_util.get_loss(
                ep_s, labels, cfg,
                box_loss_weight=step_cfg.box_loss_weight,
                corner_loss_weight=step_cfg.corner_loss_weight)

            ep_w, upd2 = detector_model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]},
                weak["points"], weak["one_hot"], train=True,
                bn_momentum=bn_momentum, rngs={"dropout": r_weak},
                mutable=["batch_stats"])
            wk = weak_losses(ep_w, weak, boxpc_model, boxpc_vars, cfg,
                             weights, diag_classes=diag_classes)
            w_eff = weak_weight
            if weak_warmup_steps > 0:
                w_eff = weak_weight * jnp.clip(
                    det.step.astype(jnp.float32) / weak_warmup_steps,
                    0.0, 1.0)
            total = sup["total_loss"] + w_eff * wk["weak_total_loss"]
            return total, ({**sup, **wk, "combined_loss": total}, upd2,
                           ep_s)

        grads, (losses, updates, ep_s) = jax.grad(
            loss_fn, has_aux=True)(det.params)
        upd, new_opt = tx.update(grads, det.opt_state, det.params)
        new_params = optax.apply_updates(det.params, upd)

        metrics = dict(losses)
        metrics["lr"] = lr_schedule(det.step)
        if step_cfg.compute_iou_metrics:
            metrics.update(model_util.compute_metrics(
                ep_s, labels, cfg, class_idx=strong.get("class_idx")))

        new_det = train_loop.TrainState(
            step=det.step + 1, params=new_params,
            batch_stats=updates["batch_stats"], opt_state=new_opt,
            rng=det.rng)
        return SemisupState(detector=new_det,
                            boxpc_params=state.boxpc_params,
                            boxpc_batch_stats=state.boxpc_batch_stats), \
            metrics

    return jax.jit(step_fn, donate_argnums=(0,))
