"""BoxPC fit network — the Transferable3D core (SURVEY.md C13, §3.5).

Capability parity target: the reference's Box-PointCloud fit model: given
(frustum point cloud, candidate 3D box) predict (a) how well the box fits
the cloud and (b) a refinement delta toward the true box. Trained on
strong classes with perturbed GT boxes, it is *class-agnostic* and serves
as the transferable supervision signal for weak (2D-only) classes.

TPU-first design decisions:
  * Box canonicalization: points are expressed in the candidate box's
    frame (translate by -center, rotate by -heading, normalize by size)
    with an inside-box indicator channel — this is what makes the signal
    class-agnostic, and it is pure elementwise math that XLA fuses into
    the first matmul.
  * The perturbation sampler runs **in-graph** (jax.random), and the
    fit label comes from the in-graph rotated IoU (core/geometry.py) —
    the whole BoxPC training step is one compiled program, no host RNG
    or py_func IoU (the reference sampled perturbations on the host).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core import geometry
from transferable3d_tpu.models.layers import MLPHead, PointMLP, masked_max_pool


class BoxParams(NamedTuple):
    center: jnp.ndarray   # [B, 3]
    size: jnp.ndarray     # [B, 3] (l, w, h)
    heading: jnp.ndarray  # [B]


def canonicalize_points(points: jnp.ndarray, box: BoxParams) -> jnp.ndarray:
    """Express points [B, N, 3] in the box frame; add inside indicator.

    Returns [B, N, 7]: xyz normalized by half-sizes, the raw (unscaled)
    box-frame xyz magnitude capped, and the inside-box mask.
    """
    rel = points - box.center[:, None, :]
    rel = geometry.rotate_points_y(rel, -box.heading)
    half = jnp.maximum(box.size / 2.0, 1e-3)  # (l, w, h)
    # box frame: x spans l, y spans h, z spans w.
    denom = jnp.stack([half[:, 0], half[:, 2], half[:, 1]], axis=-1)
    normed = rel / denom[:, None, :]
    inside = (jnp.max(jnp.abs(normed), axis=-1) <= 1.0).astype(points.dtype)
    return jnp.concatenate(
        [normed, jnp.tanh(rel), inside[..., None]], axis=-1)


class BoxPCFitNet(nn.Module):
    """(points, box) -> fit logit + box refinement deltas.

    Deltas are in the *candidate box frame*: applying them via
    `apply_deltas` rotates the center delta back by the box heading.
    """

    cfg: bins_lib.BinConfig  # kept for registry signature parity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, box: BoxParams, *,
                 train: bool, bn_momentum=0.9) -> Dict[str, jnp.ndarray]:
        feats = canonicalize_points(points[..., :3], box)
        x = PointMLP([64, 64, 128, 256], dtype=self.dtype, name="mlp")(
            feats.astype(self.dtype), train=train, bn_momentum=bn_momentum)
        g = masked_max_pool(x)  # [B, 256]
        # Box scale context (log-size is scale-equivariant).
        g = jnp.concatenate(
            [g, jnp.log(jnp.maximum(box.size, 1e-3)).astype(self.dtype)],
            axis=-1)
        out = MLPHead([256, 128], out_features=1 + 3 + 1 + 3,
                      dropout_rate=0.3, dtype=self.dtype, name="head")(
                          g, train=train, bn_momentum=bn_momentum)
        return {
            "fit_logit": out[:, 0],
            "delta_center": out[:, 1:4],
            "delta_heading": out[:, 4],
            "delta_size": out[:, 5:8],
        }


def apply_deltas(box: BoxParams, deltas: Dict[str, jnp.ndarray]
                 ) -> BoxParams:
    """Refine a candidate box with predicted deltas (box-frame center)."""
    dc_world = geometry.rotate_points_y(
        deltas["delta_center"][:, None, :], box.heading)[:, 0]
    # Log-size deltas are unbounded network outputs: clamp to a sane
    # refinement range so exp() cannot overflow on an untrained head.
    dsize = jnp.clip(deltas["delta_size"], -2.0, 2.0)
    return BoxParams(
        center=box.center + dc_world,
        size=jnp.maximum(box.size * jnp.exp(dsize), 0.01),
        heading=box.heading + deltas["delta_heading"])


# ---------------------------------------------------------------------------
# In-graph perturbation sampling + training loss
# ---------------------------------------------------------------------------

def sample_perturbed_boxes(rng: jax.Array, gt: BoxParams,
                           small_frac: float = 0.5,
                           wide_frac: float = 0.25) -> BoxParams:
    """Random perturbations of GT boxes (reference: host-side sampler).

    A per-sample mixture of small perturbations (mostly still "fit") and
    medium ones (mostly "no fit") keeps the fit labels balanced around
    the IoU threshold instead of collapsing to one class.

    The third, WIDE arm exists because the semi-supervised detector
    optimizes *through* the frozen fit head (train/semisup.weak_losses):
    wherever the sampler never put a box, the learned fit landscape is
    unconstrained extrapolation, and gradient descent will find any
    direction where it spuriously slopes toward "fits". Round-3
    forensics on a collapsed seed measured exactly that: with the old
    support capped at exp(+-0.35) size scaling, the fit term's gradient
    on a 0.2x-shrunken dim-0 still pointed DOWN (+0.177 per batch vs
    the size prior's -0.098 restoring force) because BoxPC had never
    seen a thin box labeled "no fit". The wide arm samples log-size in
    +-1.4 (0.25x..4x, per-dim, so anisotropic pancake/needle boxes
    appear), center offsets ~0.5x size, and headings ~0.8 rad; IoU
    labeling marks them unfit automatically, pinning the fit landscape
    down everywhere the trust gate (semisup.WeakLossWeights) can admit
    a predicted box.
    """
    r0, r1, r2, r3 = jax.random.split(rng, 4)
    b = gt.center.shape[0]
    u = jax.random.uniform(r0, (b,))
    small = u < small_frac
    wide = u >= 1.0 - wide_frac
    c_std = jnp.where(small, 0.05, jnp.where(wide, 0.5, 0.35))[:, None]
    s_rng = jnp.where(small, 0.05, jnp.where(wide, 1.4, 0.35))[:, None]
    h_std = jnp.where(small, 0.05, jnp.where(wide, 0.8, 0.5))
    dc = jax.random.normal(r1, (b, 3)) * c_std * jnp.maximum(gt.size, 0.1)
    ds = jnp.exp(jax.random.uniform(r2, (b, 3), minval=-1.0, maxval=1.0)
                 * s_rng)
    dh = jax.random.normal(r3, (b,)) * h_std
    return BoxParams(center=gt.center + dc, size=gt.size * ds,
                     heading=gt.heading + dh)


def boxpc_targets(perturbed: BoxParams, gt: BoxParams,
                  fit_iou_thresh: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Supervision for BoxPC: fit label from in-graph IoU + exact deltas
    that map the perturbed box back onto the GT box."""
    iou3d, _ = geometry.box3d_iou_batched(
        perturbed.center, perturbed.size, perturbed.heading,
        gt.center, gt.size, gt.heading)
    fit_label = (iou3d >= fit_iou_thresh).astype(jnp.float32)
    dc_world = gt.center - perturbed.center
    dc_box = geometry.rotate_points_y(
        dc_world[:, None, :], -perturbed.heading)[:, 0]
    return {
        "fit_label": fit_label,
        "iou3d": iou3d,
        "delta_center": dc_box,
        "delta_heading": gt.heading - perturbed.heading,
        "delta_size": jnp.log(
            jnp.maximum(gt.size, 1e-3) / jnp.maximum(perturbed.size, 1e-3)),
    }


def boxpc_loss(outputs: Dict[str, jnp.ndarray],
               targets: Dict[str, jnp.ndarray],
               delta_weight: float = 10.0) -> Dict[str, jnp.ndarray]:
    """BCE fit loss + Huber delta losses (deltas on all samples: the net
    must push any box toward the GT, not only near-fits)."""
    logit = outputs["fit_logit"]
    label = targets["fit_label"]
    fit_loss = jnp.mean(
        jnp.maximum(logit, 0) - logit * label
        + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    def huber(x, d=1.0):
        a = jnp.abs(x)
        q = jnp.minimum(a, d)
        return jnp.mean(0.5 * q ** 2 + d * (a - q))

    dc = huber(outputs["delta_center"] - targets["delta_center"])
    dh = huber(outputs["delta_heading"] - targets["delta_heading"])
    ds = huber(outputs["delta_size"] - targets["delta_size"])
    total = fit_loss + delta_weight * (dc + dh + ds)
    acc = jnp.mean(((logit > 0) == (label > 0.5)).astype(jnp.float32))
    return {
        "total_loss": total, "fit_loss": fit_loss, "fit_accuracy": acc,
        "delta_center_loss": dc, "delta_heading_loss": dh,
        "delta_size_loss": ds,
        "pos_fraction": jnp.mean(label),
    }
