"""Jitted train/eval steps + TrainState for supervised F-PointNet training.

Capability parity target: the reference `train/train.py` epoch machinery
(SURVEY.md C9, call stack §3.2) — Adam + staircase LR decay + BN-decay
schedule, per-step losses and box-IoU metrics — rebuilt as a single
compiled step:

  * loss, gradients, optimizer update, BN running stats, and the box-IoU
    metrics all execute inside ONE jit (no per-step host sync; the
    reference paid a feed_dict copy + a py_func IoU each step).
  * data parallelism comes from sharding annotations (parallel/mesh.py):
    batch sharded on axis 0, state replicated; XLA inserts the gradient
    all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.models import model_util


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static pieces captured by the compiled step."""
    box_loss_weight: float = 1.0
    corner_loss_weight: float = 10.0
    compute_iou_metrics: bool = True
    # Mask padded frustums via batch["valid"] (the on-device depth
    # pipeline emits fixed-shape frame batches with padding boxes).
    use_valid_weights: bool = False


def labels_from_batch(batch: Dict[str, jnp.ndarray]) -> model_util.Labels:
    return model_util.Labels(
        seg=batch["seg"], center=batch["center"],
        heading_class=batch["heading_class"],
        heading_residual=batch["heading_residual"],
        size_class=batch["size_class"],
        size_residual=batch["size_residual"])


def create_train_state(model, cfg: bins_lib.BinConfig, tx,
                       sample_batch: Dict, seed: int = 0) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)

    # jit the whole init: one compilation instead of one per op (the
    # op-by-op path costs minutes under this container's remote-compile).
    @jax.jit
    def init_fn(points, one_hot):
        return model.init({"params": p_rng, "dropout": d_rng},
                          points, one_hot, train=False)

    variables = init_fn(sample_batch["points"], sample_batch["one_hot"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params), rng=s_rng)


def make_train_step(model, cfg: bins_lib.BinConfig, tx,
                    lr_schedule: Callable, bn_schedule: Callable,
                    step_cfg: StepConfig = StepConfig()
                    ) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Build the fully-fused compiled train step.

    The returned function is jit-compiled with the TrainState donated, so
    params/opt-state buffers are updated in place in HBM.
    """

    def step_fn(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        labels = labels_from_batch(batch)
        bn_momentum = bn_schedule(state.step)
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            end_points, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"], batch["one_hot"], train=True,
                bn_momentum=bn_momentum, rngs={"dropout": rng},
                mutable=["batch_stats"])
            weights = (batch["valid"].astype(jnp.float32)
                       if step_cfg.use_valid_weights else None)
            losses = model_util.get_loss(
                end_points, labels, cfg,
                box_loss_weight=step_cfg.box_loss_weight,
                corner_loss_weight=step_cfg.corner_loss_weight,
                example_weights=weights)
            return losses["total_loss"], (losses, updates, end_points)

        grads, (losses, updates, end_points) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        update, new_opt_state = tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, update)

        metrics = dict(losses)
        metrics["lr"] = lr_schedule(state.step)
        metrics["bn_momentum"] = bn_momentum
        if step_cfg.compute_iou_metrics:
            metrics.update(model_util.compute_metrics(
                end_points, labels, cfg,
                class_idx=batch.get("class_idx")))

        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=updates["batch_stats"],
            opt_state=new_opt_state, rng=state.rng)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model, cfg: bins_lib.BinConfig,
                   step_cfg: StepConfig = StepConfig()):
    """Compiled eval step: losses + metrics, running BN stats, no update."""

    def step_fn(state: TrainState, batch: Dict) -> Dict:
        labels = labels_from_batch(batch)
        end_points = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"], batch["one_hot"], train=False)
        losses = model_util.get_loss(
            end_points, labels, cfg,
            box_loss_weight=step_cfg.box_loss_weight,
            corner_loss_weight=step_cfg.corner_loss_weight)
        metrics = dict(losses)
        if step_cfg.compute_iou_metrics:
            metrics.update(model_util.compute_metrics(
                end_points, labels, cfg,
                class_idx=batch.get("class_idx")))
        return metrics

    return jax.jit(step_fn)


def make_predict_step(model, cfg: bins_lib.BinConfig):
    """Compiled inference step -> decoded boxes + scores (reference C10).

    Returns per-example: center/size/heading (frustum frame), seg logits
    sum (seg quality term used in detection scoring), heading/size class
    probabilities.
    """

    def step_fn(state: TrainState, batch: Dict) -> Dict:
        end_points = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"], batch["one_hot"], train=False)
        center, size, heading, hcls, scls = model_util.decode_box(
            end_points, cfg, class_idx=batch.get("class_idx"))
        seg_logits = end_points["seg_logits"]
        seg_prob = jax.nn.softmax(seg_logits, axis=-1)[..., 1]
        mask = end_points["mask"]
        # Detection score ingredients (reference test.py combines the 2D
        # score with seg/box-head confidences in log space).
        heading_prob = jnp.max(jax.nn.softmax(
            end_points["heading_scores"], axis=-1), axis=-1)
        size_prob = jnp.max(jax.nn.softmax(
            end_points["size_scores"], axis=-1), axis=-1)
        seg_conf = (jnp.sum(seg_prob * mask, axis=1)
                    / jnp.maximum(jnp.sum(mask, axis=1), 1.0))
        return {
            "center": center, "size": size, "heading": heading,
            "heading_class": hcls, "size_class": scls,
            "seg_conf": seg_conf, "heading_prob": heading_prob,
            "size_prob": size_prob, "mask_count": jnp.sum(mask, axis=1),
        }

    return jax.jit(step_fn)


def _flatten_lane_safe(inner):
    """optax.flatten twin whose concatenated vector length shares no
    divisor with any narrow (< 128) leaf trailing dim.

    Why: with optax.flatten, XLA canonicalizes the T-Net center head's
    unflatten (`reshape(flat[o:o+384], (128, 3))`) into
    `reshape(flat, (-1, 3))[...]` whenever the TOTAL length divides by
    3 — a linear->tiled relayout of the entire 1.65M-parameter vector
    (lane width 3 pads to 128: ~42x write amplification, 0.83 ms/step
    in the round-4 e2e profile, ~7% of the step). Padding the vector
    with a few zeros makes that rewrite shape-illegal; wide (>= 128)
    trailing dims relayout losslessly and are left alone. Adam on the
    zero pad is a fixed point (m = v = g = 0), so the pad never leaks.
    """
    inner = optax.with_extra_args_support(inner)

    def _pad_for(leaves, n):
        dims = {l.shape[-1] for l in leaves
                if l.ndim and 1 < l.shape[-1] < 128}
        pad = 0
        while any((n + pad) % d == 0 for d in dims):
            pad += 1
        return pad

    def _flatten(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        flat = jnp.concatenate([jnp.reshape(l, (-1,)) for l in leaves])
        return jnp.pad(flat, (0, _pad_for(leaves, flat.size)))

    def _unflatten(like, flat):
        leaves, treedef = jax.tree_util.tree_flatten(like)
        out, o = [], 0
        for l in leaves:
            out.append(jnp.reshape(flat[o:o + l.size], l.shape))
            o += l.size
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        return inner.init(_flatten(params))

    def update_fn(updates, state, params=None, **extra):
        if params is not None:
            params = _flatten(params)
        flat, state = inner.update(_flatten(updates), state, params,
                                   **extra)
        return _unflatten(updates, flat), state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def make_optimizer(lr_schedule, clip_norm: Optional[float] = None,
                   grad_accum_steps: int = 1):
    """Adam with the reference's defaults (TF1 AdamOptimizer eps=1e-8).

    Wrapped in a flatten transform: the update runs on one concatenated
    vector instead of one op per parameter leaf — the per-leaf form
    contributed hundreds of microsecond-scale ops per step on TPU (see
    _flatten_lane_safe for why it is not optax.flatten verbatim).

    grad_accum_steps > 1 wraps in optax.MultiSteps (SURVEY.md §2.3
    gradient-accumulation row): params update every k-th microbatch.
    """
    tx = optax.adam(lr_schedule, eps=1e-8)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    tx = _flatten_lane_safe(tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
