"""Layer library: shared per-point MLPs, scheduled BatchNorm, FC blocks.

Capability parity target: the reference's `models/tf_util.py` (SURVEY.md
C5) — TF1 `conv2d` with 1x1 kernels (i.e. a per-point shared MLP),
`fully_connected`, and `batch_norm_template` with the *scheduled* momentum
(bn_decay ramps 0.5 -> 0.99 during training, SURVEY.md §7 hard-part 3).

TPU-first design: the reference expressed per-point MLPs as [B, N, 1, C]
NCHW conv2d. Here they are `nn.Dense` applied to [B, N, C] — XLA lowers
this to a single [B*N, C] x [C, C'] matmul on the MXU, which is exactly
the fused kernel the conv would have needed. Compute dtype is
configurable (bf16 on TPU), params and BN stats stay fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ScheduledBatchNorm(nn.Module):
    """BatchNorm whose momentum is a *call-time* argument.

    flax's `nn.BatchNorm` fixes momentum at construction; the reference's
    training schedule sweeps it (TF1 `bn_decay` = 1 - momentum_complement
    ramping 0.5 -> 0.99), so we reimplement the standard running-stats BN
    with `momentum` traced through the train step.
    """

    use_running_average: bool
    epsilon: float = 1e-3  # TF1 batch_norm default
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, momentum: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        dtype = self.dtype or x.dtype
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon)) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)


def on_tpu() -> bool:
    import jax

    # Respect an explicit jax.default_device(...) context: a process
    # that initialized the TPU backend can still run CPU-mesh code
    # (e.g. __graft_entry__.dryrun_multichip), and Pallas TPU kernels
    # must not be traced for it.
    d = jax.config.jax_default_device
    if d is not None:
        # jax.default_device also accepts a platform string ('cpu').
        kind = d.device_kind if hasattr(d, "device_kind") else str(d)
        return "TPU" in kind.upper()
    return any("TPU" in d.device_kind for d in jax.devices())


class PointMLP(nn.Module):
    """Shared per-point MLP stack over [B, N, C] (reference: 1x1 conv2d).

    Each layer: Dense -> ScheduledBatchNorm -> ReLU. `bn_momentum` is the
    scheduled momentum (traced).

    Round-1 carried a `fused=True` Pallas variant (matmul + BN-stats in
    one VMEM pass, full custom VJP). It had lower exclusive device time
    by trace (11.7 vs 13.6 ms) but lost ~5% wall end-to-end and its
    loss descended slower, so it never became the default; retired in
    round 2 (see git history / CLAUDE.md). The multi-pass exact-BN
    fusion lives on in ops/fused_sa.py, where the grouped [B, S, K, C]
    chains make it a clear win.
    """

    features: Sequence[int]
    use_bn: bool = True
    pool: bool = False   # end with a max-pool over axis 1 (points)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"dense_{i}")(x)
            if self.use_bn:
                x = ScheduledBatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"bn_{i}")(x, bn_momentum)
            x = nn.relu(x)
        if self.pool:
            x = masked_max_pool(x)
        return x


class MLPHead(nn.Module):
    """FC stack (Dense -> BN -> ReLU per layer) + optional dropout + final
    linear projection with no activation (reference: fully_connected chain
    ending in activation_fn=None)."""

    features: Sequence[int]
    out_features: int
    dropout_rate: float = 0.0
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc_{i}")(x)
            if self.use_bn:
                x = ScheduledBatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"bn_{i}")(x, bn_momentum)
            x = nn.relu(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train,
                               name=f"dp_{i}")(x)
        # Final projection in fp32: logits / regressions feed losses.
        return nn.Dense(self.out_features, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="out")(x)


def masked_max_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                    axis: int = 1) -> jnp.ndarray:
    """Symmetric max-pool over the points axis, optionally masked.

    x [B, N, C]; mask [B, N] in {0,1}. Masked-out points are sent to a very
    negative value before the max so they never win. This is the
    PointNet symmetric function (reference: max_pool2d over N).
    """
    if mask is not None:
        neg = jnp.asarray(-1e9, x.dtype)
        x = jnp.where(mask[..., None] > 0, x, neg)
    return jnp.max(x, axis=axis)
