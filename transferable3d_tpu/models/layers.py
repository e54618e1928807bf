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

    return any("TPU" in d.device_kind for d in jax.devices())


class FusedPointLayer(nn.Module):
    """Dense + BatchNorm(train) + ReLU with single-pass fused statistics.

    Training forward runs the Pallas `linear_with_stats` kernel on TPU
    (matmul + per-column sum/sumsq in one VMEM pass — no separate
    activation read for BN stats); elsewhere, a pure-jnp twin with
    identical math. Eval uses running stats and a plain matmul.
    """

    features: int
    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum) -> jnp.ndarray:
        from transferable3d_tpu.ops import fused_linear

        c, f = x.shape[-1], self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (c, f), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (f,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(f, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(f, jnp.float32))

        lead = x.shape[:-1]
        m = 1
        for d in lead:
            m *= d
        x2 = x.reshape(m, c).astype(self.dtype)

        if train:
            if on_tpu():
                y2, stats = fused_linear.linear_with_stats(
                    x2, kernel, bias, False)
            else:
                y2, stats = fused_linear.linear_with_stats_ref(
                    x2, kernel, bias)
            mean = stats[0] / m
            var = jnp.maximum(stats[1] / m - mean * mean, 0.0)
            if not self.is_initializing():
                mom = jnp.asarray(bn_momentum, jnp.float32)
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
                ra_var.value = mom * ra_var.value + (1 - mom) * var
        else:
            y2 = (x2 @ kernel.astype(x2.dtype)
                  + bias.astype(x2.dtype)[None, :])
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon)) * scale
        out = (y2.astype(jnp.float32) - mean) * inv + beta
        return nn.relu(out).astype(self.dtype).reshape(*lead, f)


class FusedPointMLP(nn.Module):
    """Whole shared-MLP stack as a chain of fused Pallas layers.

    Each chain link (ops/fused_chain.bn_act_linear) computes
    act(a*s + t) @ w + b AND the column stats in one VMEM pass; the
    input BN of layer k is *folded* into (s, t) derived from layer
    k-1's stats — normalize/relu never materialize in HBM, and the
    custom backward kernel produces da/dw/db/ds/dt with all reductions
    accumulated in VMEM. Non-TPU falls back to the identical-math jnp
    twin (interpret-mode parity is covered by the kernel tests).
    """

    features: Sequence[int]
    epsilon: float = 1e-3
    pool: bool = False   # end with fused normalize->relu->max-pool over N
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum) -> jnp.ndarray:
        from transferable3d_tpu.ops import fused_chain

        lead = x.shape[:-1]
        m = 1
        for d in lead:
            m *= d
        a = x.reshape(m, x.shape[-1]).astype(self.dtype)
        use_kernel = train and on_tpu()

        s_in = jnp.ones(a.shape[-1], jnp.float32)
        t_in = jnp.zeros(a.shape[-1], jnp.float32)
        for i, f in enumerate(self.features):
            k_in = a.shape[-1]
            kernel = self.param(f"kernel_{i}",
                                nn.initializers.lecun_normal(),
                                (k_in, f), jnp.float32)
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (f,),
                              jnp.float32)
            scale = self.param(f"scale_{i}", nn.initializers.ones, (f,),
                               jnp.float32)
            beta = self.param(f"beta_{i}", nn.initializers.zeros, (f,),
                              jnp.float32)
            ra_mean = self.variable("batch_stats", f"mean_{i}",
                                    lambda f=f: jnp.zeros(f, jnp.float32))
            ra_var = self.variable("batch_stats", f"var_{i}",
                                   lambda f=f: jnp.ones(f, jnp.float32))
            apply_act = i > 0
            if train:
                if use_kernel:
                    y, stats = fused_chain.bn_act_linear(
                        a, s_in, t_in, kernel, bias, apply_act, False)
                else:
                    y, stats = fused_chain.bn_act_linear_ref(
                        a, s_in, t_in, kernel, bias, apply_act)
                mean = stats[0] / m
                var = jnp.maximum(stats[1] / m - mean * mean, 0.0)
                if not self.is_initializing():
                    mom = jnp.asarray(bn_momentum, jnp.float32)
                    ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
                    ra_var.value = mom * ra_var.value + (1 - mom) * var
            else:
                xin = (a.astype(jnp.float32) * s_in + t_in)
                if apply_act:
                    xin = jnp.maximum(xin, 0.0)
                y = (xin.astype(self.dtype) @ kernel.astype(self.dtype)
                     + bias.astype(self.dtype)[None, :])
                mean, var = ra_mean.value, ra_var.value
            s_in = scale * jax.lax.rsqrt(var + self.epsilon)
            t_in = beta - mean * s_in
            a = y

        f_out = self.features[-1]
        if self.pool:
            # Fused normalize->relu->max-pool over the points axis: the
            # raw chain output never round-trips HBM as a normalized
            # tensor (BASELINE's "masked symmetric max-pool" kernel).
            y3 = a.reshape(*lead, f_out)
            if use_kernel:
                pooled = fused_chain.bn_act_maxpool(y3, s_in, t_in, False)
            else:
                pooled = fused_chain.bn_act_maxpool_ref(y3, s_in, t_in)
            return pooled.astype(self.dtype)
        out = jnp.maximum(a.astype(jnp.float32) * s_in + t_in, 0.0)
        return out.astype(self.dtype).reshape(*lead, f_out)


class PointMLP(nn.Module):
    """Shared per-point MLP stack over [B, N, C] (reference: 1x1 conv2d).

    Each layer: Dense -> ScheduledBatchNorm -> ReLU. `bn_momentum` is the
    scheduled momentum (traced). With `fused=True`, the whole stack runs
    as a FusedPointMLP chain of Pallas kernels (same math).
    """

    features: Sequence[int]
    use_bn: bool = True
    fused: bool = False
    pool: bool = False   # end with a max-pool over axis 1 (points)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum) -> jnp.ndarray:
        if self.fused and self.use_bn:
            return FusedPointMLP(self.features, pool=self.pool,
                                 dtype=self.dtype, name="fused")(
                x, train=train, bn_momentum=bn_momentum)
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
