"""PointNet++ set-abstraction / feature-propagation modules.

Capability parity target: the reference's `models/pointnet_util.py`
(SURVEY.md C8): `pointnet_sa_module`, `pointnet_sa_module_msg`,
`pointnet_fp_module`, built on the TPU-native ops N1-N3 (ops/).

TPU-first notes: grouped tensors are [B, S, K, C]; the per-group MLP is
a Dense over the channel axis (one [B*S*K, C] matmul on the MXU), and
the group max-pool is a single reduce. Out-of-radius pad slots repeat an
in-radius point, so the max over K is exact without masking.

Round-2 rewrite (from v5e profiles): the first shared-MLP layer is
FACTORED through the grouping whenever the input channel count is at
least the layer width — exact algebra:

    Dense0(concat(xyz_j - c_s, feat_j))
        == (concat(xyz, feat) @ W0 + b0)[j] - c_s @ W0[:3]

so the grouping extracts layer-1 preactivations [B, S, K, F1] and the
wide [B, S, K, 3+C] grouped tensor never materializes. At seg-SA2 the
grouped tensor is 323-channel: its concat/splits/layout copies were
~12 ms/step on v5e. Parameter layout is unchanged (dense_0 still holds
the [3+C, F1] kernel), so both paths interchange in checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

import os

from transferable3d_tpu.models.layers import (PointMLP, ScheduledBatchNorm,
                                              on_tpu)
from transferable3d_tpu.ops.grouping import (ball_query, ball_query_group,
                                             group_points, grouped_payload)
from transferable3d_tpu.ops.interpolate import three_interpolate, three_nn
from transferable3d_tpu.ops.sampling import farthest_point_sample, gather_points


class _DenseParams(nn.Module):
    """Parameter-only twin of nn.Dense (same names/inits) so the fused
    grouped-chain path produces a checkpoint-identical variable tree."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter-only twin of ScheduledBatchNorm (same names/inits)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features, jnp.float32))
        return scale, bias, mean, var


def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jnp.ndarray, features: Optional[jnp.ndarray]
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS centroids + ball-query groups with centered local coords.

    Returns (new_xyz [B, S, 3], grouped [B, S, K, 3 + C]).
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = gather_points(xyz, fps_idx)
    grouped = _group(new_xyz, xyz, features, radius, nsample)
    return new_xyz, grouped


def _group(new_xyz, xyz, features, radius, nsample):
    """Grouped [B, S, K, 3+C] with centered xyz channels; the gather-free
    one-hot-matmul path on TPU (scalar-unit gathers dominate otherwise),
    classic ball_query + gather elsewhere."""
    if on_tpu():
        grouped_all, _ = ball_query_group(new_xyz, xyz, features, radius,
                                          nsample)
        return jnp.concatenate(
            [grouped_all[..., :3] - new_xyz[:, :, None, :],
             grouped_all[..., 3:]], axis=-1)
    idx, _ = ball_query(new_xyz, xyz, radius, nsample)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is None:
        return grouped_xyz
    return jnp.concatenate(
        [grouped_xyz, group_points(features, idx)], axis=-1)


class GroupedPointMLP(nn.Module):
    """Ball-query grouping + per-group shared MLP + max-pool over K.

    Parameter layout matches PointMLP (dense_i / bn_i), so this module
    is a drop-in for the grouped-MLP stage of an SA scale. The factored
    layer-1 path (module docstring above) is used unconditionally: the
    grouping extracts layer-1 preactivations, so the extraction payload
    is always bf16 and runs through the fused Pallas kernel
    (ops/grouping.ball_query_extract) on TPU. Round-1 kept the raw
    extraction for narrow inputs on a FLOP argument, but the one-hot
    contraction's lanes pad to 128 either way — C=4 costs the same as
    C=F1, so factoring is strictly better.
    """

    features: Sequence[int]
    radius: float
    nsample: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, new_xyz, xyz, feats, *, train: bool, bn_momentum):
        cin = 3 + (0 if feats is None else feats.shape[-1])
        f1 = self.features[0]
        dense0 = nn.Dense(f1, dtype=self.dtype, param_dtype=jnp.float32,
                          name="dense_0")
        src = (xyz if feats is None else
               jnp.concatenate([xyz, feats.astype(xyz.dtype)], -1))
        pf = dense0(src.astype(self.dtype))  # [B, N, F1] (incl. bias)
        # Centroid contribution -c_s @ W0[:3], via the shared Dense
        # on a zero-padded centroid (the bias cancels in the
        # difference) — no direct kernel access needed.
        cent_pad = jnp.concatenate(
            [new_xyz.astype(self.dtype),
             jnp.zeros((*new_xyz.shape[:2], cin - 3), self.dtype)],
            axis=-1)
        qc = dense0(cent_pad) - dense0(jnp.zeros_like(cent_pad))

        fused = (on_tpu() and self.dtype == jnp.bfloat16
                 and os.environ.get("T3D_FUSED_SA", "1") == "1")
        if fused:
            return self._fused(new_xyz, xyz, pf, qc, train=train,
                               bn_momentum=bn_momentum)
        grouped_pf, _ = grouped_payload(
            new_xyz, xyz, pf, self.radius, self.nsample)  # [B, S, K, F1]
        x = grouped_pf - qc[:, :, None, :]
        for i, f in enumerate(self.features):
            if i:
                x = nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"dense_{i}")(x)
            x = ScheduledBatchNorm(use_running_average=not train,
                                   dtype=self.dtype, name=f"bn_{i}")(
                                       x, bn_momentum)
            x = nn.relu(x)
        return jnp.max(x, axis=2)  # [B, S, features[-1]]

    def _fused(self, new_xyz, xyz, pf, qc, *, train, bn_momentum):
        """Fused grouped-MLP chain (ops/fused_sa): the [B, S, K, C]
        tensors never reach XLA; parameter tree is identical to the
        unfused branch (checkpoint/TF1-importer compatible)."""
        from transferable3d_tpu.ops import fused_sa

        fs = list(self.features)
        gammas, betas, ra_means, ra_vars = [], [], [], []
        ws, bs = [], []
        for i, f in enumerate(fs):
            if i:
                k, b = _DenseParams(fs[i - 1], f, name=f"dense_{i}")()
                ws.append(k)
                bs.append(b)
            g, b2, m, v = _BNParams(f, name=f"bn_{i}")()
            gammas.append(g)
            betas.append(b2)
            ra_means.append(m)
            ra_vars.append(v)

        running = tuple((m.value, v.value)
                        for m, v in zip(ra_means, ra_vars))
        # Per-scale z layout (round 3): planar ([B, F, S*K] dense
        # transposed storage) when the row count is large enough that
        # the 128-lane HBM padding of the row-major layout dominates;
        # row-major otherwise (the planar segment/replication ops
        # regress at small S*K — measured round 2).
        rows = new_xyz.shape[1] * self.nsample
        # Planar only pays when row-major storage would pad: z tensors
        # with F >= 128 are lane-dense either way, and planar's
        # segment-max rolls + replication dots then cost ~+1.4 ms at
        # the seg-SA2 K=128 scale (measured round 3). The 4096-row
        # threshold was swept in round 4 (2048 regressed +0.4 ms) and
        # is fixed, not a knob.
        padded = min(self.features) < 128
        layout = ("planar" if padded and rows % 128 == 0
                  and rows >= 4096 else "rows")
        pooled, means, variances = fused_sa.fused_grouped_chain(
            new_xyz, xyz, pf, qc, tuple(gammas), tuple(betas),
            tuple(ws), tuple(bs), self.radius, self.nsample, 1e-3,
            train, running, fused_sa.INTERPRET, layout)
        if train and not self.is_initializing():
            m = jnp.asarray(bn_momentum, jnp.float32)
            for i in range(len(fs)):
                ra_means[i].value = (m * ra_means[i].value
                                     + (1.0 - m) * means[i])
                ra_vars[i].value = (m * ra_vars[i].value
                                    + (1.0 - m) * variances[i])
        return pooled


class SetAbstraction(nn.Module):
    """Single-scale SA: FPS -> ball query -> per-group MLP -> max-pool.

    `group_all=True` collapses to one global group (reference SA with
    npoint=None).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, *, train: bool, bn_momentum):
        if self.group_all:
            grouped = (xyz if features is None else
                       jnp.concatenate([xyz, features], axis=-1))
            grouped = grouped[:, None, :, :]  # [B, 1, N, C]
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            x = PointMLP(self.mlp, dtype=self.dtype, name="mlp")(
                grouped.astype(self.dtype), train=train,
                bn_momentum=bn_momentum)
            return new_xyz, jnp.max(x, axis=2)
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)
        pooled = GroupedPointMLP(self.mlp, self.radius, self.nsample,
                                 dtype=self.dtype, name="mlp")(
            new_xyz, xyz, features, train=train, bn_momentum=bn_momentum)
        return new_xyz, pooled  # [B, S, mlp[-1]]


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA (reference `pointnet_sa_module_msg`)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, *, train: bool, bn_momentum):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)
        outs = []
        for i, (r, k, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            outs.append(GroupedPointMLP(mlp, r, k, dtype=self.dtype,
                                        name=f"mlp_{i}")(
                new_xyz, xyz, features, train=train,
                bn_momentum=bn_momentum))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """FP: 3-NN inverse-distance upsampling + unit-pointnet MLP
    (reference `pointnet_fp_module`)."""

    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz_to, xyz_from, feat_to, feat_from, *,
                 train: bool, bn_momentum):
        """Propagate feat_from @ xyz_from -> xyz_to; concat with feat_to."""
        dist, idx = three_nn(xyz_to, xyz_from)
        upsampled = three_interpolate(feat_from, idx, dist)
        if feat_to is not None:
            upsampled = jnp.concatenate([upsampled, feat_to], axis=-1)
        return PointMLP(self.mlp, dtype=self.dtype, name="mlp")(
            upsampled.astype(self.dtype), train=train,
            bn_momentum=bn_momentum)
