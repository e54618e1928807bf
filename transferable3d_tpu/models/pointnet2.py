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

from transferable3d_tpu.models.layers import (PointMLP, ScheduledBatchNorm,
                                              on_tpu)
from transferable3d_tpu.ops.grouping import (ball_query, ball_query_group,
                                             group_points)
from transferable3d_tpu.ops.interpolate import three_interpolate, three_nn
from transferable3d_tpu.ops.sampling import farthest_point_sample, gather_points


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
    layer-1 path (module docstring above) activates when 3+C >= F1 —
    i.e. where the wide grouped tensor would dominate; narrow inputs
    (seg-SA1's 4 channels) keep the raw extraction, whose one-hot
    contraction is cheaper at C'=4 than at F1=32+.
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
        if cin >= f1:
            src = (xyz if feats is None else
                   jnp.concatenate([xyz, feats.astype(xyz.dtype)], -1))
            pf = dense0(src.astype(self.dtype))  # [B, N, F1] (incl. bias)
            grouped_pf, _ = ball_query_group(
                new_xyz, xyz, pf, self.radius, self.nsample,
                include_xyz=False)  # [B, S, K, F1]
            # Centroid contribution -c_s @ W0[:3], via the shared Dense
            # on a zero-padded centroid (the bias cancels in the
            # difference) — no direct kernel access needed.
            cent_pad = jnp.concatenate(
                [new_xyz.astype(self.dtype),
                 jnp.zeros((*new_xyz.shape[:2], cin - 3), self.dtype)],
                axis=-1)
            qc = dense0(cent_pad) - dense0(jnp.zeros_like(cent_pad))
            x = grouped_pf - qc[:, :, None, :]
        else:
            grouped = _group(new_xyz, xyz, feats, self.radius,
                             self.nsample)
            x = dense0(grouped.astype(self.dtype))
        for i, f in enumerate(self.features):
            if i:
                x = nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"dense_{i}")(x)
            x = ScheduledBatchNorm(use_running_average=not train,
                                   dtype=self.dtype, name=f"bn_{i}")(
                                       x, bn_momentum)
            x = nn.relu(x)
        return jnp.max(x, axis=2)  # [B, S, features[-1]]


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
