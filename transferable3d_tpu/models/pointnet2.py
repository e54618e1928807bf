"""PointNet++ set-abstraction / feature-propagation modules.

Capability parity target: the reference's `models/pointnet_util.py`
(SURVEY.md C8): `pointnet_sa_module`, `pointnet_sa_module_msg`,
`pointnet_fp_module`, built on the TPU-native ops N1-N3 (ops/).

TPU-first notes: grouped tensors are [B, S, K, C]; the per-group MLP is
a Dense over the channel axis (one [B*S*K, C] matmul on the MXU), and
the group max-pool is a single reduce. Out-of-radius pad slots repeat an
in-radius point, so the max over K is exact without masking.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from transferable3d_tpu.models.layers import PointMLP, on_tpu
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
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, features)
        x = PointMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped.astype(self.dtype), train=train,
            bn_momentum=bn_momentum)
        return new_xyz, jnp.max(x, axis=2)  # [B, S, mlp[-1]]


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
            grouped = _group(new_xyz, xyz, features, r, k)
            x = PointMLP(mlp, dtype=self.dtype, name=f"mlp_{i}")(
                grouped.astype(self.dtype), train=train,
                bn_momentum=bn_momentum)
            outs.append(jnp.max(x, axis=2))
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
