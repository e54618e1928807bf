"""F-PointNet v2: PointNet++ backbones for seg + box estimation.

Capability parity target: the reference's `models/frustum_pointnets_v2.py`
(SURVEY.md C8), per arXiv:1711.08488 supplementary: the v1 stages with
PointNet++ encoders —

  seg net:  SA-MSG(128; r .2/.4/.8; k 32/64/128) ->
            SA-MSG(32; r .4/.8/1.6; k 64/64/128) ->
            SA(group_all; 128,256,1024) ->
            FP back to 32 -> FP back to 128 -> FP back to N (with the
            one-hot + raw points as skip) -> per-point head -> 2 logits
  box net:  SA(128, r .2, k 64; 64,64,128) ->
            SA(32, r .4, k 64; 128,128,256) ->
            SA(group_all; 256,256,512) -> FC head (same as v1)

T-Net and masking are shared with v1 (model_util).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.models import model_util
from transferable3d_tpu.models.frustum_pointnet_v1 import TNet
from transferable3d_tpu.models.layers import MLPHead, PointMLP
from transferable3d_tpu.models.pointnet2 import (FeaturePropagation,
                                                 SetAbstraction,
                                                 SetAbstractionMSG)


class InstanceSegNetV2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, one_hot, *, train: bool, bn_momentum):
        b, n, _ = points.shape
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        xyz1, f1 = SetAbstractionMSG(
            npoint=128, radii=(0.2, 0.4, 0.8), nsamples=(32, 64, 128),
            mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            dtype=self.dtype, name="sa1")(
                xyz, feats, train=train, bn_momentum=bn_momentum)
        xyz2, f2 = SetAbstractionMSG(
            npoint=32, radii=(0.4, 0.8, 1.6), nsamples=(64, 64, 128),
            mlps=((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            dtype=self.dtype, name="sa2")(
                xyz1, f1, train=train, bn_momentum=bn_momentum)
        xyz3, f3 = SetAbstraction(
            npoint=0, radius=0.0, nsample=0, mlp=(128, 256, 1024),
            group_all=True, dtype=self.dtype, name="sa3")(
                xyz2, f2, train=train, bn_momentum=bn_momentum)

        # Broadcast the one-hot class into the global feature.
        g = jnp.concatenate(
            [f3, one_hot.astype(f3.dtype)[:, None, :]], axis=-1)

        u2 = FeaturePropagation((128, 128), dtype=self.dtype, name="fp1")(
            xyz2, xyz3, f2, g, train=train, bn_momentum=bn_momentum)
        u1 = FeaturePropagation((128, 128), dtype=self.dtype, name="fp2")(
            xyz1, xyz2, f1, u2, train=train, bn_momentum=bn_momentum)
        skip = (points if feats is not None else xyz)
        u0 = FeaturePropagation((128, 128), dtype=self.dtype, name="fp3")(
            xyz, xyz1, skip.astype(self.dtype), u1, train=train,
            bn_momentum=bn_momentum)

        x = PointMLP([128], dtype=self.dtype, name="head_mlp")(
            u0, train=train, bn_momentum=bn_momentum)
        x = nn.Dropout(0.5, deterministic=not train, name="dp")(x)
        return nn.Dense(2, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="seg_out")(x)


class BoxEstimationNetV2(nn.Module):
    cfg: bins_lib.BinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_points, one_hot, *, train: bool, bn_momentum):
        xyz1, f1 = SetAbstraction(
            npoint=128, radius=0.2, nsample=64, mlp=(64, 64, 128),
            dtype=self.dtype, name="sa1")(
                obj_points, None, train=train, bn_momentum=bn_momentum)
        xyz2, f2 = SetAbstraction(
            npoint=32, radius=0.4, nsample=64, mlp=(128, 128, 256),
            dtype=self.dtype, name="sa2")(
                xyz1, f1, train=train, bn_momentum=bn_momentum)
        _, f3 = SetAbstraction(
            npoint=0, radius=0.0, nsample=0, mlp=(256, 256, 512),
            group_all=True, dtype=self.dtype, name="sa3")(
                xyz2, f2, train=train, bn_momentum=bn_momentum)
        g = jnp.concatenate([f3[:, 0], one_hot.astype(f3.dtype)], axis=-1)
        return MLPHead([512, 256], out_features=self.cfg.box_output_dim,
                       dtype=self.dtype, name="head")(
                           g, train=train, bn_momentum=bn_momentum)


class FrustumPointNetV2(nn.Module):
    """Full v2 pipeline; same end_points contract as v1."""

    cfg: bins_lib.BinConfig
    dtype: Any = jnp.float32
    num_object_point: int = model_util.NUM_OBJECT_POINT

    @nn.compact
    def __call__(self, points, one_hot, *, train: bool,
                 bn_momentum=0.9) -> Dict[str, jnp.ndarray]:
        seg_logits = InstanceSegNetV2(dtype=self.dtype, name="seg_net")(
            points, one_hot, train=train, bn_momentum=bn_momentum)
        masked = model_util.point_cloud_masking(
            points, seg_logits, self.num_object_point)
        delta_c1 = TNet(dtype=self.dtype, name="tnet")(
            masked.object_points, one_hot, train=train,
            bn_momentum=bn_momentum)
        stage1_center = delta_c1 + masked.mask_centroid
        obj_recentered = masked.object_points - delta_c1[:, None, :]
        box_out = BoxEstimationNetV2(cfg=self.cfg, dtype=self.dtype,
                                     name="box_net")(
            obj_recentered, one_hot, train=train, bn_momentum=bn_momentum)
        end_points = model_util.parse_box_output(box_out, self.cfg)
        end_points["seg_logits"] = seg_logits
        end_points["mask"] = masked.mask
        end_points["mask_centroid"] = masked.mask_centroid
        end_points["stage1_center"] = stage1_center
        end_points["center"] = end_points["center_delta"] + stage1_center
        return end_points
