"""F-PointNet v1: instance segmentation + T-Net + amodal box estimation.

Capability parity target: the reference's `models/frustum_pointnets_v1.py`
(SURVEY.md C6, call stack §3.3), re-derived from arXiv:1711.08488:

  stage 1 (seg):   per-point MLP (64,64,64,128,1024) -> global max-pool ->
                   concat(point feat 64, global 1024, one-hot K) ->
                   per-point MLP (512,256,128,128) + dropout -> 2 logits
  masking:         hard mask, masked centroid, 512 object points (static)
  stage 2 (T-Net): MLP (128,128,256) -> pool -> concat one-hot ->
                   FC (256,128) -> delta-center c1
  stage 3 (box):   MLP (128,128,256,512) -> pool -> concat one-hot ->
                   FC (512,256) -> [3 + 2*NH + 4*NS]

  center = c2 + c1 + mask_centroid ; stage1_center = c1 + mask_centroid

TPU-first: all "1x1 convs" are Dense over [B, N, C] (MXU matmuls); the
masking gather is shape-static (model_util.point_cloud_masking); compute
dtype is configurable bf16 with fp32 params/logits.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.models import model_util
from transferable3d_tpu.models.layers import (MLPHead, PointMLP,
                                              ScheduledBatchNorm,
                                              masked_max_pool)


class InstanceSegNetV1(nn.Module):
    """Per-point foreground/background logits. [B,N,C],[B,K] -> [B,N,2]."""

    dtype: Any = jnp.float32
    dropout_rate: float = 0.5  # reference keep_prob 0.5; 0 disables (parity tests)

    @nn.compact
    def __call__(self, points, one_hot, *, train: bool, bn_momentum):
        b, n, _ = points.shape
        x = points.astype(self.dtype)
        x = PointMLP([64, 64], dtype=self.dtype,
                     name="mlp1")(
            x, train=train, bn_momentum=bn_momentum)
        point_feat = x  # [B, N, 64]
        global_feat = PointMLP([64, 128, 1024], dtype=self.dtype,
                               pool=True, name="mlp2")(
            x, train=train, bn_momentum=bn_momentum)  # [B, 1024]

        # Reference: concat(point_feat, tile(global, one_hot)) -> 1x1 conv.
        # Dense(concat(pf, g)) == Dense_a(pf) + Dense_b(g) exactly (split
        # weight matrix), so compute the global/one-hot contribution once
        # per example and broadcast-add — this removes a [B, N, 1098]
        # materialization (~270 MB at bench shapes) and shrinks the
        # biggest matmul in the net from K=1098 to K=64 (~2 ms/step on
        # v5e). Same function class, same parameter count.
        g = jnp.concatenate([global_feat, one_hot.astype(self.dtype)],
                            axis=-1)  # [B, 1024 + K]
        a = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp3_point")(point_feat)  # [B, N, 512]
        bcast = nn.Dense(512, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="mlp3_global")(g)
        x = a + bcast[:, None, :]
        x = ScheduledBatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="mlp3_bn")(
                                   x, bn_momentum)
        x = nn.relu(x)
        x = PointMLP([256, 128, 128], dtype=self.dtype,
                     name="mlp3")(
            x, train=train, bn_momentum=bn_momentum)
        x = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="dp")(x)
        logits = nn.Dense(2, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="seg_out")(x)
        return logits


class TNet(nn.Module):
    """Center-regression network: object points -> delta-center [B, 3]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_points, one_hot, *, train: bool, bn_momentum):
        x = PointMLP([128, 128, 256], dtype=self.dtype,
                     pool=True, name="mlp")(
            obj_points.astype(self.dtype), train=train,
            bn_momentum=bn_momentum)  # [B, 256]
        x = jnp.concatenate([x, one_hot.astype(self.dtype)], axis=-1)
        return MLPHead([256, 128], out_features=3, dtype=self.dtype,
                       name="head")(x, train=train, bn_momentum=bn_momentum)


class BoxEstimationNetV1(nn.Module):
    """Amodal box head: object points -> [B, 3 + 2*NH + 4*NS]."""

    cfg: bins_lib.BinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_points, one_hot, *, train: bool, bn_momentum):
        x = PointMLP([128, 128, 256, 512], dtype=self.dtype,
                     pool=True, name="mlp")(
            obj_points.astype(self.dtype), train=train,
            bn_momentum=bn_momentum)  # [B, 512]
        x = jnp.concatenate([x, one_hot.astype(self.dtype)], axis=-1)
        return MLPHead([512, 256], out_features=self.cfg.box_output_dim,
                       dtype=self.dtype, name="head")(
                           x, train=train, bn_momentum=bn_momentum)


class FrustumPointNetV1(nn.Module):
    """Full 3-stage pipeline. Returns the `end_points` dict (reference
    `get_model` convention, SURVEY.md L2): seg_logits, mask, stage1_center,
    center, heading/size scores + residuals.

    The round-1 `fused=True` Pallas shared-MLP variant is retired: its
    custom-call boundary broke XLA's surrounding fusions (18.4 vs 13.6
    ms/step initially; with the full chain + VJP in kernels it reached
    11.7 ms exclusive device time but still lost ~5% wall and descended
    slower). The technique pays where BatchNorm blocks fusion over
    GROUPED tensors — see ops/fused_sa.py (v2)."""

    cfg: bins_lib.BinConfig
    dtype: Any = jnp.float32
    num_object_point: int = model_util.NUM_OBJECT_POINT
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, points, one_hot, *, train: bool,
                 bn_momentum=0.9) -> Dict[str, jnp.ndarray]:
        seg_logits = InstanceSegNetV1(dtype=self.dtype,
                                      dropout_rate=self.dropout_rate,
                                      name="seg_net")(
            points, one_hot, train=train, bn_momentum=bn_momentum)

        masked = model_util.point_cloud_masking(
            points, seg_logits, self.num_object_point)

        delta_c1 = TNet(dtype=self.dtype, name="tnet")(
            masked.object_points, one_hot, train=train,
            bn_momentum=bn_momentum)
        stage1_center = delta_c1 + masked.mask_centroid

        obj_recentered = masked.object_points - delta_c1[:, None, :]
        box_out = BoxEstimationNetV1(cfg=self.cfg, dtype=self.dtype,
                                     name="box_net")(
            obj_recentered, one_hot, train=train, bn_momentum=bn_momentum)

        end_points = model_util.parse_box_output(box_out, self.cfg)
        end_points["seg_logits"] = seg_logits
        end_points["mask"] = masked.mask
        end_points["mask_centroid"] = masked.mask_centroid
        end_points["stage1_center"] = stage1_center
        end_points["center"] = end_points["center_delta"] + stage1_center
        return end_points


class BoxEstimationOnly(nn.Module):
    """Config-1 model (BASELINE.json): box head alone on GT-cropped points
    (no seg stage, no T-Net) — the minimum end-to-end slice."""

    cfg: bins_lib.BinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, one_hot, *, train: bool,
                 bn_momentum=0.9) -> Dict[str, jnp.ndarray]:
        xyz = points[..., :3]
        centroid = jnp.mean(xyz, axis=1)  # [B, 3]
        centered = xyz - centroid[:, None, :]
        box_out = BoxEstimationNetV1(cfg=self.cfg, dtype=self.dtype,
                                     name="box_net")(
            centered, one_hot, train=train, bn_momentum=bn_momentum)
        end_points = model_util.parse_box_output(box_out, self.cfg)
        b, n, _ = points.shape
        end_points["seg_logits"] = jnp.zeros((b, n, 2), jnp.float32)
        end_points["mask"] = jnp.ones((b, n), jnp.float32)
        end_points["mask_centroid"] = centroid
        end_points["stage1_center"] = centroid
        end_points["center"] = end_points["center_delta"] + centroid
        return end_points
