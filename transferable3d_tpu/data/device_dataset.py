"""Device-resident frustum dataset: per-step sampling/augmentation on-TPU.

TPU-first replacement for the per-step host provider work (SURVEY.md
§3.2 "HOT LOOP ... feed_dict"): the single-core host builds ~2k
frustums/s while the chip trains at ~9k/s, so the classic provider
starves the device even with prefetch. Here the *whole dataset* (records
padded to a fixed point budget, labels pre-encoded, rotate-to-center
applied once) is uploaded to HBM at startup; each training step then
draws its batch entirely in-graph:

  * gather B records,
  * sample `npoints` per record uniformly with replacement from the
    valid prefix (the reference's resampling semantics),
  * random flip (x-mirror, heading -> pi - heading) and depth shift,
    with the heading bins re-encoded in-graph,
  * one-hot class vectors.

Memory: R records x M points x C channels fp32 — e.g. 50k SUN-RGBD
frustums at M=2048, C=6 is ~2.5 GB, comfortably inside one chip's HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.data.provider import FrustumRecord


class DeviceFrustums(NamedTuple):
    """All-records device arrays (already rotated to frustum frame)."""

    points: jnp.ndarray        # [R, M, C] zero-padded
    seg: jnp.ndarray           # [R, M] int8
    count: jnp.ndarray         # [R] valid points per record
    center: jnp.ndarray        # [R, 3] GT center (frustum frame)
    size: jnp.ndarray          # [R, 3]
    heading: jnp.ndarray       # [R] GT heading (frustum frame)
    class_idx: jnp.ndarray     # [R]

    @property
    def num_records(self) -> int:
        return self.points.shape[0]


def build_device_dataset(records: Sequence[FrustumRecord],
                         cfg: bins_lib.BinConfig,
                         max_points: int = 2048) -> DeviceFrustums:
    """One-time host pass: rotate-to-center, pad/truncate, upload."""
    from transferable3d_tpu.core import geometry

    r = len(records)
    c = records[0].points.shape[1]
    points = np.zeros((r, max_points, c), np.float32)
    seg = np.zeros((r, max_points), np.int8)
    count = np.zeros(r, np.int32)
    center = np.zeros((r, 3), np.float32)
    size = np.ones((r, 3), np.float32)
    heading = np.zeros(r, np.float32)
    class_idx = np.zeros(r, np.int32)

    for i, rec in enumerate(records):
        pts = rec.points.astype(np.float32)
        m = min(pts.shape[0], max_points)
        ang = np.float32(rec.frustum_angle)
        pts = pts[:m].copy()
        pts[:, :3] = geometry.rotate_points_y_np(pts[None, :, :3], ang)[0]
        points[i, :m] = pts
        if rec.seg is not None:
            seg[i, :m] = rec.seg[:m]
        count[i] = m
        if rec.center is not None:
            center[i] = geometry.rotate_points_y_np(
                np.asarray(rec.center, np.float32)[None, None, :],
                ang)[0, 0]
            size[i] = rec.size
            heading[i] = float(rec.heading) + float(ang)
        class_idx[i] = rec.class_idx

    return DeviceFrustums(
        points=jnp.asarray(points), seg=jnp.asarray(seg),
        count=jnp.asarray(count), center=jnp.asarray(center),
        size=jnp.asarray(size), heading=jnp.asarray(heading),
        class_idx=jnp.asarray(class_idx))


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def sample_batch(data: DeviceFrustums, rng: jax.Array,
                 idxs: jnp.ndarray, npoints: int,
                 cfg: bins_lib.BinConfig, random_flip: bool = True,
                 random_shift: bool = True) -> Dict[str, jnp.ndarray]:
    """Draw a train batch fully on device. idxs [B] record indices."""
    b = idxs.shape[0]
    r_pts, r_flip, r_shift = jax.random.split(rng, 3)

    pts_all = data.points[idxs]          # [B, M, C]
    seg_all = data.seg[idxs]             # [B, M]
    count = jnp.maximum(data.count[idxs], 1)  # [B]
    center = data.center[idxs]
    size = data.size[idxs]
    heading = data.heading[idxs]
    class_idx = data.class_idx[idxs]

    # Uniform-with-replacement sampling from each record's valid prefix
    # (reference np.random.choice semantics) — no sort, no top_k.
    u = jax.random.uniform(r_pts, (b, npoints))
    sel = jnp.floor(u * count[:, None].astype(jnp.float32)).astype(
        jnp.int32)
    sel = jnp.minimum(sel, count[:, None] - 1)
    pts = jnp.take_along_axis(pts_all, sel[..., None], axis=1)
    seg = jnp.take_along_axis(seg_all, sel, axis=1).astype(jnp.int32)

    # Flip augmentation (per example).
    if random_flip:
        flip = jax.random.bernoulli(r_flip, 0.5, (b,))
        sign = jnp.where(flip, -1.0, 1.0)
        pts = pts.at[..., 0].mul(sign[:, None])
        center = center.at[:, 0].mul(sign)
        heading = jnp.where(flip, jnp.pi - heading, heading)
    if random_shift:
        dist = jnp.sqrt(center[:, 0] ** 2 + center[:, 2] ** 2)
        shift = jnp.clip(
            jax.random.normal(r_shift, (b,)) * dist * 0.05,
            -dist * 0.2, dist * 0.2)
        pts = pts.at[..., 2].add(shift[:, None])
        center = center.at[:, 2].add(shift)

    hcls, hres = bins_lib.angle_to_class(heading, cfg.num_heading_bin)
    scls, sres = bins_lib.size_to_class(size, class_idx, cfg)
    return {
        "points": pts,
        "seg": seg,
        "center": center,
        "heading_class": hcls,
        "heading_residual": hres,
        "size_class": scls,
        "size_residual": sres,
        "one_hot": jax.nn.one_hot(class_idx, cfg.num_classes),
        "class_idx": class_idx,
    }


class DeviceEpochIterator:
    """Host-side shuffling of record indices; everything else on device."""

    def __init__(self, data: DeviceFrustums, cfg: bins_lib.BinConfig,
                 batch_size: int, npoints: int, seed: int = 0,
                 random_flip: bool = True, random_shift: bool = True):
        self.data = data
        self.cfg = cfg
        self.batch_size = batch_size
        self.npoints = npoints
        self.random_flip = random_flip
        self.random_shift = random_shift
        self._np_rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed)

    def epoch(self):
        order = self._np_rng.permutation(self.data.num_records)
        n_batches = len(order) // self.batch_size
        for i in range(n_batches):
            self._key, sub = jax.random.split(self._key)
            idxs = jnp.asarray(
                order[i * self.batch_size:(i + 1) * self.batch_size])
            yield sample_batch(self.data, sub, idxs, self.npoints,
                               self.cfg, self.random_flip,
                               self.random_shift)
