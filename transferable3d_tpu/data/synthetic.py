"""Synthetic frustum generator for tests, smoke training, and benchmarks.

The reference has no test data generator (SURVEY.md §4 — research code);
this fills that gap: random boxes drawn around each class's mean size,
uniform object points inside the box, clutter points in the frustum cone,
exact seg labels from the box test. Learnable by construction (object
points dominate near the box) so loss/IoU curves must improve — used as
the config-1 exit criterion (SURVEY.md §7 step 3).
"""

from __future__ import annotations

from typing import List

import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core import geometry
from transferable3d_tpu.data.provider import FrustumRecord


def make_record(rng: np.random.RandomState, cfg: bins_lib.BinConfig,
                class_idx: int = None, n_object: int = 400,
                n_clutter: int = 200, extra_channels: int = 1
                ) -> FrustumRecord:
    """One synthetic frustum in the frustum camera frame (Y down)."""
    k = (rng.randint(cfg.num_classes) if class_idx is None else class_idx)
    mean = np.asarray(cfg.mean_sizes[k], np.float32)
    size = mean * rng.uniform(0.8, 1.25, 3).astype(np.float32)
    heading = np.float32(rng.uniform(-np.pi, np.pi))

    depth = rng.uniform(3.0, 15.0)
    lateral = rng.uniform(-0.25, 0.25) * depth
    # Y down: ground is at positive Y; put the box center slightly below
    # the camera horizon like a real indoor/outdoor object.
    center = np.array([lateral, rng.uniform(0.2, 1.2), depth], np.float32)
    frustum_angle = float(-np.arctan2(center[0], center[2]))

    # Object points: uniform inside the box, rotated + translated.
    # Local axes before the heading rotation: x spans l, y spans h, z spans w.
    local = rng.uniform(-0.5, 0.5, (n_object, 3)).astype(np.float32)
    local[:, 0] *= size[0]
    local[:, 1] *= size[2]
    local[:, 2] *= size[1]
    obj = geometry.rotate_points_y_np(local[None], heading)[0] + center

    # Clutter: points spread through the frustum cone around the ray.
    t = rng.uniform(0.3, 1.4, (n_clutter, 1)).astype(np.float32)
    ray = center[None] * t
    clutter = ray + rng.normal(0, 0.8, (n_clutter, 3)).astype(np.float32)

    pts = np.concatenate([obj, clutter], axis=0)
    if extra_channels:
        extra = rng.uniform(0, 1, (pts.shape[0], extra_channels))
        pts = np.concatenate([pts, extra.astype(np.float32)], axis=1)

    corners = geometry.box_corners_np(center, size, heading)
    from transferable3d_tpu.core import box_np
    seg = box_np.in_hull_np(pts[:, :3], corners).astype(np.int64)

    perm = rng.permutation(pts.shape[0])
    return FrustumRecord(points=pts[perm], seg=seg[perm], class_idx=int(k),
                         frustum_angle=frustum_angle, center=center,
                         size=size, heading=heading,
                         box2d=np.zeros(4, np.float32),
                         frame_id=f"synthetic_{rng.randint(1 << 30):08d}")


def make_dataset(n: int, cfg: bins_lib.BinConfig, seed: int = 0,
                 **kwargs) -> List[FrustumRecord]:
    rng = np.random.RandomState(seed)
    return [make_record(rng, cfg, **kwargs) for _ in range(n)]
