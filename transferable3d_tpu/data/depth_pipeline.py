"""Fully on-device training pipeline: raw depth maps -> train batch.

This is the BASELINE.json north-star end to end: "the RGB-D frustum
lifting stage (2D box + depth map -> frustum point cloud, frustum-frame
rotation, fixed-size point sampling) becomes a fused jit-compiled
preprocessing pass" — composed here with in-graph label encoding so the
*entire* path from raw sensor data to the training step's inputs runs
inside one compiled program. The host only supplies (depth, K, boxes2d,
GT box params); no per-example python runs anywhere (contrast the
reference's hours-long offline extraction, SURVEY.md §3.1).

Pieces:
  * `scene_to_train_batch` — lift + sample + rotate (data/frustum_jit.py)
    plus in-graph seg labels (point-in-box test) and heading/size bin
    encoding, vmapped over frames.
  * `SyntheticDepthScenes` — host-side generator of synthetic depth maps
    with boxes (tests / smoke training; real data comes from the SUN-RGBD
    depth images via data/sunrgbd.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core import geometry
from transferable3d_tpu.data import frustum_jit


class DepthScene(NamedTuple):
    """One frame batch, fixed shapes (host -> device once per step)."""

    depth: jnp.ndarray        # [F, H, W] meters
    K: jnp.ndarray            # [3, 3] shared intrinsics
    boxes2d: jnp.ndarray      # [F, MB, 4] (padded with zero-area boxes)
    box_valid: jnp.ndarray    # [F, MB] bool
    center: jnp.ndarray       # [F, MB, 3] GT centers (camera frame)
    size: jnp.ndarray         # [F, MB, 3] (l, w, h)
    heading: jnp.ndarray      # [F, MB]
    class_idx: jnp.ndarray    # [F, MB] int


def points_in_box(points: jnp.ndarray, center: jnp.ndarray,
                  size: jnp.ndarray, heading: jnp.ndarray) -> jnp.ndarray:
    """In-graph point-in-box mask: points [N, 3] vs one box. jit-safe
    twin of box_np.in_hull_np."""
    rel = geometry.rotate_points_y((points - center)[None], -heading)[0]
    half = size / 2.0
    return ((jnp.abs(rel[:, 0]) <= half[0] + 1e-6)
            & (jnp.abs(rel[:, 1]) <= half[2] + 1e-6)
            & (jnp.abs(rel[:, 2]) <= half[1] + 1e-6))


@partial(jax.jit, static_argnums=(2, 3))
def scene_to_train_batch(scene: DepthScene, rng: jax.Array,
                         npoints: int, cfg: bins_lib.BinConfig
                         ) -> Dict[str, jnp.ndarray]:
    """Depth scenes -> flat train batch [F*MB, ...], entirely on device.

    Padding boxes yield zero-count frustums; the returned `valid` column
    lets the loss mask them (or the caller can rely on weight 0 labels).
    """
    f, mb = scene.boxes2d.shape[:2]

    def per_frame(depth, boxes2d, r):
        return frustum_jit.lift_depth_frustums(
            depth, scene.K, boxes2d, npoints, r)

    rngs = jax.random.split(rng, f)
    out = jax.vmap(per_frame)(scene.depth, scene.boxes2d, rngs)
    points = out.points.reshape(f * mb, npoints, -1)
    angles = out.frustum_angle.reshape(f * mb)
    counts = out.count.reshape(f * mb)

    center = scene.center.reshape(f * mb, 3)
    size = scene.size.reshape(f * mb, 3)
    heading = scene.heading.reshape(f * mb)
    class_idx = scene.class_idx.reshape(f * mb)
    valid = scene.box_valid.reshape(f * mb) & (counts > 0)

    # Rotate GT into the frustum frame (matches provider.rotate_to_center).
    center_rot = geometry.rotate_points_y(center[:, None, :], angles)[:, 0]
    heading_rot = heading + angles

    # Seg labels: in-box test against the *rotated* GT box.
    seg = jax.vmap(points_in_box)(points[..., :3], center_rot, size,
                                  heading_rot).astype(jnp.int32)

    hcls, hres = bins_lib.angle_to_class(heading_rot, cfg.num_heading_bin)
    scls, sres = bins_lib.size_to_class(size, class_idx, cfg)
    one_hot = jax.nn.one_hot(class_idx, cfg.num_classes)

    return {
        "points": points,
        "seg": seg,
        "center": center_rot,
        "heading_class": hcls,
        "heading_residual": hres,
        "size_class": scls.astype(jnp.int32),
        "size_residual": sres,
        "one_hot": one_hot,
        "class_idx": class_idx,
        "frustum_angle": angles,
        "valid": valid,
        "count": counts,
    }


# ---------------------------------------------------------------------------
# Synthetic depth scenes (tests / smoke)
# ---------------------------------------------------------------------------

def render_box_depth(h: int, w: int, K: np.ndarray, center: np.ndarray,
                     size: np.ndarray, heading: float,
                     background_depth: float = 8.0) -> np.ndarray:
    """Crude z-buffer render of one box over a flat background wall.

    Good enough for pipeline tests: each pixel's ray is intersected with
    the box's axis-aligned form in the box frame (slab method).
    """
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack([(u - K[0, 2]) / K[0, 0],
                     (v - K[1, 2]) / K[1, 1],
                     np.ones_like(u, np.float64)], axis=-1)  # [H, W, 3]
    # Into box frame.
    rot = geometry.roty_np(np.float32(-heading))
    d = dirs @ rot.T
    o = (rot @ (-center)).astype(np.float64)
    half = np.array([size[0] / 2, size[2] / 2, size[1] / 2])

    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (-half - o) / d
        t2 = (half - o) / d
    tmin = np.nanmax(np.minimum(t1, t2), axis=-1)
    tmax = np.nanmin(np.maximum(t1, t2), axis=-1)
    hit = (tmax >= np.maximum(tmin, 0))
    depth = np.where(hit, tmin, background_depth)  # camera z = t * dz
    depth = depth * dirs[..., 2]
    return np.where(depth > 0.1, depth, background_depth).astype(np.float32)


def make_depth_scene(rng: np.random.RandomState, cfg: bins_lib.BinConfig,
                     n_frames: int = 2, boxes_per_frame: int = 2,
                     h: int = 120, w: int = 160) -> Tuple[DepthScene,
                                                          np.ndarray]:
    """Synthetic DepthScene + the intrinsics used."""
    K = np.array([[130.0, 0, w / 2], [0, 130.0, h / 2], [0, 0, 1]],
                 np.float64)
    depths = np.zeros((n_frames, h, w), np.float32)
    boxes2d = np.zeros((n_frames, boxes_per_frame, 4), np.float32)
    valid = np.zeros((n_frames, boxes_per_frame), bool)
    centers = np.zeros((n_frames, boxes_per_frame, 3), np.float32)
    sizes = np.ones((n_frames, boxes_per_frame, 3), np.float32)
    headings = np.zeros((n_frames, boxes_per_frame), np.float32)
    classes = np.zeros((n_frames, boxes_per_frame), np.int64)

    for fi in range(n_frames):
        depth = np.full((h, w), 8.0, np.float32)
        for bi in range(boxes_per_frame):
            k = rng.randint(cfg.num_classes)
            size = (np.asarray(cfg.mean_sizes[k], np.float32)
                    * rng.uniform(0.9, 1.1, 3).astype(np.float32))
            lateral = rng.uniform(-0.15, 0.15)
            center = np.array([0, 0, rng.uniform(3.5, 6.0)], np.float32)
            center[0] = lateral * center[2]
            center[1] = rng.uniform(-0.2, 0.4)
            heading = np.float32(rng.uniform(-np.pi, np.pi))
            box_depth = render_box_depth(h, w, K, center, size, heading)
            depth = np.minimum(depth, box_depth)
            corners = geometry.box_corners_np(center, size, heading)
            uv = (corners @ np.array([[K[0, 0], 0], [0, K[1, 1]],
                                      [K[0, 2], K[1, 2]]], np.float64)
                  / corners[:, 2:3])
            b2d = np.array([max(uv[:, 0].min(), 0),
                            max(uv[:, 1].min(), 0),
                            min(uv[:, 0].max(), w - 1),
                            min(uv[:, 1].max(), h - 1)], np.float32)
            boxes2d[fi, bi] = b2d
            valid[fi, bi] = True
            centers[fi, bi] = center
            sizes[fi, bi] = size
            headings[fi, bi] = heading
            classes[fi, bi] = k
        depths[fi] = depth

    scene = DepthScene(
        depth=jnp.asarray(depths), K=jnp.asarray(K.astype(np.float32)),
        boxes2d=jnp.asarray(boxes2d), box_valid=jnp.asarray(valid),
        center=jnp.asarray(centers), size=jnp.asarray(sizes),
        heading=jnp.asarray(headings), class_idx=jnp.asarray(classes))
    return scene, K
