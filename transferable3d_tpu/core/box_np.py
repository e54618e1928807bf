"""Host-side (numpy) 3D box IoU and polygon utilities for offline eval.

Capability parity target: the reference's `train/box_util.py`
(`box3d_iou`, `polygon_clip`, `convex_hull_intersection`) — SURVEY.md C11.
Implemented from the textbook Sutherland–Hodgman algorithm; used by the
AP evaluators (`eval/ap.py`, the KITTI eval tool's python twin) and tests.

The in-graph jit twin lives in `geometry.py`; `tests/test_geometry.py`
cross-checks the two on random boxes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from transferable3d_tpu.core.geometry import box_corners_np


def polygon_clip(subject: Sequence[Tuple[float, float]],
                 clip: Sequence[Tuple[float, float]]
                 ) -> Optional[List[Tuple[float, float]]]:
    """Sutherland–Hodgman: clip `subject` polygon by convex `clip` polygon.

    Both polygons are sequences of (x, z) vertices in consistent winding.
    Returns the clipped vertex list or None if empty.
    """

    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) > (b[1] - a[1]) * (p[0] - a[0])

    def intersection(p, q, a, b):
        dc = (a[0] - b[0], a[1] - b[1])
        dp = (p[0] - q[0], p[1] - q[1])
        n1 = a[0] * b[1] - a[1] * b[0]
        n2 = p[0] * q[1] - p[1] * q[0]
        den = dc[0] * dp[1] - dc[1] * dp[0]
        if den == 0:
            return q
        return ((n1 * dp[0] - n2 * dc[0]) / den,
                (n1 * dp[1] - n2 * dc[1]) / den)

    output = list(subject)
    a = clip[-1]
    for b in clip:
        if not output:
            return None
        inputs, output = output, []
        p = inputs[-1]
        for q in inputs:
            if inside(q, a, b):
                if not inside(p, a, b):
                    output.append(intersection(p, q, a, b))
                output.append(q)
            elif inside(p, a, b):
                output.append(intersection(p, q, a, b))
            p = q
        a = b
    return output if output else None


def polygon_area(verts: np.ndarray) -> float:
    """Shoelace area of polygon verts [K, 2]."""
    x, z = verts[:, 0], verts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1))))


def _bev_polygon(corners: np.ndarray) -> np.ndarray:
    """Top-face BEV polygon (x, z) from canonical [8, 3] corners."""
    return corners[:4][:, [0, 2]]


def convex_hull_intersection(p1: np.ndarray, p2: np.ndarray) -> float:
    """Intersection area of two convex BEV polygons [K, 2]."""
    # polygon_clip's `inside` assumes a winding; try both orientations of
    # the clip polygon and take the consistent (non-zero) result.
    for clip in (p2, p2[::-1]):
        inter = polygon_clip([tuple(v) for v in p1], [tuple(v) for v in clip])
        if inter:
            return polygon_area(np.asarray(inter))
    return 0.0


def box3d_iou_np(corners_a: np.ndarray, corners_b: np.ndarray
                 ) -> Tuple[float, float]:
    """(3D IoU, BEV IoU) from canonical [8, 3] corner arrays.

    Y is down: top face y = corners[:4, 1], bottom face y = corners[4:, 1].
    """
    poly_a = _bev_polygon(corners_a)
    poly_b = _bev_polygon(corners_b)
    inter_area = convex_hull_intersection(poly_a, poly_b)
    area_a = polygon_area(poly_a)
    area_b = polygon_area(poly_b)
    iou_bev = inter_area / max(area_a + area_b - inter_area, 1e-8)

    ymin = max(corners_a[:, 1].min(), corners_b[:, 1].min())
    ymax = min(corners_a[:, 1].max(), corners_b[:, 1].max())
    h_overlap = max(ymax - ymin, 0.0)
    inter_vol = inter_area * h_overlap
    vol_a = area_a * (corners_a[:, 1].max() - corners_a[:, 1].min())
    vol_b = area_b * (corners_b[:, 1].max() - corners_b[:, 1].min())
    iou3d = inter_vol / max(vol_a + vol_b - inter_vol, 1e-8)
    return float(iou3d), float(iou_bev)


def box3d_iou_params_np(center_a, size_a, heading_a,
                        center_b, size_b, heading_b) -> Tuple[float, float]:
    """Param-form convenience wrapper over `box3d_iou_np`."""
    ca = box_corners_np(np.asarray(center_a, np.float32),
                        np.asarray(size_a, np.float32),
                        np.asarray(heading_a, np.float32))
    cb = box_corners_np(np.asarray(center_b, np.float32),
                        np.asarray(size_b, np.float32),
                        np.asarray(heading_b, np.float32))
    return box3d_iou_np(ca, cb)


def in_hull_np(points: np.ndarray, corners: np.ndarray) -> np.ndarray:
    """Boolean mask of points [N, 3] inside the (possibly rotated) box.

    Exact for our boxes: transform into the box frame and test the three
    axis-aligned extents — no Delaunay needed (the reference used
    scipy.spatial.Delaunay for arbitrary hulls; ours are always boxes).
    """
    center = corners.mean(axis=0)
    # Recover axes from canonical ordering: x-axis = c0 - c3, z-axis = c0 - c1.
    x_axis = corners[0] - corners[3]
    z_axis = corners[0] - corners[1]
    y_axis = corners[4] - corners[0]
    l = np.linalg.norm(x_axis)
    w = np.linalg.norm(z_axis)
    h = np.linalg.norm(y_axis)
    x_axis, z_axis, y_axis = x_axis / l, z_axis / w, y_axis / h
    rel = points - center
    px = rel @ x_axis
    py = rel @ y_axis
    pz = rel @ z_axis
    return ((np.abs(px) <= l / 2 + 1e-6)
            & (np.abs(py) <= h / 2 + 1e-6)
            & (np.abs(pz) <= w / 2 + 1e-6))
