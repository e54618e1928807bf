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
        # Tolerant test: points exactly ON the clip edge count as inside.
        # A strict '>' drops shared vertices/edges, which collapsed the
        # intersection of IDENTICAL polygons at some headings (found by
        # the hypothesis property test: unit cube at heading 2.0 gave
        # self-IoU 0.22).
        cross = ((b[0] - a[0]) * (p[1] - a[1])
                 - (b[1] - a[1]) * (p[0] - a[0]))
        scale = (abs(b[0] - a[0]) + abs(b[1] - a[1])) * (
            abs(p[0] - a[0]) + abs(p[1] - a[1])) + 1e-12
        return cross >= -1e-9 * scale

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
    """Shoelace area of polygon verts [K, 2].

    Centered + float64: the raw shoelace on camera-frame coordinates
    (z tens of meters) has cross terms ~x*z that cancel catastrophically
    for small boxes — a 10cm box at z=30 lost 0.3% of its area in fp32
    (hypothesis property test finding)."""
    v = np.asarray(verts, np.float64)
    v = v - v.mean(axis=0)
    x, z = v[:, 0], v[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(z, -1))
                           - np.dot(z, np.roll(x, -1))))


def _bev_polygon(corners: np.ndarray) -> np.ndarray:
    """Top-face BEV polygon (x, z) from canonical [8, 3] corners."""
    return corners[:4][:, [0, 2]]


def _signed_area(verts: np.ndarray) -> float:
    x, z = verts[:, 0], verts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1)))


def convex_hull_intersection(p1: np.ndarray, p2: np.ndarray) -> float:
    """Intersection area of two convex BEV polygons [K, 2].

    The clip polygon winding is normalized to counter-clockwise (the
    orientation `polygon_clip`'s inside-test assumes) — a 180-degree
    heading flip reverses a box ring's winding, and guessing the
    orientation by retry mis-clipped identical-boundary cases (found by
    the hypothesis flip-invariance property test).
    """
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    if _signed_area(p2) < 0:
        p2 = p2[::-1]
    # Clip in a centered frame: with raw camera coordinates (z up to ~80m)
    # the line-line solves for near-coincident edges are catastrophically
    # ill-conditioned (self-IoU of a 10cm box at z=30 came out 1.006 —
    # found by the hypothesis property test). Area is translation-
    # invariant, so shift both polygons near the origin first.
    offset = p1.mean(axis=0)
    inter = polygon_clip([tuple(v) for v in p1 - offset],
                         [tuple(v) for v in p2 - offset])
    if not inter:
        return 0.0
    return polygon_area(np.asarray(inter))


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
