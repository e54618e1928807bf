"""Property-based geometry tests (hypothesis): invariants of the IoU and
corner math that hold for ALL boxes, not just sampled fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from transferable3d_tpu.core import box_np, geometry
from transferable3d_tpu.core.geometry import box_corners_np

finite = dict(allow_nan=False, allow_infinity=False)
center_s = st.tuples(
    st.floats(-10, 10, **finite), st.floats(-3, 3, **finite),
    st.floats(0.5, 40, **finite))
size_s = st.tuples(
    st.floats(0.1, 8, **finite), st.floats(0.1, 8, **finite),
    st.floats(0.1, 8, **finite))
angle_s = st.floats(-np.pi, np.pi, **finite)


@settings(max_examples=60, deadline=None)
@given(center_s, size_s, angle_s)
def test_self_iou_is_one(c, s, h):
    iou3d, ioubev = box_np.box3d_iou_params_np(c, s, h, c, s, h)
    assert abs(iou3d - 1.0) < 1e-3
    assert abs(ioubev - 1.0) < 1e-3


@settings(max_examples=60, deadline=None)
@given(center_s, size_s, angle_s, angle_s)
def test_heading_flip_invariance(c, s, h, h2):
    """IoU(a, b) == IoU(a, b + pi): a box is identical under a 180-degree
    heading flip (footprint symmetric)."""
    i1, _ = box_np.box3d_iou_params_np(c, s, h, c, s, h2)
    i2, _ = box_np.box3d_iou_params_np(c, s, h, c, s, h2 + np.pi)
    assert abs(i1 - i2) < 1e-3


@settings(max_examples=60, deadline=None)
@given(center_s, size_s, angle_s,
       st.floats(-5, 5, **finite), st.floats(-5, 5, **finite), angle_s,
       size_s)
def test_iou_bounds_and_symmetry(c, s, h, dx, dz, h2, s2):
    c2 = (c[0] + dx, c[1], c[2] + dz)
    ab = box_np.box3d_iou_params_np(c, s, h, c2, s2, h2)
    ba = box_np.box3d_iou_params_np(c2, s2, h2, c, s, h)
    for v, w in zip(ab, ba):
        assert -1e-6 <= v <= 1.0 + 1e-6
        assert abs(v - w) < 2e-3


@settings(max_examples=60, deadline=None)
@given(center_s, size_s, angle_s, angle_s)
def test_rotation_preserves_iou(c, s, h, rot):
    """Rotating BOTH boxes about the origin preserves IoU."""
    c2 = (c[0] + 0.3, c[1] + 0.1, c[2] + 0.4)
    s2 = (s[0] * 1.1, s[1] * 0.9, s[2])
    base3d, _ = box_np.box3d_iou_params_np(c, s, h, c2, s2, h + 0.3)
    ca = geometry.rotate_points_y_np(
        np.asarray(c, np.float32)[None, None], np.float32(rot))[0, 0]
    cb = geometry.rotate_points_y_np(
        np.asarray(c2, np.float32)[None, None], np.float32(rot))[0, 0]
    rot3d, _ = box_np.box3d_iou_params_np(
        ca, s, h + rot, cb, s2, h + 0.3 + rot)
    assert abs(base3d - rot3d) < 5e-3


@settings(max_examples=60, deadline=None)
@given(center_s, size_s, angle_s)
def test_corner_volume_matches_params(c, s, h):
    """The corner-derived box volume equals l*w*h (rigid transform)."""
    corners = box_corners_np(np.asarray(c, np.float32),
                             np.asarray(s, np.float32), np.float32(h))
    e1 = np.linalg.norm(corners[0] - corners[3])
    e2 = np.linalg.norm(corners[0] - corners[1])
    e3 = np.linalg.norm(corners[4] - corners[0])
    vol = e1 * e2 * e3
    want = s[0] * s[1] * s[2]
    assert abs(vol - want) / want < 1e-3


@settings(max_examples=40, deadline=None)
@given(center_s, size_s, angle_s)
def test_in_hull_center_inside_corners_outside(c, s, h):
    corners = box_corners_np(np.asarray(c, np.float32),
                             np.asarray(s, np.float32), np.float32(h))
    pts = np.concatenate([np.asarray(c, np.float32)[None],
                          corners * 1.0001 + 0.01 * (corners - np.asarray(
                              c, np.float32))])
    mask = box_np.in_hull_np(pts, corners)
    assert mask[0]  # the center is inside
