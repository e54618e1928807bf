"""Geometry tests: corner math, rotations, and IoU host/device parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transferable3d_tpu.core import box_np, geometry


def test_corner_roundtrip_identity_heading():
    center = np.array([1.0, 2.0, 3.0], np.float32)
    size = np.array([4.0, 2.0, 1.5], np.float32)  # l, w, h
    corners = geometry.box_corners_np(center, size, np.float32(0.0))
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.mean(axis=0), center, atol=1e-5)
    # Extents match l (x), h (y), w (z) at heading 0.
    ext = corners.max(axis=0) - corners.min(axis=0)
    np.testing.assert_allclose(ext, [4.0, 1.5, 2.0], atol=1e-5)
    # Top face (negative y, since Y is down) is corners 0-3.
    assert (corners[:4, 1] < corners[4:, 1]).all()


def test_corners_jax_matches_np():
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(16, 3)).astype(np.float32)
    sizes = rng.uniform(0.5, 3.0, size=(16, 3)).astype(np.float32)
    headings = rng.uniform(-np.pi, np.pi, size=(16,)).astype(np.float32)
    c_np = geometry.box_corners_np(centers, sizes, headings)
    c_j = np.asarray(geometry.box_corners(
        jnp.asarray(centers), jnp.asarray(sizes), jnp.asarray(headings)))
    np.testing.assert_allclose(c_j, c_np, atol=1e-4)


def test_rotation_aligns_ray():
    # A point on the ray at angle a from +Z: rotating by the frustum angle
    # -a brings it onto +Z... verify our convention: rotate_points_y with
    # angle t maps (x, z) -> (c x + s z, -s x + c z).
    p = np.array([[[1.0, 0.0, 1.0]]], np.float32)  # 45 deg off +Z
    out = np.asarray(geometry.rotate_points_y(
        jnp.asarray(p), jnp.asarray([np.pi / 4], np.float32)))
    np.testing.assert_allclose(out[0, 0], [np.sqrt(2), 0, 0], atol=1e-5)
    # So aligning onto +Z uses angle -pi/4 for this point:
    out2 = np.asarray(geometry.rotate_points_y(
        jnp.asarray(p), jnp.asarray([-np.pi / 4], np.float32)))
    np.testing.assert_allclose(out2[0, 0], [0, 0, np.sqrt(2)], atol=1e-5)


def test_iou_identical_boxes():
    c = jnp.array([0.0, 0.0, 5.0])
    s = jnp.array([2.0, 1.0, 1.5])
    h = jnp.array(0.3)
    iou3d, ioubev = geometry.box3d_iou(c, s, h, c, s, h)
    assert abs(float(iou3d) - 1.0) < 1e-5
    assert abs(float(ioubev) - 1.0) < 1e-5


def test_iou_disjoint_boxes():
    c1 = jnp.array([0.0, 0.0, 0.0])
    c2 = jnp.array([100.0, 0.0, 0.0])
    s = jnp.array([2.0, 1.0, 1.5])
    iou3d, ioubev = geometry.box3d_iou(c1, s, jnp.array(0.0),
                                       c2, s, jnp.array(0.5))
    assert float(iou3d) == 0.0
    assert float(ioubev) == 0.0


def test_iou_axis_aligned_known_value():
    # Two axis-aligned unit-footprint boxes offset by half along x:
    # BEV inter = 0.5, union = 1.5 -> IoU_bev = 1/3. Same height span ->
    # 3D IoU also 1/3.
    s = jnp.array([1.0, 1.0, 1.0])
    c1 = jnp.array([0.0, 0.0, 0.0])
    c2 = jnp.array([0.5, 0.0, 0.0])
    iou3d, ioubev = geometry.box3d_iou(c1, s, jnp.array(0.0),
                                       c2, s, jnp.array(0.0))
    np.testing.assert_allclose(float(ioubev), 1 / 3, atol=1e-5)
    np.testing.assert_allclose(float(iou3d), 1 / 3, atol=1e-5)


def test_iou_rotated_45_known_value():
    # Unit square vs itself rotated 45 deg about the same center:
    # intersection is a regular octagon with area 2*(sqrt(2)-1).
    s = jnp.array([1.0, 1.0, 1.0])
    c = jnp.array([0.0, 0.0, 0.0])
    iou3d, ioubev = geometry.box3d_iou(c, s, jnp.array(0.0),
                                       c, s, jnp.array(np.pi / 4))
    inter = 2 * (np.sqrt(2) - 1)
    expected = inter / (2 - inter)
    np.testing.assert_allclose(float(ioubev), expected, atol=1e-4)
    np.testing.assert_allclose(float(iou3d), expected, atol=1e-4)


def test_iou_device_matches_host_random():
    rng = np.random.RandomState(7)
    n = 64
    ca = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    cb = ca + rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    sa = rng.uniform(0.5, 3, (n, 3)).astype(np.float32)
    sb = rng.uniform(0.5, 3, (n, 3)).astype(np.float32)
    ha = rng.uniform(-np.pi, np.pi, (n,)).astype(np.float32)
    hb = rng.uniform(-np.pi, np.pi, (n,)).astype(np.float32)

    iou3d_j, ioubev_j = jax.jit(geometry.box3d_iou_batched)(
        ca, sa, ha, cb, sb, hb)
    for i in range(n):
        iou3d_n, ioubev_n = box_np.box3d_iou_params_np(
            ca[i], sa[i], ha[i], cb[i], sb[i], hb[i])
        assert abs(float(iou3d_j[i]) - iou3d_n) < 1e-3, i
        assert abs(float(ioubev_j[i]) - ioubev_n) < 1e-3, i


def test_iou_symmetry():
    rng = np.random.RandomState(9)
    n = 32
    ca = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    cb = ca + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sa = rng.uniform(0.5, 3, (n, 3)).astype(np.float32)
    sb = rng.uniform(0.5, 3, (n, 3)).astype(np.float32)
    ha = rng.uniform(-np.pi, np.pi, (n,)).astype(np.float32)
    hb = rng.uniform(-np.pi, np.pi, (n,)).astype(np.float32)
    ab = geometry.box3d_iou_batched(ca, sa, ha, cb, sb, hb)
    ba = geometry.box3d_iou_batched(cb, sb, hb, ca, sa, ha)
    np.testing.assert_allclose(np.asarray(ab[0]), np.asarray(ba[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ab[1]), np.asarray(ba[1]), atol=1e-4)


def test_in_hull():
    corners = geometry.box_corners_np(
        np.array([0, 0, 0], np.float32),
        np.array([2.0, 1.0, 1.0], np.float32),
        np.float32(np.pi / 6))
    pts = np.array([
        [0, 0, 0],        # center: inside
        [10, 0, 0],       # far: outside
        [0.9, 0, 0],      # near +x in box frame... rotated, check both
    ], np.float32)
    mask = box_np.in_hull_np(pts, corners)
    assert mask[0] and not mask[1]
    # Random points: in_hull must agree with analytic box-frame test.
    rng = np.random.RandomState(4)
    pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    mask = box_np.in_hull_np(pts, corners)
    # Inverse-rotate points and test extents directly.
    inv = geometry.rotate_points_y_np(pts[None], np.float32(-np.pi / 6))[0]
    expected = ((np.abs(inv[:, 0]) <= 1.0 + 1e-6)
                & (np.abs(inv[:, 1]) <= 0.5 + 1e-6)
                & (np.abs(inv[:, 2]) <= 0.5 + 1e-6))
    np.testing.assert_array_equal(mask, expected)


def test_exact_hi_lo_split():
    """core/numerics.exact_hi_lo: bf16-valued parts, exact bf16 casts,
    ~16-bit-mantissa reconstruction. Uses lax.reduce_precision because
    TPU XLA's excess-precision pass ELIDES the naive astype round-trip
    (verified on v5e: naive lo == 0 on device)."""
    import jax.numpy as jnp

    from transferable3d_tpu.core import numerics

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-40, 40, (512, 3)).astype(np.float32))
    hi, lo = numerics.exact_hi_lo(x)
    # Parts are exactly bf16-representable.
    np.testing.assert_array_equal(
        np.asarray(hi), np.asarray(hi.astype(jnp.bfloat16).astype(
            jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(lo), np.asarray(lo.astype(jnp.bfloat16).astype(
            jnp.float32)))
    # lo is a genuine correction, and hi + lo ~= x to ~2^-16 relative.
    assert float(jnp.abs(lo).max()) > 1e-3
    err = np.abs(np.asarray(hi + lo) - np.asarray(x))
    assert err.max() < 40 * 2.0 ** -15
