"""On-device frustum preprocessing tests: parity with the host provider."""

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.data import frustum_jit

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]],
             np.float32)


def test_depth_lift_geometry():
    depth = np.zeros((480, 640), np.float32)
    depth[240, 320] = 4.0  # principal point
    depth[240, 420] = 2.0  # 100px right of center
    pts, valid = frustum_jit.depth_to_camera_points(
        jnp.asarray(depth), jnp.asarray(K))
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.sum() == 2
    i0 = 240 * 640 + 320
    np.testing.assert_allclose(pts[i0], [0, 0, 4.0], atol=1e-5)
    i1 = 240 * 640 + 420
    np.testing.assert_allclose(pts[i1], [100 / 500 * 2, 0, 2.0], atol=1e-5)


def test_frustum_sampling_and_rotation():
    rng = np.random.RandomState(0)
    depth = np.zeros((480, 640), np.float32)
    # A blob of valid depth inside the box, nothing outside.
    depth[200:280, 300:400] = rng.uniform(3.0, 4.0, (80, 100))
    boxes = np.array([[300, 200, 400, 280],    # covers the blob
                      [0, 0, 50, 50]],         # empty region
                     np.float32)
    out = frustum_jit.lift_depth_frustums(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(boxes), 256,
        jax.random.PRNGKey(0))
    assert out.points.shape == (2, 256, 3)
    assert int(out.count[0]) == 80 * 100
    assert int(out.count[1]) == 0
    # Sampled points' depth in range.
    z_range = np.asarray(out.points[0, :, 2])
    # After rotation about Y, depth changes slightly; norms preserved.
    pts0 = np.asarray(out.points[0])
    norms = np.linalg.norm(pts0, axis=1)
    assert (norms > 2.5).all() and (norms < 5.0).all()
    # Rotation centers the frustum: mean lateral offset ~ 0.
    assert abs(pts0[:, 0].mean()) < 0.2
    assert np.isfinite(np.asarray(out.points)).all()


def test_frustum_angle_matches_host_convention():
    """Angle must equal the host extractor's -arctan2(x, z) of the center
    ray (data/kitti.py frustum_angle_for_box)."""
    from transferable3d_tpu.data.kitti import Calibration, frustum_angle_for_box

    depth = np.full((480, 640), 5.0, np.float32)
    box = np.array([[400, 200, 500, 300]], np.float32)
    out = frustum_jit.lift_depth_frustums(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(box), 64,
        jax.random.PRNGKey(0))
    p2 = np.zeros((3, 4))
    p2[:3, :3] = K
    calib = Calibration(p2, np.eye(3), np.hstack([np.eye(3),
                                                  np.zeros((3, 1))]))
    want = frustum_angle_for_box(box[0], calib)
    assert abs(float(out.frustum_angle[0]) - want) < 1e-4


def test_sampling_without_replacement_when_enough():
    depth = np.zeros((100, 100), np.float32)
    depth[10:90, 10:90] = 5.0
    box = np.array([[0, 0, 100, 100]], np.float32)
    out = frustum_jit.lift_depth_frustums(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(box), 512,
        jax.random.PRNGKey(1))
    pts = np.asarray(out.points[0])
    # 6400 valid pixels >> 512 samples: all sampled points unique.
    uniq = np.unique(pts.round(5), axis=0)
    assert uniq.shape[0] == 512


def test_wrap_when_too_few():
    depth = np.zeros((100, 100), np.float32)
    depth[50, 50:60] = 5.0  # 10 valid pixels
    box = np.array([[0, 0, 100, 100]], np.float32)
    out = frustum_jit.lift_depth_frustums(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(box), 64,
        jax.random.PRNGKey(2))
    assert int(out.count[0]) == 10
    pts = np.asarray(out.points[0])
    uniq = np.unique(pts.round(5), axis=0)
    assert uniq.shape[0] == 10  # cyclic repetition of the 10 pixels


def test_point_cloud_variant_matches_host_crop():
    """crop_point_frustums must select exactly the host-extractor's
    in-box points (modulo sampling)."""
    rng = np.random.RandomState(3)
    pts = rng.uniform(-5, 5, (2000, 4)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0
    u = K[0, 0] * pts[:, 0] / pts[:, 2] + K[0, 2]
    v = K[1, 1] * pts[:, 1] / pts[:, 2] + K[1, 2]
    box = np.array([250.0, 180.0, 400.0, 300.0], np.float32)
    inside = ((u >= box[0]) & (u < box[2]) & (v >= box[1]) & (v < box[3]))

    out = frustum_jit.crop_point_frustums(
        jnp.asarray(pts), jnp.asarray(K), jnp.asarray(box[None]), 128,
        jax.random.PRNGKey(0))
    assert int(out.count[0]) == int(inside.sum())
    # Every sampled point must be one of the inside points (rotate back
    # to compare).
    from transferable3d_tpu.core.geometry import rotate_points_y_np
    sampled = np.asarray(out.points[0])
    unrot = rotate_points_y_np(sampled[None, :, :3],
                               -float(out.frustum_angle[0]))[0]
    inside_set = {tuple(np.round(p, 3)) for p in pts[inside][:, :3]}
    hits = sum(tuple(np.round(p, 3)) in inside_set for p in unrot)
    assert hits >= 120  # allow a few rounding misses
    # Extra channel carried through.
    assert sampled.shape == (128, 4)


def test_systematic_sampler_marginals_and_phase():
    """The round-3 systematic rank-select sampler: different RNG keys
    give different subsets (random phase), and over many draws every
    in-box pixel is included with similar frequency (uniform marginal
    inclusion, the property the approx_max_k sampler provided)."""
    depth = np.zeros((100, 100), np.float32)
    depth[20:84, 20:84] = 5.0  # 4096 valid pixels
    box = np.array([[0, 0, 100, 100]], np.float32)
    seen = {}
    subsets = []
    for seed in range(20):
        out = frustum_jit.lift_depth_frustums(
            jnp.asarray(depth), jnp.asarray(K), jnp.asarray(box), 256,
            jax.random.PRNGKey(seed))
        pts = np.asarray(out.points[0]).round(5)
        keys = {tuple(p) for p in pts}
        subsets.append(frozenset(keys))
        for k in keys:
            seen[k] = seen.get(k, 0) + 1
    # Phase randomness: the 20 subsets are not all identical.
    assert len(set(subsets)) > 1
    # Coverage: 20 draws x 256 of 4096 pixels = 1.25x expected
    # inclusion; systematic sampling has LOW variance, so no pixel
    # should be picked many times while others never appear.
    counts = np.asarray(list(seen.values()))
    assert len(seen) >= 2048          # most pixels touched at least once
    assert counts.max() <= 4          # no pixel hogs the sample


def test_output_slots_not_scan_ordered():
    """Regression (round-3 advisor, medium): slots emitted in pixel
    scan order bias order-truncating consumers — point_cloud_masking
    keeps the first num_object_point masked points in input order, so
    a seg mask larger than that budget would reduce to the object's
    top-of-image slice. Any PREFIX of the output must cover the whole
    frustum, like the host provider's np.random.choice order."""
    depth = np.zeros((480, 640), np.float32)
    depth[100:400, 200:500] = 5.0  # 90k valid pixels, rows 100..399
    box = np.array([[200, 100, 500, 400]], np.float32)
    out = frustum_jit.lift_depth_frustums(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(box), 1024,
        jax.random.PRNGKey(7))
    pts = np.asarray(out.points[0])
    # Rotation about +Y preserves y; constant depth makes y monotone in
    # the pixel row v. Scan order would put all of the first quarter's
    # points in the image's top rows (y below the blob median).
    y = pts[:, 1]
    y_med = np.median(y)
    for lo in range(0, 1024, 256):
        frac_top = (y[lo:lo + 256] < y_med).mean()
        assert 0.25 < frac_top < 0.75, (lo, frac_top)
    # Different frustums get different slot orders (cyclic offset):
    # re-run with two boxes and check their y sequences differ.
    boxes2 = np.array([[200, 100, 500, 400], [200, 100, 500, 400]],
                      np.float32)
    out2 = frustum_jit.lift_depth_frustums(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(boxes2), 1024,
        jax.random.PRNGKey(7))
    p2 = np.asarray(out2.points)
    assert not np.allclose(p2[0, :, 1], p2[1, :, 1])


def test_pallas_fetch_select_matches_xla():
    """The Pallas two-level fetch (TPU hot path) must agree with the
    XLA form exactly — same ranks, same hi/lo coordinate split."""
    rng = np.random.RandomState(3)
    n, c, b, npoints = 1024, 3, 5, 256
    pts = jnp.asarray(rng.uniform(-4, 9, (n, c)).astype(np.float32))
    inside = jnp.asarray(rng.rand(b, n) < 0.2)
    us = jnp.asarray(rng.rand(b).astype(np.float32))
    lrank, ts, te, want, count = jax.vmap(
        lambda i, u: frustum_jit._select_prelude(i, npoints, u))(inside,
                                                                 us)
    ref = jax.vmap(
        lambda l, s, e, w: frustum_jit._fetch_select_xla(
            pts, l, s, e, w, npoints))(lrank, ts, te, want)
    out = frustum_jit._fetch_select_pallas(pts, lrank, ts, te, want,
                                           npoints, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0, rtol=0)
