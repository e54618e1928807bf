"""Tests for the TPU-native point ops (N1-N3) and the v2 model."""

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.ops import (ball_query, farthest_point_sample,
                                    gather_points, group_points,
                                    three_interpolate, three_nn)
from transferable3d_tpu.ops.grouping import knn_point, pairwise_sqdist

CFG = bins_lib.SUNRGBD


def test_pairwise_sqdist_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.normal(size=(2, 5, 3)).astype(np.float32)
    b = rng.normal(size=(2, 7, 3)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, atol=1e-5)


def test_fps_spread_and_determinism():
    rng = np.random.RandomState(1)
    # Two well-separated clusters: FPS with k=2 must pick one from each.
    c1 = rng.normal(0, 0.1, (1, 50, 3))
    c2 = rng.normal(0, 0.1, (1, 50, 3)) + 10.0
    xyz = jnp.asarray(np.concatenate([c1, c2], axis=1).astype(np.float32))
    idx = farthest_point_sample(xyz, 2)
    assert idx.shape == (1, 2)
    assert int(idx[0, 0]) == 0  # seed point
    assert int(idx[0, 1]) >= 50  # farthest point is in the other cluster
    idx2 = farthest_point_sample(xyz, 2)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_fps_covers_better_than_random():
    """Coverage radius of FPS must beat the first-k baseline."""
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.uniform(-5, 5, (1, 512, 3)).astype(np.float32))
    k = 32
    idx = farthest_point_sample(xyz, k)
    sampled = gather_points(xyz, idx)
    d_fps = np.asarray(pairwise_sqdist(xyz, sampled)).min(-1).max()
    d_first = np.asarray(pairwise_sqdist(xyz, xyz[:, :k])).min(-1).max()
    assert d_fps < d_first


def test_ball_query_semantics():
    # 1 centroid at origin; points at known distances.
    xyz = jnp.asarray(np.array(
        [[[0.05, 0, 0], [5, 0, 0], [0, 0.08, 0], [0.3, 0, 0],
          [0, 0, 6]]], np.float32))
    centroids = jnp.zeros((1, 1, 3))
    idx, count = ball_query(centroids, xyz, radius=0.5, nsample=4)
    assert int(count[0, 0]) == 3  # points 0, 2, 3
    got = sorted(set(np.asarray(idx[0, 0]).tolist()))
    assert got == [0, 2, 3]
    # Pad slots repeat an in-radius index.
    assert np.asarray(idx[0, 0])[3] in (0, 2, 3)


def test_ball_query_empty_falls_back_to_nearest():
    xyz = jnp.asarray(np.array([[[5, 0, 0], [7, 0, 0]]], np.float32))
    centroids = jnp.zeros((1, 1, 3))
    idx, count = ball_query(centroids, xyz, radius=0.1, nsample=2)
    assert int(count[0, 0]) == 0
    np.testing.assert_array_equal(np.asarray(idx[0, 0]), [0, 0])  # nearest


def test_knn_point():
    rng = np.random.RandomState(3)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    q = rng.normal(size=(2, 8, 3)).astype(np.float32)
    idx, d2 = knn_point(jnp.asarray(q), jnp.asarray(xyz), 0.0, 3)
    full = ((q[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    want_idx = np.argsort(full, axis=-1)[..., :3]
    np.testing.assert_allclose(np.sort(np.asarray(d2), -1),
                               np.sort(np.take_along_axis(
                                   full, want_idx, -1), -1), atol=1e-4)


def test_group_points_gather():
    rng = np.random.RandomState(4)
    pts = rng.normal(size=(2, 10, 5)).astype(np.float32)
    idx = rng.randint(0, 10, (2, 3, 4)).astype(np.int32)
    out = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        for s in range(3):
            for k in range(4):
                np.testing.assert_array_equal(out[b, s, k],
                                              pts[b, idx[b, s, k]])


def test_three_interpolate_exact_on_support():
    """Interpolating at the support points returns the support features."""
    rng = np.random.RandomState(5)
    support = rng.normal(size=(1, 20, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 20, 6)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(support), jnp.asarray(support))
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, dist))
    np.testing.assert_allclose(out, feats, atol=1e-4)


def test_three_interpolate_linear_field():
    """A linear function of position is reproduced in the convex hull."""
    rng = np.random.RandomState(6)
    support = rng.uniform(-1, 1, (1, 2000, 3)).astype(np.float32)
    w = np.array([[1.0], [2.0], [-0.5]], np.float32)
    feats = support @ w  # linear field
    queries = rng.uniform(-0.5, 0.5, (1, 32, 3)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(queries), jnp.asarray(support))
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, dist))
    want = queries @ w
    # IDW of 3 NN is approximate for a linear field; the error shrinks
    # with support density (~ NN spacing * |grad| = 0.1 * 2.3 here).
    assert np.abs(out - want).mean() < 0.12


def test_v2_forward_and_loss():
    from transferable3d_tpu.models import model_util
    from transferable3d_tpu.models.frustum_pointnet_v2 import (
        FrustumPointNetV2)

    rng = np.random.RandomState(7)
    b, n, c = 2, 256, 4
    points = rng.normal(size=(b, n, c)).astype(np.float32)
    points[..., 2] += 10  # frustums look down +Z
    one_hot = np.eye(CFG.num_classes, dtype=np.float32)[
        rng.randint(0, CFG.num_classes, b)]
    model = FrustumPointNetV2(cfg=CFG, num_object_point=64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, one_hot, train=False)
    ep = model.apply(variables, points, one_hot, train=False)
    assert ep["seg_logits"].shape == (b, n, 2)
    assert ep["center"].shape == (b, 3)

    labels = model_util.Labels(
        seg=rng.randint(0, 2, (b, n)).astype(np.int64),
        center=rng.normal(size=(b, 3)).astype(np.float32),
        heading_class=rng.randint(0, 12, b).astype(np.int64),
        heading_residual=rng.uniform(-0.1, 0.1, b).astype(np.float32),
        size_class=rng.randint(0, 10, b).astype(np.int64),
        size_residual=rng.uniform(-0.1, 0.1, (b, 3)).astype(np.float32))
    losses = model_util.get_loss(ep, labels, CFG)
    assert np.isfinite(float(losses["total_loss"]))

    # Gradients flow through the SA/FP stacks.
    def loss_fn(params):
        ep, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, one_hot, train=True, bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return model_util.get_loss(ep, labels, CFG)["total_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_v2_in_registry():
    from transferable3d_tpu.models import registry
    assert "frustum_pointnets_v2" in registry.available()
    m = registry.get_model("frustum_pointnets_v2", CFG)
    assert m.cfg is CFG


def test_fps_pallas_matches_scan():
    """Pallas FPS kernel (interpret mode) == the XLA scan reference."""
    from transferable3d_tpu.ops import sampling

    rng = np.random.RandomState(11)
    xyz = jnp.asarray(rng.uniform(-5, 5, (4, 256, 3)).astype(np.float32))
    ref = sampling._fps_ref(xyz, 32)
    ker = sampling._fps_pallas(xyz, 32, True)
    np.testing.assert_array_equal(np.asarray(ker), np.asarray(ref))


def test_fps_pallas_multi_tile():
    from transferable3d_tpu.ops import sampling

    rng = np.random.RandomState(12)
    # Force tiling: large B*N so the VMEM budget splits the batch.
    xyz = jnp.asarray(rng.uniform(-5, 5, (16, 512, 3)).astype(np.float32))
    ref = sampling._fps_ref(xyz, 16)
    ker = sampling._fps_pallas(xyz, 16, True)
    np.testing.assert_array_equal(np.asarray(ker), np.asarray(ref))


def test_ball_query_group_matches_gather_path():
    """One-hot-matmul grouping == ball_query + group_points exactly."""
    from transferable3d_tpu.ops.grouping import ball_query_group

    rng = np.random.RandomState(13)
    cent = jnp.asarray(rng.uniform(-2, 2, (2, 8, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))
    r, k = 1.0, 16

    grouped, count = ball_query_group(cent, xyz, feats, r, k)
    idx, count_ref = ball_query(cent, xyz, r, k)
    ref = group_points(jnp.concatenate([xyz, feats], -1), idx)
    np.testing.assert_array_equal(np.asarray(count), np.asarray(count_ref))
    # Slots below the in-radius count must match exactly; pad slots
    # differ by convention (cyclic repetition vs repeat-first) — both are
    # members of the ball, which is all the max-pool consumer needs.
    g = np.asarray(grouped)
    rf = np.asarray(ref)
    cnt = np.asarray(count)
    for b in range(g.shape[0]):
        for si in range(g.shape[1]):
            m = min(int(cnt[b, si]), k)
            if m == 0:
                m = 1  # nearest-point fallback fills slot 0
            # hi/lo bf16 reconstruction is ~1e-4 accurate (lo is
            # itself bf16-rounded).
            np.testing.assert_allclose(g[b, si, :m], rf[b, si, :m],
                                       atol=3e-4)
            for row in g[b, si, m:]:
                dmin = np.abs(rf[b, si, :m] - row).max(axis=1).min()
                assert dmin < 1e-3  # pad slots repeat some member


def test_ball_query_extract_pallas_matches_scan():
    """Pallas fused extract kernel (interpret) == XLA one-hot scan,
    bit-exact, including K > N cyclic wrap and multi-k-tile grids."""
    from transferable3d_tpu.ops.grouping import (ball_query_extract,
                                                 ball_query_group)

    rng = np.random.RandomState(21)
    for b, s, n, c, k, r in [(3, 16, 64, 8, 12, 0.7),
                             (2, 8, 32, 16, 40, 1.2),   # K > N wrap
                             (2, 4, 16, 8, 4, 0.3)]:    # mostly empty
        # Coordinates on a 1/64 grid so both d2 formulations agree at
        # the radius boundary bit-for-bit.
        cent = jnp.asarray(
            np.round(rng.uniform(-2, 2, (b, s, 3)) * 64) / 64
        ).astype(jnp.float32)
        xyz = jnp.asarray(
            np.round(rng.uniform(-2, 2, (b, n, 3)) * 64) / 64
        ).astype(jnp.float32)
        pay = jnp.asarray(rng.uniform(-1, 1, (b, n, c)).astype(
            np.float32)).astype(jnp.bfloat16)
        ref, cnt_ref = ball_query_group(cent, xyz, pay, r, k,
                                        include_xyz=False)
        got, cnt = ball_query_extract(cent, xyz, pay, r, k, True)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(ref.astype(jnp.float32)))


def test_ball_query_extract_gradients():
    """Custom-VJP payload gradient == the XLA scan's autodiff gradient
    (up to bf16 accumulation order; the kernel accumulates in f32)."""
    from transferable3d_tpu.ops.grouping import (ball_query_extract,
                                                 ball_query_group)

    rng = np.random.RandomState(22)
    b, s, n, c, k, r = 2, 8, 32, 8, 8, 0.9
    cent = jnp.asarray(rng.uniform(-2, 2, (b, s, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (b, n, 3)).astype(np.float32))
    pay = jnp.asarray(rng.uniform(-1, 1, (b, n, c)).astype(
        np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.uniform(-1, 1, (b, s, k, c)).astype(np.float32))

    def loss_ref(p):
        g, _ = ball_query_group(cent, xyz, p, r, k, include_xyz=False)
        return jnp.sum(g.astype(jnp.float32) * w)

    def loss_new(p):
        g, _ = ball_query_extract(cent, xyz, p, r, k, True)
        return jnp.sum(g.astype(jnp.float32) * w)

    gr = np.asarray(jax.grad(loss_ref)(pay).astype(jnp.float32))
    gn = np.asarray(jax.grad(loss_new)(pay).astype(jnp.float32))
    assert gn.dtype == np.float32 and gr.shape == gn.shape
    scale = max(1e-6, np.abs(gr).max())
    assert np.abs(gr - gn).max() / scale < 0.03
    # Gradients w.r.t. the discrete selection inputs are zero.
    dc = jax.grad(lambda cc: jnp.sum(ball_query_extract(
        cc, xyz, pay, r, k, True)[0].astype(jnp.float32)))(cent)
    assert float(jnp.max(jnp.abs(dc))) == 0.0
