"""Parity tests for the fused set-abstraction chain (ops/fused_sa).

All tests run the Pallas passes in interpret mode on the CPU mesh and
compare against an explicit unfused formulation of the same math
(extraction + L x (BatchNorm + ReLU + Dense) + max-pool), mirroring
models/layers.ScheduledBatchNorm and flax Dense in bf16.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transferable3d_tpu.ops import fused_sa
from transferable3d_tpu.ops.grouping import ball_query_group

B, S, N, F0, K, R = 2, 8, 64, 16, 16, 0.9
FEATS = (F0, 24, 40)
L = len(FEATS)
EPS = 1e-3
# z-storage layouts of fused_grouped_chain (the cached-z pass schedule
# is the only one since round 4 retired the recompute schedule).
LAYOUTS = ["rows", "planar"]


def _setup(seed, integer_data=False):
    rng = np.random.RandomState(seed)
    cent = jnp.asarray(rng.uniform(-1.5, 1.5, (B, S, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (B, N, 3)).astype(np.float32))
    if integer_data:
        # Integer-valued inputs make the batch statistics exact in f32
        # (sums of small ints, M a power of two), removing the
        # reduction-order noise that otherwise flips max-pool ties.
        pf = jnp.asarray(rng.randint(-4, 5, (B, N, F0)).astype(np.float32))
        qc = jnp.asarray(rng.randint(-2, 3, (B, S, F0)).astype(np.float32))
    else:
        pf = jnp.asarray(rng.uniform(-1, 1, (B, N, F0)).astype(np.float32))
        qc = jnp.asarray(rng.uniform(-1, 1, (B, S, F0)).astype(np.float32))
    pf = pf.astype(jnp.bfloat16)
    qc = qc.astype(jnp.bfloat16)
    gammas = tuple(jnp.asarray(
        rng.uniform(0.5, 1.5, (f,)).astype(np.float32)) for f in FEATS)
    betas = tuple(jnp.asarray(
        rng.uniform(-0.3, 0.3, (f,)).astype(np.float32)) for f in FEATS)
    ws = tuple(jnp.asarray((rng.normal(size=(FEATS[i], FEATS[i + 1]))
                            * 0.3).astype(np.float32))
               for i in range(L - 1))
    bs = tuple(jnp.asarray(
        rng.uniform(-0.1, 0.1, (FEATS[i + 1],)).astype(np.float32))
        for i in range(L - 1))
    return cent, xyz, (pf, qc, gammas, betas, ws, bs)


def _ref(cent, xyz, args, running=None, folded=False):
    """Unfused reference; `running` fixes the statistics (eval mode);
    `folded` applies the kernel's z*a+c affine form (bit-matches the
    fused forward when the statistics agree exactly)."""
    pf, qc, gammas, betas, ws, bs = args
    grouped, _ = ball_query_group(cent, xyz, pf, R, K, include_xyz=False)
    x = grouped - qc[:, :, None, :]
    means, variances = [], []
    for i in range(L):
        xf = x.astype(jnp.float32)
        if running is None:
            mu = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mu * mu
        else:
            mu, var = running[i]
        means.append(mu)
        variances.append(var)
        r = jax.lax.rsqrt(var + EPS)
        if folded or running is not None:
            a = gammas[i] * r
            y = (xf * a + (betas[i] - mu * a)).astype(jnp.bfloat16)
        else:
            y = ((xf - mu) * (r * gammas[i]) + betas[i]).astype(
                jnp.bfloat16)
        h = jnp.maximum(y, jnp.bfloat16(0))
        if i < L - 1:
            x = (jnp.dot(h, ws[i].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
                 + bs[i]).astype(jnp.bfloat16)
        else:
            x = h
    return jnp.max(x, axis=2), means, variances


@pytest.mark.parametrize("layout", LAYOUTS)
def test_forward_train_matches_unfused(layout):
    cent, xyz, args = _setup(0)
    p_ref, m_ref, v_ref = _ref(cent, xyz, args)
    p, m, v = fused_sa.fused_grouped_chain(cent, xyz, *args, R, K, EPS,
                                           True, None, True, layout)
    pr = np.asarray(p_ref.astype(jnp.float32))
    pg = np.asarray(p.astype(jnp.float32))
    scale = np.abs(pr).max()
    assert np.abs(pr - pg).max() / scale < 0.02  # bf16 + stat rounding
    for i in range(L):
        np.testing.assert_allclose(np.asarray(m[i]), np.asarray(m_ref[i]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(v[i]), np.asarray(v_ref[i]),
                                   atol=5e-3)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_eval_mode_bit_exact_and_grads(layout):
    cent, xyz, args = _setup(1)
    _, m, v = fused_sa.fused_grouped_chain(cent, xyz, *args, R, K, EPS,
                                           True, None, True, layout)
    running = tuple((m[i], v[i]) for i in range(L))
    p_ref, _, _ = _ref(cent, xyz, args, running=running)
    p, _, _ = fused_sa.fused_grouped_chain(cent, xyz, *args, R, K, EPS,
                                           False, running, True, layout)
    np.testing.assert_array_equal(
        np.asarray(p_ref.astype(jnp.float32)),
        np.asarray(p.astype(jnp.float32)))

    w_r = jnp.asarray(np.random.RandomState(9).uniform(
        -1, 1, p.shape).astype(np.float32))
    gr = jax.grad(lambda a: jnp.sum(
        _ref(cent, xyz, a, running=running)[0].astype(jnp.float32)
        * w_r))(args)
    gn = jax.grad(lambda a: jnp.sum(fused_sa.fused_grouped_chain(
        cent, xyz, *a, R, K, EPS, False, running, True, layout)[0].astype(
            jnp.float32) * w_r))(args)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gn)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.linalg.norm(a - b) / max(1e-6, np.linalg.norm(a)) < 0.02


@pytest.mark.parametrize("layout", LAYOUTS)
def test_train_grads_match_with_exact_stats(layout):
    """Integer data -> exact batch statistics -> the train-mode BN
    backward (statistic correction terms) is testable tightly."""
    cent, xyz, args = _setup(3, integer_data=True)
    gr = jax.grad(lambda a: jnp.sum(
        _ref(cent, xyz, a, folded=True)[0].astype(jnp.float32)))(args)
    gn = jax.grad(lambda a: jnp.sum(fused_sa.fused_grouped_chain(
        cent, xyz, *a, R, K, EPS, True, None, True, layout)[0].astype(
            jnp.float32)))(args)
    _assert_grads_close(gr, gn)


def _assert_grads_close(gr, gn, rel_tol=0.02):
    """Train-mode gradient comparison. Dense biases under train-mode BN
    have ANALYTICALLY ZERO gradients (Sum dz = a*(Sum dy - M*mdy -
    mdyx*Sum xhat) = 0 by the batch-stat identities); both sides
    compute pure rounding noise there, so their ratio is meaningless —
    assert absolute noise-level smallness against the real-gradient
    scale instead."""
    names = ["pf", "qc", "gammas", "betas", "ws", "bs"]
    scale = max(float(np.linalg.norm(np.asarray(x, np.float32)))
                for x in jax.tree_util.tree_leaves(gr[4]))  # ws grads
    for nm, a, b in zip(names, gr, gn):
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            x = np.asarray(x, np.float32)
            y = np.asarray(y, np.float32)
            if nm == "bs":
                assert np.linalg.norm(y) < 0.01 * scale, (
                    nm, np.linalg.norm(y), scale)
                continue
            rel = np.linalg.norm(x - y) / max(1e-6, np.linalg.norm(x))
            assert rel < rel_tol, (nm, rel)


@pytest.mark.parametrize("layout", ["rows", "planar"])
def test_depth2_cached_grads(layout):
    """Depth-2 chains hit the cached schedule's fused j=0 step in its
    at_top form (rows: the pool grad is recomputed in the same pass
    that scatters d_payload); keep that edge covered."""
    global FEATS, L
    feats_save, l_save = FEATS, L
    FEATS, L = (F0, 24), 2
    try:
        cent, xyz, args = _setup(7, integer_data=True)
        gr = jax.grad(lambda a: jnp.sum(
            _ref(cent, xyz, a, folded=True)[0].astype(jnp.float32)))(args)
        gn = jax.grad(lambda a: jnp.sum(fused_sa.fused_grouped_chain(
            cent, xyz, *a, R, K, EPS, True, None, True,
            layout)[0].astype(jnp.float32)))(args)
        _assert_grads_close(gr, gn)
    finally:
        FEATS, L = feats_save, l_save


@pytest.mark.parametrize("layout", LAYOUTS)
def test_geometry_grads_are_zero(layout):
    cent, xyz, args = _setup(4)

    def loss(c, x):
        p, _, _ = fused_sa.fused_grouped_chain(c, x, *args, R, K, EPS,
                                               True, None, True, layout)
        return jnp.sum(p.astype(jnp.float32))

    dc, dx = jax.grad(loss, argnums=(0, 1))(cent, xyz)
    assert float(jnp.max(jnp.abs(dc))) == 0.0
    assert float(jnp.max(jnp.abs(dx))) == 0.0


def test_fused_module_eval_matches_unfused(monkeypatch):
    """Module-level EVAL parity: GroupedPointMLP's fused branch in eval
    mode routes the primal through the single-pass inference kernel
    (no grad, running stats); must bit-match the unfused module."""
    from transferable3d_tpu.models import pointnet2

    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.uniform(-1, 1, (B, N, 5)).astype(
        np.float32)).astype(jnp.bfloat16)
    new_xyz = xyz[:, :S, :]
    mod = pointnet2.GroupedPointMLP((16, 24, 32), R, K,
                                    dtype=jnp.bfloat16)
    v0 = mod.init(jax.random.PRNGKey(0), new_xyz, xyz, feats, train=True,
                  bn_momentum=0.9)
    # one train step to make running stats non-trivial
    _, muts = mod.apply(v0, new_xyz, xyz, feats, train=True,
                        bn_momentum=0.5, mutable=["batch_stats"])
    v0 = {**v0, **muts}

    out_u = mod.apply(v0, new_xyz, xyz, feats, train=False,
                      bn_momentum=0.9)
    monkeypatch.setattr(fused_sa, "INTERPRET", True)
    monkeypatch.setattr(pointnet2, "on_tpu", lambda: True)
    out_f = mod.apply(v0, new_xyz, xyz, feats, train=False,
                      bn_momentum=0.9)
    np.testing.assert_array_equal(
        np.asarray(out_u.astype(jnp.float32)),
        np.asarray(out_f.astype(jnp.float32)))


def test_fused_module_path_matches_unfused(monkeypatch):
    """GroupedPointMLP's fused branch: identical variable tree, matching
    forward and batch-stat updates."""
    from transferable3d_tpu.models import pointnet2

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.uniform(-1, 1, (B, N, 5)).astype(
        np.float32)).astype(jnp.bfloat16)
    new_xyz = xyz[:, :S, :]
    mod = pointnet2.GroupedPointMLP((16, 24, 32), R, K,
                                    dtype=jnp.bfloat16)

    v0 = mod.init(jax.random.PRNGKey(0), new_xyz, xyz, feats, train=True,
                  bn_momentum=0.9)
    monkeypatch.setattr(fused_sa, "INTERPRET", True)
    monkeypatch.setattr(pointnet2, "on_tpu", lambda: True)
    v1 = mod.init(jax.random.PRNGKey(0), new_xyz, xyz, feats, train=True,
                  bn_momentum=0.9)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_f, muts_f = mod.apply(v0, new_xyz, xyz, feats, train=True,
                              bn_momentum=0.9, mutable=["batch_stats"])
    monkeypatch.setattr(pointnet2, "on_tpu", lambda: False)
    out_u, muts_u = mod.apply(v0, new_xyz, xyz, feats, train=True,
                              bn_momentum=0.9, mutable=["batch_stats"])
    scale = float(jnp.max(jnp.abs(out_u.astype(jnp.float32))))
    diff = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                 - out_u.astype(jnp.float32))))
    assert diff / scale < 0.02
    for a, b in zip(jax.tree_util.tree_leaves(muts_f),
                    jax.tree_util.tree_leaves(muts_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3)
