"""Pallas fused matmul+BN-stats kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.ops import fused_linear


def _data(m=256, k=64, n=128, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), dtype)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32) * 0.1)
    return x, w, b


def test_kernel_matches_reference_interpret():
    x, w, b = _data()
    y, stats = fused_linear.linear_with_stats(x, w, b, True)
    y_ref, stats_ref = fused_linear.linear_with_stats_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=1e-5, atol=1e-3)


def test_kernel_multi_tile_accumulation():
    # m > tile size forces multi-step grid accumulation of the stats.
    x, w, b = _data(m=2048, k=32, n=128, seed=1)
    y, stats = fused_linear.linear_with_stats(x, w, b, True)
    _, stats_ref = fused_linear.linear_with_stats_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=1e-4, atol=1e-2)


def test_custom_vjp_matches_reference_grad():
    x, w, b = _data(m=128, k=32, n=64, seed=2)

    def loss_kernel(x, w, b):
        y, stats = fused_linear.linear_with_stats(x, w, b, True)
        mean = stats[0] / x.shape[0]
        var = stats[1] / x.shape[0] - mean ** 2
        yn = (y - mean) / jnp.sqrt(var + 1e-3)
        return jnp.sum(jnp.tanh(yn))

    def loss_ref(x, w, b):
        y, stats = fused_linear.linear_with_stats_ref(x, w, b)
        mean = stats[0] / x.shape[0]
        var = stats[1] / x.shape[0] - mean ** 2
        yn = (y - mean) / jnp.sqrt(var + 1e-3)
        return jnp.sum(jnp.tanh(yn))

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)


def test_fused_chain_matches_unfused_model():
    """FusedPointMLP chain == Dense+ScheduledBatchNorm stack (same math,
    transplanted parameters)."""
    from transferable3d_tpu.models.layers import PointMLP

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(4, 64, 16)).astype(np.float32))

    fused = PointMLP([32, 32], fused=True)
    plain = PointMLP([32, 32], fused=False)
    vf = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False,
                    bn_momentum=0.9)
    # Transplant fused-chain params into the plain layout.
    pf = vf["params"]["fused"]
    pp = {}
    bs = {}
    for i in range(2):
        pp[f"dense_{i}"] = {"kernel": pf[f"kernel_{i}"],
                            "bias": pf[f"bias_{i}"]}
        pp[f"bn_{i}"] = {"scale": pf[f"scale_{i}"],
                         "bias": pf[f"beta_{i}"]}
        bs[f"bn_{i}"] = {
            "mean": vf["batch_stats"]["fused"][f"mean_{i}"],
            "var": vf["batch_stats"]["fused"][f"var_{i}"]}

    # Train mode: batch-stat normalization must agree.
    out_f, upd_f = fused.apply(vf, x, train=True, bn_momentum=0.9,
                               mutable=["batch_stats"])
    out_p, upd_p = plain.apply({"params": pp, "batch_stats": bs}, x,
                               train=True, bn_momentum=0.9,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-5)
    # Running stats updated identically.
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(upd_f["batch_stats"]["fused"][f"mean_{i}"]),
            np.asarray(upd_p["batch_stats"][f"bn_{i}"]["mean"]),
            atol=1e-5)

    # Eval mode parity too.
    out_f = fused.apply(vf, x, train=False, bn_momentum=0.9)
    out_p = plain.apply({"params": pp, "batch_stats": bs}, x,
                        train=False, bn_momentum=0.9)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-5)

    # Gradient parity through the chain (ref path on CPU).
    def loss(mod, variables, params_override=None):
        v = dict(variables)
        if params_override is not None:
            v = {"params": params_override,
                 "batch_stats": variables["batch_stats"]}
        out, _ = mod.apply(v, x, train=True, bn_momentum=0.9,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    gf = jax.grad(lambda p: loss(fused, {"params": p,
                                         "batch_stats": vf["batch_stats"]})
                  )(vf["params"])
    gp = jax.grad(lambda p: loss(plain, {"params": p,
                                         "batch_stats": bs}))(pp)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(gf["fused"][f"kernel_{i}"]),
            np.asarray(gp[f"dense_{i}"]["kernel"]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(gf["fused"][f"scale_{i}"]),
            np.asarray(gp[f"bn_{i}"]["scale"]), rtol=1e-4, atol=1e-4)


def test_v1_model_fused_flag_toggles():
    """Both fused and unfused v1 models train a step without error."""
    from transferable3d_tpu.core import bins as bins_lib
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)

    rng = np.random.RandomState(4)
    pts = rng.normal(size=(2, 64, 4)).astype(np.float32)
    oh = np.eye(10, dtype=np.float32)[rng.randint(0, 10, 2)]
    for fused in [True, False]:
        model = FrustumPointNetV1(cfg=bins_lib.SUNRGBD,
                                  num_object_point=32, fused=fused)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, pts, oh,
                       train=False)
        ep, _ = model.apply(v, pts, oh, train=True, bn_momentum=0.9,
                            rngs={"dropout": jax.random.PRNGKey(2)},
                            mutable=["batch_stats"])
        assert np.isfinite(np.asarray(ep["center"])).all()
