"""Fused BN->act->matmul->stats chain kernel: value + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transferable3d_tpu.ops import fused_chain


def _data(m=256, k=64, n=128, seed=0):
    rng = np.random.RandomState(seed)
    a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1.5, k).astype(np.float32))
    t = jnp.asarray(rng.normal(size=k).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=n).astype(np.float32) * 0.1)
    return a, s, t, w, b


@pytest.mark.parametrize("apply_act", [True, False])
def test_forward_matches_reference(apply_act):
    args = _data()
    y, stats = fused_chain.bn_act_linear(*args, apply_act, True)
    y_ref, stats_ref = fused_chain.bn_act_linear_ref(*args, apply_act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=1e-5, atol=1e-3)


def test_forward_multi_tile():
    args = _data(m=2048, k=32, n=128, seed=1)
    y, stats = fused_chain.bn_act_linear(*args, True, True)
    _, stats_ref = fused_chain.bn_act_linear_ref(*args, True)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("apply_act", [True, False])
def test_gradients_match_reference(apply_act):
    args = _data(m=192, k=32, n=64, seed=2)

    def loss(fn, *a):
        y, stats = fn(*a)
        mean = stats[0] / a[0].shape[0]
        var = stats[1] / a[0].shape[0] - mean ** 2
        yn = (y.astype(jnp.float32) - mean) / jnp.sqrt(var + 1e-3)
        return jnp.sum(jnp.tanh(yn)) + 0.1 * jnp.sum(jnp.sin(stats))

    g_kernel = jax.grad(
        lambda a, s, t, w, b: loss(
            lambda *x: fused_chain.bn_act_linear(*x, apply_act, True),
            a, s, t, w, b),
        argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(
        lambda a, s, t, w, b: loss(
            lambda *x: fused_chain.bn_act_linear_ref(*x, apply_act),
            a, s, t, w, b),
        argnums=(0, 1, 2, 3, 4))(*args)
    names = ["da", "ds", "dt", "dw", "db"]
    for nm, gk, gr in zip(names, g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_bf16_path():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32),
                    jnp.bfloat16)
    s = jnp.ones(64)
    t = jnp.zeros(64)
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32) * 0.1)
    b = jnp.zeros(128)
    y, stats = fused_chain.bn_act_linear(a, s, t, w, b, True, True)
    assert y.dtype == jnp.bfloat16
    y_ref, stats_ref = fused_chain.bn_act_linear_ref(a, s, t, w, b, True)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32), atol=0.15)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               rtol=2e-2, atol=1.0)
