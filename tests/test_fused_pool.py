"""Fused normalize->relu->max-pool kernel: value + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.ops import fused_chain


def _data(b=8, n=96, c=64, seed=0):
    rng = np.random.RandomState(seed)
    y = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    t = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.3)
    return y, s, t


def test_pool_forward_matches_reference():
    y, s, t = _data()
    out = fused_chain.bn_act_maxpool(y, s, t, True)
    ref = fused_chain.bn_act_maxpool_ref(y, s, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_pool_forward_multi_tile():
    y, s, t = _data(b=16, n=512, c=128, seed=1)
    out = fused_chain.bn_act_maxpool(y, s, t, True)
    ref = fused_chain.bn_act_maxpool_ref(y, s, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_pool_gradients_match_reference():
    y, s, t = _data(b=4, n=64, c=32, seed=2)

    def loss(fn, y, s, t):
        return jnp.sum(jnp.tanh(fn(y, s, t)))

    gk = jax.grad(lambda y, s, t: loss(
        lambda *a: fused_chain.bn_act_maxpool(*a, True), y, s, t),
        argnums=(0, 1, 2))(y, s, t)
    gr = jax.grad(lambda y, s, t: loss(
        fused_chain.bn_act_maxpool_ref, y, s, t),
        argnums=(0, 1, 2))(y, s, t)
    for name, a, b in zip(["dy", "ds", "dt"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_pool_all_negative_channel_zero_grad():
    """A channel whose activations are all clipped (pool = 0) must give
    zero gradient to y for that channel."""
    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
    s = jnp.ones(8)
    t = jnp.full(8, -100.0)  # everything clips to 0
    out = fused_chain.bn_act_maxpool(y, s, t, True)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    g = jax.grad(lambda y: jnp.sum(
        fused_chain.bn_act_maxpool(y, s, t, True)))(y)
    np.testing.assert_allclose(np.asarray(g), 0.0)
