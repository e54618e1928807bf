"""Direct unit tests for two load-bearing primitives that were only
covered transitively through round 4 (verdict item 9):

- ops/grouping._lane_prefix_sum — the masked Hillis-Steele lane cumsum
  that replaced the [N, N] triangular-dot rank computation inside every
  extract-style Pallas kernel.
- train/train_loop._flatten_lane_safe — the optax.flatten twin that
  pads the flat parameter vector to break XLA's reshape
  canonicalization (a measured 0.83 ms/step e2e relayout).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.experimental import pallas as pl

from transferable3d_tpu.ops.grouping import _lane_prefix_sum
from transferable3d_tpu.train.train_loop import _flatten_lane_safe


# ---------------------------------------------------------------------------
# _lane_prefix_sum
# ---------------------------------------------------------------------------


def _prefix_sum_host(x):
    """Run the kernel-side helper through an interpret-mode pallas_call
    (pltpu.roll only exists inside Pallas kernels)."""

    def kernel(x_ref, o_ref):
        o_ref[...] = _lane_prefix_sum(x_ref[...])

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True)(x)


@pytest.mark.parametrize("shape", [
    (8, 64),      # rows-style [S, N] rank tile (non-power-of-two rows)
    (8, 128),     # power-of-two lanes
    (16, 1024),   # seg-SA1 scale lane count
    (3, 8, 96),   # 3-D (planar coordinate-plane shapes), odd lane count
])
def test_lane_prefix_sum_matches_cumsum(shape):
    rng = np.random.RandomState(0)
    # Small integers: the kernel's contract (exact f32 counts <= N).
    x = jnp.asarray(rng.randint(0, 3, shape).astype(np.float32))
    got = np.asarray(_prefix_sum_host(x))
    want = np.asarray(jnp.cumsum(x, axis=-1))
    np.testing.assert_array_equal(got, want)


def test_lane_prefix_sum_binary_mask_ranks():
    """The production use: 1-based in-radius ranks from a 0/1 mask."""
    rng = np.random.RandomState(1)
    mask = jnp.asarray((rng.uniform(size=(8, 256)) < 0.3)
                       .astype(np.float32))
    ranks = np.asarray(_prefix_sum_host(mask))
    want = np.cumsum(np.asarray(mask), axis=-1)
    np.testing.assert_array_equal(ranks, want)
    # rank at each in-mask lane is its 1-based in-mask position
    m = np.asarray(mask) > 0
    for r in range(mask.shape[0]):
        assert (ranks[r][m[r]] == np.arange(1, m[r].sum() + 1)).all()


# ---------------------------------------------------------------------------
# _flatten_lane_safe
# ---------------------------------------------------------------------------


def _demo_params():
    """A pytree with a [128, 3] leaf (the T-Net center head shape that
    triggered the XLA reshape canonicalization) plus assorted shapes."""
    rng = np.random.RandomState(2)
    return {
        "head": {"kernel": jnp.asarray(rng.normal(size=(128, 3))
                                       .astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(size=(3,))
                                     .astype(np.float32))},
        "dense": {"kernel": jnp.asarray(rng.normal(size=(64, 256))
                                        .astype(np.float32)),
                  "bias": jnp.asarray(rng.normal(size=(256,))
                                      .astype(np.float32))},
        "scalar": jnp.asarray(0.5, jnp.float32),
    }


def _demo_grads(step):
    rng = np.random.RandomState(100 + step)
    return jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.normal(size=l.shape)
                              .astype(np.float32)), _demo_params())


def _run_steps(tx, n=3):
    params = _demo_params()
    state = tx.init(params)
    outs = []
    for i in range(n):
        upd, state = tx.update(_demo_grads(i), state, params)
        params = optax.apply_updates(params, upd)
        outs.append(params)
    return outs


@pytest.mark.parametrize("wrap", ["plain", "clip", "multistep"])
def test_flatten_lane_safe_matches_optax_flatten(wrap):
    def build(flavor):
        tx = optax.adam(1e-2, eps=1e-8)
        if wrap == "clip":
            tx = optax.chain(optax.clip_by_global_norm(1.0), tx)
        tx = flavor(tx)
        if wrap == "multistep":
            tx = optax.MultiSteps(tx, every_k_schedule=2)
        return tx

    ref = _run_steps(build(optax.flatten), n=4)
    got = _run_steps(build(_flatten_lane_safe), n=4)
    for pr, pg in zip(ref, got):
        for a, b in zip(jax.tree_util.tree_leaves(pr),
                        jax.tree_util.tree_leaves(pg)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_flatten_lane_safe_pad_breaks_divisibility():
    """The padded total length must not divide by any narrow trailing
    dim — that divisibility is exactly what lets XLA rewrite the
    per-leaf unflatten into a whole-vector relayout."""
    from transferable3d_tpu.train.train_loop import _flatten_lane_safe  # noqa
    params = _demo_params()
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(l.size for l in leaves)
    narrow = {l.shape[-1] for l in leaves
              if l.ndim and 1 < l.shape[-1] < 128}
    assert 3 in narrow  # the motivating case
    # Reproduce the wrapper's padded length via its init state size.
    tx = _flatten_lane_safe(optax.adam(1e-2))
    state = tx.init(params)
    padded = jax.tree_util.tree_leaves(state)[1].size  # adam mu vector
    assert padded >= total
    for d in narrow:
        assert padded % d != 0, (padded, d)


# ---------------------------------------------------------------------------
# ops/fused_sa._mult_from_rank
# ---------------------------------------------------------------------------


def _mult_reference(rank_m, k):
    """Ground truth: sum the _onehot_all slot selection over slots."""
    from transferable3d_tpu.ops.fused_sa import _onehot_all

    def kernel(r_ref, o_ref):
        s_ch, n = r_ref.shape
        oh = _onehot_all(r_ref[...], k)                # [S_ch*K, N]
        o_ref[...] = jnp.sum(
            oh.reshape(s_ch, k, n).astype(jnp.float32), axis=1)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(rank_m.shape, jnp.float32),
        interpret=True)(rank_m)


def _mult_host(rank_m, k):
    from transferable3d_tpu.ops.fused_sa import _mult_from_rank

    def kernel(r_ref, o_ref):
        o_ref[...] = _mult_from_rank(r_ref[...], k)

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(rank_m.shape, jnp.float32),
        interpret=True)(rank_m)


@pytest.mark.parametrize("k", [16, 32, 64, 128])
@pytest.mark.parametrize("density", [0.02, 0.3, 0.9])
def test_mult_from_rank_matches_onehot_sum(k, density):
    """Elementwise multiplicities must equal the one-hot column sums
    bit-for-bit (integer counts <= K), including: empty balls (the
    nearest-point patch gives rank 1 -> mult K), count < K
    (duplication), count > K (ranks beyond the slot budget -> 0)."""
    rng = np.random.RandomState(int(k + 1000 * density))
    s_ch, n = 8, 256
    mask = (rng.uniform(size=(s_ch, n)) < density).astype(np.float32)
    rank = np.cumsum(mask, axis=1) * mask             # 1-based ranks, 0 out
    # emulate the empty-ball patch: rows with no in-radius points get a
    # single rank-1 entry at a random lane
    for r in range(s_ch):
        if mask[r].sum() == 0:
            rank[r, rng.randint(n)] = 1.0
    rank = jnp.asarray(rank.astype(np.float32))
    got = np.asarray(_mult_host(rank, k))
    want = np.asarray(_mult_reference(rank, k))
    np.testing.assert_array_equal(got, want)
    # sanity on the contract itself: each centroid's slots sum to K
    np.testing.assert_array_equal(got.sum(axis=1), np.full(s_ch, float(k)))
