"""Pallas fused BN->act->matmul->stats layer (training fwd + bwd).

The full "shared-MLP stacks as Pallas kernels" design (BASELINE.json):
one training layer of a per-point MLP chain is

    x  = act(a_in * s + t)        # folded input BatchNorm + ReLU
    y  = x @ w + b                # MXU
    st = (sum_rows(y), sum_rows(y*y))   # stats for THIS layer's BN

computed in ONE pass over VMEM tiles (forward kernel), with a matching
backward kernel that recomputes x tile-wise and produces

    da_in, dw, db, ds, dt

— all per-column reductions accumulated in VMEM, no separate stats
passes, no [M, N] fp32 materializations (the failure mode of the plain
matmul+stats kernel, see ops/fused_linear.py history).

The trick that keeps the backward local: the *input* normalization is
folded into per-channel (s, t) = (gamma/sigma, beta - mu*gamma/sigma)
treated as independent custom-VJP inputs. The batch-statistics
dependence of (s, t) is a [K]-sized function handled by XLA *between*
layer kernels, so the usual BN backward's global mean(dh), mean(dh*xhat)
terms never appear inside the kernel.

CPU path: `interpret=True` (tests) or the pure-jnp `*_ref` twins.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(apply_act, a_ref, s_ref, t_ref, w_ref, b_ref,
                y_ref, stats_ref):
    i = pl.program_id(0)
    x = a_ref[:].astype(jnp.float32) * s_ref[:][None, :] + t_ref[:][None, :]
    if apply_act:
        x = jnp.maximum(x, 0.0)
    acc = jnp.dot(x.astype(a_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    acc = acc + b_ref[:][None, :]
    y_ref[:] = acc.astype(y_ref.dtype)
    block = jnp.concatenate(
        [jnp.sum(acc, axis=0, keepdims=True),
         jnp.sum(acc * acc, axis=0, keepdims=True)], axis=0)

    @pl.when(i == 0)
    def _():
        stats_ref[:] = block

    @pl.when(i > 0)
    def _():
        stats_ref[:] = stats_ref[:] + block


def _fwd(a, s, t, w, b, apply_act: bool, interpret: bool):
    m, k = a.shape
    n = w.shape[1]
    tile_m = min(_round_up(m, 8), 1024)
    y, stats = pl.pallas_call(
        partial(_fwd_kernel, apply_act),
        grid=(pl.cdiv(m, tile_m),),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), a.dtype),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ],
        interpret=interpret,
    )(a, s, t, w.astype(a.dtype), b)
    return y, stats


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(apply_act, a_ref, s_ref, t_ref, w_ref, y_ref,
                gy_ref, gs0_ref, gs1_ref,
                da_ref, dw_ref, db_ref, ds_ref, dt_ref):
    i = pl.program_id(0)
    a = a_ref[:].astype(jnp.float32)
    pre = a * s_ref[:][None, :] + t_ref[:][None, :]
    x = jnp.maximum(pre, 0.0) if apply_act else pre

    dacc = (gy_ref[:].astype(jnp.float32) + gs0_ref[:][None, :]
            + 2.0 * y_ref[:].astype(jnp.float32) * gs1_ref[:][None, :])
    dacc_b = dacc.astype(a_ref.dtype)
    x_b = x.astype(a_ref.dtype)

    # dx = dacc @ w^T ; dw += x^T @ dacc (both MXU, tiles resident).
    dx = jax.lax.dot_general(
        dacc_b, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [tm, K]
    dw_blk = jax.lax.dot_general(
        x_b, dacc_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [K, N]

    dh = dx * (pre > 0.0) if apply_act else dx  # [tm, K]
    da_ref[:] = (dh * s_ref[:][None, :]).astype(da_ref.dtype)

    db_blk = jnp.sum(dacc, axis=0, keepdims=True)       # [1, N]
    ds_blk = jnp.sum(dh * a, axis=0, keepdims=True)     # [1, K]
    dt_blk = jnp.sum(dh, axis=0, keepdims=True)         # [1, K]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw_blk
        db_ref[:] = db_blk
        ds_ref[:] = ds_blk
        dt_ref[:] = dt_blk

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_blk
        db_ref[:] = db_ref[:] + db_blk
        ds_ref[:] = ds_ref[:] + ds_blk
        dt_ref[:] = dt_ref[:] + dt_blk


def _bwd_call(a, s, t, w, y, gy, gs, apply_act: bool, interpret: bool):
    m, k = a.shape
    n = w.shape[1]
    tile_m = min(_round_up(m, 8), 1024)
    da, dw, db, ds, dt = pl.pallas_call(
        partial(_bwd_kernel, apply_act),
        grid=(pl.cdiv(m, tile_m),),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # a
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                 # w
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # y
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # gy
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # da
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                 # dw
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                 # db
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                 # ds
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                 # dt
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), a.dtype),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        interpret=interpret,
    )(a, s, t, w.astype(a.dtype), y, gy, gs[0], gs[1])
    return da, dw, db[0], ds[0], dt[0]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bn_act_linear(a, s, t, w, b, apply_act: bool = True,
                  interpret: bool = False):
    """One fused chain layer: (act(a*s + t)) @ w + b, plus column stats.

    a [M, K] (bf16/f32), s/t [K] f32 (folded input BN; identity = 1/0),
    w [K, N] f32 params, b [N] f32. Returns (y [M, N] a.dtype,
    stats [2, N] f32 = (sum, sumsq) of the fp32 accumulator rows).
    """
    return _fwd(a, s, t, w, b, apply_act, interpret)


def _vjp_fwd(a, s, t, w, b, apply_act, interpret):
    y, stats = _fwd(a, s, t, w, b, apply_act, interpret)
    return (y, stats), (a, s, t, w, y)


def _vjp_bwd(apply_act, interpret, res, grads):
    a, s, t, w, y = res
    gy, gstats = grads
    da, dw, db, ds, dt = _bwd_call(a, s, t, w, y, gy, gstats,
                                   apply_act, interpret)
    return da, ds, dt, dw.astype(w.dtype), db


bn_act_linear.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Pure-jnp reference (CPU fallback + tests)
# ---------------------------------------------------------------------------

def bn_act_linear_ref(a, s, t, w, b, apply_act: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = a.astype(jnp.float32) * s[None, :] + t[None, :]
    if apply_act:
        x = jnp.maximum(x, 0.0)
    acc = x.astype(a.dtype).astype(jnp.float32) @ w.astype(
        a.dtype).astype(jnp.float32) + b[None, :]
    y = acc.astype(a.dtype)
    stats = jnp.stack([jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)])
    return y, stats


# ---------------------------------------------------------------------------
# Fused normalize -> relu -> max-pool (the "masked symmetric max-pool"
# Pallas kernel of BASELINE.json): pooled = max_n relu(y_raw*s + t).
# Closes the chain: the last layer's raw output goes straight into the
# pool without a materialized normalize/relu pass (measured 0.8 ms fwd +
# 1.6 ms bwd for the 1024-wide seg branch when left to XLA).
# ---------------------------------------------------------------------------

def _pool_fwd_kernel(y_ref, s_ref, t_ref, out_ref):
    j = pl.program_id(1)  # N-tile index
    x = (y_ref[:].astype(jnp.float32) * s_ref[:][None, None, :]
         + t_ref[:][None, None, :])
    x = jnp.maximum(x, 0.0)
    blk = jnp.max(x, axis=1)  # [tb, C]

    @pl.when(j == 0)
    def _():
        out_ref[:] = blk.astype(out_ref.dtype)

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], blk.astype(out_ref.dtype))


def _pool_bwd_kernel(y_ref, s_ref, t_ref, out_ref, g_ref,
                     dy_ref, ds_ref, dt_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    y = y_ref[:].astype(jnp.float32)
    x = y * s_ref[:][None, None, :] + t_ref[:][None, None, :]
    x = jnp.maximum(x, 0.0)
    # Winner mask: elements equal to the pooled max AND positive (a
    # pooled value of 0 means relu clipped everything: no gradient).
    pooled = out_ref[:].astype(jnp.float32)[:, None, :]
    win = (x >= pooled) & (x > 0.0)
    g = g_ref[:].astype(jnp.float32)[:, None, :] * win
    dy_ref[:] = (g * s_ref[:][None, None, :]).astype(dy_ref.dtype)
    ds_blk = jnp.sum(g * y, axis=(0, 1), keepdims=True)[0]  # [1, C]
    dt_blk = jnp.sum(g, axis=(0, 1), keepdims=True)[0]

    @pl.when((i == 0) & (j == 0))
    def _():
        ds_ref[:] = ds_blk
        dt_ref[:] = dt_blk

    @pl.when((i > 0) | (j > 0))
    def _():
        ds_ref[:] = ds_ref[:] + ds_blk
        dt_ref[:] = dt_ref[:] + dt_blk


def _pool_tiles(b: int, n: int, c: int):
    """Tile so the bf16 input block stays <= ~2 MB: Mosaic materializes
    fp32 intermediates of the block on the VMEM stack, and double
    buffering doubles it again (observed 32 MB scoped-vmem OOM with an
    8 MB block)."""
    budget = 1 << 20  # bytes of bf16 input block
    tile_b = max(1, min(b, 8))
    tile_n = max(1, min(n, budget // max(tile_b * c * 2, 1)))
    # Round to sublane-friendly sizes.
    if tile_n >= 128:
        tile_n = tile_n // 128 * 128
    return tile_b, tile_n


def _pool_fwd(y, s, t, interpret: bool):
    b, n, c = y.shape
    tb, tn = _pool_tiles(b, n, c)
    return pl.pallas_call(
        _pool_fwd_kernel,
        grid=(pl.cdiv(b, tb), pl.cdiv(n, tn)),
        in_specs=[
            pl.BlockSpec((tb, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        interpret=interpret,
    )(y, s, t)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_act_maxpool(y, s, t, interpret: bool = False):
    """y [B, N, C] raw, s/t [C] -> pooled [B, C] = max_n relu(y*s + t)."""
    return _pool_fwd(y, s, t, interpret)


def _pool_vjp_fwd(y, s, t, interpret):
    out = _pool_fwd(y, s, t, interpret)
    return out, (y, s, t, out)


def _pool_vjp_bwd(interpret, res, g):
    y, s, t, out = res
    b, n, c = y.shape
    tb, tn = _pool_tiles(b, n, c)
    dy, ds, dt = pl.pallas_call(
        _pool_bwd_kernel,
        grid=(pl.cdiv(b, tb), pl.cdiv(n, tn)),
        in_specs=[
            pl.BlockSpec((tb, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), y.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(y, s, t, out, g)
    return dy, ds[0], dt[0]


bn_act_maxpool.defvjp(_pool_vjp_fwd, _pool_vjp_bwd)


def bn_act_maxpool_ref(y, s, t):
    x = y.astype(jnp.float32) * s[None, None, :] + t[None, None, :]
    return jnp.max(jnp.maximum(x, 0.0), axis=1)
