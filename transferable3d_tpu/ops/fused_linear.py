"""Pallas fused matmul + batch-norm-statistics kernel.

Capability/perf target: BASELINE.json — "the PointNet shared 1x1-conv MLP
stacks ... become Pallas kernels over batched [B, N, C] point tensors".
Profiling the v1 train step (v5e) showed each training-mode BatchNorm
paying a separate full read of its layer's activations to reduce
mean/var (e.g. 0.84 ms for the [B*N, 512] layer). This kernel computes

    y = x @ w + b          (bf16 in, fp32 MXU accumulation)
    s = sum_rows(y)        (fp32, from the accumulator — pre-rounding)
    s2 = sum_rows(y * y)

in ONE pass while the tiles are in VMEM: the stats cost zero extra HBM
traffic. Backward is a custom VJP: dacc = dy + ds + 2*y*ds2 (y stands in
for the fp32 accumulator; |y - acc| <= 1 bf16 ulp), then standard
dx/dw/db matmuls that XLA schedules on the MXU.

On CPU (tests) the kernel runs in interpreter mode — same semantics,
same code path.
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


def _kernel(x_ref, w_ref, b_ref, y_ref, stats_ref):
    i = pl.program_id(0)
    acc = jnp.dot(x_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32)
    acc = acc + b_ref[:][None, :]
    y_ref[:] = acc.astype(y_ref.dtype)
    s = jnp.sum(acc, axis=0, keepdims=True)       # [1, N]
    s2 = jnp.sum(acc * acc, axis=0, keepdims=True)
    block = jnp.concatenate([s, s2], axis=0)      # [2, N]

    @pl.when(i == 0)
    def _():
        stats_ref[:] = block

    @pl.when(i > 0)
    def _():
        stats_ref[:] = stats_ref[:] + block


def _forward(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m, k = x.shape
    n = w.shape[1]
    tile_m = min(_round_up(m, 8), 1024)
    grid = (pl.cdiv(m, tile_m),)
    y, stats = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # Same block every grid step: accumulated in place.
            pl.BlockSpec((2, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), x.dtype),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n + 3 * m * n,
            bytes_accessed=(m * k + k * n + m * n) * 2 + 8 * n,
            transcendentals=0),
        interpret=interpret,
    )(x, w.astype(x.dtype), b)
    return y, stats


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_with_stats(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      interpret: bool = False):
    """x [M, K] x w [K, N] + b -> (y [M, N], stats [2, N] = (sum, sumsq)).

    Stats are over rows (the batch*points axis), computed from the fp32
    accumulator before the output cast.
    """
    return _forward(x, w, b, interpret)


def _fwd(x, w, b, interpret):
    y, stats = _forward(x, w, b, interpret)
    return (y, stats), (x, w, y)


def _bwd(interpret, res, grads):
    x, w, y = res
    dy, dstats = grads
    ds = dstats[0]   # d/dsum   [N]
    ds2 = dstats[1]  # d/dsumsq [N]
    yf = y.astype(jnp.float32)
    dacc = (dy.astype(jnp.float32) + ds[None, :]
            + 2.0 * yf * ds2[None, :])
    dacc_b = dacc.astype(x.dtype)
    dx = dacc_b @ w.astype(x.dtype).T
    dw = (x.T @ dacc_b).astype(w.dtype)
    db = jnp.sum(dacc, axis=0).astype(jnp.float32)
    return dx.astype(x.dtype), dw, db


linear_with_stats.defvjp(_fwd, _bwd)


def linear_with_stats_ref(x, w, b):
    """Pure-jnp reference implementation (tests, and non-TPU fallback)."""
    acc = x.astype(jnp.float32) @ w.astype(jnp.float32) + b[None, :]
    y = acc.astype(x.dtype)
    stats = jnp.stack([jnp.sum(acc, axis=0),
                       jnp.sum(acc * acc, axis=0)])
    return y, stats
