"""Farthest-point sampling — TPU-native equivalent of reference op N1.

Capability parity target: the reference's CUDA `tf_sampling` op
(`farthest_point_sample`, `gather_point` — SURVEY.md N1). Reformulated
for XLA per the survey plan: an iterative argmax over a running
min-distance field with a fixed trip count (`lax.fori_loop`), fully
shape-static, batched on the VPU. No dynamic shapes, no host sync; the
gradient flows through `gather_points` (FPS indices are discrete and
non-differentiable, as in the reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_ref(xyz: jnp.ndarray, k: int) -> jnp.ndarray:
    """XLA implementation: lax.scan with stacked outputs (CPU/tests).

    A scan emitting one index per step avoids a per-iteration scatter
    into a carried buffer, which lowers much worse on TPU.
    """
    b, n, _ = xyz.shape

    def step(carry, _):
        dist, last = carry
        last_xyz = jnp.take_along_axis(
            xyz, last[:, None, None], axis=1)  # [B, 1, 3]
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # [B, N]
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)  # [B]
        return (dist, nxt), nxt

    idx0 = jnp.zeros((b,), jnp.int32)
    if k == 1:
        return idx0[:, None]
    dist0 = jnp.full((b, n), 1e10, xyz.dtype)
    _, rest = jax.lax.scan(step, (dist0, idx0), None, length=k - 1)
    return jnp.concatenate([idx0[:, None], rest.T], axis=1)


def _fps_kernel(k, x_ref, y_ref, z_ref, out_ref, dist_ref, last_ref):
    """Whole FPS loop in one kernel, points resident in VMEM.

    The XLA scan pays per-iteration op dispatch (~92 us/iter measured on
    v5e: 12 ms for k=128) — here one launch runs all k iterations.
    Coordinates come as three [TB, N] planes (a trailing dim of 3 would
    pad to 128 lanes: 64 MB VMEM for the bench shapes). The 'last point'
    is re-extracted each iteration by a one-hot reduction.
    """
    coords = (x_ref[:].astype(jnp.float32),
              y_ref[:].astype(jnp.float32),
              z_ref[:].astype(jnp.float32))  # each [TB, N]
    tb, n = coords[0].shape
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)

    dist_ref[:] = jnp.full((tb, n), 1e10, jnp.float32)
    last_ref[:] = jnp.zeros((tb,), jnp.int32)
    # Output is [K, TB]: the per-iteration write is then a dynamic
    # SUBLANE-row store (supported); dynamic lane-dim indices must be
    # 128-aligned in Mosaic. The wrapper transposes back.
    out_ref[0, :] = jnp.zeros((tb,), jnp.int32)

    def body(i, _):
        sel = (iota_n == last_ref[:][:, None]).astype(jnp.float32)
        d = jnp.zeros((tb, n), jnp.float32)
        for c in coords:
            last_c = jnp.sum(sel * c, axis=1)  # [TB]
            diff = c - last_c[:, None]
            d = d + diff * diff
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        # argmax does not legalize in Mosaic: take the row max, then the
        # smallest index attaining it (matches jnp.argmax tie-breaking).
        m = jnp.max(dist, axis=1, keepdims=True)
        cand = jnp.where(dist >= m, iota_n, n)
        nxt = jnp.min(cand, axis=1).astype(jnp.int32)
        out_ref[i, :] = nxt
        last_ref[:] = nxt
        return 0

    jax.lax.fori_loop(1, k, body, 0)


def _fps_pallas(xyz: jnp.ndarray, k: int, interpret: bool) -> jnp.ndarray:
    b, n, _ = xyz.shape
    tile_b = b
    # ~6 [TB, N] fp32 planes live at once; keep them inside VMEM.
    while tile_b > 1 and tile_b * n * 4 * 6 > (1 << 23):
        tile_b //= 2
    planes = [xyz[:, :, c] for c in range(3)]  # three [B, N] planes
    spec = pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_fps_kernel, k),
        grid=(pl.cdiv(b, tile_b),),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((k, tile_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_b, n), jnp.float32),
                        pltpu.VMEM((tile_b,), jnp.int32)],
        interpret=interpret,
    )(*planes)
    return out.T


@partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz: jnp.ndarray, k: int) -> jnp.ndarray:
    """FPS indices [B, k] over xyz [B, N, 3] (first point = index 0).

    Deterministic (seed point 0, matching the reference kernel semantics,
    SURVEY.md N1). Pallas single-launch kernel on TPU; XLA scan
    elsewhere (bit-identical selection rule: argmax of the running
    min-distance, first index wins ties).
    """
    xyz = jax.lax.stop_gradient(xyz)
    if k == 1:
        return jnp.zeros((xyz.shape[0], 1), jnp.int32)
    from transferable3d_tpu.models.layers import on_tpu

    if on_tpu():
        return _fps_pallas(xyz, k, False)
    return _fps_ref(xyz, k)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B, N, C], idx [B, S] -> [B, S, C] (reference `gather_point`,
    differentiable w.r.t. points)."""
    from transferable3d_tpu.ops.grouping import flat_row_gather

    return flat_row_gather(points, idx)
