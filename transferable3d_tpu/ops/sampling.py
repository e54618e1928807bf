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


@partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz: jnp.ndarray, k: int) -> jnp.ndarray:
    """FPS indices [B, k] over xyz [B, N, 3] (first point = index 0).

    Deterministic (seed point 0, matching the reference kernel). O(k*N)
    per batch row, vectorized over B.
    """
    b, n, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz)

    # lax.scan with stacked outputs: each step emits one index — avoids a
    # per-iteration scatter into a carried buffer, which lowers much
    # worse on TPU (long compile times under Mosaic).
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


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B, N, C], idx [B, S] -> [B, S, C] (reference `gather_point`,
    differentiable w.r.t. points)."""
    from transferable3d_tpu.ops.grouping import flat_row_gather

    return flat_row_gather(points, idx)
