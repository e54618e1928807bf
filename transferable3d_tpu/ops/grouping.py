"""Ball-query grouping — TPU-native equivalent of reference op N2.

Capability parity target: the reference's CUDA `tf_grouping` ops
(`query_ball_point`, `group_point`, `knn_point` — SURVEY.md N2).
Reformulated per the survey plan: a tiled pairwise-distance matrix
(one [B, S, N] einsum that XLA maps onto the MXU) with a masked
first-k selection — padded to a fixed `nsample` with repetition of the
first in-radius point, mirroring the reference kernel's semantics
(slots beyond the in-radius count repeat index 0 of the group).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, S, 3] x [B, N, 3] -> squared distances [B, S, N].

    Expanded form keeps the cross term a single batched matmul (MXU);
    the norms are rank-1 corrections fused by XLA.
    """
    cross = jnp.einsum("bsc,bnc->bsn", a, b,
                       precision=jax.lax.Precision.HIGHEST)
    na = jnp.sum(a * a, axis=-1)[:, :, None]
    nb = jnp.sum(b * b, axis=-1)[:, None, :]
    return jnp.maximum(na + nb - 2 * cross, 0.0)


@partial(jax.jit, static_argnums=(3,))
def ball_query(centroids: jnp.ndarray, xyz: jnp.ndarray, radius: float,
               nsample: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices [B, S, nsample] of <= nsample points within `radius` of each
    centroid + count [B, S] of in-radius points.

    First-k selection: among in-radius points, the lowest point indices
    win (top_k on a score that decreases with index); pad slots repeat
    the first hit. Centroids with zero hits fall back to the nearest
    point (keeps downstream features finite; its relative offset is
    still masked out by `group_points` callers via the count).
    """
    d2 = pairwise_sqdist(centroids, xyz)  # [B, S, N]
    n = xyz.shape[1]
    within = d2 <= radius * radius
    count = jnp.sum(within, axis=-1).astype(jnp.int32)  # [B, S]

    # Score: in-radius points keyed by -index (so earliest index first);
    # out-of-radius points -inf.
    neg_idx = -jnp.arange(n, dtype=jnp.float32)
    score = jnp.where(within, neg_idx[None, None, :], -jnp.inf)
    _, idx = jax.lax.top_k(score, min(nsample, n))  # [B, S, k]
    if nsample > n:
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[..., :1],
                                   (*idx.shape[:2], nsample - n))], -1)

    slot = jnp.arange(nsample)[None, None, :]
    have = jnp.maximum(count, 1)[..., None]
    first = idx[..., :1]
    idx = jnp.where(slot < have, idx, first)
    # Zero-hit fallback: nearest point.
    nearest = jnp.argmin(d2, axis=-1).astype(idx.dtype)[..., None]
    idx = jnp.where(count[..., None] == 0, nearest, idx)
    return idx.astype(jnp.int32), count


@partial(jax.jit, static_argnums=(3,))
def knn_point(centroids: jnp.ndarray, xyz: jnp.ndarray, _unused: float,
              k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors (reference `knn_point` variant): indices
    [B, S, k] + distances [B, S, k]."""
    d2 = pairwise_sqdist(centroids, xyz)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg_d


def flat_row_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather [B, ...idx] rows from points [B, N, C] via a flattened
    global-row gather.

    `take_along_axis` on [B, N, C] lowers to per-channel minor-dim
    gathers (~10 ns/scalar on v5e — 21 ms for one SA level's grouping);
    a single row gather over the flattened [B*N, C] array keeps whole
    C-wide rows together and lowers to an efficient major-dim gather.
    """
    b, n, c = points.shape
    offsets = jnp.arange(b, dtype=idx.dtype) * n
    flat_idx = (idx.reshape(b, -1)
                + offsets[:, None]).reshape(-1)  # [B * prod(idx)]
    rows = jnp.take(points.reshape(b * n, c), flat_idx, axis=0)
    return rows.reshape(*idx.shape, c)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B, N, C], idx [B, S, K] -> grouped [B, S, K, C]
    (reference `group_point`, differentiable w.r.t. points)."""
    return flat_row_gather(points, idx)


def ball_query_group(centroids: jnp.ndarray, xyz: jnp.ndarray,
                     features, radius: float, nsample: int,
                     include_xyz: bool = True
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ball query + grouping with NO gathers: one-hot matmuls.

    Returns (grouped [B, S, K, 3 + C] with RAW xyz in the first three
    channels — or [B, S, K, C] of features only with include_xyz=False —
    and count [B, S]). Selection semantics match
    ball_query+group_points: first-k in-radius points by index, cyclic
    repetition when short, nearest-point fallback for empty balls.

    Motivation: the gather form runs on the scalar unit (~40 ms/step
    across the v2 SA levels); here slot k's member is extracted by a
    rank-comparison one-hot contracted with the points on the MXU
    (scan over K). An exact bf16 hi/lo split keeps fp32 values (skipped
    when the payload is already bf16, e.g. the factored layer-1
    preactivations of models/pointnet2.GroupedPointMLP).
    """
    d2 = pairwise_sqdist(centroids, xyz)  # [B, S, N]
    r2 = radius * radius
    within = d2 <= r2
    count = jnp.sum(within.astype(jnp.int32), axis=-1)  # [B, S]
    rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)  # 1-based
    # Empty balls: fall back to the nearest point (its rank stays 0, so
    # patch `within`/`rank` to mark it as the single member).
    nearest = jnp.argmin(d2, axis=-1)  # [B, S]
    is_nearest = (jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
                  == nearest[..., None])
    empty = (count == 0)[..., None]
    within = jnp.where(empty, is_nearest, within)
    rank = jnp.where(empty, is_nearest.astype(jnp.int32), rank)
    eff = jnp.maximum(jnp.minimum(count, nsample), 1)[..., None]  # [B,S,1]

    if include_xyz:
        src = (xyz if features is None
               else jnp.concatenate([xyz, features.astype(xyz.dtype)], -1))
    else:
        src = features
    if src.dtype == jnp.bfloat16:
        parts = [src]  # bf16 payload: the one-hot contraction is exact
    else:
        hi = src.astype(jnp.bfloat16)
        lo = (src.astype(jnp.float32) - hi.astype(jnp.float32)).astype(
            jnp.bfloat16)
        parts = [hi, lo]

    def step(carry, k):
        want = jnp.mod(k, eff) + 1  # cyclic repetition past the count
        oh = (within & (rank == want)).astype(jnp.bfloat16)  # [B, S, N]
        member = sum(
            jnp.einsum("bsn,bnc->bsc", oh, p,
                       preferred_element_type=jnp.float32) for p in parts)
        return carry, member.astype(src.dtype)

    _, out = jax.lax.scan(step, 0, jnp.arange(nsample))  # [K, B, S, C]
    grouped = jnp.moveaxis(out, 0, 2)  # [B, S, K, C]
    return grouped, count
