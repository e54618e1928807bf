"""3-NN feature interpolation — TPU-native equivalent of reference op N3.

Capability parity target: the reference's `tf_interpolate` ops
(`three_nn`, `three_interpolate` — SURVEY.md N3): for each query point,
find its 3 nearest support points and inverse-distance-weight their
features. Here: one pairwise-distance matmul + `top_k` + a weighted
gather — all static shapes, differentiable w.r.t. features (as in the
reference, whose grad is only w.r.t. points' features).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from transferable3d_tpu.ops.grouping import pairwise_sqdist


def three_nn(queries: jnp.ndarray, support: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """queries [B, M, 3], support [B, N, 3] -> (dist [B, M, 3], idx).

    Selection uses the fast expanded-form distance matrix (one matmul);
    the 3 selected distances are then recomputed in direct form — the
    expanded form loses ~1e-6 absolute accuracy to cancellation, which
    matters when a query coincides with a support point (self-distance
    must be exactly 0 for the IDW weights to be exact there).
    """
    d2 = pairwise_sqdist(queries, support)  # [B, M, N]
    n = support.shape[1]
    _, idx = jax.lax.top_k(-d2, min(3, n))
    if n < 3:  # tiny support (e.g. the global-SA level): repeat neighbors
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[..., :1],
                                   (*idx.shape[:2], 3 - n))], axis=-1)
    idx = idx.astype(jnp.int32)
    b, m, _ = idx.shape
    flat = idx.reshape(b, m * 3)
    sel = jnp.take_along_axis(support, flat[..., None], axis=1)
    sel = sel.reshape(b, m, 3, 3)
    exact = jnp.sum((sel - queries[:, :, None, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(exact, 0.0)), idx


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      dist: jnp.ndarray) -> jnp.ndarray:
    """features [B, N, C], idx/dist [B, M, 3] -> interpolated [B, M, C]
    with inverse-distance weights (reference normalization: w_i = (1/d_i)
    / sum_j (1/d_j), eps-guarded)."""
    from transferable3d_tpu.ops.grouping import flat_row_gather

    w = 1.0 / jnp.maximum(dist, 1e-10)
    w = w / jnp.sum(w, axis=-1, keepdims=True)  # [B, M, 3]
    gathered = flat_row_gather(features, idx)   # [B, M, 3, C]
    return jnp.sum(gathered * w[..., None], axis=2)
