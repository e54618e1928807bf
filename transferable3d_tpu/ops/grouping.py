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

from transferable3d_tpu.core import numerics
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    if include_xyz:
        src = (xyz if features is None
               else jnp.concatenate([xyz, features.astype(xyz.dtype)], -1))
    else:
        src = features
    _, _, _, count = _select_masks(centroids, xyz, radius, nsample)
    grouped = _onehot_select(centroids, xyz, src, radius, nsample)
    return grouped, count


def _select_masks(centroids, xyz, radius, nsample):
    """Selection bookkeeping shared by the one-hot select's forward and
    backward (recomputed in bwd instead of storing K one-hots).

    Returns (within [B, S, N] bool, rank [B, S, N] 1-based in-radius
    cumrank, eff [B, S, 1] effective member count, count [B, S])."""
    d2 = pairwise_sqdist(centroids, xyz)  # [B, S, N]
    within = d2 <= radius * radius
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
    return within, rank, eff, count


def _contraction_parts(x):
    """Exact MXU operands for a one-hot contraction against f32 data.

    On TPU the MXU rounds f32 operands to bf16, so f32 data is split
    into exact bf16 hi + lo parts (core/numerics). Off TPU the dot is
    f32-exact as-is — skipping the split there matters because the
    hi/lo recombination truncates below ~2^-17 relative. bf16 data is
    exact in one dot everywhere."""
    if x.dtype == jnp.bfloat16:
        return [x]
    from transferable3d_tpu.models.layers import on_tpu
    if not on_tpu():
        return [x.astype(jnp.float32)]
    hi, lo = numerics.exact_hi_lo(x.astype(jnp.float32))
    return [hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _onehot_select(centroids, xyz, src, radius, nsample):
    """Grouped src rows [B, S, K, C]: slot k of centroid s takes the
    in-radius point of rank (k mod eff) + 1, via one-hot MXU
    contractions. Differentiable wrt `src` only (the selection pattern
    is piecewise constant in the coordinates; centroids/xyz get zero
    cotangents, matching the gather form where d2 feeds comparisons).

    The custom VJP exists for gradient EXACTNESS, not speed: AD through
    the bf16 hi/lo forward forces the payload cotangent to bf16
    (~0.8% relative rounding — broke the analytic zero of BN-fed bias
    gradients, caught by the v2 train-mode TF1 twin). The backward
    applies the same hi/lo trick to the COTANGENT on TPU and plain f32
    contractions elsewhere."""
    within, rank, eff, _ = _select_masks(centroids, xyz, radius, nsample)
    parts = _contraction_parts(src)
    ohdt = parts[0].dtype

    def step(carry, k):
        want = jnp.mod(k, eff) + 1  # cyclic repetition past the count
        oh = (within & (rank == want)).astype(ohdt)  # [B, S, N]
        member = sum(
            jnp.einsum("bsn,bnc->bsc", oh, p,
                       preferred_element_type=jnp.float32) for p in parts)
        return carry, member.astype(src.dtype)

    _, out = jax.lax.scan(step, 0, jnp.arange(nsample))  # [K, B, S, C]
    return jnp.moveaxis(out, 0, 2)  # [B, S, K, C]


def _onehot_select_fwd(centroids, xyz, src, radius, nsample):
    out = _onehot_select(centroids, xyz, src, radius, nsample)
    return out, (centroids, xyz)


def _onehot_select_bwd(radius, nsample, res, ct):
    # ct.dtype == out dtype == src dtype (forward casts to src.dtype).
    centroids, xyz = res
    src_dtype = ct.dtype
    within, rank, eff, _ = _select_masks(centroids, xyz, radius, nsample)
    ct_parts = [jnp.moveaxis(p, 2, 0)  # [K, B, S, C] for the scan
                for p in _contraction_parts(ct)]
    ohdt = ct_parts[0].dtype
    b, n = xyz.shape[:2]
    c = ct.shape[-1]

    def step(dsrc, inp):
        k, cts = inp[0], inp[1:]
        want = jnp.mod(k, eff) + 1
        oh = (within & (rank == want)).astype(ohdt)  # [B, S, N]
        dk = sum(
            jnp.einsum("bsn,bsc->bnc", oh, p,
                       preferred_element_type=jnp.float32)
            for p in cts)
        return dsrc + dk, None

    dsrc, _ = jax.lax.scan(
        step, jnp.zeros((b, n, c), jnp.float32),
        (jnp.arange(nsample), *ct_parts))
    return (jnp.zeros_like(centroids), jnp.zeros_like(xyz),
            dsrc.astype(src_dtype))


_onehot_select.defvjp(_onehot_select_fwd, _onehot_select_bwd)


# ---------------------------------------------------------------------------
# Pallas fused ball-query + payload extraction (SURVEY.md N2).
#
# The XLA scan above materializes a [B, S, N] one-hot in HBM per k slot
# (~33 MB each at the v2 seg-SA1 shapes): measured 0.07-0.1 ms per slot
# on v5e — 26 ms/step across the 224 slots of seg-SA1 alone, all of it
# HBM traffic on the masks (payload width was irrelevant in A/B runs).
# The kernel below keeps everything in VMEM: squared distances from
# coordinate PLANES (a trailing dim of 3 would pad to 128 lanes), ranks
# as a masked lane prefix sum (inclusive cumsum; f32 accumulation is
# exact for counts <= N), then per centroid a [K_t, N] one-hot built
# in registers and contracted with the [N, C] payload on the MXU.
#
# Grid: (B, K/K_t). Mosaic requires the last two block dims to divide
# (8, 128) or equal the array dims, so S stays whole (S <= 128 in every
# model config) and the output is tiled over slots; the rank matrix is
# computed once per batch row (first k-tile) into persistent scratch.
# ---------------------------------------------------------------------------


def _lane_prefix_sum(x):
    """Inclusive prefix sum along the lane (last) axis: ceil(log2 N)
    masked Hillis-Steele roll+add stages. Replaces the [N, N]
    triangular-ones MXU dot the rank kernels used through round 3 —
    that operand was 2 MB of bf16 resident in every rank kernel's VMEM
    window and streamed from HBM, and at ~1.2 us/grid-step fixed cost
    it dominated the extract-style kernels' overhead (round-4 tile
    sweep). Each stage adds x[i - d] into x[i] — a RIGHT roll by d in
    the jnp.roll convention pltpu.roll follows; lanes that wrapped in
    from the end are masked by the iota compare. Exact for
    small-integer f32 inputs (counts <= N << 2^24).
    """
    n = x.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    d = 1
    while d < n:
        x = x + jnp.where(iota >= d, pltpu.roll(x, d, x.ndim - 1), 0.0)
        d *= 2
    return x


def _masked_rank(r2, ct, pt):
    """In-radius ranks for one batch row.

    `ct` [3, S] / `pt` [3, N] are coordinate planes. Returns
    (rank_m [S, N] f32 — 1-based in-radius rank, 0 out of radius,
    patched to mark the nearest point as the single member for empty
    balls — and count [S, 1] f32, the TRUE in-radius count, 0 for
    empty balls).
    """
    s, n = ct.shape[-1], pt.shape[-1]
    d2 = jnp.zeros((s, n), jnp.float32)
    for i in range(3):
        diff = ct[i : i + 1, :].reshape(s, 1) - pt[i : i + 1, :]
        d2 = d2 + diff * diff
    within = d2 <= r2
    # i1 -> bf16 selects hit a Mosaic relayout bug ((8,128) mask tiling
    # into (16,128) bf16); select into f32.
    wf = jnp.where(within, 1.0, 0.0)
    # Inclusive cumsum along N; f32 accumulation of 0/1 is exact.
    rank = _lane_prefix_sum(wf)
    count = rank[:, n - 1 : n]  # [S, 1]
    # Empty balls fall back to the nearest point (lowest index on ties,
    # matching jnp.argmin); argmin itself does not legalize in Mosaic.
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)
    dmin = jnp.min(d2, axis=1, keepdims=True)
    near = jnp.min(jnp.where(d2 <= dmin, iota_n, n), axis=1,
                   keepdims=True)
    empty = count < 0.5
    rank_m = jnp.where(within, rank, 0.0)
    rank_m = jnp.where(empty, jnp.where(iota_n == near, 1.0, 0.0), rank_m)
    return rank_m, count


def _want_tile(rank_ref, k, k_t, kt):
    """Per-slot wanted ranks for slots [kt*k_t, (kt+1)*k_t) — [S, K_t].

    want = (slot mod eff) + 1 with eff = clip(count, 1, k); computed in
    f32 where all quantities are small exact integers. Mosaic lowers
    f32 division to reciprocal-multiply, which can round an exact
    integer quotient just below it (33/33 -> 0.99999997, floor -> 0);
    biasing the numerator by +0.25 preserves the exact floor for all
    integer slot/eff < 2^11 while absorbing that error. eff is
    recovered as max(rank_m) so later k-tiles need no extra state.
    """
    eff = jnp.clip(jnp.max(rank_ref[:], axis=1, keepdims=True), 1.0,
                   float(k))  # [S, 1]
    s = eff.shape[0]
    slot = (jax.lax.broadcasted_iota(jnp.int32, (s, k_t), 1).astype(
        jnp.float32) + (kt * k_t).astype(jnp.float32))
    return slot - eff * jnp.floor((slot + 0.25) / eff) + 1.0  # [S, K_t]


def grouped_payload(centroids: jnp.ndarray, xyz: jnp.ndarray,
                    payload: jnp.ndarray, radius: float, nsample: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped payload rows [B, S, K, C]: the Pallas kernel on TPU for
    bf16 payloads, the XLA one-hot scan elsewhere (same semantics)."""
    from transferable3d_tpu.models.layers import on_tpu

    if on_tpu() and payload.dtype == jnp.bfloat16:
        return ball_query_extract(centroids, xyz, payload, radius,
                                  nsample)
    return ball_query_group(centroids, xyz, payload, radius, nsample,
                            include_xyz=False)


def _onehot_tile(rank_ref, k, k_t, kt):
    """One-hot slot-membership for slots [kt*k_t, (kt+1)*k_t).

    Fully vectorized over centroids: one [S, K_t, N] broadcast compare
    of ranks against per-slot wanted ranks, flattened to [S*K_t, N]
    bf16 so the payload contraction is a single MXU dot per grid step
    (a per-centroid loop costs ~300 cycles/iteration in dynamic slices
    and tiny transposes — measured 2x slower than the XLA scan).
    """
    want = _want_tile(rank_ref, k, k_t, kt)           # [S, K_t]
    oh3 = jnp.where(rank_ref[:][:, None, :] == want[:, :, None],
                    1.0, 0.0)                         # [S, K_t, N] f32
    s, n = rank_ref.shape
    return oh3.astype(jnp.bfloat16).reshape(s * k_t, n)


def _extract_fwd_kernel(r2, k, k_t, ct, pt, pay, out, cnt,
                        rank_ref):
    s = ct.shape[-1]
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        rank_m, count = _masked_rank(r2, ct[0], pt[0])
        rank_ref[:] = rank_m
        cnt[0, 0, :] = count[:, 0].astype(jnp.int32)

    oh = _onehot_tile(rank_ref, k, k_t, kt)           # [S*K_t, N]
    g = jnp.dot(oh, pay[0], preferred_element_type=jnp.float32)
    out[0] = g.reshape(s, k_t, -1).astype(out.dtype)


def _extract_bwd_kernel(r2, k, k_t, ct, pt, dg, dpay,
                        rank_ref, acc_ref):
    s = ct.shape[-1]
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        rank_m, _ = _masked_rank(r2, ct[0], pt[0])
        rank_ref[:] = rank_m
        acc_ref[:] = jnp.zeros_like(acc_ref)

    oh = _onehot_tile(rank_ref, k, k_t, kt)           # [S*K_t, N]
    dg_flat = dg[0].reshape(s * k_t, -1)              # [S*K_t, C]
    acc_ref[:] += jax.lax.dot_general(
        oh, dg_flat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [N, C]

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        dpay[0] = acc_ref[:].astype(dpay.dtype)


def _slot_tiles(s: int, n: int, k: int) -> int:
    """Slot-tile size keeping the in-kernel [S, K_t, N] one-hot build
    (f32 compare + bf16 flat copy, ~6 B/element transient) ~<= 8 MB.

    Kept a power of two >= 8 (Mosaic block sublane constraint) that
    divides k; k < 8 falls back to the whole slot axis.
    """
    budget = max(1, (8 << 20) // (s * n * 6))
    k_t = 8
    while k_t * 2 <= min(k, budget):
        k_t *= 2
    if k_t >= k or k % k_t:
        return k
    return k_t


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ball_query_extract(centroids: jnp.ndarray, xyz: jnp.ndarray,
                       payload: jnp.ndarray, radius: float, nsample: int,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ball query + payload-row extraction as one Pallas kernel.

    Semantically identical to `ball_query_group(..., include_xyz=False)`
    (first-k in-radius points by index, cyclic repetition past the
    count, nearest-point fallback for empty balls), for a bf16 payload.
    Differentiable w.r.t. `payload` only (selection is discrete, as in
    the reference CUDA op — SURVEY.md N2).
    """
    return _extract_fwd_call(centroids, xyz, payload, radius, nsample,
                             interpret)


def _extract_fwd_call(centroids, xyz, payload, radius, nsample, interpret):
    b, s, _ = centroids.shape
    n = xyz.shape[1]
    c = payload.shape[-1]
    k_t = _slot_tiles(s, n, nsample)
    ct = jnp.swapaxes(centroids, 1, 2)  # [B, 3, S] coordinate planes
    pt = jnp.swapaxes(xyz, 1, 2)        # [B, 3, N]
    grouped, cnt = pl.pallas_call(
        partial(_extract_fwd_kernel, radius * radius, nsample, k_t),
        grid=(b, nsample // k_t),
        in_specs=[
            pl.BlockSpec((1, 3, s), lambda b_, kt: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda b_, kt: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda b_, kt: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, k_t, c), lambda b_, kt: (b_, 0, kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda b_, kt: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, nsample, c), payload.dtype),
            jax.ShapeDtypeStruct((b, 1, s), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((s, n), jnp.float32)],
        interpret=interpret,
    )(ct, pt, payload)
    return grouped, cnt[:, 0, :]


def _extract_fwd_rule(centroids, xyz, payload, radius, nsample, interpret):
    out = _extract_fwd_call(centroids, xyz, payload, radius, nsample,
                            interpret)
    return out, (centroids, xyz, jnp.zeros((), payload.dtype))


def _extract_bwd_rule(radius, nsample, interpret, res, cts):
    centroids, xyz, pay_token = res
    pay_dtype = pay_token.dtype
    dg, _ = cts  # count cotangent is integer/zero
    b, s, _ = centroids.shape
    n = xyz.shape[1]
    c = dg.shape[-1]
    k_t = _slot_tiles(s, n, nsample)
    ct = jnp.swapaxes(centroids, 1, 2)
    pt = jnp.swapaxes(xyz, 1, 2)
    dpay = pl.pallas_call(
        partial(_extract_bwd_kernel, radius * radius, nsample, k_t),
        grid=(b, nsample // k_t),
        in_specs=[
            pl.BlockSpec((1, 3, s), lambda b_, kt: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda b_, kt: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, k_t, c), lambda b_, kt: (b_, 0, kt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda b_, kt: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), pay_dtype),
        scratch_shapes=[pltpu.VMEM((s, n), jnp.float32),
                        pltpu.VMEM((n, c), jnp.float32)],
        interpret=interpret,
    )(ct, pt, dg.astype(pay_dtype))
    return (jnp.zeros_like(centroids), jnp.zeros_like(xyz), dpay)


ball_query_extract.defvjp(_extract_fwd_rule, _extract_bwd_rule)
