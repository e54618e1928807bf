"""Fused set-abstraction grouped-MLP chain (SURVEY.md N2, round 2).

One logical op: ball-query extraction + L x (BatchNorm + ReLU + Dense)
+ max-pool over the group axis, with exact train-mode BatchNorm batch
statistics, as a family of Pallas passes.

Why: the unfused chain materializes [B, S, K, C] grouped tensors in HBM
for every layer, forward and backward — ~60% of the v2 train step on
v5e, most of it HBM traffic (and XLA pads the minor dim to 128 lanes,
so C=32 tensors cost 4x their size). XLA cannot fuse across BatchNorm
batch-statistic reductions: each layer's normalization needs the full
batch's statistics before the next matmul can run, so every layer
round-trips its activation through HBM. Here the chain's only HBM
tensor is the layer-1 preactivation z1 (bf16, written once by the
extraction pass); every later pass re-derives the chain from z1 tiles
inside VMEM, emitting only per-channel statistics, the pooled output,
or parameter gradients.

Pass structure (L = chain depth, typically 3):
  forward:  extract(z1 + stats_0) -> stats_1 .. stats_{L-1} -> pooled
  backward: ties -> R_{L-1} -> {R_j + dW_{j+1}, db_{j+1}} for j<L-1
            -> dz1 -> (d_payload via the one-hot transpose, d_qc)
Each pass reads only z1 (plus O(F^2) weights): the exact-BN sequential
dependency costs L extra streams of one bf16 tensor instead of L
materialized activation tensors.

Numerics match models/layers.ScheduledBatchNorm + flax Dense in bf16:
bf16 preactivations and activations, f32 normalization affine, biased
variance, eps=1e-3, max-pool gradient split equally among ties (jnp
semantics; ties are guaranteed by cyclic slot repetition).

Per-layer parameters enter kernels as one f32 [6, F] "pack":
  row 0: a    = gamma * rsqrt(var + eps)     (fused scale)
  row 1: c    = beta - mu * a                (fused shift)
  row 2: mu   (batch or running mean)
  row 3: r    = rsqrt(var + eps)
  row 4: mdy  = Sum(dy) / M                  (backward only)
  row 5: mdyx = Sum(dy * xhat) / M           (backward only)
so y = z * a + c, xhat = (z - mu) * r, and the train-mode BN backward
is dz = a * (dy - mdy - xhat * mdyx).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from transferable3d_tpu.ops.grouping import _lane_prefix_sum

# Target rows (s_chunk * K) per chain-pass tile: the round-4 stage-4
# sweep measured 2048..16384 flat (±0.1 ms), so the value is fixed; the
# VMEM-budget min() below is what actually binds at wide layers.
_CHAIN_ROWS = 4096
# MB budget for the one-hot build in extraction-style passes — the one
# remaining sweep knob (read at trace time).
_EXTRACT_MB = os.environ.get("T3D_SA_EXTRACT_MB", "")


def _extract_mb(n):
    """One-hot VMEM budget (MB) for extraction-style passes. Round-4
    measured 32 MB OOMing against the 16 MB scoped-VMEM limit at the
    K=128 scale; the round-5 rewrites (lane-prefix-sum rank deleting
    the [N,N] triangular-dot operand, per-group static-slice pooling
    deleting the rep/sel dot operands) freed that headroom: with NO
    scoped-vmem flag, 32 MB tiles compile and win at every stage
    (2026-08-21, /tmp+artifacts r5_recover stage S vs the no-flag
    probe: seg_sa1 30.6->29.2 ms, box_sa1 8.70->8.12, seg_sa2/box_sa2
    flat). Env override for sweeps."""
    if _EXTRACT_MB:
        return int(_EXTRACT_MB)
    return 32
# Test hook: models.pointnet2 passes this as the interpret flag so CPU
# tests can exercise the fused module path (see tests/test_fused_sa.py).
INTERPRET = False


def _f32(x):
    return x.astype(jnp.float32)


def _bf16_round(x):
    """Round f32 -> nearest-even bf16, kept in f32 — IN-KERNEL twin of
    lax.reduce_precision(x, 8, 7), which Mosaic refuses to lower
    (NotImplementedError: reduce_precision, KernelType.TC; hit on the
    first round-4 TPU validation). Bit-twiddled RNE on the u32 view so
    no convert-folding pass can ever elide it (the round-3 trap: a
    bf16 cast consumed only by f32 math is removed by XLA's
    excess-precision pass). Probe-verified on v5e Mosaic: legalizes and
    is bit-exact vs reduce_precision (scripts/probe_bf16_round.py).
    NaN payloads may differ from hardware casts; inputs here are finite.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = (u + jnp.uint32(0x7FFF) + ((u >> jnp.uint32(16)) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def _bf16(x):
    return x.astype(jnp.bfloat16)


def _zero_at_first(*outs):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for o in outs:
            o[:] = jnp.zeros_like(o)


def _chain_all(z1_rows, packs, ws, bs):
    """Recompute the chain from z1 rows.

    packs: list of pack refs (layers 0..d-1); ws/bs: Dense params, ws[i]
    maps h_i -> z_{i+1}. Returns (zs, hs): zs[i]/hs[i] bf16 preact /
    activation of layer i; len(zs) == len(ws) + 1 when ws extends past
    the normalized layers (statistics passes), else len(packs).
    """
    zs, hs = [z1_rows], []
    for i in range(len(packs)):
        a, c = packs[i][0:1, :], packs[i][1:2, :]
        y = _bf16(_f32(zs[i]) * a + c)
        hs.append(jnp.maximum(y, jnp.bfloat16(0)))
        if i < len(ws):
            zs.append(_bf16(jnp.dot(hs[i], _bf16(ws[i][:]),
                                    preferred_element_type=jnp.float32)
                            + bs[i][:]))
    return zs, hs


def _expand_rows(ref, k):
    """[1, S, F] block ref -> f32 [S*k, F] with each row repeated k
    times (row-major match for [S, k]-flattened tiles). bf16 repeats
    and 3-D bf16 broadcasts do not legalize in Mosaic; f32 repeat
    does, and equality against f32-cast bf16 values stays exact."""
    return jnp.repeat(_f32(ref[0]), k, axis=0)


# ---------------------------------------------------------------------------
# Kernels. All passes run on a (B, S/s_chunk) grid over whole-K row
# tiles [s_chunk * K, F]. z1 and dy_0 are stored FLAT as
# [B, S*K*F0/128, 128] bf16 — the natural [B, S, K, F0] layout pads the
# minor dim to 128 lanes in HBM (2-4x the bytes at F0 = 64/32), and
# these two tensors are streamed by every pass.
# ---------------------------------------------------------------------------


def _rank_rows(r2, ct_rows, pt):
    """In-radius ranks for an s-chunk. ct_rows [S_ch, 3] (natural
    layout; 3 lanes pad in VMEM only), pt [3, N] planes. Returns
    rank_m [S_ch, N] f32: 1-based in-radius rank, 0 out of radius,
    patched so the nearest point is the single member of an empty
    ball. Ranks come from a masked lane prefix sum (see
    grouping._lane_prefix_sum) — round 4 retired the [N, N]
    triangular-dot formulation whose 2 MB operand dominated the
    extract-style kernels' per-grid-step overhead."""
    s_ch = ct_rows.shape[0]
    n = pt.shape[-1]
    d2 = jnp.zeros((s_ch, n), jnp.float32)
    for i in range(3):
        diff = ct_rows[:, i:i + 1] - pt[i:i + 1, :]
        d2 = d2 + diff * diff
    within = d2 <= r2
    rank = _lane_prefix_sum(jnp.where(within, 1.0, 0.0))
    count = rank[:, n - 1:n]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (s_ch, n), 1)
    dmin = jnp.min(d2, axis=1, keepdims=True)
    near = jnp.min(jnp.where(d2 <= dmin, iota_n, n), axis=1,
                   keepdims=True)
    empty = count < 0.5
    rank_m = jnp.where(within, rank, 0.0)
    return jnp.where(empty, jnp.where(iota_n == near, 1.0, 0.0), rank_m)


def _onehot_all(rank_m, k):
    """One-hot membership for ALL k slots of an s-chunk: [S_ch*K, N]
    bf16. want = (slot mod eff) + 1 with eff = clip(max rank, 1, k);
    +0.25 numerator bias absorbs Mosaic's reciprocal-division rounding
    (see ops/grouping._want_tile)."""
    s_ch, n = rank_m.shape
    eff = jnp.clip(jnp.max(rank_m, axis=1, keepdims=True), 1.0, float(k))
    slot = jax.lax.broadcasted_iota(jnp.int32, (s_ch, k), 1).astype(
        jnp.float32)
    want = slot - eff * jnp.floor((slot + 0.25) / eff) + 1.0  # [S_ch, K]
    oh3 = jnp.where(rank_m[:, None, :] == want[:, :, None], 1.0, 0.0)
    return oh3.astype(jnp.bfloat16).reshape(s_ch * k, n)


def _extract_kernel(r2, k, f0, ct, pt, pay, qc, z1, sums, sumsq):
    s_ch = ct.shape[1]
    _zero_at_first(sums, sumsq)
    rank_m = _rank_rows(r2, ct[0], pt[0])
    oh = _onehot_all(rank_m, k)                        # [S_ch*K, N]
    g = jnp.dot(oh, pay[0], preferred_element_type=jnp.float32)
    qc_rep = _expand_rows(qc, k)                       # [S_ch*K, F0] f32
    z = _bf16(g) - _bf16(qc_rep)        # bf16 subtract, matching the
    z1[0] = z.reshape(s_ch, k, -1)      # unfused grouped_pf - qc order
    zf = _f32(z)
    sums[:] += jnp.sum(zf, axis=0, keepdims=True)
    sumsq[:] += jnp.sum(zf * zf, axis=0, keepdims=True)


def _split(refs, *counts):
    out, p = [], 0
    for n in counts:
        out.append(list(refs[p:p + n]))
        p += n
    assert p == len(refs), (p, len(refs))
    return out


def _rows(z1_block, f0, k):
    """[S_ch, K, F0] block -> ([rows, F0] view, s_chunk)."""
    s_ch = z1_block.shape[0]
    return z1_block.reshape(s_ch * k, f0), s_ch


# ---------------------------------------------------------------------------
# pallas_call wrappers.
# ---------------------------------------------------------------------------


def _vspec(block, index):
    return pl.BlockSpec(block, index, memory_space=pltpu.VMEM)


def _param_specs(packs, ws, bs):
    const = lambda a: _vspec(a.shape, lambda b_, i: tuple(
        0 for _ in a.shape))
    return [const(x) for x in (*packs, *ws, *bs)]


def _acc_spec(shape):
    """Output accumulated across the whole grid (constant index map)."""
    return (_vspec(shape, lambda b_, i: tuple(0 for _ in shape)),
            jax.ShapeDtypeStruct(shape, jnp.float32))


def _div_chunk(s, s_ch):
    s_ch = max(1, min(s, s_ch))
    while s % s_ch:
        s_ch -= 1
    return s_ch


def _s_chunk(s, k, f_max):
    """Rows per chain tile, bounded by VMEM: ~5 live f32 [rows, F_max]
    intermediates (chain recompute + cascade) must fit ~10 MB."""
    rows = min(_CHAIN_ROWS, max(512, (10 << 20) // (f_max * 4 * 5)))
    return _div_chunk(s, rows // k)


def _s_chunk_extract(s, k, n):
    """s-chunk for extraction passes: the [S_ch, K, N] one-hot build
    (f32 compare + bf16 copy, ~6 B/element transient) must fit the
    _extract_mb(n) budget."""
    return _div_chunk(s, max(1, (_extract_mb(n) << 20) // (k * n * 6)))


def _flat_struct(b, s, k, f0):
    # Natural [B, S, K, F0] storage. A dense flat [B, S*K*F0/128, 128]
    # packing would dodge the 128-lane HBM padding (2-4x bytes at
    # F0 = 64/32), but the required in-kernel repack is a lane-width-
    # changing reshape, which Mosaic cannot lower ("unsupported shape
    # cast" for vector<1024x32> -> vector<256x128>). Round-3 idea: a
    # transposed [B, F0, S*K] layout with a roll-based segment max.
    return jax.ShapeDtypeStruct((b, s, k, f0), jnp.bfloat16)


def _flat_spec(s_ch, k, f0):
    return _vspec((1, s_ch, k, f0), lambda b_, i: (b_, i, 0, 0))


def _geo_specs(s_ch, n):
    return [
        _vspec((1, s_ch, 3), lambda b_, i: (b_, i, 0)),  # centroids
        _vspec((1, 3, n), lambda b_, i: (b_, 0, 0)),     # point planes
    ]


def _call_extract(cent, xyz, pf, qc, radius, nsample, interpret):
    b, s, _ = cent.shape
    n = xyz.shape[1]
    f0 = pf.shape[-1]
    s_ch = _s_chunk_extract(s, nsample, n)
    pt = jnp.swapaxes(xyz, 1, 2)        # [B, 3, N]
    sspec, sshape = _acc_spec((1, f0))
    qspec, qshape = _acc_spec((1, f0))
    z1, sums, sumsq = pl.pallas_call(
        partial(_extract_kernel, radius * radius, nsample, f0),
        grid=(b, s // s_ch),
        in_specs=_geo_specs(s_ch, n) + [
            _vspec((1, n, f0), lambda b_, i: (b_, 0, 0)),
            _vspec((1, s_ch, f0), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=[_flat_spec(s_ch, nsample, f0), sspec, qspec],
        out_shape=[_flat_struct(b, s, nsample, f0), sshape, qshape],
        interpret=interpret,
    )(cent, pt, pf, _bf16(qc))
    return z1, sums[0], sumsq[0]


# ---------------------------------------------------------------------------
# Cached-z schedule (round 3).
#
# The recompute schedule above re-derives the chain from z1 in every
# pass: at depth L the forward runs each chain dot L-i times and every
# backward pass replays the whole forward chain — ~2.7x the minimal
# chain FLOPs at L=3. The planar-layout experiment showed these passes
# are COMPUTE-bound on v5e (halving HBM bytes barely moved pass times),
# so the FLOPs are the cost that matters. This schedule instead stores
# every layer's bf16 preactivation z_i in HBM:
#   forward:  extract(z_0 + stats_0) -> step_1 .. step_{L-1}
#             (step_d reads z_{d-1}, applies pack_{d-1} + Dense_{d-1},
#              WRITES z_d, accumulates stats_d: each dot runs ONCE; the
#              last rows step also emits per-centroid z extrema so
#              `pooled` is an XLA epilogue — planar keeps a pool pass,
#              where the segment-max rolls outprice the saved stream)
#   backward: top (BN-stat sums of layer L-1; rows: stats-only, the
#             next step recomputes the pool grad; planar: also writes
#             dy_{L-1})
#             -> step_j for j = L-2..1 (reads z_j, z_{j+1}, dy_{j+1};
#                computes dz_{j+1} with the now-final mdy/mdyx rows,
#                one cascade dot dz_{j+1} W_j^T + the dW_j dot; writes
#                dy_j)
#             -> step_0 FUSED with the dz1/d_payload scatter: dy_0
#                never reaches HBM; the pass emits onehot^T dy_0 and
#                the slot-multiplicity reductions, and an XLA epilogue
#                assembles d_payload / d_qc once this pass's own BN
#                statistics are known (see _bwd_step0_kernel).
# No forward chain dot is ever replayed; each pass streams at most
# three [rows, F] tensors. Extra HBM vs recompute: z_1..z_{L-1} written
# once + read once or twice — bytes the compute-bound passes can hide.
# ---------------------------------------------------------------------------


def _fwd_step_kernel(k, f_in, f_out, z_prev, pack, w, b, z_next, sums,
                     sumsq):
    """z_{d} = Dense_{d-1}(relu(BN(z_{d-1}))) + stats of z_d."""
    _zero_at_first(sums, sumsq)
    tile, s_ch = _rows(z_prev[0], f_in, k)
    a, c = pack[0:1, :], pack[1:2, :]
    h = jnp.maximum(_bf16(_f32(tile) * a + c), jnp.bfloat16(0))
    z = _bf16(jnp.dot(h, _bf16(w[:]), preferred_element_type=jnp.float32)
              + b[:])
    z_next[0] = z.reshape(s_ch, k, f_out)
    zf = _f32(z)
    sums[:] += jnp.sum(zf, axis=0, keepdims=True)
    sumsq[:] += jnp.sum(zf * zf, axis=0, keepdims=True)


def _fwd_last_kernel(k, f_in, f_out, z_prev, pack, w, b, z_next, sums,
                     sumsq, zmax, zmin):
    """Last cached fwd step (rows): _fwd_step_kernel + per-centroid
    max/min of z_d over the group axis, so the pool pass (a full read
    of the widest z tensor) is replaced by an XLA epilogue:
    pooled = relu(bf16(a*zsel + c)) with zsel = zmax where a > 0 else
    zmin — exact, because bf16 rounding is monotone and the affine map
    is monotone in z per channel, so max_k bf16(a*z_k + c) ==
    bf16(a*(max_k z_k) + c) (min for a < 0; a == 0 gives bf16(c)
    either way)."""
    _zero_at_first(sums, sumsq)
    tile, s_ch = _rows(z_prev[0], f_in, k)
    a, c = pack[0:1, :], pack[1:2, :]
    h = jnp.maximum(_bf16(_f32(tile) * a + c), jnp.bfloat16(0))
    z = _bf16(jnp.dot(h, _bf16(w[:]), preferred_element_type=jnp.float32)
              + b[:])
    z_next[0] = z.reshape(s_ch, k, f_out)
    zf = _f32(z)
    zf3 = zf.reshape(s_ch, k, f_out)
    zmax[0] = jnp.max(zf3, axis=1)
    zmin[0] = jnp.min(zf3, axis=1)
    sums[:] += jnp.sum(zf, axis=0, keepdims=True)
    sumsq[:] += jnp.sum(zf * zf, axis=0, keepdims=True)


def _top_dy_rows(h, pooled, dpooled, k, s_ch, f):
    """Max-pool gradient + relu mask at the top layer (row tiles): each
    s is complete within one tile, so ties are counted in-kernel."""
    pooled_rows = _expand_rows(pooled, k)
    eq = jnp.where(_f32(h) == pooled_rows, 1.0, 0.0)
    ties_rows = jnp.repeat(jnp.sum(eq.reshape(s_ch, k, f), axis=1), k,
                           axis=0)
    dh = _bf16(_f32(_expand_rows(dpooled, k)) * eq
               / jnp.maximum(ties_rows, 1.0))
    return jnp.where(_f32(h) > 0, dh, jnp.bfloat16(0))


def _step_dz_rows(train, top, k, f_j1, ins, pack_j1, s_ch):
    """dz_{j+1} rows for a cached bwd step: BN backward of dy_{j+1}
    (pack_{j+1} rows 4/5 must be final). top=True: dy_{j+1} is
    RECOMPUTED from z_{j+1} + pooled/dpooled instead of read from HBM —
    the stats-only top pass never stored it (saves a write + read of
    the widest dy tensor for one in-VMEM pool-grad redo)."""
    tile_j1, _ = _rows(ins[1][0], f_j1, k)
    a1, mu1, r1 = pack_j1[0:1, :], pack_j1[2:3, :], pack_j1[3:4, :]
    if top:
        pooled, dpooled = ins[2], ins[3]
        c1 = pack_j1[1:2, :]
        h1 = jnp.maximum(_bf16(_f32(tile_j1) * a1 + c1), jnp.bfloat16(0))
        dy1_rows = _top_dy_rows(h1, pooled, dpooled, k, s_ch, f_j1)
    else:
        dy1_rows, _ = _rows(ins[2][0], f_j1, k)
    if train:
        mdy1, mdyx1 = pack_j1[4:5, :], pack_j1[5:6, :]
        xhat1 = (_f32(tile_j1) - mu1) * r1
        return _bf16((_f32(dy1_rows) - mdy1 - xhat1 * mdyx1) * a1)
    return _bf16(_f32(dy1_rows) * a1)


def _bwd_step_kernel(train, top, k, f_j, f_j1, *refs):
    """Backward step at layer 0 < j < depth-1: BN backward of dy_{j+1}
    (see _step_dz_rows), one cascade dot through W_j, relu mask from
    the cached z_j; accumulates dW_j, db_j and layer j's BN-stat sums;
    writes dy_j."""
    (ins, (pack_j, pack_j1, w_j),
     (dy_out, sdy, sdyx, dw, db)) = _split(refs, 4 if top else 3, 3, 5)
    z_j = ins[0]
    _zero_at_first(sdy, sdyx, dw, db)
    tile_j, s_ch = _rows(z_j[0], f_j, k)
    dz1_ = _step_dz_rows(train, top, k, f_j1, ins, pack_j1, s_ch)
    a, c, mu, r = (pack_j[0:1, :], pack_j[1:2, :], pack_j[2:3, :],
                   pack_j[3:4, :])
    h_j = jnp.maximum(_bf16(_f32(tile_j) * a + c), jnp.bfloat16(0))
    dh = _bf16(jnp.dot(dz1_, _bf16(w_j[:]).T,
                       preferred_element_type=jnp.float32))
    dy_j = jnp.where(_f32(h_j) > 0, dh, jnp.bfloat16(0))
    dy_out[0] = dy_j.reshape(s_ch, k, f_j)
    xhat_j = (_f32(tile_j) - mu) * r
    dyf = _f32(dy_j)
    sdy[:] += jnp.sum(dyf, axis=0, keepdims=True)
    sdyx[:] += jnp.sum(dyf * xhat_j, axis=0, keepdims=True)
    dw[:] += jax.lax.dot_general(
        h_j, dz1_, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db[:] += jnp.sum(_f32(dz1_), axis=0, keepdims=True)


def _infer_kernel(r2, k, f0, depth, ct, pt, pay, qc, *refs):
    """Single-pass INFERENCE chain (rows): extract -> L layers -> pool
    entirely in VMEM. Eval mode has no batch-stat barriers (packs are
    built from running stats), so no z tensor ever needs HBM: the pass
    reads geometry + payload once and writes only pooled. Bit-matches
    the multi-pass schedules (same _chain_all math, same pool)."""
    packs, ws, bs, (pooled,) = _split(refs, depth, depth - 1,
                                      depth - 1, 1)
    s_ch = ct.shape[1]
    rank_m = _rank_rows(r2, ct[0], pt[0])
    oh = _onehot_all(rank_m, k)                        # [S_ch*K, N]
    g = jnp.dot(oh, pay[0], preferred_element_type=jnp.float32)
    # g and qc_rep are exactly bf16-valued (one-hot selection of bf16
    # payload; bf16 qc), so the stored-z1 semantics reduce to rounding
    # their f32 difference. The rounding must be elision-proof (a bf16
    # cast consumed only by f32 math is ELIDED — same trap as
    # core/numerics.exact_hi_lo) AND Mosaic-legal (reduce_precision is
    # not): _bf16_round is both.
    z1 = _bf16_round(g - _expand_rows(qc, k))
    _, hs = _chain_all(z1, packs, ws, bs)
    h = hs[-1]
    pooled[0] = jnp.max(h.reshape(s_ch, k, h.shape[-1]), axis=1)


def _infer_kernel_p(r2, k, f0, depth, ct, pt, payt, qc, *refs):
    """Planar twin of _infer_kernel."""
    packs, ws, bs, (pooled,) = _split(refs, depth, depth - 1,
                                      depth - 1, 1)
    s_ch = ct.shape[1]
    rank_m = _rank_rows(r2, ct[0], pt[0])
    oh = _onehot_all(rank_m, k)
    g = jax.lax.dot_general(
        payt[0], oh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [F0, rows]
    # elision-proof in-kernel rounding: see _infer_kernel. Per-group
    # [F0, 1] lane broadcast replaces the qc replication dot.
    qc_t = jnp.swapaxes(_f32(qc[0]), 0, 1)             # [F0, S_ch]
    z1 = _bf16_round(jnp.concatenate(
        [g[:, gg * k:(gg + 1) * k] - qc_t[:, gg:gg + 1]
         for gg in range(s_ch)], axis=1))
    _, hs = _chain_all_p(z1, packs, ws, bs)
    pooled[0] = _pool_groups_t(_f32(hs[-1]), s_ch, k).astype(
        pooled.dtype)


def _call_infer(cent, xyz, pf, qc, radius, nsample, packs, ws, bs,
                planar, interpret):
    b, s, _ = cent.shape
    n = xyz.shape[1]
    f0 = pf.shape[-1]
    f_last = packs[-1].shape[-1]
    depth = len(packs)
    pt = jnp.swapaxes(xyz, 1, 2)
    if planar:
        f_max = max(p_.shape[-1] for p_ in packs)
        s_ch = _s_chunk_p(s, nsample, f_max, n)
        pay = jnp.swapaxes(_bf16(pf), 1, 2)            # [B, F0, N]
        pay_spec = _vspec((1, f0, n), lambda b_, i: (b_, 0, 0))
        params = _param_specs(_pack_planar(packs), ws, _bs_planar(bs))
        p_args = (*_pack_planar(packs), *ws, *_bs_planar(bs))
        kern = _infer_kernel_p
    else:
        s_ch = _s_chunk_extract(s, nsample, n)
        pay = pf
        pay_spec = _vspec((1, n, f0), lambda b_, i: (b_, 0, 0))
        params = _param_specs(packs, ws, bs)
        p_args = (*packs, *ws, *bs)
        kern = _infer_kernel
    return pl.pallas_call(
        partial(kern, radius * radius, nsample, f0, depth),
        grid=(b, s // s_ch),
        in_specs=_geo_specs(s_ch, n) + [
            pay_spec,
            _vspec((1, s_ch, f0), lambda b_, i: (b_, i, 0)),
        ] + params,
        out_specs=_vspec((1, s_ch, f_last), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, f_last), jnp.bfloat16),
        interpret=interpret,
    )(cent, pt, pay, _bf16(qc), *p_args)


def _mult_from_rank(rank_m, k):
    """Slot multiplicity M [S_ch, N] f32 directly from in-radius
    ranks: of the K cyclic slots (want = slot mod eff + 1, see
    _onehot_all) exactly floor((K - rank)/eff) + 1 have want == rank,
    so a point with rank in [1, eff] fills that many slots and
    out-of-radius / rank > eff points fill none. Counts are integers
    <= K (exact in f32), matching the retired rep-matrix segment-sum
    dot over the one-hot bit-for-bit; the +0.25 numerator bias absorbs
    Mosaic's reciprocal-division rounding (ops/grouping._want_tile).
    Round-5 ablation: the rep.oh dot was ~0.5-1 ms/scale at seg-SA1
    (artifacts/r5_measure2.log b0/nomm vs full); this form is
    elementwise."""
    eff = jnp.clip(jnp.max(rank_m, axis=1, keepdims=True), 1.0,
                   float(k))
    # max(., 0) also zeroes rank > eff (floor goes to -1, -2, ... for
    # in-radius points beyond the slot budget when count > K).
    mult = jnp.maximum(
        jnp.floor((float(k) - rank_m + 0.25) / eff) + 1.0, 0.0)
    return jnp.where(rank_m >= 0.5, mult, 0.0)


def _bwd_step0_kernel(train, top, r2, k, f_j, f_j1, *refs):
    """Cached backward step at j = 0, FUSED with the dz1/d_payload
    pass: dy_0 is never stored. Instead of dy_out this pass emits the
    reductions an XLA epilogue combines into d_payload / d_qc once its
    own BN statistics (mdy_0 = Sum dy_0 / M, mdyx_0) are known:

      dz_1 = a0 (dy_0 - mdy_0 - xhat_0 mdyx_0)
      dpf  = onehot^T dz_1
           = a0 (H - cnt mdy_0) - a0 mdyx_0 r0 (cnt pf - Mq - cnt mu_0)
      dqc  = -Sum_k dz_1
           = -a0 (Sdy - K mdy_0 - mdyx_0 r0 (Sz - K mu_0))

    with H = onehot^T dy_0, cnt = onehot^T 1, Mq = M^T qc,
    Sdy = Sum_k dy_0, Sz = Sum_k z_1, using
    onehot^T z_1 = cnt*pf - M^T qc. That identity is exact up to z_1's
    stored bf16-subtraction rounding (well inside the train-grad
    tolerance; the eval-mode backward has no correction terms and uses
    only H/Sdy). Saves the dy_0 stream (write + read) and the retired
    dz1 pass's z_1 re-read; the one-hot build + transpose dot move
    here unchanged."""
    (ins, (ct, pt, qc_t), (pack_j, pack_j1, w_j),
     (sdy, sdyx, dw, db, h_out, mq_out, cnt_out, sdy_s, sz_s),
     (acc_h, acc_mq, acc_cnt)) = _split(
         refs, 4 if top else 3, 3, 3, 9, 3)
    z_j = ins[0]
    _zero_at_first(sdy, sdyx, dw, db)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_h[:] = jnp.zeros_like(acc_h)
        acc_mq[:] = jnp.zeros_like(acc_mq)
        acc_cnt[:] = jnp.zeros_like(acc_cnt)

    tile_j, s_ch = _rows(z_j[0], f_j, k)
    dz1_ = _step_dz_rows(train, top, k, f_j1, ins, pack_j1, s_ch)
    a, c, mu, r = (pack_j[0:1, :], pack_j[1:2, :], pack_j[2:3, :],
                   pack_j[3:4, :])
    h_j = jnp.maximum(_bf16(_f32(tile_j) * a + c), jnp.bfloat16(0))
    dh = _bf16(jnp.dot(dz1_, _bf16(w_j[:]).T,
                       preferred_element_type=jnp.float32))
    dy_j = jnp.where(_f32(h_j) > 0, dh, jnp.bfloat16(0))
    xhat_j = (_f32(tile_j) - mu) * r
    dyf = _f32(dy_j)
    sdy[:] += jnp.sum(dyf, axis=0, keepdims=True)
    sdyx[:] += jnp.sum(dyf * xhat_j, axis=0, keepdims=True)
    dw[:] += jax.lax.dot_general(
        h_j, dz1_, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db[:] += jnp.sum(_f32(dz1_), axis=0, keepdims=True)

    rank_m = _rank_rows(r2, ct[0], pt[0])
    oh = _onehot_all(rank_m, k)                        # [S_ch*K, N]
    acc_h[:] += jax.lax.dot_general(
        oh, dy_j, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [N, F0]
    mm = _mult_from_rank(rank_m, k)                    # [S_ch, N]
    acc_cnt[:] += jnp.sum(mm, axis=0, keepdims=True)
    acc_mq[:] += jax.lax.dot_general(
        _bf16(mm), qc_t[0], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [N, F0]
    sdy_s[0] = jnp.sum(dyf.reshape(s_ch, k, f_j), axis=1)
    sz_s[0] = jnp.sum(_f32(tile_j).reshape(s_ch, k, f_j), axis=1)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        h_out[0] = acc_h[:]
        mq_out[0] = acc_mq[:]
        cnt_out[0] = acc_cnt[:]


def _cached_grid(z_prev, s, k, f_max):
    b = z_prev.shape[0]
    s_ch = _s_chunk(s, k, f_max)
    return (b, s // s_ch), s_ch


def _call_fwd_step(z_prev, s, k, f_in, f_out, pack, w, b_, f_max,
                   interpret):
    b = z_prev.shape[0]
    grid, s_ch = _cached_grid(z_prev, s, k, f_max)
    sspec, sshape = _acc_spec((1, f_out))
    qspec, qshape = _acc_spec((1, f_out))
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    z_next, sums, sumsq = pl.pallas_call(
        partial(_fwd_step_kernel, k, f_in, f_out),
        grid=grid,
        in_specs=[_flat_spec(s_ch, k, f_in), const(pack), const(w),
                  const(b_)],
        out_specs=[_flat_spec(s_ch, k, f_out), sspec, qspec],
        out_shape=[_flat_struct(b, s, k, f_out), sshape, qshape],
        interpret=interpret,
    )(z_prev, pack, w, b_)
    return z_next, sums[0], sumsq[0]


def _call_fwd_last(z_prev, s, k, f_in, f_out, pack, w, b_, f_max,
                   interpret):
    """_call_fwd_step for the final chain layer: also returns f32
    [B, S, F_out] zmax/zmin for the XLA pool epilogue."""
    b = z_prev.shape[0]
    grid, s_ch = _cached_grid(z_prev, s, k, f_max)
    sspec, sshape = _acc_spec((1, f_out))
    qspec, qshape = _acc_spec((1, f_out))
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    mspec = _vspec((1, s_ch, f_out), lambda b__, i: (b__, i, 0))
    mshape = jax.ShapeDtypeStruct((b, s, f_out), jnp.float32)
    z_next, sums, sumsq, zmax, zmin = pl.pallas_call(
        partial(_fwd_last_kernel, k, f_in, f_out),
        grid=grid,
        in_specs=[_flat_spec(s_ch, k, f_in), const(pack), const(w),
                  const(b_)],
        out_specs=[_flat_spec(s_ch, k, f_out), sspec, qspec, mspec,
                   mspec],
        out_shape=[_flat_struct(b, s, k, f_out), sshape, qshape,
                   mshape, mshape],
        interpret=interpret,
    )(z_prev, pack, w, b_)
    return z_next, sums[0], sumsq[0], zmax, zmin


def _pool_epilogue(zmax, zmin, pack):
    """pooled from the last fwd step's z extrema (see _fwd_last_kernel).

    Uses the same fused a/c rows the bwd kernels read, so the result
    bit-matches the retired pool pass (and the kernels' h == pooled
    comparisons)."""
    a, c = pack[0], pack[1]
    ysel = jnp.where(a > 0, a * zmax + c, a * zmin + c)
    return jnp.maximum(ysel.astype(jnp.bfloat16), jnp.bfloat16(0))


def _call_bwd_step(train, top, z_j, z_j1, dy_src, s, k, f_j, f_j1,
                   pack_j, pack_j1, w_j, f_max, interpret):
    """top=False: dy_src is the stored dy_{j+1} [B,S,K,F_j1].
    top=True: dy_src is (pooled, dpooled) [B,S,F_j1] each."""
    b = z_j.shape[0]
    grid, s_ch = _cached_grid(z_j, s, k, f_max)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    if top:
        pooled, dpooled = dy_src
        pspec = _vspec((1, s_ch, f_j1), lambda b__, i: (b__, i, 0))
        extra_specs = [pspec, pspec]
        extra_ins = (pooled, dpooled.astype(jnp.bfloat16))
    else:
        extra_specs = [_flat_spec(s_ch, k, f_j1)]
        extra_ins = (dy_src,)
    out_specs, out_shapes = [_flat_spec(s_ch, k, f_j)], [
        _flat_struct(b, s, k, f_j)]
    for shape in [(1, f_j), (1, f_j), w_j.shape, (1, f_j1)]:
        sp, sh = _acc_spec(shape)
        out_specs.append(sp)
        out_shapes.append(sh)
    return pl.pallas_call(
        partial(_bwd_step_kernel, train, top, k, f_j, f_j1),
        grid=grid,
        in_specs=[_flat_spec(s_ch, k, f_j), _flat_spec(s_ch, k, f_j1)]
        + extra_specs + [const(pack_j), const(pack_j1), const(w_j)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(z_j, z_j1, *extra_ins, pack_j, pack_j1, w_j)


def _call_bwd_step0(train, top, z_j, z_j1, dy_src, cent, xyz, qc, s, k,
                    f_j, f_j1, pack_j, pack_j1, w_j, radius, interpret):
    """j = 0 cached bwd step fused with the dz1 pass (rows). Returns
    (sdy, sdyx, dw, db, H [B,N,F0], Mq [B,N,F0], cnt [B,1,N],
    Sdy [B,S,F0], Sz [B,S,F0]); see _bwd_step0_kernel."""
    b = z_j.shape[0]
    n = xyz.shape[1]
    s_ch = _s_chunk_extract(s, k, n)
    grid = (b, s // s_ch)
    pt = jnp.swapaxes(xyz, 1, 2)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    if top:
        pooled, dpooled = dy_src
        pspec = _vspec((1, s_ch, f_j1), lambda b__, i: (b__, i, 0))
        extra_specs = [pspec, pspec]
        extra_ins = (pooled, dpooled.astype(jnp.bfloat16))
    else:
        extra_specs = [_flat_spec(s_ch, k, f_j1)]
        extra_ins = (dy_src,)
    sspec = _vspec((1, s_ch, f_j), lambda b__, i: (b__, i, 0))
    out_specs, out_shapes = [], []
    for shape in [(1, f_j), (1, f_j), w_j.shape, (1, f_j1)]:
        sp, sh = _acc_spec(shape)
        out_specs.append(sp)
        out_shapes.append(sh)
    perb = lambda shp: (_vspec((1,) + shp, lambda b__, i: (b__,)
                               + tuple(0 for _ in shp)),
                        jax.ShapeDtypeStruct((b,) + shp, jnp.float32))
    for shp in [(n, f_j), (n, f_j), (1, n)]:
        sp, sh = perb(shp)
        out_specs.append(sp)
        out_shapes.append(sh)
    out_specs += [sspec, sspec]
    out_shapes += [jax.ShapeDtypeStruct((b, s, f_j), jnp.float32)] * 2
    return pl.pallas_call(
        partial(_bwd_step0_kernel, train, top, radius * radius, k, f_j,
                f_j1),
        grid=grid,
        in_specs=[_flat_spec(s_ch, k, f_j), _flat_spec(s_ch, k, f_j1)]
        + extra_specs
        + _geo_specs(s_ch, n)
        + [_vspec((1, s_ch, f_j), lambda b__, i: (b__, i, 0))]
        + [const(pack_j), const(pack_j1), const(w_j)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((n, f_j), jnp.float32),
                        pltpu.VMEM((n, f_j), jnp.float32),
                        pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(z_j, z_j1, *extra_ins, cent, pt, _bf16(qc), pack_j,
      pack_j1, w_j)


# ---------------------------------------------------------------------------
# Cached-z schedule, PLANAR storage (round 3, second pass).
#
# The cached schedule's passes are few-FLOP streamers: each reads 1-3 z
# tensors and does one or two chain dots. In the row-major [B, S, K, F]
# layout those streams pay the 128-lane HBM padding (2-4x the bytes at
# F = 64/32) — the dominant cost once the redundant recompute FLOPs are
# gone. These twins store z/dy as dense planar [B, F, S*K] instead; the
# chain dots contract over full 4096-lane tiles, and only the pool /
# ties / broadcast ops pay the planar tax (segment rolls + replication
# dots), which amortizes at seg-SA1 row counts (S*K >= 4096) — the same
# per-scale layout rule as the recompute planar family.
# ---------------------------------------------------------------------------


def _fwd_step_kernel_cp(k, f_in, f_out, z_prev, pack, w, b, z_next,
                        sums, sumsq):
    """Planar cached fwd step: z_{d} = Dense(relu(BN(z_{d-1}))) + stats.

    pack [F_in, 6] planar; w [F_in, F_out] raw; b [F_out, 1]."""
    _zero_at_first(sums, sumsq)
    a, c = pack[:, 0:1], pack[:, 1:2]
    h = jnp.maximum(_bf16(_f32(z_prev[0]) * a + c), jnp.bfloat16(0))
    z = _bf16(jax.lax.dot_general(
        _bf16(w[:]), h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b[:])
    z_next[0] = z
    zf = _f32(z)
    sums[:] += jnp.sum(zf, axis=1, keepdims=True)
    sumsq[:] += jnp.sum(zf * zf, axis=1, keepdims=True)


def _fwd_pool_ymax_kernel_cp(k, f, z_last, pack, pooled, ymax):
    """Pool variant for the fused planar top: a per-group static-slice
    max over the PRE-relu, PRE-rounding y = f32(z)*a + c yields both
      pooled = relu(bf16(max y))   — EXACT (monotone rounding: equals
                                     max over relu(bf16(y)); the bwd
                                     kernels' h == pooled tests rely
                                     on bit-exactness), and
      ymax   = max y (exact f32)   — for the XLA top-stat epilogue's
                                     z recovery (ymax - c)/a.
    Static slice maxes replaced the round-3 log2(K) lane-roll segment
    max + hi/lo selection dots in round 5: 0.575 vs 1.683 ms at
    seg-SA1 scale b on-chip (artifacts/r5_ablate_run*.log — the rolls
    were the cost), and the slice form is exact f32, so no hi/lo
    split is needed at all (pooled = bf16(ym) is the old hi part
    bit-for-bit; ymax drops the old lo-term rounding)."""
    s_ch = ymax.shape[1]
    a, c = pack[:, 0:1], pack[:, 1:2]
    y = _f32(z_last[0]) * a + c
    ym_t = _pool_groups_t(y, s_ch, k)                  # [S_ch, F] f32
    pooled[0] = jnp.maximum(_bf16(ym_t), jnp.bfloat16(0))
    ymax[0] = ym_t


def _top_dy_cols(h, pooled, dpooled, k, s_ch):
    """Planar twin of _top_dy_rows: per-group static K-slices with
    [F, 1] lane broadcasts — ties counted by a slice sum instead of
    the retired rep-matrix segment dot, and the pooled/dpooled
    replication dots become free lane broadcasts (the same
    slices-beat-dots result as _pool_groups_t). Values are identical:
    eq/ties are exact integers and the f32 mul/div operands match the
    dot form elementwise."""
    pooled_t = jnp.swapaxes(_f32(pooled[0]), 0, 1)     # [F, S_ch]
    dpooled_t = jnp.swapaxes(_f32(dpooled[0]), 0, 1)   # [F, S_ch]
    hf = _f32(h)
    parts = []
    for g in range(s_ch):
        h_g = hf[:, g * k:(g + 1) * k]
        eq_g = jnp.where(h_g == pooled_t[:, g:g + 1], 1.0, 0.0)
        ties_g = jnp.sum(eq_g, axis=1, keepdims=True)
        parts.append(dpooled_t[:, g:g + 1] * eq_g
                     / jnp.maximum(ties_g, 1.0))
    dh = _bf16(jnp.concatenate(parts, axis=1))
    return jnp.where(hf > 0, dh, jnp.bfloat16(0))


def _step_dz_cols(train, top, k, ins, pack_j1):
    """Planar twin of _step_dz_rows."""
    z_j1 = ins[1]
    a1, mu1, r1 = pack_j1[:, 0:1], pack_j1[:, 2:3], pack_j1[:, 3:4]
    if top:
        pooled, dpooled = ins[2], ins[3]
        c1 = pack_j1[:, 1:2]
        h1 = jnp.maximum(_bf16(_f32(z_j1[0]) * a1 + c1), jnp.bfloat16(0))
        dy1_cols = _top_dy_cols(h1, pooled, dpooled, k, pooled.shape[1])
    else:
        dy1_cols = ins[2][0]
    if train:
        mdy1, mdyx1 = pack_j1[:, 4:5], pack_j1[:, 5:6]
        xhat1 = (_f32(z_j1[0]) - mu1) * r1
        return _bf16((_f32(dy1_cols) - mdy1 - xhat1 * mdyx1) * a1)
    return _bf16(_f32(dy1_cols) * a1)


def _bwd_step_kernel_cp(train, top, k, f_j, f_j1, *refs):
    """Planar cached backward step at j < depth-1 (see row-major twin)."""
    (ins, (pack_j, pack_j1, w_j),
     (dy_out, sdy, sdyx, dw, db)) = _split(refs, 4 if top else 3, 3, 5)
    z_j = ins[0]
    _zero_at_first(sdy, sdyx, dw, db)
    dz1_ = _step_dz_cols(train, top, k, ins, pack_j1)
    a, c, mu, r = (pack_j[:, 0:1], pack_j[:, 1:2], pack_j[:, 2:3],
                   pack_j[:, 3:4])
    h_j = jnp.maximum(_bf16(_f32(z_j[0]) * a + c), jnp.bfloat16(0))
    dh = _bf16(jax.lax.dot_general(
        _bf16(w_j[:]), dz1_, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dy_j = jnp.where(_f32(h_j) > 0, dh, jnp.bfloat16(0))
    dy_out[0] = dy_j
    xhat_j = (_f32(z_j[0]) - mu) * r
    dyf = _f32(dy_j)
    sdy[:] += jnp.sum(dyf, axis=1, keepdims=True)
    sdyx[:] += jnp.sum(dyf * xhat_j, axis=1, keepdims=True)
    dw[:] += jax.lax.dot_general(
        h_j, dz1_, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [F_j, F_{j+1}]
    db[:] += jnp.sum(_f32(dz1_), axis=1, keepdims=True)


def _bwd_step0_kernel_cp(train, top, r2, k, f_j, f_j1, *refs):
    """Planar twin of _bwd_step0_kernel (j = 0 step fused with the dz1
    pass); accumulator orientation is [F, 1] / lane reductions."""
    (ins, (ct, pt, qc_t), (pack_j, pack_j1, w_j),
     (sdy, sdyx, dw, db, h_out, mq_out, cnt_out, sdy_s, sz_s),
     (acc_h, acc_mq, acc_cnt)) = _split(
         refs, 4 if top else 3, 3, 3, 9, 3)
    z_j = ins[0]
    _zero_at_first(sdy, sdyx, dw, db)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_h[:] = jnp.zeros_like(acc_h)
        acc_mq[:] = jnp.zeros_like(acc_mq)
        acc_cnt[:] = jnp.zeros_like(acc_cnt)

    s_ch = ct.shape[1]
    dz1_ = _step_dz_cols(train, top, k, ins, pack_j1)
    a, c, mu, r = (pack_j[:, 0:1], pack_j[:, 1:2], pack_j[:, 2:3],
                   pack_j[:, 3:4])
    h_j = jnp.maximum(_bf16(_f32(z_j[0]) * a + c), jnp.bfloat16(0))
    dh = _bf16(jax.lax.dot_general(
        _bf16(w_j[:]), dz1_, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dy_j = jnp.where(_f32(h_j) > 0, dh, jnp.bfloat16(0))
    xhat_j = (_f32(z_j[0]) - mu) * r
    dyf = _f32(dy_j)
    sdy[:] += jnp.sum(dyf, axis=1, keepdims=True)
    sdyx[:] += jnp.sum(dyf * xhat_j, axis=1, keepdims=True)
    dw[:] += jax.lax.dot_general(
        h_j, dz1_, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db[:] += jnp.sum(_f32(dz1_), axis=1, keepdims=True)

    rank_m = _rank_rows(r2, ct[0], pt[0])
    oh = _onehot_all(rank_m, k)                        # [S_ch*K, N]
    # Scatter + multiplicity accumulators in [F0, N] orientation: the
    # planar dy_j already has F0 on sublanes, so dy.oh needs no
    # operand relayout and the output keeps all 128 lanes live
    # (N = 1024) instead of F0 <= 64; the caller transposes once in
    # XLA. Round-5 ablation: see artifacts/r5_measure*.log b0/accht.
    acc_h[:] += jax.lax.dot_general(
        dy_j, oh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [F0, N]
    mm = _mult_from_rank(rank_m, k)                    # [S_ch, N]
    acc_cnt[:] += jnp.sum(mm, axis=0, keepdims=True)
    acc_mq[:] += jax.lax.dot_general(
        qc_t[0], _bf16(mm), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [F0, N]
    rep = _rep_matrix(s_ch, k)
    sdy_s[0] = jax.lax.dot_general(
        rep, dy_j, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [S_ch, F0]
    sz_s[0] = jax.lax.dot_general(
        rep, z_j[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        h_out[0] = acc_h[:]
        mq_out[0] = acc_mq[:]
        cnt_out[0] = acc_cnt[:]


def _s_chunk_cp(s, k, f_max):
    """Planar cached chunk: chain VMEM budget + (s_ch * k) % 128 == 0."""
    s_ch = _s_chunk(s, k, f_max)
    while (s_ch * k) % 128 and s_ch > 1:
        s_ch -= 1
    while s % s_ch:
        s_ch -= 1
    assert (s_ch * k) % 128 == 0, (s, k, s_ch)
    return s_ch


def _call_fwd_step_cp(z_prev, s, k, f_in, f_out, pack, w, b_, f_max,
                      interpret):
    b = z_prev.shape[0]
    s_ch = _s_chunk_cp(s, k, f_max)
    grid = (b, s // s_ch)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    packp, bp = jnp.swapaxes(pack, 0, 1), b_[:, None]
    sspec, sshape = _acc_spec_p((f_out, 1))
    qspec, qshape = _acc_spec_p((f_out, 1))
    z_next, sums, sumsq = pl.pallas_call(
        partial(_fwd_step_kernel_cp, k, f_in, f_out),
        grid=grid,
        in_specs=[_planar_spec(s_ch, k, f_in), const(packp), const(w),
                  const(bp)],
        out_specs=[_planar_spec(s_ch, k, f_out), sspec, qspec],
        out_shape=[_planar_struct(b, s, k, f_out), sshape, qshape],
        interpret=interpret,
    )(z_prev, packp, w, bp)
    return z_next, sums[:, 0], sumsq[:, 0]


def _call_fwd_pool_ymax_cp(z_last, s, k, f, pack, f_max, interpret):
    """Planar pool for the fused top: returns (pooled bf16, ymax f32)."""
    b = z_last.shape[0]
    s_ch = _s_chunk_cp(s, k, f_max)
    grid = (b, s // s_ch)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    packp = jnp.swapaxes(pack, 0, 1)
    ospec = lambda dt: _vspec((1, s_ch, f), lambda b__, i: (b__, i, 0))
    return pl.pallas_call(
        partial(_fwd_pool_ymax_kernel_cp, k, f),
        grid=grid,
        in_specs=[_planar_spec(s_ch, k, f), const(packp)],
        out_specs=[ospec(None), ospec(None)],
        out_shape=[jax.ShapeDtypeStruct((b, s, f), jnp.bfloat16),
                   jax.ShapeDtypeStruct((b, s, f), jnp.float32)],
        interpret=interpret,
    )(z_last, packp)


def _call_bwd_step_cp(train, top, z_j, z_j1, dy_src, s, k, f_j, f_j1,
                      pack_j, pack_j1, w_j, f_max, interpret):
    b = z_j.shape[0]
    s_ch = _s_chunk_cp(s, k, f_max)
    grid = (b, s // s_ch)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    if top:
        pooled, dpooled = dy_src
        pspec = _vspec((1, s_ch, f_j1), lambda b__, i: (b__, i, 0))
        extra_specs = [pspec, pspec]
        extra_ins = (pooled, dpooled.astype(jnp.bfloat16))
    else:
        extra_specs = [_planar_spec(s_ch, k, f_j1)]
        extra_ins = (dy_src,)
    out_specs, out_shapes = [_planar_spec(s_ch, k, f_j)], [
        _planar_struct(b, s, k, f_j)]
    for shape in [(f_j, 1), (f_j, 1), w_j.shape, (f_j1, 1)]:
        sp, sh = _acc_spec_p(shape)
        out_specs.append(sp)
        out_shapes.append(sh)
    packjp = jnp.swapaxes(pack_j, 0, 1)
    packj1p = jnp.swapaxes(pack_j1, 0, 1)
    dy, sdy, sdyx, dw, db = pl.pallas_call(
        partial(_bwd_step_kernel_cp, train, top, k, f_j, f_j1),
        grid=grid,
        in_specs=[_planar_spec(s_ch, k, f_j), _planar_spec(s_ch, k, f_j1)]
        + extra_specs + [const(packjp), const(packj1p), const(w_j)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(z_j, z_j1, *extra_ins, packjp, packj1p, w_j)
    return dy, sdy[None, :, 0], sdyx[None, :, 0], dw, db[None, :, 0]


def _call_bwd_step0_cp(train, top, z_j, z_j1, dy_src, cent, xyz, qc, s,
                       k, f_j, f_j1, pack_j, pack_j1, w_j, radius,
                       f_max, interpret):
    """Planar j = 0 cached bwd step fused with the dz1 pass; returns
    the same tuple as _call_bwd_step0 (rows conventions)."""
    b = z_j.shape[0]
    n = xyz.shape[1]
    s_ch = _s_chunk_p(s, k, f_max, n)
    grid = (b, s // s_ch)
    pt = jnp.swapaxes(xyz, 1, 2)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    if top:
        pooled, dpooled = dy_src
        pspec = _vspec((1, s_ch, f_j1), lambda b__, i: (b__, i, 0))
        extra_specs = [pspec, pspec]
        extra_ins = (pooled, dpooled.astype(jnp.bfloat16))
    else:
        extra_specs = [_planar_spec(s_ch, k, f_j1)]
        extra_ins = (dy_src,)
    sspec = _vspec((1, s_ch, f_j), lambda b__, i: (b__, i, 0))
    out_specs, out_shapes = [], []
    for shape in [(f_j, 1), (f_j, 1), w_j.shape, (f_j1, 1)]:
        sp, sh = _acc_spec_p(shape)
        out_specs.append(sp)
        out_shapes.append(sh)
    perb = lambda shp: (_vspec((1,) + shp, lambda b__, i: (b__,)
                               + tuple(0 for _ in shp)),
                        jax.ShapeDtypeStruct((b,) + shp, jnp.float32))
    # h/mq accumulate [F0, N] in-kernel (full MXU lanes, no operand
    # relayout); the rows-convention [B, N, F0] the epilogue expects
    # is restored by one XLA transpose below.
    for shp in [(f_j, n), (f_j, n), (1, n)]:
        sp, sh = perb(shp)
        out_specs.append(sp)
        out_shapes.append(sh)
    out_specs += [sspec, sspec]
    out_shapes += [jax.ShapeDtypeStruct((b, s, f_j), jnp.float32)] * 2
    packjp = jnp.swapaxes(pack_j, 0, 1)
    packj1p = jnp.swapaxes(pack_j1, 0, 1)
    (sdy, sdyx, dw, db, h_acc, mq, cnt, sdy_s, sz_s) = pl.pallas_call(
        partial(_bwd_step0_kernel_cp, train, top, radius * radius, k,
                f_j, f_j1),
        grid=grid,
        in_specs=[_planar_spec(s_ch, k, f_j), _planar_spec(s_ch, k, f_j1)]
        + extra_specs
        + _geo_specs(s_ch, n)
        + [_vspec((1, s_ch, f_j), lambda b__, i: (b__, i, 0))]
        + [const(packjp), const(packj1p), const(w_j)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((f_j, n), jnp.float32),
                        pltpu.VMEM((f_j, n), jnp.float32),
                        pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(z_j, z_j1, *extra_ins, cent, pt, _bf16(qc), packjp,
      packj1p, w_j)
    return (sdy[None, :, 0], sdyx[None, :, 0], dw, db[None, :, 0],
            jnp.swapaxes(h_acc, 1, 2), jnp.swapaxes(mq, 1, 2), cnt,
            sdy_s, sz_s)


# ---------------------------------------------------------------------------
# Planar-layout kernel family (round 3).
#
# z tensors stored TRANSPOSED: [B, F, S*K] with the row axis on lanes.
# Why: the natural [B, S, K, F] layout pads F < 128 to 128 HBM lanes
# (2-4x the bytes at F = 64/32), and every pass streams these tensors —
# at the seg-SA1 scales (S*K = 4k-16k rows, F0 <= 64) the padding is
# the single biggest cost. Planar storage is fully dense (S*K is a
# lane multiple) and the chain dots contract with full 4096-wide lane
# tiles. The costs of the layout (measured in round 2): per-group
# reductions become lane-segment ops (log2 K rolls for the max), and
# every [S]->[S*K] broadcast becomes a replication DOT — cheap at
# seg-SA1 shapes, a regression at sa2/box shapes (S*K <= 2048), hence
# the per-scale `layout` choice on fused_grouped_chain.
# ---------------------------------------------------------------------------


def _rep_matrix(s_ch, k, dtype=jnp.bfloat16):
    """R [S_ch, S_ch*K]: R[s, l] = 1 iff l // K == s (group broadcast /
    segment-sum operator; K is a power of two so // lowers to a shift)."""
    lane_group = jax.lax.broadcasted_iota(
        jnp.int32, (s_ch, s_ch * k), 1) // k
    row = jax.lax.broadcasted_iota(jnp.int32, (s_ch, s_ch * k), 0)
    return jnp.where(lane_group == row, 1.0, 0.0).astype(dtype)


def _chain_all_p(z1_cols, packs, ws, bs):
    """Planar twin of _chain_all: z/h as [F, rows] columns.

    packs are [F, 6] (planar orientation); ws[i] [F_i, F_{i+1}] raw;
    bs[i] [F_{i+1}, 1]."""
    zs, hs = [z1_cols], []
    for i in range(len(packs)):
        a, c = packs[i][:, 0:1], packs[i][:, 1:2]
        y = _bf16(_f32(zs[i]) * a + c)
        hs.append(jnp.maximum(y, jnp.bfloat16(0)))
        if i < len(ws):
            z_next = jax.lax.dot_general(
                _bf16(ws[i][:]), hs[i],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bs[i][:]
            zs.append(_bf16(z_next))
    return zs, hs


def _pool_groups_t(y, s_ch, k):
    """Segmented lane max [F, S_ch*K] -> [S_ch, F] via one static
    jnp.max per K-group, a lane concat and a transpose. Measured 3x
    cheaper than the retired roll+selection-dot form (0.575 vs
    1.683 ms, seg-SA1 scale b) and exact in f32."""
    parts = [jnp.max(y[:, g * k:(g + 1) * k], axis=1, keepdims=True)
             for g in range(s_ch)]
    return jnp.swapaxes(jnp.concatenate(parts, axis=1), 0, 1)


def _extract_kernel_p(r2, k, f0, ct, pt, payt, qc, z1, sums, sumsq):
    s_ch = ct.shape[1]
    _zero_at_first(sums, sumsq)
    rank_m = _rank_rows(r2, ct[0], pt[0])
    oh = _onehot_all(rank_m, k)                        # [S_ch*K, N]
    g = jax.lax.dot_general(
        payt[0], oh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [F0, rows]
    # per-group [F0, 1] lane broadcast replaces the qc replication dot
    qc_t = jnp.swapaxes(qc[0], 0, 1)                   # [F0, S_ch] bf16
    z = jnp.concatenate(
        [_bf16(g[:, gg * k:(gg + 1) * k]) - qc_t[:, gg:gg + 1]
         for gg in range(s_ch)], axis=1)
    z1[0] = z
    zf = _f32(z)
    sums[:] += jnp.sum(zf, axis=1, keepdims=True)
    sumsq[:] += jnp.sum(zf * zf, axis=1, keepdims=True)


# --- planar pallas_call wrappers -------------------------------------------


def _planar_struct(b, s, k, f0):
    return jax.ShapeDtypeStruct((b, f0, s * k), jnp.bfloat16)


def _planar_spec(s_ch, k, f0):
    return _vspec((1, f0, s_ch * k), lambda b_, i: (b_, 0, i))


def _acc_spec_p(shape):
    return (_vspec(shape, lambda b_, i: tuple(0 for _ in shape)),
            jax.ShapeDtypeStruct(shape, jnp.float32))


def _s_chunk_p(s, k, f_max, n):
    """Planar chunk: bounded by both the chain budget and the one-hot
    build budget (extract/bwd_dz1 reuse it), and rows % 128 == 0."""
    s_ch = min(_s_chunk(s, k, f_max), _s_chunk_extract(s, k, n))
    while (s_ch * k) % 128 and s_ch > 1:
        s_ch -= 1
    while s % s_ch:
        s_ch -= 1
    assert (s_ch * k) % 128 == 0, (s, k, s_ch)
    return s_ch


def _pack_planar(packs):
    return [jnp.swapaxes(p_, 0, 1) for p_ in packs]


def _bs_planar(bs):
    return [b_[:, None] for b_ in bs]


def _call_extract_p(cent, xyz, pf, qc, radius, nsample, f_max,
                    interpret):
    b, s, _ = cent.shape
    n = xyz.shape[1]
    f0 = pf.shape[-1]
    s_ch = _s_chunk_p(s, nsample, f_max, n)
    pt = jnp.swapaxes(xyz, 1, 2)
    payt = jnp.swapaxes(_bf16(pf), 1, 2)               # [B, F0, N]
    sspec, sshape = _acc_spec_p((f0, 1))
    qspec, qshape = _acc_spec_p((f0, 1))
    z1, sums, sumsq = pl.pallas_call(
        partial(_extract_kernel_p, radius * radius, nsample, f0),
        grid=(b, s // s_ch),
        in_specs=_geo_specs(s_ch, n) + [
            _vspec((1, f0, n), lambda b_, i: (b_, 0, 0)),
            _vspec((1, s_ch, f0), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=[_planar_spec(s_ch, nsample, f0), sspec, qspec],
        out_shape=[_planar_struct(b, s, nsample, f0), sshape, qshape],
        interpret=interpret,
    )(cent, pt, payt, _bf16(qc))
    return z1, sums[:, 0], sumsq[:, 0]


# ---------------------------------------------------------------------------
# Public op with custom VJP.
# ---------------------------------------------------------------------------


def _make_pack(gamma, beta, mu, var, eps, mdy=None, mdyx=None):
    r = jax.lax.rsqrt(var + eps)
    a = gamma * r
    c = beta - mu * a
    z = jnp.zeros_like(a)
    return jnp.stack([a, c, mu, r,
                      z if mdy is None else mdy,
                      z if mdyx is None else mdyx]).astype(jnp.float32)


def _fwd_impl(new_xyz, xyz, pf, qc, gammas, betas, ws, bs, radius,
              nsample, eps, train, running, interpret, layout="rows",
              with_residuals=True):
    depth = len(gammas)
    # Depth-1 chains would leave dy0 unset in the backward cascade
    # (the j==0 pass doubles as the j==depth-1 pass); no SA config uses
    # one, so reject instead of special-casing.
    assert depth >= 2, "fused_grouped_chain requires chain depth >= 2"
    assert layout in ("rows", "planar"), layout
    # bf16 contract (see fused_grouped_chain docstring): a non-bf16
    # pf/qc silently desyncs the stored-z1 semantics from callers'
    # unfused formulations.
    assert pf.dtype == jnp.bfloat16, pf.dtype
    assert qc.dtype == jnp.bfloat16, qc.dtype
    b, s, _ = new_xyz.shape
    k = nsample
    f_max = max(g.shape[0] for g in gammas)
    planar = layout == "planar"
    if not train and not with_residuals:
        # Inference fast path: packs from running stats, one kernel.
        packs = [_make_pack(gammas[d], betas[d], *running[d], eps)
                 for d in range(depth)]
        pooled = _call_infer(new_xyz, xyz, pf, qc, radius, nsample,
                             packs, ws, bs, planar, interpret)
        means = [running[d][0] for d in range(depth)]
        variances = [running[d][1] for d in range(depth)]
        return pooled, means, variances, (), packs, ()
    if planar:
        z1, s0, q0 = _call_extract_p(new_xyz, xyz, pf, qc, radius,
                                     nsample, f_max, interpret)
    else:
        z1, s0, q0 = _call_extract(new_xyz, xyz, pf, qc, radius,
                                   nsample, interpret)
    m = b * s * k

    def stat(sums, sumsq):
        mu = sums / m
        return mu, sumsq / m - mu * mu

    means, variances, packs = [], [], []
    zs = [z1]
    sums, sumsq = s0, q0
    zmax = zmin = None
    for d in range(depth):
        mu, var = stat(sums, sumsq) if train else running[d]
        means.append(mu)
        variances.append(var)
        packs.append(_make_pack(gammas[d], betas[d], mu, var, eps))
        if d < depth - 1:
            f_in = gammas[d].shape[0]
            f_out = gammas[d + 1].shape[0]
            if d == depth - 2 and not planar:
                # Rows: the last step also emits z extrema so the
                # pool pass (full z_last read) becomes an XLA
                # epilogue. Planar keeps the pool pass: its segment
                # max needs log2(K) roll+max sweeps, and two of
                # them (max AND min, the affine sign being unknown
                # until the stats land) cost more than the saved
                # stream.
                z_next, sums, sumsq, zmax, zmin = _call_fwd_last(
                    zs[d], s, k, f_in, f_out, packs[d], ws[d],
                    bs[d], f_max, interpret)
            else:
                step = _call_fwd_step_cp if planar else _call_fwd_step
                z_next, sums, sumsq = step(
                    zs[d], s, k, f_in, f_out, packs[d], ws[d],
                    bs[d], f_max, interpret)
            zs.append(z_next)
    if planar:
        pooled, ymax = _call_fwd_pool_ymax_cp(
            zs[-1], s, k, gammas[-1].shape[0], packs[-1], f_max,
            interpret)
        pool_aux = (ymax,)
    else:
        pooled = _pool_epilogue(zmax, zmin, packs[-1])
        pool_aux = (zmax, zmin)
    return pooled, means, variances, tuple(zs), packs, pool_aux


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 13, 14))
def fused_grouped_chain(new_xyz, xyz, pf, qc, gammas, betas, ws, bs,
                        radius, nsample, eps, train, running,
                        interpret=False, layout="rows"):
    """Fused ball-query + grouped-MLP chain + max-pool (one SA scale).

    Args: new_xyz [B,S,3] f32 centroids; xyz [B,N,3] f32 points;
    pf [B,N,F0] bf16 layer-1 preactivations (dense_0 applied to all
    points); qc [B,S,F0] *bf16* centroid correction (dense_0 kernel
    applied to centroids, bias-free). pf AND qc must be bf16: the
    kernels store z1 = bf16_round(pf - qc), which equals the unfused
    bf16 subtraction only when both operands are bf16-valued (an f32 qc
    desyncs z1 from any unfused twin by one rounding — measured ~10%
    rel on dpf through ReLU/pool tie flips; scripts/diag_rows_pf2.py).
    gammas/betas: BN affine params per layer;
    ws/bs: dense_1..dense_{L-1} params; running: ((mean, var), ...) for
    eval mode (train=False); layout: "rows" ([B,S,K,F] z storage) or
    "planar" ([B,F,S*K] dense transposed storage — see the planar
    section header for when each wins; requires (S*K) % 128 == 0).

    Returns (pooled [B,S,F_last] bf16, means, variances) — the batch
    statistics (train mode) for the caller's running-average update;
    their cotangents are ignored (flax variable-update semantics).

    Semantics match the unfused GroupedPointMLP stack exactly up to f32
    reduction order; gradient w.r.t. the discrete selection geometry is
    zero (as in the reference CUDA op).
    """
    # Primal (not under grad): eval mode takes the single-pass fused
    # inference kernel — no batch-stat barriers, no z tensor in HBM.
    # Under jax.grad the custom VJP routes through _fgc_fwd instead,
    # which keeps the multi-pass schedule and its residuals.
    pooled, means, variances, _, _, _ = _fwd_impl(
        new_xyz, xyz, pf, qc, gammas, betas, ws, bs, radius, nsample,
        eps, train, running, interpret, layout, with_residuals=False)
    return pooled, tuple(means), tuple(variances)


def _fgc_fwd(new_xyz, xyz, pf, qc, gammas, betas, ws, bs, radius,
             nsample, eps, train, running, interpret, layout):
    pooled, means, variances, zs, packs, pool_aux = _fwd_impl(
        new_xyz, xyz, pf, qc, gammas, betas, ws, bs, radius, nsample,
        eps, train, running, interpret, layout)
    # pf/qc ride along for the cached schedule's fused j=0 step (qc
    # feeds the in-kernel M^T qc dot, pf the XLA dz1 epilogue); they
    # are op inputs, so this adds no residual memory. pool_aux carries
    # the pool extrema for the XLA top-stat epilogue ([B,S,F]-sized).
    res = (new_xyz, xyz, zs, pooled, tuple(packs), ws, bs, pf, qc,
           running, pool_aux)
    return (pooled, tuple(means), tuple(variances)), res


def _fgc_bwd(radius, nsample, eps, train, interpret, layout, res, cts):
    (new_xyz, xyz, zs, pooled, packs, ws, bs, pf_res, qc_res,
     running, pool_aux) = res
    dpooled = cts[0]  # stats cotangents ignored (variable updates)
    depth = len(packs)
    b, s = pooled.shape[:2]
    k = nsample
    f_max = max(p_.shape[-1] for p_ in packs)
    m = b * s * k
    planar = layout == "planar"
    packs = list(packs)
    dgammas, dbetas = [None] * depth, [None] * depth
    dws, dbs = [None] * (depth - 1), [None] * (depth - 1)
    fdims = [p_.shape[-1] for p_ in packs]
    step = _call_bwd_step_cp if planar else _call_bwd_step
    # The top layer's BN-stat sums come from an XLA epilogue over
    # the pool extrema (no kernel pass, no stored dy_{L-1}; the
    # j = depth-2 step redoes the pool grad in-VMEM). Exact for
    # sdy; sdyx recovers the argmax row's z from pool_aux — exact
    # for rows (true z extrema), one f32 divide away for planar.
    # Subgradient caveat (advisor, round 3): on bf16-rounding TIES
    # (several rows' bf16 h equal to pooled) — and for a == 0
    # channels, where zmin stands in regardless — this epilogue
    # attributes the whole pool cotangent to the single z-extremum
    # row, while the j = depth-2 in-kernel pool-grad redo
    # tie-splits dy among all tied rows. Both are valid
    # subgradients of max, so gradients can differ at tied rows
    # (parity tests pass at 2% rel tol).
    dy_next = None
    h_acc = mq = cnt = sdy_s = sz_s = None
    for j in range(depth - 1, -1, -1):
        if j == depth - 1:
            aL, cL = packs[j][0], packs[j][1]
            muL, rL = packs[j][2], packs[j][3]
            if planar:
                (ymax,) = pool_aux
                zsel = (ymax - cL) / jnp.where(aL == 0.0, 1.0, aL)
            else:
                zmax, zmin = pool_aux
                zsel = jnp.where(aL > 0, zmax, zmin)
            mask = _f32(pooled) > 0
            dyp = jnp.where(mask, _f32(dpooled), 0.0)
            sdy = jnp.sum(dyp, axis=(0, 1))[None]
            sdyx = jnp.sum(dyp * ((zsel - muL) * rL),
                           axis=(0, 1))[None]
        else:
            at_top = j == depth - 2
            dy_src = (pooled, dpooled) if at_top else dy_next
            if j == 0:
                # Final step fused with the dz1/d_payload pass:
                # dy_0 never reaches HBM (see _bwd_step0_kernel).
                if planar:
                    (sdy, sdyx, dws[j], dbs_, h_acc, mq, cnt,
                     sdy_s, sz_s) = _call_bwd_step0_cp(
                        train, at_top, zs[j], zs[j + 1], dy_src,
                        new_xyz, xyz, qc_res, s, k, fdims[j],
                        fdims[j + 1], packs[j], packs[j + 1],
                        ws[j], radius, f_max, interpret)
                else:
                    (sdy, sdyx, dws[j], dbs_, h_acc, mq, cnt,
                     sdy_s, sz_s) = _call_bwd_step0(
                        train, at_top, zs[j], zs[j + 1], dy_src,
                        new_xyz, xyz, qc_res, s, k, fdims[j],
                        fdims[j + 1], packs[j], packs[j + 1],
                        ws[j], radius, interpret)
            else:
                dy_next, sdy, sdyx, dws[j], dbs_ = step(
                    train, at_top, zs[j], zs[j + 1], dy_src, s, k,
                    fdims[j], fdims[j + 1], packs[j], packs[j + 1],
                    ws[j], f_max, interpret)
            dbs[j] = dbs_[0]
        sdy, sdyx = sdy[0], sdyx[0]
        dbetas[j] = sdy
        dgammas[j] = sdyx
        if train:
            packs[j] = (packs[j].at[4].set(sdy / m)
                        .at[5].set(sdyx / m))
    # dz1/d_payload epilogue (see _bwd_step0_kernel's docstring).
    a0, mu0, r0 = packs[0][0], packs[0][2], packs[0][3]
    cntv = jnp.swapaxes(cnt, 1, 2)               # [B, N, 1]
    if train:
        mdy0, mdyx0 = packs[0][4], packs[0][5]
        pf_f = _f32(_bf16(pf_res))               # kernel's bf16 view
        xoh = r0 * (cntv * pf_f - mq - cntv * mu0)
        dpf = a0 * (h_acc - cntv * mdy0) - (a0 * mdyx0) * xoh
        sxhat = r0 * (sz_s - k * mu0)
        dqc = -(a0 * (sdy_s - k * mdy0 - mdyx0 * sxhat))
    else:
        dpf = a0 * h_acc
        dqc = -(a0 * sdy_s)
    dpf = dpf.astype(pf_res.dtype)
    drunning = jax.tree_util.tree_map(jnp.zeros_like, running)
    return (jnp.zeros_like(new_xyz), jnp.zeros_like(xyz), dpf,
            dqc.astype(qc_res.dtype), tuple(dgammas), tuple(dbetas),
            tuple(dws), tuple(dbs), drunning)


fused_grouped_chain.defvjp(_fgc_fwd, _fgc_bwd)
