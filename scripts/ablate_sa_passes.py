"""Ablate the planar fused-SA passes to locate the gap vs roofline.

Round-5 context: seg-SA1 planar measures 37.8 ms/step vs a 15.9 ms
roofline floor, concentrated in bwd_step0 (14.9 vs 3.4), extract (7.0
vs 2.9) and fwd_pool (5.9 vs 2.2) (profile_sa_kernels --layout planar,
artifacts/r5_ablate.log). This script times stripped-down and
restructured variants of those kernels on the real chip so the excess
can be attributed to a specific section (one-hot build, dot
orientation, seg-max rolls, rep-matrix dots) instead of guessed at.

All timings are xplane device-exclusive (wall lies through the relay).
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transferable3d_tpu.ops import fused_sa as fsa
from transferable3d_tpu.ops.fused_sa import (
    _acc_spec_p, _bf16, _bf16_round, _f32, _geo_specs, _onehot_all,
    _planar_spec, _planar_struct, _rank_rows, _s_chunk_cp,
    _s_chunk_p, _vspec, _zero_at_first)
from transferable3d_tpu.utils.profiling import device_ms


def _rep_cols(ref, s_ch, k):
    """RETIRED round-5 production form (production now uses per-group
    static-slice [F, 1] lane broadcasts): [1, S_ch, F] block ref ->
    f32 [F, S_ch*K] via a replication dot."""
    return jax.lax.dot_general(
        _bf16(ref[0]), fsa._rep_matrix(ref.shape[1], k),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _seg_max_lanes(x_cols, k):
    """RETIRED round-5 production form (kept here so the losing
    variant stays measurable): log2 K roll+max steps; lane s*K of
    each group holds the group max."""
    rows = x_cols.shape[1]
    shift = k // 2
    while shift >= 1:
        x_cols = jnp.maximum(x_cols, pltpu.roll(x_cols, rows - shift, 1))
        shift //= 2
    return x_cols


def _sel_matrix(s_ch, k, dtype=jnp.bfloat16):
    """RETIRED with _seg_max_lanes: [S_ch, S_ch*K] one-hot selecting
    lane s*K of each group."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_ch, s_ch * k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (s_ch, s_ch * k), 0)
    return jnp.where(lane == row * k, 1.0, 0.0).astype(dtype)


def _mult_tile(oh, s_ch, k):
    """RETIRED round-5 production form (production bwd_step0 now uses
    _mult_from_rank, elementwise): multiplicity via a rep-matrix
    segment-sum dot over the one-hot."""
    return jax.lax.dot_general(
        fsa._rep_matrix(s_ch, k), oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

B, N, S = 128, 1024, 128
# seg-SA1 planar scales: (name, K, (m0, m1, m2))
SCALES = {"b": (64, (64, 64, 128)), "c": (128, (64, 96, 128))}


# --- extract variants -------------------------------------------------------


def _ex_kernel(mode, r2, k, f0, ct, pt, payt, qc, z1, sums, sumsq):
    s_ch = ct.shape[1]
    n = pt.shape[-1]
    _zero_at_first(sums, sumsq)
    qc_rep = _rep_cols(qc, s_ch, k)                    # [F0, rows] f32
    # cheap consumption of payt in stripped modes: unused inputs give
    # the program the "stats-only consumer" shape the relay compiler
    # can hang on (CLAUDE.md round-4 finding d)
    pay_bias = _f32(payt[0][:, 0:1]) * 1e-6
    if mode == "base":
        z = _bf16(qc_rep + pay_bias)
    else:
        rank_m = _rank_rows(r2, ct[0], pt[0])
        if mode == "rank":
            sumsq[:] += jnp.sum(rank_m) * 1e-6
            z = _bf16(qc_rep + pay_bias)
        elif mode == "oh":
            oh = _onehot_all(rank_m, k)
            # consume via the axis-1 multiplicity sum (itself a
            # candidate replacement for the rep-matrix dot)
            mm = jnp.sum(_f32(oh.reshape(s_ch, k, n)), axis=1)
            sumsq[:] += jnp.sum(mm) * 1e-6
            z = _bf16(qc_rep + pay_bias)
        elif mode == "full":
            oh = _onehot_all(rank_m, k)
            g = jax.lax.dot_general(
                payt[0], oh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = _bf16(g) - _bf16(qc_rep)
        elif mode == "full_t":
            # transposed one-hot [N, rows]: the dot contracts lhs lanes
            # with rhs sublanes — the MXU-natural orientation.
            eff = jnp.clip(jnp.max(rank_m, axis=1, keepdims=True), 1.0,
                           float(k))
            rank_t = jnp.swapaxes(rank_m, 0, 1)        # [N, S_ch]
            if k == 128:
                rank_rep = jnp.repeat(rank_t, k, axis=1)
                eff_rep = jnp.repeat(jnp.swapaxes(eff, 0, 1), k, axis=1)
            else:
                rep = fsa._rep_matrix(s_ch, k, jnp.float32)
                rank_rep = jax.lax.dot_general(
                    rank_t, rep, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                eff_rep = jax.lax.dot_general(
                    jnp.swapaxes(eff, 0, 1), rep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            slot = (jax.lax.broadcasted_iota(jnp.int32, (1, s_ch * k), 1)
                    % k).astype(jnp.float32)
            want = slot - eff_rep[0:1] * jnp.floor(
                (slot + 0.25) / eff_rep[0:1]) + 1.0    # [1, rows]
            oh_t = jnp.where(rank_rep == want, 1.0, 0.0
                             ).astype(jnp.bfloat16)    # [N, rows]
            g = jax.lax.dot_general(
                payt[0], oh_t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = _bf16(g) - _bf16(qc_rep)
    z1[0] = z
    zf = _f32(z)
    sums[:] += jnp.sum(zf, axis=1, keepdims=True)
    sumsq[:] += jnp.sum(zf * zf, axis=1, keepdims=True)


def call_extract(mode, cent, xyz, pf, qc, radius, k, f_max):
    b, s, _ = cent.shape
    n = xyz.shape[1]
    f0 = pf.shape[-1]
    s_ch = _s_chunk_p(s, k, f_max, n)
    pt = jnp.swapaxes(xyz, 1, 2)
    payt = jnp.swapaxes(_bf16(pf), 1, 2)
    sspec, sshape = _acc_spec_p((f0, 1))
    qspec, qshape = _acc_spec_p((f0, 1))
    return pl.pallas_call(
        partial(_ex_kernel, mode, radius * radius, k, f0),
        grid=(b, s // s_ch),
        in_specs=_geo_specs(s_ch, n) + [
            _vspec((1, f0, n), lambda b_, i: (b_, 0, 0)),
            _vspec((1, s_ch, f0), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=[_planar_spec(s_ch, k, f0), sspec, qspec],
        out_shape=[_planar_struct(b, s, k, f0), sshape, qshape],
    )(cent, pt, payt, _bf16(qc))


# --- pool variants ----------------------------------------------------------


def _pool_kernel(mode, k, f, z_last, pack, pooled, ymax):
    s_ch = ymax.shape[1]
    a, c = pack[:, 0:1], pack[:, 1:2]
    y = _f32(z_last[0]) * a + c
    if mode == "slices":
        parts = [jnp.max(y[:, g * k:(g + 1) * k], axis=1, keepdims=True)
                 for g in range(s_ch)]
        ym_sf = jnp.concatenate(parts, axis=1)          # [F, S_ch]
        ym_t = jnp.swapaxes(ym_sf, 0, 1)                # [S_ch, F]
        pooled[0] = jnp.maximum(_bf16(ym_t), jnp.bfloat16(0))
        ymax[0] = ym_t
        return
    ym = y if mode == "norolls" else _seg_max_lanes(y, k)
    hi = _bf16_round(ym)
    lo = _bf16_round(ym - hi)
    sel = _sel_matrix(s_ch, k)
    dims = (((1,), (1,)), ((), ()))
    phi = jax.lax.dot_general(sel, hi, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    plo = jax.lax.dot_general(sel, lo, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    pooled[0] = jnp.maximum(phi.astype(jnp.bfloat16), jnp.bfloat16(0))
    ymax[0] = phi + plo


def call_pool(mode, z_last, s, k, f, pack, f_max):
    b = z_last.shape[0]
    s_ch = _s_chunk_cp(s, k, f_max)
    const = lambda a: _vspec(a.shape,
                             lambda b__, i: tuple(0 for _ in a.shape))
    packp = jnp.swapaxes(pack, 0, 1)
    ospec = _vspec((1, s_ch, f), lambda b__, i: (b__, i, 0))
    return pl.pallas_call(
        partial(_pool_kernel, mode, k, f),
        grid=(b, s // s_ch),
        in_specs=[_planar_spec(s_ch, k, f), const(packp)],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((b, s, f), jnp.bfloat16),
                   jax.ShapeDtypeStruct((b, s, f), jnp.float32)],
    )(z_last, packp)


# --- bwd_step0 variants ------------------------------------------------------
#
# Production (b0/full) vs stripped forms, all with identical in/out
# specs (missing sections write zeros) so no variant degenerates into
# the stats-only-consumer shape the relay compiler can hang on:
#   b0/dz     — only the dz/dw/db chain section (no one-hot at all);
#               the one-hot budget s-chunk is kept, so this is the
#               true in-kernel baseline (bwd/step uses a larger chunk)
#   b0/noacch — drop the oh·dy scatter dot
#   b0/nomm   — drop the multiplicity dots (mm, mq, cnt)
#   b0/noseg  — drop the per-centroid segment dots (sdy_s, sz_s)
#   b0/accht  — scatter dot in MXU-natural orientation:
#               dy[F0,rows]·oh[rows,N] -> acc [F0, N] (full lanes)
#               instead of oh·dy -> [N, F0] (F0 < 128 lanes wasted)


def _b0_kernel(mode, r2, k, f_j, f_j1, *refs):
    (ins, (ct, pt, qc_t), (pack_j, pack_j1, w_j),
     (sdy, sdyx, dw, db, h_out, mq_out, cnt_out, sdy_s, sz_s),
     (acc_h, acc_mq, acc_cnt)) = fsa._split(refs, 3, 3, 3, 9, 3)
    z_j = ins[0]
    _zero_at_first(sdy, sdyx, dw, db)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_h[:] = jnp.zeros_like(acc_h)
        acc_mq[:] = jnp.zeros_like(acc_mq)
        acc_cnt[:] = jnp.zeros_like(acc_cnt)

    s_ch = ct.shape[1]
    dz1_ = fsa._step_dz_cols(True, False, k, ins, pack_j1)
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

    if mode != "dz":
        rank_m = _rank_rows(r2, ct[0], pt[0])
        oh = _onehot_all(rank_m, k)                    # [S_ch*K, N]
        if mode != "noacch":
            if mode == "accht":
                acc_h[:] += jax.lax.dot_general(
                    dy_j, oh, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [F0, N]
            else:
                acc_h[:] += jax.lax.dot_general(
                    oh, dy_j, dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [N, F0]
        if mode != "nomm":
            mm = _mult_tile(oh, s_ch, k)           # [S_ch, N]
            acc_cnt[:] += jnp.sum(mm, axis=0, keepdims=True)
            acc_mq[:] += jax.lax.dot_general(
                _bf16(mm), qc_t[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [N, F0]
    if mode != "noseg":
        rep = fsa._rep_matrix(s_ch, k)
        sdy_s[0] = jax.lax.dot_general(
            rep, dy_j, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S_ch, F0]
        sz_s[0] = jax.lax.dot_general(
            rep, z_j[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        sdy_s[0] = jnp.zeros_like(sdy_s[0])
        sz_s[0] = jnp.zeros_like(sz_s[0])

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        h_out[0] = acc_h[:]
        mq_out[0] = acc_mq[:]
        cnt_out[0] = acc_cnt[:]


def call_b0(mode, z0, z1, dy1, cent, xyz, qc, pack0, pack1, w0,
            radius, s, k, f0, f1, f_max):
    b = z0.shape[0]
    n = xyz.shape[1]
    s_ch = _s_chunk_p(s, k, f_max, n)
    grid = (b, s // s_ch)
    pt = jnp.swapaxes(xyz, 1, 2)
    const = lambda a_: _vspec(a_.shape,
                              lambda b__, i: tuple(0 for _ in a_.shape))
    sspec = _vspec((1, s_ch, f0), lambda b__, i: (b__, i, 0))
    out_specs, out_shapes = [], []
    for shape in [(f0, 1), (f0, 1), w0.shape, (f1, 1)]:
        sp, sh = _acc_spec_p(shape)
        out_specs.append(sp)
        out_shapes.append(sh)
    # Only acc_h transposes in accht mode; acc_mq's dot always emits
    # [N, F0] (the first accht run died on this mismatch).
    acch_shape = (f0, n) if mode == "accht" else (n, f0)
    perb = lambda shp: (_vspec((1,) + shp, lambda b__, i: (b__,)
                               + tuple(0 for _ in shp)),
                        jax.ShapeDtypeStruct((b,) + shp, jnp.float32))
    for shp in [acch_shape, (n, f0), (1, n)]:
        sp, sh = perb(shp)
        out_specs.append(sp)
        out_shapes.append(sh)
    out_specs += [sspec, sspec]
    out_shapes += [jax.ShapeDtypeStruct((b, s, f0), jnp.float32)] * 2
    packjp = jnp.swapaxes(pack0, 0, 1)
    packj1p = jnp.swapaxes(pack1, 0, 1)
    return pl.pallas_call(
        partial(_b0_kernel, mode, radius * radius, k, f0, f1),
        grid=grid,
        in_specs=[_planar_spec(s_ch, k, f0), _planar_spec(s_ch, k, f1),
                  _planar_spec(s_ch, k, f1)]
        + _geo_specs(s_ch, n)
        + [_vspec((1, s_ch, f0), lambda b__, i: (b__, i, 0))]
        + [const(packjp), const(packj1p), const(w0)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM(acch_shape, jnp.float32),
                        pltpu.VMEM((n, f0), jnp.float32),
                        pltpu.VMEM((1, n), jnp.float32)],
    )(z0, z1, dy1, cent, pt, _bf16(qc), packjp, packj1p, w0)


# --- harness ----------------------------------------------------------------


def mk_inputs(rng, k, feats):
    f0 = feats[0]
    cent = jnp.asarray(rng.uniform(-2, 2, (B, S, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    pf = jnp.asarray(rng.uniform(-1, 1, (B, N, f0)).astype(np.float32))
    qc = jnp.asarray(rng.uniform(-1, 1, (B, S, f0)).astype(np.float32))
    return cent, xyz, _bf16(pf), _bf16(qc)


def time_fn(name, fn, *args):
    print(f"  [compile+run] {name} ...", flush=True)
    try:
        ms = device_ms(fn, *args)
        print(f"  {name:24s} {ms:8.3f} ms", flush=True)
        return ms
    except Exception as e:  # noqa: BLE001 — report and continue sweep
        print(f"  {name:24s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None


def run_one(sc, name):
    """Run a single variant (subprocess unit — the relay compiler can
    hang >900 s on stripped-down programs; the driver loop times each
    variant out independently)."""
    rng = np.random.RandomState(0)
    k, feats = SCALES[sc]
    f_max = max(feats)
    f0, f1, f2 = feats
    cent, xyz, pf, qc = mk_inputs(rng, k, feats)
    radius = 0.8
    group, _, mode = name.partition("/")

    if group == "extract":
        fn = lambda ce, xy, p_, q_: call_extract(
            mode, ce, xy, p_, q_, radius, k, f_max)
        return time_fn(f"{sc}:{name}", fn, cent, xyz, pf, qc)

    if group == "pool":
        z2 = _bf16(jnp.asarray(
            rng.uniform(-1, 1, (B, f2, S * k)).astype(np.float32)))
        pack2 = jnp.stack([jnp.ones(f2), jnp.zeros(f2), jnp.zeros(f2),
                           jnp.ones(f2), jnp.zeros(f2),
                           jnp.zeros(f2)], axis=0).astype(jnp.float32)
        fn = lambda z_, pk: call_pool(mode, z_, S, k, f2, pk, f_max)
        return time_fn(f"{sc}:{name}", fn, z2, pack2)

    # bwd / b0 groups
    z0 = _bf16(jnp.asarray(
        rng.uniform(-1, 1, (B, f0, S * k)).astype(np.float32)))
    z1 = _bf16(jnp.asarray(
        rng.uniform(-1, 1, (B, f1, S * k)).astype(np.float32)))
    dy1 = _bf16(jnp.asarray(
        rng.uniform(-1, 1, (B, f1, S * k)).astype(np.float32)))
    pack = lambda f: jnp.stack(
        [jnp.ones(f), jnp.zeros(f), jnp.zeros(f), jnp.ones(f),
         jnp.zeros(f), jnp.zeros(f)], axis=0).astype(jnp.float32)
    w0 = _bf16(jnp.asarray(
        rng.normal(0, 0.1, (f0, f1)).astype(np.float32)))
    if group == "b0":
        fn = lambda a0, a1, d_, ce, xy, q_, p0, p1, w_: call_b0(
            mode, a0, a1, d_, ce, xy, q_, p0, p1, w_, radius, S, k,
            f0, f1, f_max)
        return time_fn(f"{sc}:{name}", fn, z0, z1, dy1, cent, xyz, qc,
                       pack(f0), pack(f1), w0)
    if mode == "step":
        fn = lambda a0, a1, d_, p0, p1, w_: fsa._call_bwd_step_cp(
            True, False, a0, a1, d_, S, k, f0, f1, p0, p1, w_,
            f_max, False)
        return time_fn(f"{sc}:{name}", fn, z0, z1, dy1, pack(f0),
                       pack(f1), w0)
    fn = lambda a0, a1, d_, ce, xy, q_, p0, p1, w_: \
        fsa._call_bwd_step0_cp(
            True, False, a0, a1, d_, ce, xy, q_, S, k, f0, f1,
            p0, p1, w_, radius, f_max, False)
    return time_fn(f"{sc}:{name}", fn, z0, z1, dy1, cent, xyz, qc,
                   pack(f0), pack(f1), w0)


ALL = ["bwd/step0", "bwd/step", "extract/full", "extract/full_t",
       "pool/full", "pool/slices", "pool/norolls", "extract/oh",
       "extract/rank", "extract/base",
       "b0/dz", "b0/noacch", "b0/nomm", "b0/noseg", "b0/accht"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="'<scale>:<group>/<mode>' — run one variant")
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl", "rbg")
    if args.only:
        sc, _, name = args.only.partition(":")
        run_one(sc, name)
        return
    for sc in ("c", "b"):
        for name in ALL:
            run_one(sc, name)


if __name__ == "__main__":
    main()
