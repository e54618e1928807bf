"""Analytical speed-of-light model for the v2 train step's fused-SA passes.

VERDICT r03 item 2 asks: if the 3,000 f/s bar is architecturally out of
reach on v5e-1, write the roofline argument down (bytes/step vs HBM
bandwidth). This script computes, per SA scale and per pass of the
cached-z schedule (ops/fused_sa.py, cached section docstring), three
floors and takes the max:

  - HBM:  bytes moved / 819 GB/s  (v5e HBM bandwidth)
  - MXU:  PADDED matmul FLOPs / 197 TFLOP/s bf16 peak (both contraction
          and output dims padded to 128 — the systolic array processes
          full 128-lane tiles regardless of logical width)
  - VPU:  elementwise ops / ~3.8 Tops/s (rough: compares, affine+relu,
          casts, stat accumulation — ~10 ops per element touched)

Storage layouts mirror models/pointnet2.py:186-199 (per-scale rule):
  rows   [B, S, K, F] bf16 -> last dim padded to 128 HBM lanes
  planar [B, F, S*K] bf16 -> dense (S*K divisible by 128)

Pass structure mirrored from ops/fused_sa.py (cached schedule, depth-3
mlps, dense0 factored out pre-extraction so stored z_0 is [S, K, m0]):
  fwd: extract(z_0) -> step(z_0->z_1) -> last(z_1->z_2 [+extrema rows])
       [planar: + pool pass]
  bwd: step_top(z_1, z_2, pooled -> dy_1, dW_1)
       -> step_0 fused w/ dz1 scatter (z_0, z_1, dy_1, geo -> H, Mq,
          dW_0, ...)

The model intentionally EXCLUDES the non-SA residue (dense0/qc, FP
layers, group-all SAs, heads, loss, Adam) — pass --residue-ms with the
measured value (profile_step.py); default 4.4 ms (~7% of the measured
63 ms step, per the round-2 profile note in CLAUDE.md).

Expected accuracy: ~±15% per pass (ignores DMA latency overlap quality,
grid/program overheads, revisit caching of const blocks). Calibrate
against scripts/profile_sa_kernels.py output when the TPU is reachable.
"""

from __future__ import annotations

import argparse
import json

HBM_BW = 819e9          # B/s, TPU v5e
MXU_PEAK = 197e12       # bf16 FLOP/s, TPU v5e
VPU_PEAK = 3.8e12       # elementwise f32 ops/s (rough)
VPU_OPS_PER_ELEM = 10.0

B = 128                 # bench batch (bench.py BATCH)


def pad128(f):
    return ((f + 127) // 128) * 128


def pad8(f):
    return ((f + 7) // 8) * 8


def dot_flops(rows, f_in, f_out, layout="rows"):
    """Padded MXU FLOPs for a chain-style dot over `rows` elements.

    rows layout computes [rows, f_in] @ [f_in, f_out]: the contraction
    pads to 128 and the output lanes pad to 128. planar computes
    [f_out, f_in] @ [f_in, rows]: the rows live on (dense) lanes, so
    only the contraction pads to 128 and f_out pads to 8 sublanes —
    the layout's whole point (ops/fused_sa.py planar section).
    """
    if layout == "rows":
        return 2.0 * rows * pad128(f_in) * pad128(f_out)
    return 2.0 * rows * pad128(f_in) * pad8(f_out)


def wide_dot_flops(rows, f_in, f_out):
    """Dots whose contraction is the wide axis (N or rows): onehot
    selections/scatters and planar dW dots — pads are negligible on
    the wide dim; the narrow output dims pad to 8/128 by position."""
    return 2.0 * rows * f_in * max(f_out, 8)


class Pass:
    def __init__(self, name, bytes_hbm, mxu_flops, vpu_ops):
        self.name = name
        self.bytes = bytes_hbm
        self.mxu = mxu_flops
        self.vpu = vpu_ops

    @property
    def t_hbm(self):
        return self.bytes / HBM_BW

    @property
    def t_mxu(self):
        return self.mxu / MXU_PEAK

    @property
    def t_vpu(self):
        return self.vpu / VPU_PEAK

    @property
    def floor(self):
        return max(self.t_hbm, self.t_mxu, self.t_vpu)

    @property
    def bound(self):
        t = {"hbm": self.t_hbm, "mxu": self.t_mxu, "vpu": self.t_vpu}
        return max(t, key=t.get)


def z_bytes(s, k, f, layout):
    """HBM bytes of one bf16 z tensor for one example."""
    if layout == "rows":
        return s * k * pad128(f) * 2
    return s * k * f * 2  # planar: dense


def scale_passes(name, s, k, n, mlp, layout, planar_top="fused"):
    """Passes of the cached schedule for one (radius-)scale.

    n: points the ball query runs over; mlp: (m0, m1, m2); stored z
    tensors are [S, K, m0/m1/m2]. All quantities per-example, scaled
    by B at the end.
    """
    m0, m1, m2 = mlp
    r = s * k                      # rows per example
    lg_k = max(1, k.bit_length() - 1)
    zb = [z_bytes(s, k, m, layout) for m in (m0, m1, m2)]
    tri_b = n * n * 2              # bf16 ones; one DMA per example
    pay_b = n * pad128(m0) * 2     # pf payload [N, m0] (bf16)
    geo_b = tri_b + pay_b + n * 3 * 4 + s * 4 * 4
    rank_f = dot_flops(s, n, n)    # wf [S, N] @ tri [N, N]
    oh_f = dot_flops(r, n, m0, layout)  # onehot selection dot
    # planar [S]->[S*K] broadcasts are replication dots whose s_ch
    # contraction pads to 128 (ops/fused_sa._rep_cols); s_ch mirrors
    # _s_chunk's ~4096-row tiles.
    s_ch = max(1, 4096 // k)
    rep_f = 2.0 * pad128(s_ch) / s_ch * r if layout == "planar" else 0.0

    passes = [Pass(
        f"{name}/extract",
        geo_b + zb[0] + s * pad128(m0) * 2,       # + qc read
        rank_f + oh_f + rep_f * m0,
        (r * n / 64 + r * m0 * 2) * VPU_OPS_PER_ELEM,  # onehot compares amortized: the
        # [R, N] one-hot build is bf16 compares the VPU vectorizes;
        # /64 reflects the measured ~even cost vs the XLA extract
    )]
    # fwd chain steps: step(z0->z1), last(z1->z2)
    passes.append(Pass(f"{name}/fwd_step1", zb[0] + zb[1],
                       dot_flops(r, m0, m1, layout),
                       r * (m0 + m1) * VPU_OPS_PER_ELEM))
    last_extra = (s * m2 * 4 * 2) if layout == "rows" else 0
    passes.append(Pass(f"{name}/fwd_last", zb[1] + zb[2] + last_extra,
                       dot_flops(r, m1, m2, layout),
                       r * (m1 + m2) * VPU_OPS_PER_ELEM))
    if layout == "planar":        # planar keeps the pool pass
        # segment max = log2(K) lane rolls + the exact hi/lo ymax
        # selection dots (the XLA top-stat emission)
        passes.append(Pass(f"{name}/fwd_pool", zb[2] + s * m2 * 2,
                           rep_f * m2, (2 * lg_k + 6) * r * m2))
    # bwd: step_top (j=1): reads z1, z2, pooled+dpooled; writes dy_1;
    # cascade dot dz2 @ W1^T, dW1 = h1^T dz2 (wide contraction), and
    # (planar) 3 replication-dot broadcasts of pooled/dpooled/ties.
    pooled_b = s * (m2 if layout == "planar" else pad128(m2)) * 2 * 2
    passes.append(Pass(
        f"{name}/bwd_top",
        zb[1] + zb[2] + pooled_b + zb[1],          # + dy_1 write
        dot_flops(r, m2, m1, layout) + wide_dot_flops(r, m1, m2)
        + 3 * rep_f * m2,
        r * (m1 + 3 * m2) * VPU_OPS_PER_ELEM))
    # bwd: step_0 fused with the dz1/d_payload scatter: reads z0, z1,
    # dy_1, geo; rebuilds the one-hot (rank dot) and contracts
    # onehot^T dz_1 -> H [N, m0]; cascade dz1 @ W0^T + dW0.
    h_out_b = (n * m0 * 4) * 2 + n * 4 + s * m0 * 4 * 2
    passes.append(Pass(
        f"{name}/bwd_step0",
        zb[0] + zb[1] + zb[1] + tri_b + h_out_b,
        rank_f + dot_flops(r, n, m0, layout)       # onehot^T dz_1
        + dot_flops(r, m1, m0, layout) + wide_dot_flops(r, m0, m1)
        + rep_f * (2 * m0 + 1),
        (r * n / 64 + r * (3 * m0 + m1)) * VPU_OPS_PER_ELEM))
    return passes


def layout_for(s, k, mlp, planar_min=4096):
    rows = s * k
    padded = min(mlp) < 128
    return ("planar" if padded and rows % 128 == 0 and rows >= planar_min
            else "rows")


# v2 config — models/frustum_pointnet_v2.py:44-95. n = points the
# scale queries over (seg SA2 queries the 128 SA1 centroids; the box
# net runs on the 512 masked object points).
SCALES = [
    ("seg_sa1_a", 128, 32, 1024, (32, 32, 64)),
    ("seg_sa1_b", 128, 64, 1024, (64, 64, 128)),
    ("seg_sa1_c", 128, 128, 1024, (64, 96, 128)),
    ("seg_sa2_a", 32, 64, 128, (64, 64, 128)),
    ("seg_sa2_b", 32, 64, 128, (128, 128, 256)),
    ("seg_sa2_c", 32, 128, 128, (128, 128, 256)),
    ("box_sa1", 128, 64, 512, (64, 64, 128)),
    ("box_sa2", 32, 64, 128, (128, 128, 256)),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--residue-ms", type=float, default=4.4,
                    help="measured non-SA step time (dense0, FP, "
                         "group-all SAs, heads, loss, Adam)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows_fmt = "{:22s} {:>7s} {:>9s} {:>8s} {:>8s} {:>8s}  {}"
    total = 0.0
    out = []
    print(rows_fmt.format("pass", "layout", "MB(HBM)", "hbm_ms",
                          "mxu_ms", "floor", "bound"))
    for name, s, k, n, mlp in SCALES:
        layout = layout_for(s, k, mlp)
        sub = 0.0
        for p in scale_passes(name, s, k, n, mlp, layout):
            hbm_ms = p.t_hbm * B * 1e3
            mxu_ms = p.t_mxu * B * 1e3
            floor_ms = p.floor * B * 1e3
            sub += floor_ms
            out.append({"pass": p.name, "layout": layout,
                        "mb": p.bytes * B / 2**20,
                        "hbm_ms": hbm_ms, "mxu_ms": mxu_ms,
                        "vpu_ms": p.t_vpu * B * 1e3,
                        "floor_ms": floor_ms, "bound": p.bound})
            print(rows_fmt.format(
                p.name, layout, f"{p.bytes * B / 2**20:.1f}",
                f"{hbm_ms:.2f}", f"{mxu_ms:.2f}", f"{floor_ms:.2f}",
                p.bound))
        print(f"{'  -- ' + name + ' total':22s} {'':7s} {'':9s} {'':8s} "
              f"{'':8s} {sub:8.2f}")
        total += sub
    step_ms = total + args.residue_ms
    fps = B / (step_ms / 1e3)
    print(f"\nSA floor: {total:.1f} ms  + residue {args.residue_ms:.1f} "
          f"ms  => step floor {step_ms:.1f} ms")
    print(f"implied v2 train ceiling: {fps:,.0f} frustums/s "
          f"(bar: 3,000; B={B})")
    if args.json:
        print(json.dumps({"passes": out, "sa_floor_ms": total,
                          "residue_ms": args.residue_ms,
                          "ceiling_fps": fps}))


if __name__ == "__main__":
    main()
