"""On-TPU validation of the new fused-SA kernels (run before benches).

1. Mosaic compile + run smoke of fused_grouped_chain fwd+bwd for every
   v2 SA scale config, train + eval, at real shapes.
2. Numeric cross-check vs the unfused XLA formulation at one MSG scale
   (substantive leaves only; Dense-bias grads are analytically zero
   under train BN -> noise, skipped).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

print(jax.devices(), flush=True)
from transferable3d_tpu.ops import fused_sa


def _np32(x):
    return jnp.asarray(x).astype(jnp.float32)

B, N = 128, 1024
# (S, K, feats, radius, layout_expected)
CONFIGS = [
    (128, 32, (32, 32, 64), 0.2),      # seg-SA1 a  (planar)
    (128, 64, (64, 64, 128), 0.4),     # seg-SA1 b  (planar)
    (128, 128, (64, 96, 128), 0.8),    # seg-SA1 c  (planar)
    (32, 64, (64, 64, 128), 0.4),      # seg-SA2 a  (rows)
    (32, 128, (128, 128, 256), 1.6),   # seg-SA2 c  (rows)
    (128, 64, (64, 64, 128), 0.2),     # box-SA1    (planar)
    (32, 64, (128, 128, 256), 0.4),    # box-SA2    (rows)
]


def make(s, k, feats, seed, integer=False):
    rng = np.random.RandomState(seed)
    f0 = feats[0]
    cent = jnp.asarray(rng.uniform(-2, 2, (B, s, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    if integer:
        # Integer payloads are exactly bf16-representable: batch stats,
        # z, and cotangent roundings are all exact, so cross-impl
        # gradient comparison is tight (tests/test_fused_sa.py pattern).
        pf = jnp.asarray(rng.randint(-4, 5, (B, N, f0)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        qc = jnp.asarray(rng.randint(-2, 3, (B, s, f0)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    else:
        pf = jnp.asarray(rng.uniform(-1, 1, (B, N, f0)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        # bf16, as in production (GroupedPointMLP computes qc in model
        # dtype; the fused path only engages at dtype==bf16 — an f32 qc
        # is out-of-contract, see the fused_grouped_chain docstring).
        qc = jnp.asarray(rng.uniform(-1, 1, (B, s, f0)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    gammas = tuple(jnp.asarray(rng.uniform(0.5, 1.5, (f,)).astype(np.float32))
                   for f in feats)
    betas = tuple(jnp.asarray(rng.uniform(-.3, .3, (f,)).astype(np.float32))
                  for f in feats)
    ws = tuple(jnp.asarray((rng.normal(size=(feats[i], feats[i+1])) * .2
                            ).astype(np.float32)).astype(jnp.bfloat16)
               for i in range(len(feats) - 1))
    bs = tuple(jnp.asarray(rng.uniform(-.1, .1, (f,)).astype(np.float32)
                           ).astype(jnp.bfloat16) for f in feats[1:])
    return cent, xyz, pf, qc, gammas, betas, ws, bs


def rows_for(s, k, feats):
    # mirrors models/pointnet2.py's fixed per-scale layout rule
    rows = s * k
    return ("planar" if min(feats) < 128 and rows % 128 == 0
            and rows >= 4096 else "rows")


for (s, k, feats, radius) in CONFIGS:
    layout = rows_for(s, k, feats)
    cent, xyz, pf, qc, gammas, betas, ws, bs = make(s, k, feats, 0)

    def pooled_of(args, train):
        pf_, qc_, ws_, bs_ = args
        out = fused_sa.fused_grouped_chain(
            cent, xyz, pf_, qc_, gammas, betas, ws_, bs_, radius, k,
            1e-3, train,
            None if train else tuple((jnp.zeros((f,)), jnp.ones((f,)))
                                     for f in feats),
            False, layout)
        return out[0]

    def loss(args, train):
        return jnp.sum(pooled_of(args, train).astype(jnp.float32))

    args = (pf, qc, ws, bs)
    # primal eval (no grad) exercises the single-pass inference kernel
    t0 = time.time()
    pe = jax.jit(lambda a: pooled_of(a, False))
    p_infer = jax.block_until_ready(pe(args))
    assert bool(jnp.all(jnp.isfinite(p_infer))), (s, k, feats,
                                                  "infer nonfinite")
    print(f"S={s} K={k} feats={feats} {layout} INFER single-pass: "
          f"loss={float(jnp.sum(_np32(p_infer))):.1f} "
          f"compile+run {time.time()-t0:.1f}s ok", flush=True)
    # The exactness claim is BITWISE equality of the inference kernel's
    # pooled vs the multi-pass differentiable path (jax.vjp primal runs
    # the custom-VJP fwd = the multi-pass schedule). Scalar loss sums
    # are NOT comparable at 1e-5: XLA reduces 5e5 f32 terms in
    # program-dependent order (measured rel ~1.4e-5 on bit-identical
    # pooled at S=32 K=64).
    p_eval, _ = jax.vjp(jax.jit(lambda a: pooled_of(a, False)), args)
    p_eval = jax.block_until_ready(p_eval)
    n_bad = int(jnp.sum(_np32(p_infer) != _np32(p_eval)))
    assert n_bad == 0, ("infer vs eval pooled mismatch", n_bad,
                        float(jnp.max(jnp.abs(_np32(p_infer)
                                              - _np32(p_eval)))))
    for train in (True, False):
        t0 = time.time()
        g = jax.jit(jax.value_and_grad(lambda a: loss(a, train)))
        v, gr = jax.block_until_ready(g(args))
        flat = jax.tree_util.tree_leaves(gr)
        bad = [float(jnp.max(jnp.abs(x))) for x in flat
               if not bool(jnp.all(jnp.isfinite(x)))]
        assert not bad, (s, k, feats, train, "nonfinite grads")
        print(f"S={s} K={k} feats={feats} {layout} train={train}: "
              f"loss={float(v):.1f} compile+run {time.time()-t0:.1f}s ok",
              flush=True)

# Numeric cross-check at a small config: fused grads ON TPU vs the
# unfused reference formulation ON CPU. The reference deliberately runs
# on the host backend: the unfused XLA one-hot scan MIS-EXECUTES on the
# axon TPU backend when fused with reduction-only consumers (round-4
# finding — primal BN var 6.57 vs true 10.66 in-context yet bit-correct
# standalone; grad rel error 53x, unchanged by an optimization_barrier
# on the forward, so the backward scan is corrupt too). CPU execution
# is the trusted baseline (185-test parity lattice); production model
# paths use the Pallas extraction kernels, never this scan, on TPU.
#
# Tolerance design (round-4 diagnosis, scripts/diag_arbitrate.py run):
# with CONTINUOUS bf16 payloads, dpf/dqc comparisons between ANY two
# formulations carry a multi-percent band — JAX cotangents of bf16
# primals are bf16, so every implementation rounds dy at different
# program points, and the pool's bf16 tie sets redistribute whole dy
# quanta across points. Measured on bit-identical forwards (z1 and
# eval-mode pooled bitwise equal): gather-vs-onehot XLA autodiff 1.6%,
# fused-vs-either ~7% on dpf, while dW stays at 0.3%. So: strict
# thresholds on INTEGER payloads (exactly bf16-representable - exact
# stats, exact cotangents; same design as tests/test_fused_sa.py), and
# a direction-only cosine bound on continuous payloads.
s, k, feats, radius = 16, 32, (16, 24, 40), 0.6   # small for unfused speed
from transferable3d_tpu.ops.grouping import ball_query_group

cpu0 = jax.devices("cpu")[0]
names = ["pf", "qc", "ws", "bs"]


def run_cross_check(integer):
    cent, xyz, pf, qc, gammas, betas, ws, bs = make(s, k, feats, 3,
                                                    integer=integer)

    def unfused(args):
        pf_, qc_, ws_, bs_ = args
        grouped, _ = ball_query_group(cent, xyz, pf_, radius, k,
                                      include_xyz=False)
        x = grouped - qc_[:, :, None, :]
        for i in range(len(feats)):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mu * mu
            r = jax.lax.rsqrt(var + 1e-3)
            a = gammas[i] * r
            y = (xf * a + (betas[i] - mu * a)).astype(jnp.bfloat16)
            h = jnp.maximum(y, jnp.bfloat16(0))
            x = ((jnp.dot(h, ws_[i].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) + bs_[i]
                  ).astype(jnp.bfloat16) if i < len(feats) - 1 else h)
        return jnp.sum(jnp.max(x, axis=2).astype(jnp.float32))

    args = (pf, qc, ws, bs)
    with jax.default_device(cpu0):
        args_cpu = jax.device_put(args, cpu0)
        gr = jax.block_until_ready(jax.jit(jax.grad(unfused))(args_cpu))
    for layout in ("rows", "planar"):
        def fused(a):
            pf_, qc_, ws_, bs_ = a
            out = fused_sa.fused_grouped_chain(
                cent, xyz, pf_, qc_, gammas, betas, ws_, bs_, radius, k,
                1e-3, True, None, False, layout)
            return jnp.sum(out[0].astype(jnp.float32))
        gn = jax.jit(jax.grad(fused))(args)
        for nm, a, b in zip(names, gr, gn):
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b)):
                if nm == "bs":
                    continue  # analytically-zero noise
                x = np.asarray(x, np.float32)
                y = np.asarray(y, np.float32)
                nx = max(1e-6, float(np.linalg.norm(x)))
                ny = max(1e-6, float(np.linalg.norm(y)))
                rel = float(np.linalg.norm(x - y)) / nx
                cos = float(np.dot(x.ravel(), y.ravel())) / (nx * ny)
                if integer:
                    assert rel < 0.02, ("int", layout, nm, rel)
                else:
                    # bf16-cotangent band (see header): direction only
                    # for pf/qc; dW averages the noise out.
                    bound = 0.05 if nm == "ws" else 0.15
                    assert rel < bound, ("cont", layout, nm, rel)
                    assert cos > 0.99, ("cont", layout, nm, cos)
        kind = "integer/strict" if integer else "continuous/direction"
        print(f"cross-check {layout} ({kind}): TPU fused grads match "
              f"the CPU unfused reference", flush=True)


run_cross_check(integer=True)
run_cross_check(integer=False)
print("ALL TPU VALIDATION PASSED", flush=True)
