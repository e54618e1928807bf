"""Per-kernel device-time breakdown of one fused-SA stage (seg-SA1).

bench_v2_stages.py gives per-STAGE totals; this drills one stage down to
individual Pallas passes (extract / fwd_step / pool / bwd_top /
bwd_step / dz1) by profiling
a single fused_grouped_chain fwd+bwd per MSG scale and aggregating the
xplane exclusive times per custom-call name.

Usage: python scripts/profile_sa_kernels.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.ops import fused_sa
from transferable3d_tpu.utils.profiling import trace, xplane_exclusive_ps

B, N, F_IN = 128, 1024, 4
# seg-SA1 MSG scales: (K, chain feature widths) at S=128 centroids.
SCALES = [(32, (32, 32, 64)), (64, (64, 64, 128)), (128, (64, 96, 128))]
S = 128


def one_scale(rng, k, feats):
    f1 = feats[0]
    cent = jnp.asarray(rng.uniform(-2, 2, (B, S, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    pf = jnp.asarray(rng.uniform(-1, 1, (B, N, f1)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    qc = jnp.asarray(rng.uniform(-1, 1, (B, S, f1)).astype(np.float32)
                     ).astype(jnp.bfloat16)  # production dtype (bf16)
    gammas = tuple(jnp.ones((f,), jnp.float32) for f in feats)
    betas = tuple(jnp.zeros((f,), jnp.float32) for f in feats)
    ws = tuple(jnp.asarray(rng.normal(0, 0.1, (feats[i], feats[i + 1]))
                           .astype(np.float32)).astype(jnp.bfloat16)
               for i in range(len(feats) - 1))
    bs = tuple(jnp.zeros((f,), jnp.bfloat16) for f in feats[1:])

    def loss(args):
        pf_, qc_, ws_, bs_ = args
        pooled, _, _ = fused_sa.fused_grouped_chain(
            cent, xyz, pf_, qc_, gammas, betas, ws_, bs_, 0.8, k, 1e-3,
            True, None, False, LAYOUT)
        return jnp.sum(pooled.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    args = (pf, qc, ws, bs)
    jax.block_until_ready(g(args))
    return g, args


LAYOUT = "rows"


def main():
    global LAYOUT
    p = argparse.ArgumentParser()
    p.add_argument("--layout", default="rows")
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()
    LAYOUT = args.layout
    jax.config.update("jax_default_prng_impl", "rbg")

    rng = np.random.RandomState(0)
    fns = [one_scale(rng, k, feats)
           for k, feats in SCALES]

    tdir = "/tmp/sa_kernel_trace"
    os.system(f"rm -rf {tdir}")
    with trace(tdir):
        for _ in range(args.steps):
            for g, a in fns:
                jax.block_until_ready(g(a))

    ps = xplane_exclusive_ps(tdir)
    rows = sorted(ps.items(), key=lambda kv: -kv[1])
    total = sum(ps.values())
    print(f"layout={LAYOUT}  total device "
          f"{total / 1e9 / args.steps:.3f} ms/step over {len(rows)} ops")
    for name, v in rows[:28]:
        print(f"  {v / 1e9 / args.steps:8.3f} ms  {100 * v / total:5.1f}%"
              f"  {name[:90]}")


if __name__ == "__main__":
    main()
