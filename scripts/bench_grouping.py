"""Micro-bench: per-SA-scale grouping cost (fwd and fwd+bwd) on the TPU.

In-jit lax.scan repetition per CLAUDE.md (host timings through the relay
lie). Prints ms per call for each v2 SA scale's shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.ops import grouping

B = 128
REPS = 20

SCALES = [
    # (name, S, N, C_feat, radius, K)
    ("seg_sa1_r1", 128, 1024, 1, 0.2, 32),
    ("seg_sa1_r2", 128, 1024, 1, 0.4, 64),
    ("seg_sa1_r3", 128, 1024, 1, 0.8, 128),
    ("seg_sa2_r1", 32, 128, 320, 0.4, 64),
    ("seg_sa2_r2", 32, 128, 320, 0.8, 64),
    ("seg_sa2_r3", 32, 128, 320, 1.6, 128),
    ("box_sa1", 128, 512, 0, 0.2, 64),
    ("box_sa2", 32, 128, 128, 0.4, 64),
]


def timeit(fn, *args):
    def multi(*a):
        def body(c, _):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            return c + leaves[0].astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return acc
    multi = jax.jit(multi)
    r = multi(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = multi(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS * 1e3


def main():
    rng = np.random.RandomState(0)
    impl = os.environ.get("T3D_GROUP_IMPL", "onehot")
    for name, s, n, c, r, k in SCALES:
        cent = jnp.asarray(rng.uniform(-2, 2, (B, s, 3)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-2, 2, (B, n, 3)).astype(np.float32))
        feats = (jnp.asarray(rng.normal(size=(B, n, c)).astype(np.float32)
                             ).astype(jnp.bfloat16) if c else None)

        if impl == "onehot":
            def fwd(xyz, feats, cent=cent, r=r, k=k):
                g, cnt = grouping.ball_query_group(cent, xyz, feats, r, k)
                return g
        else:  # sort+gather
            def fwd(xyz, feats, cent=cent, r=r, k=k):
                idx, cnt = grouping.ball_query(cent, xyz, r, k)
                src = (xyz if feats is None
                       else jnp.concatenate(
                           [xyz, feats.astype(xyz.dtype)], -1))
                return grouping.group_points(src, idx)

        def loss(xyz, feats):
            return fwd(xyz, feats).astype(jnp.float32).sum()

        grad_fn = jax.grad(loss, argnums=(0,) if feats is None else (0, 1))
        t_fwd = timeit(fwd, xyz, feats)
        t_bwd = timeit(grad_fn, xyz, feats)
        print(f"{name:12s} S={s:4d} N={n:5d} C={c:3d} K={k:3d} "
              f"fwd {t_fwd:7.3f} ms   fwd+bwd {t_bwd:7.3f} ms")


if __name__ == "__main__":
    main()
