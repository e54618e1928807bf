"""A/B alternative ball-query-group formulations on the TPU.

Variants:
  v1_scan     — current: lax.scan over K, per-iter compare + einsum.
  v2_bigein   — one einsum with the [B,S,K,N] one-hot built inline.
  v3_chunk8   — scan over K in chunks of 8 slots.
  v4_premask  — v1 with rank pre-masked (single compare per iter).
  v5_sort     — ball_query (top_k) + flat row gather.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transferable3d_tpu.ops import grouping

B = 128
REPS = 20

SCALES = [
    ("seg_sa1_r3", 128, 1024, 1, 0.8, 128),
    ("seg_sa1_r1", 128, 1024, 1, 0.2, 32),
    ("seg_sa2_r3", 32, 128, 320, 1.6, 128),
    ("box_sa1", 128, 512, 0, 0.2, 64),
]


def _prep(cent, xyz, r, k):
    d2 = grouping.pairwise_sqdist(cent, xyz)
    within = d2 <= r * r
    count = jnp.sum(within.astype(jnp.int32), axis=-1)
    rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)
    nearest = jnp.argmin(d2, axis=-1)
    is_nearest = (jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
                  == nearest[..., None])
    empty = (count == 0)[..., None]
    within = jnp.where(empty, is_nearest, within)
    rank = jnp.where(empty, is_nearest.astype(jnp.int32), rank)
    eff = jnp.maximum(jnp.minimum(count, k), 1)[..., None]
    rank_masked = jnp.where(within, rank, 0)  # 0 never matches a want
    return rank_masked, eff, count


def v1_scan(cent, xyz, feats, r, k):
    g, _ = grouping.ball_query_group(cent, xyz, feats, r, k)
    return g


def v2_bigein(cent, xyz, feats, r, k):
    rank_masked, eff, _ = _prep(cent, xyz, r, k)
    src = (xyz if feats is None
           else jnp.concatenate([xyz, feats.astype(xyz.dtype)], -1))
    hi = src.astype(jnp.bfloat16)
    lo = (src.astype(jnp.float32) - hi.astype(jnp.float32)
          ).astype(jnp.bfloat16)
    want = jnp.mod(jnp.arange(k, dtype=jnp.int32)[None, None, :], eff) + 1
    oh = (rank_masked[:, :, None, :] == want[..., None]).astype(jnp.bfloat16)
    g = (jnp.einsum("bskn,bnc->bskc", oh, hi,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("bskn,bnc->bskc", oh, lo,
                      preferred_element_type=jnp.float32))
    return g.astype(src.dtype)


def v3_chunk8(cent, xyz, feats, r, k):
    rank_masked, eff, _ = _prep(cent, xyz, r, k)
    src = (xyz if feats is None
           else jnp.concatenate([xyz, feats.astype(xyz.dtype)], -1))
    hi = src.astype(jnp.bfloat16)
    lo = (src.astype(jnp.float32) - hi.astype(jnp.float32)
          ).astype(jnp.bfloat16)
    ck = 8

    def step(carry, kc):
        ks = kc * ck + jnp.arange(ck, dtype=jnp.int32)
        want = jnp.mod(ks[None, None, :], eff) + 1  # [B,S,ck]
        oh = (rank_masked[:, :, None, :] == want[..., None]
              ).astype(jnp.bfloat16)
        m = (jnp.einsum("bskn,bnc->bskc", oh, hi,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("bskn,bnc->bskc", oh, lo,
                          preferred_element_type=jnp.float32))
        return carry, m.astype(src.dtype)

    _, out = jax.lax.scan(step, 0, jnp.arange(k // ck))
    return jnp.moveaxis(out, 0, 2).reshape(
        *rank_masked.shape[:2], k, src.shape[-1])


def v4_premask(cent, xyz, feats, r, k):
    rank_masked, eff, _ = _prep(cent, xyz, r, k)
    src = (xyz if feats is None
           else jnp.concatenate([xyz, feats.astype(xyz.dtype)], -1))
    hi = src.astype(jnp.bfloat16)
    lo = (src.astype(jnp.float32) - hi.astype(jnp.float32)
          ).astype(jnp.bfloat16)

    def step(carry, kk):
        want = jnp.mod(kk, eff) + 1
        oh = (rank_masked == want).astype(jnp.bfloat16)
        m = (jnp.einsum("bsn,bnc->bsc", oh, hi,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("bsn,bnc->bsc", oh, lo,
                          preferred_element_type=jnp.float32))
        return carry, m.astype(src.dtype)

    _, out = jax.lax.scan(step, 0, jnp.arange(k))
    return jnp.moveaxis(out, 0, 2)


def v5_sort(cent, xyz, feats, r, k):
    idx, _ = grouping.ball_query(cent, xyz, r, k)
    src = (xyz if feats is None
           else jnp.concatenate([xyz, feats.astype(xyz.dtype)], -1))
    return grouping.group_points(src, idx)


VARIANTS = {"v1_scan": v1_scan, "v2_bigein": v2_bigein,
            "v3_chunk8": v3_chunk8, "v4_premask": v4_premask,
            "v5_sort": v5_sort}


def timeit(fn, *args):
    def multi(*a):
        def body(c, _):
            out = fn(*a)
            return c + out.astype(jnp.float32).sum(), None
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
    only = os.environ.get("T3D_VARIANTS", "").split(",")
    for name, s, n, c, r, k in SCALES:
        cent = jnp.asarray(rng.uniform(-2, 2, (B, s, 3)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-2, 2, (B, n, 3)).astype(np.float32))
        feats = (jnp.asarray(rng.normal(size=(B, n, c)).astype(np.float32)
                             ).astype(jnp.bfloat16) if c else None)
        for vname, fn in VARIANTS.items():
            if only != [""] and vname not in only:
                continue
            f = partial(fn, cent, r=r, k=k)

            def fwd(xyz, feats):
                return f(xyz, feats)

            def loss(xyz, feats):
                return fwd(xyz, feats).astype(jnp.float32).sum()

            grad_fn = jax.grad(
                loss, argnums=(0,) if feats is None else (0, 1))
            try:
                t_f = timeit(fwd, xyz, feats)
                t_b = timeit(grad_fn, xyz, feats)
                print(f"{name:12s} {vname:10s} fwd {t_f:7.3f} ms   "
                      f"fwd+bwd {t_b:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:12s} {vname:10s} FAILED: {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
