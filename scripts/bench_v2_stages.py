"""Per-stage fwd+bwd device-time attribution for the v2 model.

Wall timing through the TPU relay lies (CLAUDE.md), so each stage is
profiled in isolation and the xplane exclusive device time is reported
(utils.profiling.device_ms).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from transferable3d_tpu.models.pointnet2 import (FeaturePropagation,
                                                 SetAbstraction,
                                                 SetAbstractionMSG)
from transferable3d_tpu.utils.profiling import device_ms

B = 128
DTYPE = jnp.bfloat16


def bench_module(name, mod, *inputs):
    variables = mod.init(jax.random.PRNGKey(0), *inputs, train=True,
                         bn_momentum=0.9)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def loss_fn(p, *a):
        out, _ = mod.apply({"params": p, "batch_stats": bstats}, *a,
                           train=True, bn_momentum=0.9,
                           mutable=["batch_stats"])
        if isinstance(out, tuple):
            out = out[1]
        return jnp.sum(out.astype(jnp.float32))

    def fwdbwd(p, *a):
        grads = jax.grad(loss_fn)(p, *a)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(grads))

    ms = device_ms(fwdbwd, params, *inputs)
    print(f"{name:14s} fwd+bwd {ms:8.3f} ms/call (device-exclusive)")
    return ms


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="",
                    help="comma-separated stage-name substrings to run "
                         "(empty = all); e.g. --stages seg_sa,box_sa "
                         "for knob sweeps that only move the SA kernels")
    cli = ap.parse_args()
    wanted = [s for s in cli.stages.split(",") if s]

    def skip(name):
        return wanted and not any(w in name for w in wanted)

    rng = np.random.RandomState(0)

    def mk(n, c):
        xyz = jnp.asarray(rng.uniform(-2, 2, (B, n, 3)).astype(np.float32))
        feats = (jnp.asarray(rng.uniform(-1, 1, (B, n, c))
                             .astype(np.float32)).astype(DTYPE)
                 if c else None)
        return xyz, feats

    f = lambda n, c: jnp.asarray(
        rng.uniform(-1, 1, (B, n, c)).astype(np.float32)).astype(DTYPE)

    total = 0.0
    total += bench_module("seg_sa1", SetAbstractionMSG(
        npoint=128, radii=(0.2, 0.4, 0.8), nsamples=(32, 64, 128),
        mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
        dtype=DTYPE), *mk(1024, 1))
    total += bench_module("seg_sa2", SetAbstractionMSG(
        npoint=32, radii=(0.4, 0.8, 1.6), nsamples=(64, 64, 128),
        mlps=((64, 64, 128), (128, 128, 256), (128, 128, 256)),
        dtype=DTYPE), *mk(128, 320))
    total += bench_module("seg_sa3", SetAbstraction(
        npoint=0, radius=0.0, nsample=0, mlp=(128, 256, 1024),
        group_all=True, dtype=DTYPE), *mk(32, 771))
    total += bench_module("box_sa1", SetAbstraction(
        npoint=128, radius=0.2, nsample=64, mlp=(64, 64, 128),
        dtype=DTYPE), *mk(512, 0))
    total += bench_module("box_sa2", SetAbstraction(
        npoint=32, radius=0.4, nsample=64, mlp=(128, 128, 256),
        dtype=DTYPE), *mk(128, 128))
    total += bench_module("box_sa3", SetAbstraction(
        npoint=0, radius=0.0, nsample=0, mlp=(256, 256, 512),
        group_all=True, dtype=DTYPE), *mk(32, 256))

    x1, _ = mk(1, 0)
    x32, _ = mk(32, 0)
    x128, _ = mk(128, 0)
    x1024, _ = mk(1024, 0)
    total += bench_module("fp1", FeaturePropagation((128, 128),
                                                    dtype=DTYPE),
                          x32, x1, f(32, 771), f(1, 1034))
    total += bench_module("fp2", FeaturePropagation((128, 128),
                                                    dtype=DTYPE),
                          x128, x32, f(128, 320), f(32, 128))
    total += bench_module("fp3", FeaturePropagation((128, 128),
                                                    dtype=DTYPE),
                          x1024, x128, f(1024, 4), f(128, 128))

    print(f"{'TOTAL':14s}         {total:8.3f} ms  (compare against the "
          f"full-step wall time from T3D_MODEL=v2 bench.py)")


if __name__ == "__main__":
    main()
