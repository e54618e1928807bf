"""Arbitrate: fused kernels vs ball_query_group one-hot VJP vs a plain
gather formulation (indices from ball_query), all on CPU, eval mode
with shared running stats. Whoever disagrees with the gather autodiff
is the buggy side."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from transferable3d_tpu.ops import fused_sa
from transferable3d_tpu.ops.grouping import ball_query_group, ball_query

B, N = 128, 1024
s, k, feats, radius = 16, 32, (16, 24, 40), 0.6
rng = np.random.RandomState(3)
f0 = feats[0]
cent = jnp.asarray(rng.uniform(-2, 2, (B, s, 3)).astype(np.float32))
xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
pf = jnp.asarray(rng.uniform(-1, 1, (B, N, f0)).astype(np.float32)
                 ).astype(jnp.bfloat16)
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
args = (pf, qc, ws, bs)

_, m_, v_ = fused_sa.fused_grouped_chain(
    cent, xyz, pf, qc, gammas, betas, ws, bs, radius, k, 1e-3,
    True, None, True, "rows")
running = tuple((m_[i], v_[i]) for i in range(len(feats)))

idx, cntq = ball_query(cent, xyz, radius, k)   # [B,S,K] indices


def chain(x, ws_, bs_):
    for i in range(len(feats)):
        xf = x.astype(jnp.float32)
        mu, var = running[i]
        r = jax.lax.rsqrt(var + 1e-3)
        a_ = gammas[i] * r
        y = (xf * a_ + (betas[i] - mu * a_)).astype(jnp.bfloat16)
        h = jnp.maximum(y, jnp.bfloat16(0))
        x = ((jnp.dot(h, ws_[i].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bs_[i]
              ).astype(jnp.bfloat16) if i < len(feats) - 1 else h)
    return jnp.sum(jnp.max(x, axis=2).astype(jnp.float32))


def loss_onehot(a):
    pf_, qc_, ws_, bs_ = a
    grouped, _ = ball_query_group(cent, xyz, pf_, radius, k,
                                  include_xyz=False)
    return chain(grouped - qc_[:, :, None, :], ws_, bs_)


def loss_gather(a):
    pf_, qc_, ws_, bs_ = a
    grouped = jnp.take_along_axis(pf_[:, None, :, :].repeat(s, 1),
                                  idx[..., None], axis=2)
    return chain(grouped - qc_[:, :, None, :], ws_, bs_)


def loss_fused(a, layout):
    pf_, qc_, ws_, bs_ = a
    out = fused_sa.fused_grouped_chain(
        cent, xyz, pf_, qc_, gammas, betas, ws_, bs_, radius, k,
        1e-3, False, running, True, layout)
    return jnp.sum(out[0].astype(jnp.float32))


# primal agreement of the gather formulation first
l_oh = float(jax.jit(loss_onehot)(args))
l_ga = float(jax.jit(loss_gather)(args))
print(f"primal: onehot={l_oh:.2f} gather={l_ga:.2f}", flush=True)

g_ga = jax.jit(jax.grad(loss_gather))(args)
g_oh = jax.jit(jax.grad(loss_onehot))(args)
g_fu = jax.jit(jax.grad(lambda a: loss_fused(a, "rows")))(args)

names = ["pf", "qc", "w0", "w1"]
def rels(tag, gr, gn):
    rl = [gr[0], gr[1], gr[2][0], gr[2][1]]
    gl = [gn[0], gn[1], gn[2][0], gn[2][1]]
    out = []
    for nm, x, y in zip(names, rl, gl):
        x = np.asarray(x, np.float32); y = np.asarray(y, np.float32)
        out.append(f"{nm}={np.linalg.norm(x-y)/max(1e-6,np.linalg.norm(x)):.2e}")
    print(tag + ": " + "  ".join(out), flush=True)

rels("onehot vs gather", g_ga, g_oh)
rels("fused  vs gather", g_ga, g_fu)
rels("fused  vs onehot", g_oh, g_fu)
print("DONE", flush=True)
