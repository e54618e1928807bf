"""Bisect the fused-vs-unfused dpf mismatch at the validate config.

All CPU (hardware == interpret to 4e-4 shown earlier). Stages:
  1. z1 from the extraction kernel vs bf16(grouped - qc): bitwise.
  2. extraction stat sums vs XLA sums.
  3. eval-mode (identical running stats) pooled: bitwise.
  4. eval-mode grads: per-leaf rel.
  5. train-mode pooled + grads: per-leaf rel.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from transferable3d_tpu.ops import fused_sa
from transferable3d_tpu.ops.grouping import ball_query_group

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

# ---- stage 1: z1 bitwise
z1_k, s0, q0 = fused_sa._call_extract(cent, xyz, pf, qc, radius, k, True)
grouped, cnt = ball_query_group(cent, xyz, pf, radius, k, include_xyz=False)
z1_r = (grouped - qc[:, :, None, :])  # bf16 arithmetic
z1_k32 = np.asarray(z1_k, np.float32).reshape(B, s, k, f0)
z1_r32 = np.asarray(z1_r, np.float32)
nbad = int((z1_k32 != z1_r32).sum())
print(f"z1 bitwise mismatches: {nbad} / {z1_k32.size}"
      f"  maxabsdiff={np.abs(z1_k32 - z1_r32).max():.3e}", flush=True)
if nbad:
    # where: which balls?
    badmask = (z1_k32 != z1_r32).any(axis=(2, 3))
    print(f"  balls affected: {int(badmask.sum())} / {B*s}", flush=True)

# ---- stage 2: stat sums
m = B * s * k
xf = z1_r.astype(jnp.float32)
s_ref = jnp.sum(xf, axis=(0, 1, 2))
q_ref = jnp.sum(xf * xf, axis=(0, 1, 2))
print("stat sums rel:",
      float(jnp.linalg.norm(s0 - s_ref) / jnp.linalg.norm(s_ref)),
      float(jnp.linalg.norm(q0 - q_ref) / jnp.linalg.norm(q_ref)),
      flush=True)

# ---- unfused forward given fixed per-layer (mu, var)
def unfused_pooled(a, running):
    pf_, qc_, ws_, bs_ = a
    grouped, _ = ball_query_group(cent, xyz, pf_, radius, k,
                                  include_xyz=False)
    x = grouped - qc_[:, :, None, :]
    for i in range(len(feats)):
        xf = x.astype(jnp.float32)
        if running is None:
            mu = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mu * mu
        else:
            mu, var = running[i]
        r = jax.lax.rsqrt(var + 1e-3)
        a_ = gammas[i] * r
        y = (xf * a_ + (betas[i] - mu * a_)).astype(jnp.bfloat16)
        h = jnp.maximum(y, jnp.bfloat16(0))
        x = ((jnp.dot(h, ws_[i].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bs_[i]
              ).astype(jnp.bfloat16) if i < len(feats) - 1 else h)
    return jnp.max(x, axis=2)

def fused_pooled(a, train, running):
    pf_, qc_, ws_, bs_ = a
    out = fused_sa.fused_grouped_chain(
        cent, xyz, pf_, qc_, gammas, betas, ws_, bs_, radius, k,
        1e-3, train, running, True, "rows")
    return out[0]

args = (pf, qc, ws, bs)
# identical running stats for both sides, from the fused train pass
_, m_, v_ = fused_sa.fused_grouped_chain(
    cent, xyz, pf, qc, gammas, betas, ws, bs, radius, k, 1e-3,
    True, None, True, "rows")
running = tuple((m_[i], v_[i]) for i in range(len(feats)))

# ---- stage 3: eval pooled bitwise
p_u = np.asarray(unfused_pooled(args, running), np.float32)
p_f = np.asarray(fused_pooled(args, False, running),
                 np.float32)
print(f"eval pooled bitwise mismatches: {int((p_u != p_f).sum())} "
      f"/ {p_u.size}  maxabs={np.abs(p_u-p_f).max():.3e}", flush=True)

# ---- stage 4: eval grads
names = ["pf", "qc", "w0", "w1"]
def rels(gr, gn):
    rl = [gr[0], gr[1], gr[2][0], gr[2][1]]
    gl = [gn[0], gn[1], gn[2][0], gn[2][1]]
    out = []
    for nm, x, y in zip(names, rl, gl):
        x = np.asarray(x, np.float32); y = np.asarray(y, np.float32)
        out.append(f"{nm}={np.linalg.norm(x-y)/max(1e-6,np.linalg.norm(x)):.2e}")
    return "  ".join(out)

gr = jax.jit(jax.grad(lambda a: jnp.sum(
    unfused_pooled(a, running).astype(jnp.float32))))(args)
gn = jax.jit(jax.grad(lambda a: jnp.sum(fused_pooled(
    a, False, running).astype(jnp.float32))))(args)
print(f"eval grads: {rels(gr, gn)}", flush=True)

# ---- stage 5: train pooled + grads
p_u = np.asarray(unfused_pooled(args, None), np.float32)
p_f = np.asarray(fused_pooled(args, True, None), np.float32)
print(f"train pooled: mismatches={int((p_u != p_f).sum())}/{p_u.size} "
      f" maxrel={np.abs(p_u-p_f).max()/np.abs(p_u).max():.2e}", flush=True)
gr = jax.jit(jax.grad(lambda a: jnp.sum(
    unfused_pooled(a, None).astype(jnp.float32))))(args)
gn = jax.jit(jax.grad(lambda a: jnp.sum(fused_pooled(
    a, True, None).astype(jnp.float32))))(args)
print(f"train grads: {rels(gr, gn)}", flush=True)
print("DONE", flush=True)
