"""Probe which in-kernel bf16-rounding idioms Mosaic legalizes AND
executes bit-exactly vs lax.reduce_precision (the XLA reference).

Context: Pallas TPU lowering rejects lax.reduce_precision (KernelType.TC),
which round-3's in-kernel stored-bf16 discipline relied on. Candidates:
  castpair : x.astype(bf16).astype(f32)  — valid iff Mosaic doesn't elide
             the lossy convert pair (XLA's excess-precision pass does).
  bitrne   : round-to-nearest-even via u32 bit ops
             u = bitcast(x); r = (u + 0x7FFF + ((u>>16)&1)) & 0xFFFF0000.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _castpair(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _bitrne(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = (u + jnp.uint32(0x7FFF) + ((u >> jnp.uint32(16)) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def _kernel(fn, x_ref, o_ref):
    # Consume the rounded value ONLY in f32 math (the elision-prone shape).
    y = fn(x_ref[...])
    o_ref[...] = y * 1.0 + (y - y)


def run(name, fn, x):
    try:
        out = pl.pallas_call(
            functools.partial(_kernel, fn),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x)
        ref = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
        ok = bool(jnp.all(out == ref))
        # Also ensure it actually rounded (not elided): out != x somewhere.
        rounded = bool(jnp.any(out != x))
        print(f"{name}: compiled ok, bit_exact={ok}, actually_rounds={rounded}")
        return ok and rounded
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")
        return False


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 256), jnp.float32) * 100.0
    print("devices:", jax.devices())
    run("castpair", _castpair, x)
    run("bitrne", _bitrne, x)
