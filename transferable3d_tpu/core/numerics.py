"""Numeric helpers shared by the one-hot-contraction code paths."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def exact_hi_lo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split f32 `x` into bf16-valued (hi, lo) with x ~= hi + lo.

    For one-hot MXU contractions: the selection sum has a single term
    per output row, so oh@hi + oh@lo reconstructs x to ~16-bit mantissa
    accuracy even though the MXU rounds its operands to bf16.

    MUST be used instead of the naive `hi = x.astype(bf16);
    lo = x - hi.astype(f32)` pattern: TPU XLA compiles with excess
    precision allowed and ELIDES the f32->bf16->f32 convert pair, which
    silently turns `lo` into exact zeros (verified on v5e — the naive
    split's lo dot contributed nothing). `lax.reduce_precision` is the
    rounding op the simplifier must preserve.

    Returns f32 arrays whose values are exactly bf16-representable
    (casting them to bf16 is lossless).
    """
    hi = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    lo = jax.lax.reduce_precision(x - hi, exponent_bits=8,
                                  mantissa_bits=7)
    return hi, lo
