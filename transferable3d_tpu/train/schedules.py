"""LR and BatchNorm-momentum schedules with TF1-reference semantics.

Capability parity target: `get_learning_rate` / `get_bn_decay` in the
reference `train/train.py` (SURVEY.md C9, §7 hard-part 3):

  lr(step)  = max(lr_min, base * decay_rate ** floor(samples/decay_step))
  bnm(step) = min(0.99, 1 - 0.5 * 0.5   ** floor(samples/bn_decay_step))

where samples = step * batch_size (TF1 counted decay in *samples*, we keep
that so flag values carry over). Both are staircase. `bnm` is the running-
stats momentum fed to ScheduledBatchNorm (TF1 calls it bn_decay).
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_staircase_lr(base_lr: float = 1e-3,
                             decay_rate: float = 0.7,
                             decay_samples: float = 200000.0,
                             batch_size: int = 32,
                             min_lr: float = 1e-5):
    def schedule(step):
        samples = jnp.asarray(step, jnp.float32) * batch_size
        lr = base_lr * decay_rate ** jnp.floor(samples / decay_samples)
        return jnp.maximum(lr, min_lr)
    return schedule


def bn_momentum_schedule(init_decay: float = 0.5,
                         decay_rate: float = 0.5,
                         decay_samples: float = 200000.0,
                         batch_size: int = 32,
                         clip: float = 0.99):
    def schedule(step):
        samples = jnp.asarray(step, jnp.float32) * batch_size
        decay = init_decay * decay_rate ** jnp.floor(samples / decay_samples)
        return jnp.minimum(1.0 - decay, clip)
    return schedule
