"""Device mesh + sharding helpers for data-parallel training.

SURVEY.md §2.3: the reference has no distributed layer (single TF1 process,
optional in-host GPU towers). The TPU-native design scales batch-wise over
a 1-D `data` mesh axis: batches are sharded on axis 0, params/opt state are
replicated, and XLA inserts the gradient all-reduce over ICI from the
sharding annotations alone (jit + NamedSharding — the scaling-book recipe;
no explicit collectives in user code). Multi-host extends the same mesh via
`jax.distributed.initialize` (DCN) without touching the train step.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(devices: Optional[Sequence[jax.Device]] = None
                       ) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with axis 0 sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
