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
POINTS_AXIS = "points"


def data_parallel_mesh(devices: Optional[Sequence[jax.Device]] = None
                       ) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_points_mesh(data: int, points: int,
                     devices: Optional[Sequence[jax.Device]] = None
                     ) -> Mesh:
    """2-D mesh (data, points): batch DP x points-axis sharding.

    The survey's sequence-parallel analog (SURVEY.md §5.7): the per-point
    MLPs are pointwise, so sharding the N axis only costs collectives at
    the max-pool (pmax) and BN statistics (psum) — all inserted by XLA
    from the sharding annotations. Useful when N grows beyond per-chip
    HBM (whole-scene variants); at N=1024 plain DP is faster.
    """
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= data * points
    arr = np.asarray(devices[:data * points]).reshape(data, points)
    return Mesh(arr, (DATA_AXIS, POINTS_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across 'data'; axis 1 (points) across
    'points' when the mesh has that axis."""
    if POINTS_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, POINTS_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with axis 0 sharded over the mesh.

    On a (data, points) mesh, arrays whose axis 1 is the points axis
    (divisible by the points mesh size and larger than label vectors)
    are additionally sharded along it; label arrays stay DP-only.
    """
    if POINTS_AXIS not in mesh.axis_names:
        sh = batch_sharding(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batch)

    n_points_shards = mesh.shape[POINTS_AXIS]
    dp_only = NamedSharding(mesh, P(DATA_AXIS))
    dp_points = NamedSharding(mesh, P(DATA_AXIS, POINTS_AXIS))

    def place(x):
        if (x.ndim >= 2 and x.shape[1] > 16
                and x.shape[1] % n_points_shards == 0):
            return jax.device_put(x, dp_points)
        return jax.device_put(x, dp_only)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
