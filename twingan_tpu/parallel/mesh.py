"""Mesh construction and sharding helpers.

Design: the GAN is small enough (<= ~25M params at 256px) that parameters are
replicated and only the batch axis is sharded — pure DP, exactly the
capability surface of the reference's model_deploy (which has no
tensor/pipeline parallelism to mirror, SURVEY.md section 2.5). Gradient
all-reduce happens inside jit: with replicated-param out-shardings XLA emits
a single fused psum over ICI per step, replacing _sum_clones_gradients's
graph-level add_n (reference deployment/model_deploy.py:473-503).

The same jitted train steps from GanTrainer run unchanged: jit compiles an
SPMD program from the argument shardings, so single-chip and multi-chip use
one code path. Under jit's global-view semantics batch-norm moments and
minibatch-stddev reduce over the *global* batch (the improved 'synced'
behavior; per-device statistics parity is available via
DomainNorm(sync_axis=...) + shard_map if ever needed).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Iterable[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int = 4, axis: str = DATA_AXIS) -> NamedSharding:
    """Batch-dim sharding for an ndim-rank array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """device_put every leaf with its batch axis split across the mesh."""

    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf fully replicated across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
