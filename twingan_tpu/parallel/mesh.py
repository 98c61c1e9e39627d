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

# The active device mesh, registered by the runner (set_current_mesh) so
# model-internal parallel paths (context-parallel self-attention,
# ops.sharded_attention_core) can reach it without threading a Mesh through
# every module signature. None = single-device / no mesh.
_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def create_mesh(devices: Optional[Iterable[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int = 4, axis: str = DATA_AXIS) -> NamedSharding:
    """Batch-dim sharding for an ndim-rank array (rank-0 → replicated —
    scalar batch leaves like per-batch weights have no batch axis)."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Batch-axis-shard every leaf across the mesh.

    Leaves hold the GLOBAL batch on every host. Single-process: one
    device_put. Multi-process (mesh spans hosts): each process contributes
    its local_batch_slice rows via make_array_from_process_local_data —
    device_put cannot target non-addressable devices."""
    return jax.tree_util.tree_map(
        lambda x: put_with_sharding(x, data_sharding(mesh, np.ndim(x), axis)),
        batch,
    )


def put_with_sharding(x: Any, sharding: NamedSharding) -> jax.Array:
    """device_put a host array to a sharding, multi-process-safe: when the
    sharding spans non-addressable devices, assemble the global array from
    this process's slice instead (every process holds the global value).

    The routing checks the SHARDING's devices, not jax.process_count():
    in a multi-process run a host-local sharding (e.g. a mesh over
    jax.local_devices() for per-host eval) is fully addressable and must
    take the plain device_put path — make_global_array would slice the
    already-local value."""
    if not sharding.is_fully_addressable:
        from twingan_tpu.parallel.multihost import make_global_array

        return make_global_array(x, sharding)
    return jax.device_put(x, sharding)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate every leaf across the mesh (all hosts must pass the
    same values — e.g. state initialized from the same PRNG seed)."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: put_with_sharding(x, sharding), tree
    )
