"""Multi-host (DCN) initialization for multi-slice / multi-process runs.

The reference's multi-replica story is TF1 PS/worker flags
(/root/reference/model/model_inheritor.py:82-107 + SyncReplicasOptimizer at
:1081-1089, documented untested at docs/training.md:110-124). The TPU-native
equivalent keeps the exact same SPMD program: `jax.distributed.initialize`
turns N processes into one logical device set, the mesh in
`twingan_tpu.parallel.create_mesh` spans all global devices, and the same
replicated-params / batch-sharded layout rides ICI within a slice and DCN
across slices — XLA places the gradient all-reduce hierarchically on its
own. No code in the trainers changes between 1 and N hosts.

Single-host environments (this image has one TPU chip) exercise the no-op
path of `initialize_from_env()`; the multi-process branch is executed for
real by tests/test_multihost.py — two OS processes x two virtual CPU devices
each, gloo collectives over localhost standing in for DCN — which asserts a
full TwinGAN training round matches the single-process 4-device run.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

import jax


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Resolution order: explicit args, then JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment variables (also set by
    TPU pod runtimes automatically — in that case bare
    ``jax.distributed.initialize()`` self-configures). Returns True when
    distributed mode was initialized, False for the single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if not coordinator_address and num_processes in (None, 0, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded batch: hosts feed only
    their local shard (jax.make_array_from_process_local_data pattern)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global_batch {global_batch} not divisible by process_count {n}"
            " — remainder samples would be silently dropped"
        )
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_array(x: Any, sharding) -> jax.Array:
    """Assemble one global jax.Array from per-process host data.

    ``x`` is the GLOBAL-shape host array; every process passes the same
    value (the deterministic-iterator pattern: all hosts run the same
    seeded data iterator and this helper slices out their shard). For a
    batch-sharded ``sharding`` each process contributes rows
    ``local_batch_slice``; for a fully-replicated sharding each process
    contributes the whole array."""
    x = np.asarray(x)
    spec = sharding.spec
    if any(s is not None for s in spec[1:]):
        # Only leading-axis (batch) sharding is implemented; silently
        # passing the full global array as "process-local data" for an
        # inner-axis sharding would mis-assemble the global array.
        # (Callers needing inner-axis sharding slice their own shard and
        # call jax.make_array_from_process_local_data directly, as
        # stage_runner's stacked-scan transfer does.)
        raise NotImplementedError(
            f"make_global_array handles leading-axis sharding only, got {spec}")
    if len(spec) and spec[0] is not None:
        x = x[local_batch_slice(x.shape[0])]
    return jax.make_array_from_process_local_data(sharding, x)
