"""Device-mesh data parallelism (replaces reference deployment/model_deploy.py).

The reference's multi-GPU story is in-graph clones with graph-level gradient
add_n and variables pinned to GPU0/PS tasks. The TPU-native equivalent is
single-controller SPMD: one mesh over ICI, parameters replicated, the batch
sharded on the 'data' axis, XLA inserting the gradient all-reduce
(SURVEY.md sections 2.5/5.8).
"""

from twingan_tpu.parallel.mesh import (
    create_mesh,
    current_mesh,
    set_current_mesh,
    shard_batch,
    replicate,
    data_sharding,
    put_with_sharding,
    replicated_sharding,
)
from twingan_tpu.parallel.multihost import (
    initialize_from_env,
    local_batch_slice,
    make_global_array,
)
