"""Parallelism & distributed layer — absent in the single-GPU reference
(SURVEY §2.7) but first-class here: device meshes, sharding rules for
batched inference (DP) and weight sharding (TP), and multi-host init.
"""

from dlq_tpu.parallel.mesh import MeshConfig, make_mesh  # noqa: F401
from dlq_tpu.parallel.shard import (  # noqa: F401
    shard_batch,
    shard_params_tp,
    replicate,
)
