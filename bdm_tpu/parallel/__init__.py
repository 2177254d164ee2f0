"""Device-mesh parallelism.

The reference's only real strategy is DDP via HuggingFace accelerate
(`main.py:39-43,110-120`; NCCL grad sync). The TPU-native equivalent is
SPMD: one `jax.sharding.Mesh`, batch sharded over the 'dp' axis, params
replicated, and XLA inserting the grad-reduction collectives over ICI.
No user-level transport code exists or is needed.
"""

from bdm_tpu.parallel.mesh import (
    get_mesh,
    get_mesh_for_batch,
    shard_batch,
    replicate,
    batch_sharding,
)

__all__ = ["get_mesh", "get_mesh_for_batch", "shard_batch", "replicate",
           "batch_sharding"]
