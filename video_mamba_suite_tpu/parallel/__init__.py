"""Mesh-parallel execution: device meshes, sharded train steps, ring scan.

TPU-native replacement for the reference's four separate torch.distributed/
NCCL/DataParallel stacks (SURVEY.md §2.4): one `jax.sharding.Mesh` with named
axes ('data', 'seq'), pjit-sharded training steps, and a sequence-parallel
ring selective scan over the 'seq' axis (the scan analogue of ring attention,
which the reference lacks entirely).
"""

from .mesh import make_mesh, shard_batch, replicate_params, data_parallel_sharding
from .multihost import (
    initialize as initialize_multihost,
    is_primary,
    local_batch_to_global,
    sync_global_devices,
)
from .expert import MoEMlp, ep_shard_params, moe_dispatch
from .hlo_audit import (
    audit_collectives,
    collective_stats,
    ring_permute_budget,
)
from .pipeline import pipeline_apply, pp_mamba_blocks, pp_stack_params
from .ring_scan import ring_mamba_vim, ring_selective_scan
from .tensor_parallel import tp_mamba_forward, tp_shard_params

__all__ = [
    "initialize_multihost",
    "is_primary",
    "local_batch_to_global",
    "sync_global_devices",
    "make_mesh",
    "shard_batch",
    "replicate_params",
    "data_parallel_sharding",
    "MoEMlp",
    "audit_collectives",
    "collective_stats",
    "ring_permute_budget",
    "ep_shard_params",
    "moe_dispatch",
    "pipeline_apply",
    "pp_mamba_blocks",
    "pp_stack_params",
    "ring_mamba_vim",
    "ring_selective_scan",
    "tp_mamba_forward",
    "tp_shard_params",
]
