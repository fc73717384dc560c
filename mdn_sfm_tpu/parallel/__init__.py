"""Device-mesh and sharding helpers — the framework's communication layer.

The reference has no distributed backend at all (single process, one CUDA
device — SURVEY.md §2); parallelism here is TPU-native: a 1-D ``Mesh`` over
all chips, batch-axis data sharding with replicated params, and XLA-emitted
gradient all-reduce over ICI (no NCCL/MPI analog needed).
"""

from .distributed import barrier, maybe_initialize_distributed
from .mesh import (
    data_sharding,
    global_batch_to_device,
    host_local,
    make_mesh,
    make_spatial_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_spatial_mesh",
    "data_sharding",
    "shard_batch",
    "replicate",
    "host_local",
    "global_batch_to_device",
    "maybe_initialize_distributed",
    "barrier",
]
