"""SPMD parallelism over device meshes (the reference's DataParallel,
rebuilt as jax.sharding + jit)."""
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to,
    replicate,
    replicated,
    shard_batch,
    spatial_sharding,
)
from .serving import DataParallelEngine

__all__ = [
    "DataParallelEngine",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "pad_batch_to",
    "replicate",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]
