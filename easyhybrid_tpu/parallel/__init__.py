from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_epoch_tensors,
    data_parallel_sharding,
)
from .multisite import MultiSiteHybridModel

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_epoch_tensors",
    "data_parallel_sharding",
    "MultiSiteHybridModel",
]
