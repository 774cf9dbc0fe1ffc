from .block import TensorBlock, TensorMap
from .labels import Labels
from .system import (
    NeighborData,
    System,
    SystemBatch,
    batch_from_systems,
    bucket_atoms,
    bucket_neighbors,
    bucket_size,
    systems_to_lists,
)

__all__ = [
    "Labels",
    "TensorBlock",
    "TensorMap",
    "System",
    "SystemBatch",
    "NeighborData",
    "batch_from_systems",
    "bucket_atoms",
    "bucket_neighbors",
    "bucket_size",
    "systems_to_lists",
]
