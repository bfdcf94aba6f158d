from .mesh import (
    DATA_AXIS,
    block_sharding,
    make_mesh,
    matrix_row_sharding,
    replicated,
    vector_sharding,
)
from . import collectives
from .sharded_bsr import ShardedBSR, ShardedBSRInt8
from .sharded_symm import ShardedSymmetric

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "block_sharding",
    "vector_sharding",
    "matrix_row_sharding",
    "replicated",
    "collectives",
    "ShardedBSR",
    "ShardedBSRInt8",
    "ShardedSymmetric",
]
