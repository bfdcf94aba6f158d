"""Device-mesh and sharding helpers — the TPU replacement for the reference's
MPI communicator + Distribution plumbing (SURVEY.md §2.5).

Vectors of dimension N are 1-D row-partitioned over the "data" mesh axis,
exactly like the reference's spread-remainder Distribution over MPI ranks
(util/Distribution.h:98-109); every contraction over N then psums over ICI
where the reference called MPI_Allreduce.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def block_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for (m, N) row-blocks: replicate rows, shard the vector axis."""
    return NamedSharding(mesh, PartitionSpec(None, axis))


def vector_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for (N,) vectors (e.g. diagonals)."""
    return NamedSharding(mesh, PartitionSpec(axis))


def matrix_row_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for an (N, N) operator partitioned by output rows."""
    return NamedSharding(mesh, PartitionSpec(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def init_multi_host(coordinator_address: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None) -> Mesh:
    """Initialise the jax distributed runtime and return the global 1-D mesh.

    The multi-host replacement for the reference's mpirun + communicator
    plumbing (SURVEY.md §2.5): one controller process per host, all chips of
    the pod slice joined into a single data-axis mesh; pjit/GSPMD then routes
    the psum/all-gather traffic over ICI within hosts and DCN between them.
    Arguments default to the TPU pod's automatic configuration.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return make_mesh()
