"""Explicit shard_map kernels for the distributed hot path.

The jnp-level ops in array/vector_ops.py rely on GSPMD to insert collectives;
these shard_map versions make the communication explicit — one psum per Gram
contraction over the sharded vector axis — matching the reference's pattern
of local CBLAS gemm + MPI_Allreduce (array/util/gemm.h:31-46). They are used
by tests to pin the collective structure and are available for manual
scheduling experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


def sharded_gram(mesh: Mesh, axis: str = DATA_AXIS):
    """Return a jitted (m,N)x(k,N)->(m,k) Gram with explicit psum over ICI."""

    @functools.partial(jax.jit)
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(),
    )
    def gram(x, y):
        local = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(local, axis)

    return gram


def sharded_reconstruct(mesh: Mesh, axis: str = DATA_AXIS):
    """coeff (m,k) x basis (k,N) -> (m,N): embarrassingly parallel over shards."""

    @functools.partial(jax.jit)
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
    )
    def reconstruct(coeff, basis):
        return jnp.matmul(coeff, basis, precision=jax.lax.Precision.HIGHEST)

    return reconstruct


def sharded_dot(mesh: Mesh, axis: str = DATA_AXIS):
    """Row-wise dots with explicit psum."""

    @functools.partial(jax.jit)
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(),
    )
    def dots(x, y):
        return jax.lax.psum(
            jnp.einsum("in,in->i", x, y, precision=jax.lax.Precision.HIGHEST), axis
        )

    return dots
