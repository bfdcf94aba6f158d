"""DistrArray — the reference's distributed-vector contract over jax.

API-parity layer for the reference's abstract DistrArray
(reference: array/DistrArray.h:90-300): a 1-D double vector partitioned
contiguously over ranks with one-sided element access, local linear algebra,
collective dots and top-n selections.  Here the storage is a sharded
jax.Array over a 1-D device mesh; "ranks" are mesh devices, the Distribution
describes the contiguous ranges (spread-remainder, matching
DistrArrayDefaultRange in the C bindings), RMA get/put become functional
slice updates, and the collectives (dot -> psum, gather_all ->
full replication) are XLA collectives instead of MPI_Allreduce/Allgatherv
(DistrArray.cpp:126-136, util/gather_all.h:15-26).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import vector_ops as vops
from .distribution import Distribution, spread_remainder

Array = jax.Array


class DistrArray:
    def __init__(
        self,
        dimension: int,
        mesh=None,
        data=None,
        dtype=None,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.dimension = int(dimension)
        self.dtype = dtype
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            self.sharding = NamedSharding(mesh, PartitionSpec(axis))
            n_ranks = mesh.devices.size
        else:
            self.sharding = None
            n_ranks = 1
        self._distribution = spread_remainder(dimension, n_ranks)
        # physical storage pads to a multiple of the mesh size (XLA shards
        # must divide evenly; the logical Distribution keeps the reference's
        # uneven spread-remainder ranges)
        self._storage_n = ((dimension + n_ranks - 1) // n_ranks) * n_ranks
        if data is None:
            arr = jnp.zeros((self._storage_n,), dtype=dtype)
        else:
            host = np.zeros(self._storage_n, dtype=np.float64)
            host[:dimension] = np.asarray(data, dtype=np.float64)
            arr = jnp.asarray(host, dtype=dtype)
        if self.sharding is not None:
            arr = jax.device_put(arr, self.sharding)
        self.data = arr

    # -- structure -------------------------------------------------------
    @property
    def size(self) -> int:
        return self.dimension

    def distribution(self) -> Distribution:
        return self._distribution

    def compatible(self, other: "DistrArray") -> bool:
        return self.dimension == other.dimension and self._distribution.compatible(
            other._distribution
        )

    def local_buffer(self, rank: int = 0) -> np.ndarray:
        """Copy of the contiguous range owned by ``rank`` (DistrArray.h:117-143)."""
        lo, hi = self._distribution.range(rank)
        return np.asarray(self.data[lo:hi])

    def clone(self) -> "DistrArray":
        out = DistrArray(self.dimension, self.mesh, dtype=self.dtype)
        out.data = self.data
        return out

    # -- one-sided access (RMA equivalents, DistrArray.h:145-181) --------
    def at(self, index: int) -> float:
        return float(self.data[index])

    def set(self, index: int, value: float) -> None:
        self.data = self.data.at[index].set(value)

    def get(self, lo: int, hi: int) -> np.ndarray:
        return np.asarray(self.data[lo:hi])

    def put(self, lo: int, values) -> None:
        values = jnp.asarray(np.asarray(values), dtype=self.dtype)
        self.data = jax.lax.dynamic_update_slice(self.data, values, (jnp.asarray(lo),))

    def acc(self, lo: int, values) -> None:
        values = jnp.asarray(np.asarray(values), dtype=self.dtype)
        self.data = self.data.at[lo : lo + values.shape[0]].add(values)

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        return np.asarray(self.data[jnp.asarray(list(indices), dtype=jnp.int32)])

    def scatter(self, indices: Sequence[int], values) -> None:
        idx = jnp.asarray(list(indices), dtype=jnp.int32)
        self.data = self.data.at[idx].set(jnp.asarray(np.asarray(values), dtype=self.dtype))

    def scatter_acc(self, indices: Sequence[int], values) -> None:
        idx = jnp.asarray(list(indices), dtype=jnp.int32)
        self.data = self.data.at[idx].add(jnp.asarray(np.asarray(values), dtype=self.dtype))

    def gather_all(self) -> np.ndarray:
        """Full replicated copy (util/gather_all.h — MPI_Allgatherv)."""
        return np.asarray(self.data)[: self.dimension]

    # -- local linear algebra (DistrArray.h:183-221) ---------------------
    def fill(self, value: float) -> None:
        filled = jnp.full_like(self.data, value)
        if self._storage_n != self.dimension:
            mask = jnp.arange(self._storage_n) < self.dimension
            filled = jnp.where(mask, filled, 0.0)
        self.data = filled

    def copy_from(self, other: "DistrArray") -> None:
        self.data = other.data

    def axpy(self, alpha: float, x: "DistrArray") -> None:
        self.data = self.data + self.dtype(alpha) * x.data

    def scal(self, alpha: float) -> None:
        self.data = self.data * self.dtype(alpha)

    def add(self, other: "DistrArray") -> None:
        self.data = self.data + other.data

    def sub(self, other: "DistrArray") -> None:
        self.data = self.data - other.data

    def recip(self) -> None:
        mask = jnp.arange(self._storage_n) < self.dimension
        self.data = jnp.where(mask, 1.0 / jnp.where(mask, self.data, 1.0), 0.0)

    def times(self, other: "DistrArray") -> None:
        self.data = self.data * other.data

    def divide(self, a: "DistrArray", b: "DistrArray", shift: float = 0.0,
               append: bool = False, negative: bool = False) -> None:
        """this = (+/-) a / (b + shift), optionally accumulated (DistrArray.h:231-243)."""
        denom = b.data + shift
        if self._storage_n != self.dimension:
            # keep padding at zero (0/0 would poison later collectives)
            mask = jnp.arange(self._storage_n) < self.dimension
            denom = jnp.where(mask, denom, 1.0)
        val = a.data / denom
        if negative:
            val = -val
        self.data = self.data + val if append else val

    # -- collectives -----------------------------------------------------
    def dot(self, other: "DistrArray") -> float:
        """Global dot product: local partials + psum over the mesh
        (DistrArray.cpp:126-136's MPI_Allreduce)."""
        return float(jnp.dot(self.data, other.data, precision=jax.lax.Precision.HIGHEST))

    def norm(self) -> float:
        return float(jnp.sqrt(jnp.abs(jnp.dot(self.data, self.data, precision=jax.lax.Precision.HIGHEST))))

    # -- reductions / selections (DistrArray.h:245-283) ------------------
    def _top_pairs(self, values: Array, n: int, largest: bool) -> List[Tuple[int, float]]:
        n = min(n, self.dimension)
        if self._storage_n != self.dimension:
            mask = jnp.arange(self._storage_n) < self.dimension
            pad = -jnp.inf if largest else jnp.inf
            values = jnp.where(mask, values, pad)
        vals, idx = jax.lax.top_k(values if largest else -values, n)
        idx = np.asarray(idx)
        return [(int(i), float(self.data[int(i)])) for i in idx]

    def max_n(self, n: int) -> List[Tuple[int, float]]:
        return self._top_pairs(self.data, n, True)

    def min_n(self, n: int) -> List[Tuple[int, float]]:
        return self._top_pairs(self.data, n, False)

    def max_abs_n(self, n: int) -> List[Tuple[int, float]]:
        return self._top_pairs(jnp.abs(self.data), n, True)

    def min_abs_n(self, n: int) -> List[Tuple[int, float]]:
        return self._top_pairs(jnp.abs(self.data), n, False)

    def min_loc_n(self, n: int) -> List[int]:
        return [i for i, _ in self.min_n(n)]

    def select(self, n: int, max_select: bool = False, ignore_sign: bool = False):
        """Top-n elements as {index: value} (handler select semantics)."""
        vals = jnp.abs(self.data) if ignore_sign else self.data
        pairs = self._top_pairs(vals, n, max_select)
        return dict(pairs)

    def select_max_dot(self, n: int, other: "DistrArray"):
        """n largest |this_i * other_i| contributions (util/select_max_dot.h)."""
        idx, _ = vops.select_max_dot(
            self.data[: self.dimension], other.data[: self.dimension], min(n, self.dimension)
        )
        idx = np.asarray(idx)
        return {int(i): float(self.data[int(i)] * other.data[int(i)]) for i in idx}
