"""Fixed-capacity device-resident basis stacks (the Q/D/P vector store).

The reference keeps its Q-space history as a list of individually-allocated
(often disk-backed) distributed vectors streamed through BufferManager pages
(reference: array/DistrArrayFile.*, array/util/BufferManager.h:136-173).  The
TPU-native equivalent is one preallocated ``(capacity, N)`` HBM array per
store with host-side slot management:

- static shape => every gram/reconstruct against the stack compiles once;
- appending a vector is an in-place donated row write (no realloc, no copy of
  the history);
- the full-stack matmul IS the streamed gemm: XLA tiles the (capacity, N)
  operand through VMEM exactly like BufferManager paged the file through RAM,
  and on a sharded mesh the contraction reduction rides ICI.

Logical ordering (e.g. the Q space's newest-first list, QSpace.h:80-85) lives
on the host as a list of slot ids; erasure is O(1) slot free with no device
traffic (the reference's matrix shuffles happen on tiny host matrices).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import vector_ops as vops

Array = jax.Array


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_row(data: Array, slot, row: Array) -> Array:
    return data.at[slot].set(row)


@functools.partial(jax.jit, donate_argnums=(0,))
def _fill_row(data: Array, slot, value) -> Array:
    return data.at[slot].set(value)


@functools.partial(jax.jit, donate_argnums=(0,))
def _axpy_row(data: Array, slot, alpha, row: Array) -> Array:
    return data.at[slot].add(alpha * row)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scale_row(data: Array, slot, alpha) -> Array:
    return data.at[slot].multiply(alpha)


@functools.partial(jax.jit)
def _gram_against(x: Array, data: Array) -> Array:
    return jnp.matmul(x, data.T, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit)
def _combine(coeff_full: Array, data: Array) -> Array:
    return jnp.matmul(coeff_full, data, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit)
def _combine_add(out: Array, coeff_full: Array, data: Array) -> Array:
    return out + jnp.matmul(coeff_full, data, precision=jax.lax.Precision.HIGHEST)


class BasisStore:
    """Slot-managed ``(capacity, N)`` device stack of basis vectors."""

    def __init__(
        self,
        capacity: int,
        n: int,
        dtype=jnp.float64,
        sharding=None,
        name: str = "basis",
    ):
        self.capacity = int(capacity)
        self.n = int(n)
        self.dtype = dtype
        self.sharding = sharding
        self.name = name
        data = jnp.zeros((self.capacity, self.n), dtype=dtype)
        if sharding is not None:
            data = jax.device_put(data, sharding)
        self.data = data
        self._free: List[int] = list(range(self.capacity - 1, -1, -1))

    # -- slot management -------------------------------------------------
    @property
    def n_used(self) -> int:
        return self.capacity - len(self._free)

    def alloc(self) -> int:
        if not self._free:
            self._grow()
        return self._free.pop()

    def release(self, slot: int) -> None:
        self._free.append(slot)

    def _grow(self) -> None:
        new_capacity = max(2 * self.capacity, 4)
        pad = jnp.zeros((new_capacity - self.capacity, self.n), dtype=self.dtype)
        data = jnp.concatenate([self.data, pad], axis=0)
        if self.sharding is not None:
            data = jax.device_put(data, self.sharding)
        self.data = data
        self._free.extend(range(new_capacity - 1, self.capacity - 1, -1))
        self.capacity = new_capacity

    # -- row access ------------------------------------------------------
    def put(self, slot: int, vec) -> None:
        self.data = _set_row(self.data, slot, jnp.asarray(vec, dtype=self.dtype))

    def append(self, vec) -> int:
        slot = self.alloc()
        self.put(slot, vec)
        return slot

    def get(self, slot: int) -> Array:
        return self.data[slot]

    def fill(self, slot: int, value: float) -> None:
        self.data = _fill_row(self.data, slot, jnp.asarray(value, dtype=self.dtype))

    def axpy(self, slot: int, alpha: float, vec) -> None:
        self.data = _axpy_row(
            self.data, slot, jnp.asarray(alpha, dtype=self.dtype), jnp.asarray(vec, dtype=self.dtype)
        )

    def scale(self, slot: int, alpha: float) -> None:
        self.data = _scale_row(self.data, slot, jnp.asarray(alpha, dtype=self.dtype))

    def rows(self, slots: Sequence[int]) -> Array:
        """Gather logical rows as a dense (len(slots), N) block."""
        if len(slots) == 0:
            return jnp.zeros((0, self.n), dtype=self.dtype)
        return self.data[jnp.asarray(list(slots), dtype=jnp.int32)]

    # -- block numerics --------------------------------------------------
    def gram_block(self, x: Array) -> np.ndarray:
        """<x_i, basis_slot> for EVERY physical slot: (m, capacity) host array.

        One static-shape matmul; callers index the tiny result by their
        logical slot lists. (Unused slots contribute garbage columns that are
        simply never read.)"""
        return np.asarray(_gram_against(x, self.data))

    def mgs_sweep(self, r: Array, slots: Sequence[int], inv_norms) -> Array:
        """Sequential modified-Gram-Schmidt of the rows of ``r`` against the
        logical rows ``slots`` in order, scaling each projection by
        ``inv_norms`` (1/<x,x>). Device path: one fused fori_loop kernel."""
        from . import vector_ops as vops

        idx = np.zeros(self.capacity, dtype=np.int32)
        inv = np.zeros(self.capacity)
        for logical, slot in enumerate(slots):
            idx[logical] = slot
            inv[logical] = inv_norms[logical]
        xblock = self.data[jnp.asarray(idx)]
        return vops.mgs_project(r, xblock, jnp.asarray(inv, dtype=self.dtype))

    def gram(self, x: Array, slots: Sequence[int]) -> np.ndarray:
        """<x_i, basis_j> for the logical rows ``slots``: returns (m, k) host array.

        One static-shape matmul against the whole stack; the logical gather
        happens on the tiny (m, capacity) result.
        """
        if len(slots) == 0:
            return np.zeros((x.shape[0], 0))
        full = np.asarray(_gram_against(x, self.data))
        return full[:, list(slots)]

    def combine(self, coeff: np.ndarray, slots: Sequence[int]) -> Array:
        """Rows of ``coeff @ basis[slots]`` as a device block (nsol, N)."""
        coeff = np.asarray(coeff, dtype=np.float64)
        nsol = coeff.shape[0]
        coeff_full = np.zeros((nsol, self.capacity))
        if len(slots):
            coeff_full[:, list(slots)] = coeff
        return _combine(jnp.asarray(coeff_full, dtype=self.dtype), self.data)

    def combine_add(self, out: Array, coeff: np.ndarray, slots: Sequence[int]) -> Array:
        coeff = np.asarray(coeff, dtype=np.float64)
        nsol = coeff.shape[0]
        if len(slots) == 0:
            return out
        coeff_full = np.zeros((nsol, self.capacity))
        coeff_full[:, list(slots)] = coeff
        return _combine_add(out, jnp.asarray(coeff_full, dtype=self.dtype), self.data)
