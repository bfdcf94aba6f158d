"""Host/disk-offloaded basis store — the pluggable Q-history spill tier.

Drop-in replacement for the device ``BasisStore`` backed by the native
streamed file store (native/vecstore.cpp): basis vectors live outside HBM
and every block numeric streams rows through the double-buffered native
pipeline — the reference's DistrArrayFile-as-Qvector configuration
(IterativeSolverCMPI.cpp:48) rebuilt for the TPU host.

Device arrays cross the host boundary only at put/get/combine edges; the
inner-product matrices and MGS sweeps run on the host against the stream.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..native import VecStore

Array = jax.Array


class OffloadBasisStore:
    def __init__(self, capacity: int, n: int, dtype=jnp.float64, sharding=None, name: str = "offload"):
        self.capacity = int(capacity)
        self.n = int(n)
        self.dtype = dtype
        self.sharding = sharding
        self.name = name
        self._store = VecStore(self.capacity, self.n)
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
        # zero the slot so whole-capacity grams see no stale data
        self._store.put(slot, np.zeros(self.n))
        self._free.append(slot)

    def _grow(self) -> None:
        new_capacity = max(2 * self.capacity, 4)
        new_store = VecStore(new_capacity, self.n)
        for slot in range(self.capacity):
            new_store.put(slot, self._store.get(slot))
        self._store.close()
        self._store = new_store
        self._free.extend(range(new_capacity - 1, self.capacity - 1, -1))
        self.capacity = new_capacity

    # -- row access ------------------------------------------------------
    def put(self, slot: int, vec) -> None:
        self._store.put(slot, np.asarray(vec, dtype=np.float64))

    def append(self, vec) -> int:
        slot = self.alloc()
        self.put(slot, vec)
        return slot

    def get(self, slot: int) -> Array:
        return self._to_device(self._store.get(slot))

    def fill(self, slot: int, value: float) -> None:
        self._store.put(slot, np.full(self.n, float(value)))

    def axpy(self, slot: int, alpha: float, vec) -> None:
        self._store.axpy(slot, float(alpha), np.asarray(vec, dtype=np.float64))

    def scale(self, slot: int, alpha: float) -> None:
        self._store.scale(slot, float(alpha))

    def rows(self, slots: Sequence[int]) -> Array:
        if len(slots) == 0:
            return jnp.zeros((0, self.n), dtype=self.dtype)
        block = np.stack([self._store.get(s) for s in slots])
        return self._to_device(block)

    # -- block numerics (streamed on the host) ---------------------------
    def gram_block(self, x: Array) -> np.ndarray:
        xh = np.asarray(x, dtype=np.float64)
        return self._store.gram(xh, list(range(self.capacity)))

    def gram(self, x: Array, slots: Sequence[int]) -> np.ndarray:
        if len(slots) == 0:
            return np.zeros((x.shape[0], 0))
        return self._store.gram(np.asarray(x, dtype=np.float64), list(slots))

    def combine(self, coeff: np.ndarray, slots: Sequence[int]) -> Array:
        coeff = np.atleast_2d(np.asarray(coeff, dtype=np.float64))
        out = self._store.combine(coeff, list(slots))
        return self._to_device(out)

    def combine_add(self, out: Array, coeff: np.ndarray, slots: Sequence[int]) -> Array:
        return out + self.combine(coeff, slots)

    def mgs_sweep(self, r: Array, slots: Sequence[int], inv_norms) -> Array:
        """Sequential MGS against the streamed rows, on the host (the
        reference's BufferManager-paged Gram-Schmidt)."""
        rh = np.array(r, dtype=np.float64)  # writable copy
        for logical, slot in enumerate(slots):
            xrow = self._store.get(slot)
            dots = rh @ xrow
            rh -= np.outer(dots * inv_norms[logical], xrow)
        return self._to_device(rh)

    # ------------------------------------------------------------------
    def _to_device(self, arr: np.ndarray) -> Array:
        out = jnp.asarray(arr, dtype=self.dtype)
        if self.sharding is not None:
            from . import vector_ops as vops

            out = jax.device_put(out, vops.adapt_sharding(self.sharding, out.ndim))
        return out

    def close(self) -> None:
        self._store.close()
