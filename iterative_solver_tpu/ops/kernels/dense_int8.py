"""Quantized DENSE operator tiers for the non-symmetric families.

The symmetric families get their int8 tiers from the packed-triangle
kernels (symm_int8.py); a non-symmetric operator cannot use those (no
triangle to pack), but the two tricks that make int8 work transfer
directly (symm_int8.py module docstring):

1. **Exact diagonal split** — store diag(A) in f32, quantize only the
   off-diagonal couplings E = A - diag(A). Without it the quantization
   step scales with the diagonal and destroys small couplings on the
   diagonally-dominant spectra these solvers live on.
2. **Two-sided equilibration** — for non-symmetric E the symmetric
   row-max scaling generalizes to ``gr[i] = sqrt(rowmax|E[i,:]|)``,
   ``gc[j] = sqrt(colmax|E[:,j]|)``: since ``|E[i,j]| <= min(rowmax_i,
   colmax_j) <= gr[i]*gc[j]``, the scaled ``B = E / (gr gc^T)`` lies in
   [-1, 1], so ONE global activation scale per block row works and the
   int8 dot accumulates into an EXACT int32 (headroom guarded).

Action (row-block form, y = x A^T):

    u  = x * gc            (column pre-scale)
    qx = round(127 u / sx)                       per-row activation scale
    acc[m, i] = sum_j qx[m, j] q[i, j]           one int8 MXU dot, int32
    y = acc * sx/127 * gr  +  x * d              rank-1 dequant + exact diag

Tiers: one-plane (coupling error ~ gr gc/254, bf16 class at a QUARTER of
f32 bytes) and two-plane split (operator ~= (q1 + q2/254)/127, activations
split likewise, error ~2^-14 class — the split-bf16 accuracy at half its
bytes). The matvecs are pure jnp (vmap-compatible: the batched nonsym
solves take them directly).

No reference counterpart (the reference is f64-only); the tier exists
because HBM bandwidth is the matvec bound on TPU and int8 streams 4x
fewer bytes than f32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .symm_int8 import (
    _check_acc_headroom,
    quantize_rows,
    quantize_rows_split,
)

Array = jax.Array


@dataclass
class DenseInt8:
    """One-plane quantized dense operator: A ~= gr (q/127) gc^T + diag(d)."""

    q: Array      # (n, n) int8 — scaled off-diagonal couplings
    gr: Array     # (n,) f32 row equilibration
    gc: Array     # (n,) f32 column equilibration
    d: Array      # (n,) f32 exact diagonal
    n: int

    @classmethod
    def from_dense(cls, matrix: np.ndarray) -> "DenseInt8":
        work = np.array(matrix, dtype=np.float64, copy=True)
        n = work.shape[0]
        if work.shape != (n, n):
            raise ValueError("operator must be square")
        _check_acc_headroom(n, n, 1, "DenseInt8")
        d = np.diagonal(work).copy()
        np.fill_diagonal(work, 0.0)
        rmax = np.abs(work).max(axis=1)
        cmax = np.abs(work).max(axis=0)
        gr = np.sqrt(np.where(rmax > 0.0, rmax, 1.0))
        gc = np.sqrt(np.where(cmax > 0.0, cmax, 1.0))
        # scale in place, one axis at a time: the (n, n) outer-product
        # temporary alone is another full-matrix allocation, and this
        # host runs GB-scale numpy at tens of MB/s (CLAUDE.md gotcha)
        work /= gr[:, None]
        work /= gc[None, :]
        work *= 127.0
        np.round(work, out=work)
        q = np.clip(work, -127, 127).astype(np.int8)
        return cls(q=jnp.asarray(q), gr=jnp.asarray(gr, jnp.float32),
                   gc=jnp.asarray(gc, jnp.float32),
                   d=jnp.asarray(d, jnp.float32), n=n)

    def tree(self):
        return (self.q, self.gr, self.gc, self.d)

    def shard(self, mesh, axis: str = "data"):
        """Row-shard the quantized plane over ``mesh`` (scales/diagonal on
        their one axis). The matvec is pure jnp, so GSPMD inserts the
        collectives — the per-row activation scale reduces over the full
        row of the (replicated-or-column-sharded) block, and the int32
        partials stay exact because dequantization is linear in the
        accumulator."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (jax.device_put(self.q, NamedSharding(mesh, P(axis, None))),
                jax.device_put(self.gr, NamedSharding(mesh, P(axis))),
                # gc scales the ACTIVATION's contraction axis, not q's row
                # axis: replicate it so a replicated activation never drags
                # an all-gather into every matvec (a sharded activation
                # slices it locally either way — n floats, free)
                jax.device_put(self.gc, NamedSharding(mesh, P(None))),
                jax.device_put(self.d, NamedSharding(mesh, P(axis))))


@dataclass
class DenseInt8Split:
    """Two-plane tier: E/(gr gc^T) ~= (q1 + q2/254)/127 — split-bf16
    accuracy class at half its streamed bytes."""

    q1: Array
    q2: Array
    gr: Array
    gc: Array
    d: Array
    n: int

    @classmethod
    def from_dense(cls, matrix: np.ndarray) -> "DenseInt8Split":
        work = np.array(matrix, dtype=np.float64, copy=True)
        n = work.shape[0]
        if work.shape != (n, n):
            raise ValueError("operator must be square")
        # the lo accumulator receives TWO dots (p1@q2 + p2@q1)
        _check_acc_headroom(n, n, 2, "DenseInt8Split")
        d = np.diagonal(work).copy()
        np.fill_diagonal(work, 0.0)
        rmax = np.abs(work).max(axis=1)
        cmax = np.abs(work).max(axis=0)
        gr = np.sqrt(np.where(rmax > 0.0, rmax, 1.0))
        gc = np.sqrt(np.where(cmax > 0.0, cmax, 1.0))
        # in-place sequential scaling (see DenseInt8.from_dense)
        work /= gr[:, None]
        work /= gc[None, :]
        work *= 127.0
        q1 = np.clip(np.round(work), -127, 127)
        work -= q1
        work *= 254.0
        q2 = np.clip(np.round(work, out=work), -127, 127)
        return cls(q1=jnp.asarray(q1.astype(np.int8)),
                   q2=jnp.asarray(q2.astype(np.int8)),
                   gr=jnp.asarray(gr, jnp.float32),
                   gc=jnp.asarray(gc, jnp.float32),
                   d=jnp.asarray(d, jnp.float32), n=n)

    def tree(self):
        return (self.q1, self.q2, self.gr, self.gc, self.d)

    def shard(self, mesh, axis: str = "data"):
        """Two-plane analogue of DenseInt8.shard."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (jax.device_put(self.q1, NamedSharding(mesh, P(axis, None))),
                jax.device_put(self.q2, NamedSharding(mesh, P(axis, None))),
                jax.device_put(self.gr, NamedSharding(mesh, P(axis))),
                # replicated for the same reason as DenseInt8.shard: gc
                # scales the activation's contraction axis
                jax.device_put(self.gc, NamedSharding(mesh, P(None))),
                jax.device_put(self.d, NamedSharding(mesh, P(axis))))


def _int8_dot(a: Array, b: Array) -> Array:
    """(m, n) int8 x (k, n) int8 -> (m, k) int32 exact (contract on n)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)


def dense_int8_matvec(x: Array, op) -> Array:
    """y = x A^T through the one-plane quantized operator.

    ``op`` is the ``(q, gr, gc, d)`` tree (pass ``DenseInt8.tree()`` as the
    solver operand so it traces as jit arguments, never closure constants).
    """
    q, gr, gc, d = op
    xf = x.astype(jnp.float32)
    qx, sx = quantize_rows(xf * gc[None, :])
    acc = _int8_dot(qx, q)
    y = acc.astype(jnp.float32) * (sx / 127.0) * gr[None, :]
    y = y + xf * d[None, :]
    return y.astype(x.dtype)


def dense_int8_matvec_split(x: Array, op) -> Array:
    """Two-plane action: operator (q1 + q2/254)/127, activations
    sx (p1 + p2/254); the hi dot is p1@q1, the lo dot folds the two
    cross terms (p2@q2/254^2 ~ 2^-16 is dropped, below the tier floor)."""
    q1, q2, gr, gc, d = op
    xf = x.astype(jnp.float32)
    p1, p2, sx = quantize_rows_split(xf * gc[None, :])
    hi = _int8_dot(p1, q1)
    lo = _int8_dot(p1, q2) + _int8_dot(p2, q1)
    y = (hi.astype(jnp.float32) + lo.astype(jnp.float32) / 254.0)
    y = y * (sx / 127.0) * gr[None, :]
    y = y + xf * d[None, :]
    return y.astype(x.dtype)
