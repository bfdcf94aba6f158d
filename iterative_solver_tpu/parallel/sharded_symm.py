"""Mesh-sharded packed-triangle symmetric operator action.

The single-chip packed kernel (ops/kernels/symm_pallas.py) halves HBM
traffic by streaming only the lower triangle and applying each tile to BOTH
output block-rows. Across a mesh that second contribution scatters: tile
(i, j) writes block-rows i and j, which generally live on different
devices, so unlike the row-partitioned BSR action (sharded_bsr.py) the
output cannot be uniquely owned. The TPU-native layout is therefore:

- tile PAIRS are interleaved round-robin over the mesh (balanced count,
  each stored once — aggregate HBM stays half of a dense replica);
- each device all-gathers the x row-block (m x N, a few hundred KB — three
  orders of magnitude below the HBM it saves), contracts its local tiles
  into a partial (m, N) result, and
- a ``psum_scatter`` over the vector axis returns the canonical
  (None, axis) sharding, reducing the cross-device partials on ICI.

This mirrors the reference's MPI split where every rank computes partial
contributions and an Allreduce combines them (gemm.h:43-46,
DistrArray.cpp:126-136) — but rides reduce-scatter over ICI instead of a
full allreduce, and keeps the packed-storage bandwidth win per chip.

Both storage tiers shard: plain tiles (f32 HIGHEST / bf16 single-pass,
``from_symmetric``) and split double-bf16 hi+lo tiles (``from_split`` —
the precise tier). The per-device contraction uses the portable XLA einsum
path by default (runs on the CPU test mesh) and the Pallas packed kernels
per shard on TPU (``use_pallas=True`` / auto).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernels.symm_pallas import (
    SymmetricBlocked,
    SymmetricBlockedSplit,
    _symm_matmat_pallas_impl,
    _symm_matmat_split_impl,
    _symm_matmat_xla,
    bf16_split,
)
from .mesh import DATA_AXIS

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


def _interleave_pairs(values, ii, jj, ndev, b, dtype=None):
    """Round-robin tile pairs over devices, padded to equal count with zero
    tiles aimed at block (0, 0) — they contribute nothing."""
    n_pairs = values.shape[0]
    max_p = (n_pairs + ndev - 1) // ndev
    v = np.zeros((ndev, max_p, b, b), dtype=dtype if dtype is not None else np.float64)
    gi = np.zeros((ndev, max_p), dtype=np.int32)
    gj = np.zeros((ndev, max_p), dtype=np.int32)
    for d in range(ndev):
        idx = np.arange(d, n_pairs, ndev)
        k = len(idx)
        v[d, :k] = values[idx]
        gi[d, :k] = ii[idx]
        gj[d, :k] = jj[idx]
    return v.reshape(ndev * max_p, b, b), gi.reshape(-1), gj.reshape(-1), max_p


@dataclasses.dataclass
class ShardedSymmetric:
    """Packed lower-triangle tiles interleaved across a 1-D mesh."""

    values: Array       # (ndev * max_p, b, b) sharded on axis 0 (or hi tiles)
    ii: Array           # (ndev * max_p,) int32 GLOBAL block row
    jj: Array           # (ndev * max_p,) int32 GLOBAL block col (jj <= ii)
    mesh: Mesh
    axis: str
    shape: Tuple[int, int]
    b: int
    pairs_per_dev: int
    diagonal: Array     # (N,) sharded on the vector axis
    lo: Optional[Array] = None   # split tier: bf16 lo tiles (values = hi)
    gq: Optional[Array] = None   # int8 tiers: replicated (N,) equilibration
                                 # (values = Q / Q1 int8 planes, lo = Q2);
                                 # diagonal then carries the EXACT diag and
                                 # is applied OUTSIDE the psum (once, not
                                 # once per device partial)

    @property
    def n(self) -> int:
        return self.shape[0]

    @classmethod
    def from_symmetric(cls, sym: SymmetricBlocked, mesh: Mesh,
                       axis: str = DATA_AXIS) -> "ShardedSymmetric":
        ndev = mesh.devices.size
        n = sym.shape[0]
        if n % ndev != 0:
            raise ValueError(
                f"operator dimension {n} must divide over {ndev} devices; "
                f"pad the matrix (SymmetricBlocked.from_dense pads to the "
                f"block multiple — pick b so that n is also a mesh multiple)")
        v, gi, gj, max_p = _interleave_pairs(
            np.asarray(sym.values, dtype=np.float64),
            np.asarray(sym.ii), np.asarray(sym.jj), ndev, sym.b,
        )

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

        dtype = sym.values.dtype
        diag = np.zeros(n)
        if sym.diagonal is not None:
            diag[: len(np.asarray(sym.diagonal))] = np.asarray(
                sym.diagonal, dtype=np.float64)
        return cls(
            values=put(jnp.asarray(v, dtype=dtype), P(axis, None, None)),
            ii=put(gi, P(axis)),
            jj=put(gj, P(axis)),
            mesh=mesh,
            axis=axis,
            shape=sym.shape,
            b=sym.b,
            pairs_per_dev=max_p,
            diagonal=put(jnp.asarray(diag, dtype=jnp.float32
                                     if dtype == jnp.bfloat16 else dtype), P(axis)),
        )

    @classmethod
    def from_split(cls, sym: SymmetricBlockedSplit, mesh: Mesh,
                   axis: str = DATA_AXIS) -> "ShardedSymmetric":
        """Shard the precise (split double-bf16) tier: hi and lo tiles carry
        the same pair layout."""
        ndev = mesh.devices.size
        n = sym.shape[0]
        if n % ndev != 0:
            raise ValueError(
                f"operator dimension {n} must divide over {ndev} devices")
        ii = np.asarray(sym.ii)
        jj = np.asarray(sym.jj)
        hi, gi, gj, max_p = _interleave_pairs(
            np.asarray(sym.hi, dtype=np.float64), ii, jj, ndev, sym.b)
        lo, _, _, _ = _interleave_pairs(
            np.asarray(sym.lo, dtype=np.float64), ii, jj, ndev, sym.b)

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

        diag = np.zeros(n)
        if sym.diagonal is not None:
            diag[: len(np.asarray(sym.diagonal))] = np.asarray(
                sym.diagonal, dtype=np.float64)
        return cls(
            values=put(jnp.asarray(hi, dtype=jnp.bfloat16), P(axis, None, None)),
            ii=put(gi, P(axis)),
            jj=put(gj, P(axis)),
            mesh=mesh,
            axis=axis,
            shape=sym.shape,
            b=sym.b,
            pairs_per_dev=max_p,
            diagonal=put(jnp.asarray(diag, dtype=jnp.float32), P(axis)),
            lo=put(jnp.asarray(lo, dtype=jnp.bfloat16), P(axis, None, None)),
        )

    @classmethod
    def from_int8(cls, sym, mesh: Mesh, axis: str = DATA_AXIS) -> "ShardedSymmetric":
        """Shard the quantized tiers (ops/kernels/symm_int8.py): accepts a
        SymmetricBlockedInt8 (one plane) or SymmetricBlockedInt8Split (two
        planes). Int8 planes interleave round-robin like the float tiers;
        the equilibration vector replicates (32 KB) and the exact diagonal
        shards over the vector axis."""
        ndev = mesh.devices.size
        n = sym.shape[0]
        if n % ndev != 0:
            raise ValueError(
                f"operator dimension {n} must divide over {ndev} devices")
        ii = np.asarray(sym.ii)
        jj = np.asarray(sym.jj)
        two_plane = hasattr(sym, "q1")
        q1 = np.asarray(sym.q1 if two_plane else sym.q)
        v1, gi, gj, max_p = _interleave_pairs(q1, ii, jj, ndev, sym.b, dtype=np.int8)
        # per-device exact-int32 headroom, enforced over the ACTUAL
        # interleave (symm_int8._check_acc_headroom's escape hatch points
        # here, so the claimed bound must be checked, not assumed): an
        # off-diagonal pair (i,j) adds one int8 dot (two for the split lo
        # plane) into accumulator rows i AND j, a diagonal tile only into
        # row i, each bounded by 127^2 * b. Counted over the REAL pairs
        # (round-robin device assignment), not the interleave buffer —
        # the zero pad tiles aimed at block (0,0) contribute nothing and
        # must not inflate row 0's count.
        counts = np.zeros((ndev, n // sym.b), dtype=np.int64)
        dev_of = (np.arange(ii.size) % ndev).astype(np.int64)
        np.add.at(counts, (dev_of, ii), 1)
        off = ii != jj
        np.add.at(counts, (dev_of[off], jj[off]), 1)
        dots = 2 if two_plane else 1
        if dots * int(counts.max()) * 127 * 127 * sym.b >= 2 ** 31:
            raise ValueError(
                f"ShardedSymmetric.from_int8: a device accumulator row "
                f"receives {int(counts.max())} int8 tile dots of b={sym.b} "
                "— exceeds exact-int32 headroom even sharded over "
                f"{ndev} devices; use more devices or a float tier")

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

        lo = None
        if two_plane:
            v2, _, _, _ = _interleave_pairs(np.asarray(sym.q2), ii, jj, ndev,
                                            sym.b, dtype=np.int8)
            lo = put(v2, P(axis, None, None))
        return cls(
            values=put(v1, P(axis, None, None)),
            ii=put(gi, P(axis)),
            jj=put(gj, P(axis)),
            mesh=mesh,
            axis=axis,
            shape=sym.shape,
            b=sym.b,
            pairs_per_dev=max_p,
            diagonal=put(jnp.asarray(
                sym.diagonal if sym.diagonal is not None
                else np.zeros(n), dtype=jnp.float32), P(axis)),
            lo=lo,
            gq=put(jnp.asarray(sym.gq, dtype=jnp.float32), P(None)),
        )

    def matvec_fn(self, use_pallas: bool | None = None):
        """Return (matvec, operand): ``matvec(x, operand)`` with x of shape
        (m, N) sharded (None, axis); output identically sharded."""
        mesh, axis, b = self.mesh, self.axis, self.b
        n = self.n
        nb = n // b
        max_p = self.pairs_per_dev
        int8 = self.gq is not None
        split = self.lo is not None
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if int8:
            return self._matvec_fn_int8(use_pallas, split)

        def contract_xla(x, values, ii, jj):
            # the portable packed contraction from the kernel module, on the
            # device-local pair list (one shared implementation)
            return _symm_matmat_xla(x, values.astype(x.dtype), (ii, jj), b, nb)

        def contract_xla_split(x, hi, lo, ii, jj):
            # three-term double-bf16 contraction (x_h A_h + x_h A_l + x_l A_h)
            xh, xl = bf16_split(x.astype(jnp.float32))
            y = contract_xla(xh.astype(jnp.float32), hi.astype(jnp.float32), ii, jj)
            y = y + contract_xla(xh.astype(jnp.float32), lo.astype(jnp.float32), ii, jj)
            y = y + contract_xla(xl.astype(jnp.float32), hi.astype(jnp.float32), ii, jj)
            return y.astype(x.dtype)

        in_specs = [P(None, axis), P(axis, None, None), P(axis), P(axis)]
        if split:
            in_specs.insert(2, P(axis, None, None))

        @jax.shard_map(
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P(None, axis),
            # pallas_call outputs carry no varying-mesh-axes metadata; the
            # explicit psum_scatter already states the cross-device semantics
            check_vma=False,
        )
        def sharded_action(x_local, *op):
            m = x_local.shape[0]
            # halo: the packed layout needs every column block (a tile's i or
            # j can be anywhere) — gather the thin row-block over ICI
            x = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
            if split:
                values, lo, ii, jj = op
                if use_pallas:
                    y = _symm_matmat_split_impl(
                        ii, jj, x, values, lo, m=m, n=n, b=b, n_pairs=max_p,
                        interpret=False,
                    )
                else:
                    y = contract_xla_split(x, values, lo, ii, jj)
            else:
                values, ii, jj = op
                if use_pallas:
                    y = _symm_matmat_pallas_impl(
                        ii, jj, x, values, m=m, n=n, b=b, n_pairs=max_p,
                        interpret=False,
                    )
                else:
                    y = contract_xla(x, values, ii, jj)
            # partial (m, N) results reduce over the mesh back to the
            # canonical vector-axis sharding (ICI reduce-scatter, the
            # packed analogue of gemm.h's MPI_Allreduce)
            return jax.lax.psum_scatter(y, axis, scatter_dimension=1, tiled=True)

        def matvec(x, operand):
            return sharded_action(x, *operand)

        operand = ((self.values, self.lo, self.ii, self.jj) if split
                   else (self.values, self.ii, self.jj))
        return matvec, operand

    def _matvec_fn_int8(self, use_pallas: bool, two_plane: bool):
        """Int8 tiers over the mesh: each device quantizes the gathered x
        (cheap, redundant), contracts its local int8 pairs into an exact
        int32 partial, dequantizes (linear in the accumulator, so the
        psum_scatter of scaled partials is exact), and the EXACT diagonal
        is applied once outside the reduction on the sharded output."""
        from ..ops.kernels.symm_int8 import (
            _symm_matmat_int8_impl,
            _symm_matmat_int8_split_impl,
            _symm_matmat_int8_xla,
            quantize_rows,
            quantize_rows_split,
        )

        mesh, axis, b = self.mesh, self.axis, self.b
        n = self.n
        nb = n // b
        max_p = self.pairs_per_dev

        in_specs = [P(None, axis), P(axis, None, None), P(axis), P(axis), P(None)]
        if two_plane:
            in_specs.insert(2, P(axis, None, None))

        @jax.shard_map(
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P(None, axis),
            check_vma=False,
        )
        def sharded_action(x_local, *op):
            m = x_local.shape[0]
            x = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
            xf = x.astype(jnp.float32)
            if two_plane:
                q1, q2, ii, jj, gq = op
                p1, p2, sx = quantize_rows_split(xf * gq[None, :])
                if use_pallas:
                    y = _symm_matmat_int8_split_impl(
                        ii, jj, p1, p2, q1, q2, xf, sx, gq.reshape(1, n),
                        jnp.zeros((1, n), jnp.float32),  # diag applied outside
                        m=m, n=n, b=b, n_pairs=max_p, interpret=False)
                else:
                    a1 = _symm_matmat_int8_xla(p1, q1, (ii, jj), b, nb)
                    a2 = _symm_matmat_int8_xla(p1, q2, (ii, jj), b, nb)
                    a2 = a2 + _symm_matmat_int8_xla(p2, q1, (ii, jj), b, nb)
                    y = (a1.astype(jnp.float32)
                         + a2.astype(jnp.float32) * (1.0 / 254.0)) * sx * gq[None, :]
            else:
                q, ii, jj, gq = op
                qx, sx = quantize_rows(xf * gq[None, :])
                if use_pallas:
                    y = _symm_matmat_int8_impl(
                        ii, jj, qx, q, xf, sx, gq.reshape(1, n),
                        jnp.zeros((1, n), jnp.float32),
                        m=m, n=n, b=b, n_pairs=max_p, interpret=False)
                else:
                    acc = _symm_matmat_int8_xla(qx, q, (ii, jj), b, nb)
                    y = acc.astype(jnp.float32) * sx * gq[None, :]
            return jax.lax.psum_scatter(y, axis, scatter_dimension=1, tiled=True)

        def matvec(x, operand):
            # the exact diagonal rides the operand tuple (a traced argument,
            # never a baked constant) and applies once on the canonical
            # sharding, outside the partial-sum reduction
            y = sharded_action(x, *operand[:-1])
            return (y + x.astype(jnp.float32) * operand[-1][None, :]).astype(x.dtype)

        operand = ((self.values, self.lo, self.ii, self.jj, self.gq, self.diagonal)
                   if two_plane
                   else (self.values, self.ii, self.jj, self.gq, self.diagonal))
        return matvec, operand
