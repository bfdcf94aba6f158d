"""Mesh-sharded block-sparse Hamiltonian action.

The reference's distributed SpMV keeps vector rows on their owning MPI rank
and streams remote operator pages (SURVEY.md §2.5); the TPU-native layout
partitions the operator by BLOCK ROWS across the mesh: every device owns the
blocks of a contiguous range of row-blocks, input vectors arrive sharded by
the vector axis, are all-gathered over ICI inside the kernel (the halo
exchange), each device computes its row range with batched MXU block gemms +
a local segment-sum, and the output comes out sharded by the same vector
axis with NO reduction collective (rows are uniquely owned).

Per-device block counts are padded to the maximum with zero blocks so the
shard_map body is static-shape on every device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernels.spmv_pallas import BSRMatrix
from .mesh import DATA_AXIS

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class ShardedBSR:
    """Row-block-partitioned BSR operator bound to a mesh."""

    values: Array      # (ndev * max_b, bm, bn) sharded on axis 0
    col_idx: Array     # (ndev * max_b,) global block-column ids
    local_row: Array   # (ndev * max_b,) row-block id LOCAL to the owner
    mesh: Mesh
    axis: str
    shape: Tuple[int, int]
    bm: int
    bn: int
    rb_per_dev: int
    diagonal: Array    # (N,) sharded

    @property
    def n(self) -> int:
        return self.shape[0]

    @classmethod
    def from_bsr(cls, bsr: BSRMatrix, mesh: Mesh, axis: str = DATA_AXIS) -> "ShardedBSR":
        ndev = mesh.devices.size
        bm, bn = bsr.bm, bsr.bn
        n_rb = bsr.shape[0] // bm
        n_rb_pad = ((n_rb + ndev - 1) // ndev) * ndev
        rb_per_dev = n_rb_pad // ndev
        row_idx = np.asarray(bsr.row_idx)
        col_idx = np.asarray(bsr.col_idx)
        values = np.asarray(bsr.values, dtype=np.float64)
        owners = row_idx // rb_per_dev
        per_dev = [np.nonzero(owners == d)[0] for d in range(ndev)]
        max_b = max((len(p) for p in per_dev), default=1) or 1
        v = np.zeros((ndev, max_b, bm, bn))
        c = np.zeros((ndev, max_b), dtype=np.int32)
        r = np.zeros((ndev, max_b), dtype=np.int32)
        for d, idx in enumerate(per_dev):
            k = len(idx)
            if k:
                v[d, :k] = values[idx]
                c[d, :k] = col_idx[idx]
                r[d, :k] = row_idx[idx] - d * rb_per_dev
            # pad blocks are zeros scattered into local row 0 — harmless
        n_pad = n_rb_pad * bm
        diag = np.zeros(n_pad)
        diag[: bsr.shape[0]] = np.asarray(bsr.diagonal, dtype=np.float64)
        dtype = bsr.values.dtype
        return cls(
            values=jax.device_put(
                jnp.asarray(v.reshape(ndev * max_b, bm, bn), dtype=dtype),
                NamedSharding(mesh, P(axis, None, None)),
            ),
            col_idx=jax.device_put(
                jnp.asarray(c.reshape(-1)), NamedSharding(mesh, P(axis))
            ),
            local_row=jax.device_put(
                jnp.asarray(r.reshape(-1)), NamedSharding(mesh, P(axis))
            ),
            mesh=mesh,
            axis=axis,
            shape=(n_pad, n_pad),
            bm=bm,
            bn=bn,
            rb_per_dev=rb_per_dev,
            diagonal=jax.device_put(jnp.asarray(diag, dtype=dtype), NamedSharding(mesh, P(axis))),
        )

    def matvec_fn(self):
        """Return a jit-able ``f(x, operand)`` with operand=self flattened;
        x is (m, N) sharded on the vector axis, output identically sharded."""
        mesh, axis = self.mesh, self.axis
        bm, bn, rb_per_dev = self.bm, self.bn, self.rb_per_dev

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, axis), P(axis, None, None), P(axis), P(axis)),
            out_specs=P(None, axis),
        )
        def sharded_action(x_local, values, col_idx, local_row):
            # halo exchange: gather the full x over ICI (tiled concat)
            x = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
            m = x.shape[0]
            xt = x.reshape(m, -1, bn).transpose(1, 0, 2)      # (n_cb, m, bn)
            x_blocks = xt[col_idx]                             # (max_b, m, bn)
            contrib = jnp.einsum("kmn,kin->kmi", x_blocks, values, precision=_PREC)
            y_blocks = jax.ops.segment_sum(contrib, local_row, num_segments=rb_per_dev)
            return y_blocks.transpose(1, 0, 2).reshape(m, rb_per_dev * bm)

        def matvec(x, operand):
            values, col_idx, local_row = operand
            return sharded_action(x, values, col_idx, local_row)

        return matvec, (self.values, self.col_idx, self.local_row)
