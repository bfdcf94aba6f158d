"""Mesh-sharded block-sparse Hamiltonian action with overlapped halo exchange.

The reference's distributed SpMV keeps vector rows on their owning MPI rank
and streams remote operator pages (SURVEY.md §2.5); the TPU-native layout
partitions the operator by BLOCK ROWS across the mesh. Each device's blocks
are split into two groups:

- **local** blocks whose column range lives in the device's own shard of x —
  computed immediately from ``x_local`` with no communication;
- **remote** blocks that need other devices' columns — computed from the
  all-gathered x.

Because the local contribution is data-independent of the all-gather, XLA's
latency-hiding scheduler overlaps the ICI halo exchange with the local MXU
work — the TPU shape of the reference's "overlap halo traffic with SpMV
compute" requirement (BufferManager-style pipelining across the network
boundary). Output comes out sharded by the same vector axis with no
reduction collective (rows are uniquely owned). Per-device block counts are
padded to the maximum with zero blocks so the shard_map body is static.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernels.spmv_pallas import BSRMatrix, check_int8_accum_headroom
from .mesh import DATA_AXIS

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


def _group_to_device_arrays(groups, values, col_idx, row_idx, ndev, bm, bn, rb_per_dev):
    """Pad each device's block list to the max count; returns flat arrays
    sharded on axis 0 plus the per-device count."""
    max_b = max((len(g) for g in groups), default=1) or 1
    v = np.zeros((ndev, max_b, bm, bn))
    c = np.zeros((ndev, max_b), dtype=np.int32)
    r = np.zeros((ndev, max_b), dtype=np.int32)
    for d, idx in enumerate(groups):
        k = len(idx)
        if k:
            v[d, :k] = values[idx]
            c[d, :k] = col_idx[idx]
            r[d, :k] = row_idx[idx] - d * rb_per_dev
        # pad blocks are zeros scattered into local row 0 — harmless
    return v.reshape(ndev * max_b, bm, bn), c.reshape(-1), r.reshape(-1)


@dataclasses.dataclass
class ShardedBSR:
    """Row-block-partitioned BSR operator bound to a mesh, with blocks split
    into comm-free (local-column) and halo (remote-column) groups."""

    loc_values: Array   # (ndev * max_loc, bm, bn) sharded on axis 0
    loc_col: Array      # (ndev * max_loc,) column block id LOCAL to the device shard
    loc_row: Array      # (ndev * max_loc,) row-block id local to the owner
    rem_values: Array   # (ndev * max_rem, bm, bn)
    rem_col: Array      # (ndev * max_rem,) GLOBAL column block id
    rem_row: Array      # (ndev * max_rem,)
    mesh: Mesh
    axis: str
    shape: Tuple[int, int]
    bm: int
    bn: int
    rb_per_dev: int
    diagonal: Array     # (N,) sharded

    @property
    def n(self) -> int:
        return self.shape[0]

    @classmethod
    def from_bsr(cls, bsr: BSRMatrix, mesh: Mesh, axis: str = DATA_AXIS) -> "ShardedBSR":
        ndev = mesh.devices.size
        bm, bn = bsr.bm, bsr.bn
        assert bm == bn, "square blocks required for the row/column partition to align"
        n_rb = bsr.shape[0] // bm
        n_rb_pad = ((n_rb + ndev - 1) // ndev) * ndev
        rb_per_dev = n_rb_pad // ndev
        row_idx = np.asarray(bsr.row_idx)
        col_idx = np.asarray(bsr.col_idx)
        values = np.asarray(bsr.values, dtype=np.float64)
        owners = row_idx // rb_per_dev
        col_owner = col_idx // rb_per_dev
        loc_groups, rem_groups = [], []
        for d in range(ndev):
            mine = owners == d
            loc_groups.append(np.nonzero(mine & (col_owner == d))[0])
            rem_groups.append(np.nonzero(mine & (col_owner != d))[0])
        lv, lc, lr = _group_to_device_arrays(
            loc_groups, values, col_idx, row_idx, ndev, bm, bn, rb_per_dev
        )
        # local group: translate column ids into the device's own shard
        for d in range(ndev):
            max_loc = lv.shape[0] // ndev
            sl = slice(d * max_loc, (d + 1) * max_loc)
            lc[sl] = np.maximum(lc[sl] - d * rb_per_dev, 0)
        rv, rc, rr = _group_to_device_arrays(
            rem_groups, values, col_idx, row_idx, ndev, bm, bn, rb_per_dev
        )
        n_pad = n_rb_pad * bm
        diag = np.zeros(n_pad)
        diag[: bsr.shape[0]] = np.asarray(bsr.diagonal, dtype=np.float64)
        dtype = bsr.values.dtype

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

        return cls(
            loc_values=put(jnp.asarray(lv, dtype=dtype), P(axis, None, None)),
            loc_col=put(lc, P(axis)),
            loc_row=put(lr, P(axis)),
            rem_values=put(jnp.asarray(rv, dtype=dtype), P(axis, None, None)),
            rem_col=put(rc, P(axis)),
            rem_row=put(rr, P(axis)),
            mesh=mesh,
            axis=axis,
            shape=(n_pad, n_pad),
            bm=bm,
            bn=bn,
            rb_per_dev=rb_per_dev,
            diagonal=put(jnp.asarray(diag, dtype=dtype), P(axis)),
        )

    def matvec_fn(self):
        """Return a jit-able ``f(x, operand)``; x is (m, N) sharded on the
        vector axis, output identically sharded."""
        mesh, axis = self.mesh, self.axis
        bm, bn, rb_per_dev = self.bm, self.bn, self.rb_per_dev

        def contract(x_tiles, values, col_idx, local_row):
            x_blocks = x_tiles[col_idx]                        # (max_b, m, bn)
            contrib = jnp.einsum("kmn,kin->kmi", x_blocks, values, precision=_PREC)
            y = jax.ops.segment_sum(contrib, local_row, num_segments=rb_per_dev)
            return y  # (rb_per_dev, m, bm)

        @jax.jit
        @jax.shard_map(
            mesh=mesh,
            in_specs=(
                P(None, axis),
                P(axis, None, None), P(axis), P(axis),
                P(axis, None, None), P(axis), P(axis),
            ),
            out_specs=P(None, axis),
        )
        def sharded_action(x_local, lv, lc, lr, rv, rc, rr):
            m = x_local.shape[0]
            # comm-free contribution from the device's own x shard...
            x_loc_tiles = x_local.reshape(m, -1, bn).transpose(1, 0, 2)
            y_loc = contract(x_loc_tiles, lv, lc, lr)
            # ...while the halo exchange (all-gather over ICI) is in flight —
            # XLA's latency-hiding scheduler overlaps the two
            x = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
            x_tiles = x.reshape(m, -1, bn).transpose(1, 0, 2)
            y_rem = contract(x_tiles, rv, rc, rr)
            return (y_loc + y_rem).transpose(1, 0, 2).reshape(m, rb_per_dev * bm)

        def matvec(x, operand):
            lv, lc, lr, rv, rc, rr = operand
            return sharded_action(x, lv, lc, lr, rv, rc, rr)

        return matvec, (
            self.loc_values, self.loc_col, self.loc_row,
            self.rem_values, self.rem_col, self.rem_row,
        )


@dataclasses.dataclass
class ShardedBSRInt8:
    """Mesh-sharded QUANTIZED BSR action (the int8 tier of ShardedBSR).

    Same row-block partition + local/remote split as the float variant,
    with two quantized-specific design points:

    - the activation quantization scale is a per-row max over the FULL
      row, which lives column-sharded across the mesh — a tiny (m,)
      ``lax.pmax`` reduction computes it before anything else, and is the
      only extra collective;
    - the halo exchange all-gathers the INT8 activations, not the floats:
      a 4x ICI-traffic cut on the one communication the distributed SpMV
      pays (the reference's analogue streams f64 pages, gemm.h:100-152).

    Dequantization is linear in the exact int32 accumulators, so local +
    remote partials sum exactly; the EXACT diagonal is applied once on the
    device-owned output rows (rows are uniquely owned — no psum at all).
    """

    loc_q: Array        # (ndev * max_loc, bm, bn) int8, sharded axis 0
    loc_col: Array
    loc_row: Array
    rem_q: Array        # (ndev * max_rem, bm, bn) int8
    rem_col: Array
    rem_row: Array
    rq: Array           # (N,) f32 row dequant scales, sharded on the vector axis
    cq: Array           # (N,) f32 column scales, sharded on the vector axis
    diagonal: Array     # (N,) f32 EXACT diagonal, sharded
    mesh: Mesh
    axis: str
    shape: Tuple[int, int]
    bm: int
    bn: int
    rb_per_dev: int

    @property
    def n(self) -> int:
        return self.shape[0]

    @classmethod
    def from_int8(cls, bsr_q, mesh: Mesh, axis: str = DATA_AXIS) -> "ShardedBSRInt8":
        """Shard a BSRMatrixInt8 (host or device arrays accepted)."""
        ndev = mesh.devices.size
        bm, bn = bsr_q.bm, bsr_q.bn
        assert bm == bn, "square blocks required"
        n_rb = bsr_q.shape[0] // bm
        n_rb_pad = ((n_rb + ndev - 1) // ndev) * ndev
        rb_per_dev = n_rb_pad // ndev
        row_idx = np.asarray(bsr_q.row_idx)
        col_idx = np.asarray(bsr_q.col_idx)
        q = np.asarray(bsr_q.q)
        # per-device segment_sum accumulates the same way the single-device
        # path does — the guard must hold here too (a direct-constructor
        # BSRMatrixInt8 never passed through from_bsr's check)
        check_int8_accum_headroom(row_idx, bn, context="ShardedBSRInt8")
        owners = row_idx // rb_per_dev
        col_owner = col_idx // rb_per_dev
        loc_groups, rem_groups = [], []
        for d in range(ndev):
            mine = owners == d
            loc_groups.append(np.nonzero(mine & (col_owner == d))[0])
            rem_groups.append(np.nonzero(mine & (col_owner != d))[0])
        lv, lc, lr = _group_to_device_arrays(
            loc_groups, q, col_idx, row_idx, ndev, bm, bn, rb_per_dev)
        for d in range(ndev):
            max_loc = lv.shape[0] // ndev
            sl = slice(d * max_loc, (d + 1) * max_loc)
            lc[sl] = np.maximum(lc[sl] - d * rb_per_dev, 0)
        rv, rc, rr = _group_to_device_arrays(
            rem_groups, q, col_idx, row_idx, ndev, bm, bn, rb_per_dev)
        n_pad = n_rb_pad * bm
        n_orig = bsr_q.shape[0]

        def padv(vec, fill=0.0):
            out = np.full(n_pad, fill, dtype=np.float32)
            out[:n_orig] = np.asarray(vec, dtype=np.float32)
            return out

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

        diag = (padv(bsr_q.diagonal) if bsr_q.diagonal is not None
                else np.zeros(n_pad, np.float32))
        return cls(
            loc_q=put(jnp.asarray(lv, jnp.int8), P(axis, None, None)),
            loc_col=put(lc, P(axis)),
            loc_row=put(lr, P(axis)),
            rem_q=put(jnp.asarray(rv, jnp.int8), P(axis, None, None)),
            rem_col=put(rc, P(axis)),
            rem_row=put(rr, P(axis)),
            rq=put(padv(bsr_q.rq, fill=1.0), P(axis)),
            cq=put(padv(bsr_q.cq, fill=1.0), P(axis)),
            diagonal=put(diag, P(axis)),
            mesh=mesh,
            axis=axis,
            shape=(n_pad, n_pad),
            bm=bm,
            bn=bn,
            rb_per_dev=rb_per_dev,
        )

    def matvec_fn(self):
        mesh, axis = self.mesh, self.axis
        bm, bn, rb_per_dev = self.bm, self.bn, self.rb_per_dev

        def contract_i8(x_tiles, q, col_idx, local_row):
            x_blocks = x_tiles[col_idx].astype(jnp.int32)   # (max_b, m, bn)
            contrib = jnp.einsum("kmn,kin->kmi", x_blocks, q.astype(jnp.int32))
            return jax.ops.segment_sum(contrib, local_row,
                                       num_segments=rb_per_dev)

        @jax.jit
        @jax.shard_map(
            mesh=mesh,
            in_specs=(
                P(None, axis),
                P(axis, None, None), P(axis), P(axis),
                P(axis, None, None), P(axis), P(axis),
                P(axis), P(axis), P(axis),
            ),
            out_specs=P(None, axis),
        )
        def sharded_action(x_local, lq, lc, lr, rq_, rc, rr, rqv, cqv, dg):
            m = x_local.shape[0]
            xf = x_local.astype(jnp.float32)
            xs = xf * cqv[None, :]
            # global per-row quantization scale: tiny (m,) pmax collective
            amax = jax.lax.pmax(jnp.max(jnp.abs(xs), axis=1), axis)
            sx = (jnp.where(amax > 0.0, amax, 1.0) / 127.0)[:, None]
            qx_local = jnp.clip(jnp.round(xs / sx), -127, 127).astype(jnp.int8)
            # comm-free local contribution from the device's own int8 slice...
            x_loc_tiles = qx_local.reshape(m, -1, bn).transpose(1, 0, 2)
            y_loc = contract_i8(x_loc_tiles, lq, lc, lr)
            # ...overlapping the INT8 halo exchange (4x less ICI than f32)
            qx = jax.lax.all_gather(qx_local, axis, axis=1, tiled=True)
            x_tiles = qx.reshape(m, -1, bn).transpose(1, 0, 2)
            y_rem = contract_i8(x_tiles, rq_, rc, rr)
            acc = (y_loc + y_rem).transpose(1, 0, 2).reshape(
                m, rb_per_dev * bm)
            # dequant is linear in the exact int32 sum; exact diagonal once
            y = acc.astype(jnp.float32) * sx * rqv[None, :] + xf * dg[None, :]
            return y.astype(x_local.dtype)

        def matvec(x, operand):
            return sharded_action(x, *operand)

        return matvec, (
            self.loc_q, self.loc_col, self.loc_row,
            self.rem_q, self.rem_col, self.rem_row,
            self.rq, self.cq, self.diagonal,
        )
