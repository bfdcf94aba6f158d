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

The per-device contraction uses the portable XLA einsum path by default
(runs on the CPU test mesh) and the Pallas packed kernel per shard on TPU
(``use_pallas=True`` / auto).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernels.symm_pallas import SymmetricBlocked, _symm_matmat_pallas_impl
from .mesh import DATA_AXIS

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class ShardedSymmetric:
    """Packed lower-triangle tiles interleaved across a 1-D mesh."""

    values: Array       # (ndev * max_p, b, b) sharded on axis 0
    ii: Array           # (ndev * max_p,) int32 GLOBAL block row
    jj: Array           # (ndev * max_p,) int32 GLOBAL block col (jj <= ii)
    mesh: Mesh
    axis: str
    shape: Tuple[int, int]
    b: int
    pairs_per_dev: int
    diagonal: Array     # (N,) sharded on the vector axis

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
        values = np.asarray(sym.values, dtype=np.float64)
        ii = np.asarray(sym.ii)
        jj = np.asarray(sym.jj)
        n_pairs = values.shape[0]
        max_p = (n_pairs + ndev - 1) // ndev
        v = np.zeros((ndev, max_p, sym.b, sym.b))
        gi = np.zeros((ndev, max_p), dtype=np.int32)
        gj = np.zeros((ndev, max_p), dtype=np.int32)
        for d in range(ndev):
            idx = np.arange(d, n_pairs, ndev)  # round-robin: balanced count
            k = len(idx)
            v[d, :k] = values[idx]
            gi[d, :k] = ii[idx]
            gj[d, :k] = jj[idx]
            # pad tiles are zeros aimed at block (0, 0) — contribute nothing

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

        dtype = sym.values.dtype
        diag = np.zeros(n)
        if sym.diagonal is not None:
            diag[: len(np.asarray(sym.diagonal))] = np.asarray(
                sym.diagonal, dtype=np.float64)
        return cls(
            values=put(jnp.asarray(v.reshape(ndev * max_p, sym.b, sym.b), dtype=dtype),
                       P(axis, None, None)),
            ii=put(gi.reshape(-1), P(axis)),
            jj=put(gj.reshape(-1), P(axis)),
            mesh=mesh,
            axis=axis,
            shape=sym.shape,
            b=sym.b,
            pairs_per_dev=max_p,
            diagonal=put(jnp.asarray(diag, dtype=jnp.float32
                                     if dtype == jnp.bfloat16 else dtype), P(axis)),
        )

    def matvec_fn(self, use_pallas: bool | None = None):
        """Return (matvec, operand): ``matvec(x, operand)`` with x of shape
        (m, N) sharded (None, axis); output identically sharded."""
        mesh, axis, b = self.mesh, self.axis, self.b
        n = self.n
        nb = n // b
        max_p = self.pairs_per_dev
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

        def contract_xla(x, values, ii, jj):
            m = x.shape[0]
            xt = x.reshape(m, nb, b).transpose(1, 0, 2)        # (nb, m, b)
            a = values.astype(x.dtype)
            # y_i += x_j A_ij^T for all local pairs
            ci = jnp.einsum("kmn,kin->kmi", xt[jj], a, precision=_PREC)
            yi = jax.ops.segment_sum(ci, ii, num_segments=nb)
            # y_j += x_i A_ij for strict-lower local pairs
            strict = (ii != jj).astype(x.dtype)
            cj = jnp.einsum("kmn,kni->kmi", xt[ii], a, precision=_PREC)
            yj = jax.ops.segment_sum(cj * strict[:, None, None], jj, num_segments=nb)
            return (yi + yj).transpose(1, 0, 2).reshape(m, n)

        @jax.shard_map(
            mesh=mesh,
            in_specs=(P(None, axis), P(axis, None, None), P(axis), P(axis)),
            out_specs=P(None, axis),
            # pallas_call outputs carry no varying-mesh-axes metadata; the
            # explicit psum_scatter already states the cross-device semantics
            check_vma=False,
        )
        def sharded_action(x_local, values, ii, jj):
            m = x_local.shape[0]
            # halo: the packed layout needs every column block (a tile's i or
            # j can be anywhere) — gather the thin row-block over ICI
            x = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
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
            values, ii, jj = operand
            return sharded_action(x, values, ii, jj)

        return matvec, (self.values, self.ii, self.jj)
