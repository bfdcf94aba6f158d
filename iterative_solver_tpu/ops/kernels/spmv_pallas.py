"""Block-sparse (BSR) Hamiltonian action kernels.

The reference's hot loop is the user ``action`` — a sparse matrix times a
block of vectors streamed through BufferManager pages with CBLAS gemm
(reference: array/util/gemm.h:76-153, BufferManager.h:136-173).  On TPU the
MXU wants dense tiles, so the TPU-native sparse format is BSR: (bm, bn)
dense blocks, only nonzero blocks stored.  Two implementations:

- ``bsr_matmat``: XLA path — gather x tiles, batched block matmul, and a
  segment-sum over row blocks. Compiles to MXU batched gemm + scatter-add;
  works on every backend and shards over a mesh.
- ``bsr_matmat_pallas``: hand-tiled Pallas kernel with scalar-prefetched
  block topology and double-buffered HBM->VMEM DMA of block values — the
  direct analogue of the reference's two-page BufferManager pipeline
  (GEMM_BUFFERS=2), keeping the MXU busy while the next block streams in.

Dense FCI matrices (he/bh/hf) convert losslessly with ``BSRMatrix.from_dense``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class BSRMatrix:
    """Block-sparse row matrix: values (nb, bm, bn), block col indices (nb,),
    block row ids (nb,) sorted by row, and row pointer (n_rb+1,)."""

    values: Array        # (n_blocks, bm, bn)
    col_idx: Array       # (n_blocks,) int32 block-column of each block
    row_idx: Array       # (n_blocks,) int32 block-row of each block
    row_ptr: Array       # (n_row_blocks + 1,) int32
    shape: Tuple[int, int]
    bm: int
    bn: int
    diagonal: Optional[Array] = None

    @property
    def n_blocks(self) -> int:
        return self.values.shape[0]

    @property
    def nnz(self) -> int:
        return self.n_blocks * self.bm * self.bn

    @classmethod
    def from_dense(cls, matrix: np.ndarray, bm: Optional[int] = None, bn: Optional[int] = None,
                   tol: float = 0.0, dtype=None) -> "BSRMatrix":
        from ... import config

        if bm is None:
            bm = int(config.get_option("BSR_BLOCK"))
        if bn is None:
            bn = bm
        matrix = np.asarray(matrix, dtype=np.float64)
        n, m = matrix.shape
        n_pad = ((n + bm - 1) // bm) * bm
        m_pad = ((m + bn - 1) // bn) * bn
        padded = np.zeros((n_pad, m_pad))
        padded[:n, :m] = matrix
        n_rb, n_cb = n_pad // bm, m_pad // bn
        vals, cols, rows = [], [], []
        for rb in range(n_rb):
            for cb in range(n_cb):
                block = padded[rb * bm:(rb + 1) * bm, cb * bn:(cb + 1) * bn]
                if np.abs(block).max() > tol:
                    vals.append(block)
                    cols.append(cb)
                    rows.append(rb)
        row_ptr = np.zeros(n_rb + 1, dtype=np.int32)
        for rb in rows:
            row_ptr[rb + 1] += 1
        row_ptr = np.cumsum(row_ptr).astype(np.int32)
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        return cls(
            values=jnp.asarray(np.stack(vals) if vals else np.zeros((0, bm, bn)), dtype=dtype),
            col_idx=jnp.asarray(np.asarray(cols, dtype=np.int32)),
            row_idx=jnp.asarray(np.asarray(rows, dtype=np.int32)),
            row_ptr=jnp.asarray(row_ptr),
            shape=(n_pad, m_pad),
            bm=bm,
            bn=bn,
            diagonal=jnp.asarray(np.diagonal(padded).copy(), dtype=dtype),
        )


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _bsr_matmat_xla(x, values, col_idx, row_idx, bm, bn, n_rb):
    """y(m, N) = x(m, N) @ A^T via gather + batched block gemm + segment sum."""
    m = x.shape[0]
    # gather x tiles for every block's column: (nb, m, bn)
    xt = x.reshape(m, -1, bn).transpose(1, 0, 2)  # (n_cb, m, bn)
    x_blocks = xt[col_idx]                        # (nb, m, bn)
    # block contributions: (nb, m, bm)
    contrib = jnp.einsum("kmn,kin->kmi", x_blocks, values, precision=_PREC)
    # scatter-add into block rows
    y_blocks = jax.ops.segment_sum(contrib, row_idx, num_segments=n_rb)  # (n_rb, m, bm)
    return y_blocks.transpose(1, 0, 2).reshape(m, n_rb * bm)


def bsr_matmat(x: Array, bsr: BSRMatrix) -> Array:
    """Action of the BSR operator on a row-block: (m, N) -> (m, N)."""
    n_rb = bsr.shape[0] // bsr.bm
    return _bsr_matmat_xla(x, bsr.values, bsr.col_idx, bsr.row_idx, bsr.bm, bsr.bn, n_rb)


# ---------------------------------------------------------------------------
# Pallas double-buffered kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _pallas_bsr_fn(m: int, n: int, bm: int, bn: int, n_rb: int, nb: int,
                   vdtype_name: str, xdtype_name: str, interpret: bool):
    """Build (and cache) the jitted pallas call for one shape signature, so
    repeated actions don't re-trace/re-compile."""
    return jax.jit(
        functools.partial(
            _bsr_matmat_pallas_impl, m=m, n=n, bm=bm, bn=bn, n_rb=n_rb,
            nb=nb, interpret=interpret,
        )
    )


def bsr_matmat_pallas(x: Array, bsr: BSRMatrix, interpret: bool = False) -> Array:
    """Pallas BSR SpMM: grid over block rows; block values stream HBM->VMEM
    through two scratch buffers while the MXU consumes the previous block
    (the reference's GEMM_BUFFERS=2 double buffering, BufferManager.h:136-173).
    """
    m, n = x.shape
    n_rb = bsr.shape[0] // bsr.bm
    if bsr.n_blocks == 0:
        return jnp.zeros_like(x)
    fn = _pallas_bsr_fn(
        m, n, bsr.bm, bsr.bn, n_rb, bsr.n_blocks,
        str(bsr.values.dtype), str(x.dtype), interpret,
    )
    return fn(bsr.row_ptr, bsr.col_idx, x, bsr.values)


def _bsr_matmat_pallas_impl(row_ptr, col_idx, x, values, *, m, n, bm, bn, n_rb, nb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(row_ptr_ref, col_idx_ref, x_ref, values_hbm, y_ref, scratch, sems):
        rb = pl.program_id(0)
        start = row_ptr_ref[rb]
        end = row_ptr_ref[rb + 1]
        nblocks = end - start

        def get_dma(slot, iblock):
            return pltpu.make_async_copy(
                values_hbm.at[start + iblock],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(nblocks > 0)
        def _():
            get_dma(0, 0).start()

        def body(i, acc):
            slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
            next_slot = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

            @pl.when(i + 1 < nblocks)
            def _():
                get_dma(next_slot, i + 1).start()

            get_dma(slot, i).wait()
            cb = col_idx_ref[start + i]
            x_tile = x_ref[:, pl.ds(cb * bn, bn)]
            return acc + jax.lax.dot_general(
                x_tile,
                scratch[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # without this the MXU runs a single bf16 pass (~2e-3 rel err)
                precision=jax.lax.Precision.HIGHEST,
            )

        acc0 = jnp.zeros((m, bm), dtype=jnp.float32)
        acc = jax.lax.fori_loop(0, nblocks, body, acc0)
        y_ref[...] = acc.astype(y_ref.dtype)

    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_ptr, col_idx
        grid=(n_rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x, full
            pl.BlockSpec(memory_space=pl.ANY),       # values stay in HBM
        ],
        out_specs=pl.BlockSpec((m, bm), lambda rb, *_: (0, rb), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bm, bn), values.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    nnz = nb * bm * bn
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n_rb * bm), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * nnz, bytes_accessed=nnz * 4 + 2 * m * n * 4, transcendentals=0
        ),
    )(row_ptr, col_idx, x, values)
    return out


# ---------------------------------------------------------------------------
# Int8 quantized BSR: the sparse twin of ops/kernels/symm_int8.py.
#
# Two-sided equilibration generalises the symmetric trick to ANY matrix:
# |E[P,Q]| <= min(rowmax_P, colmax_Q) <= sqrt(rowmax_P * colmax_Q), so with
# r = sqrt(rowmax|E|), c = sqrt(colmax|E|) the scaled matrix lies in [-1,1]
# and one GLOBAL pair of scale vectors quantizes every block to int8:
#
#     E[P,Q] ~= rq[P] * cq[Q] * Q8[P,Q],     rq = r/sqrt(127), cq = c/sqrt(127)
#
# The action then runs entirely in exact int32 (pre-scale x by cq, row-
# quantize, int8 block gemms, int32 segment-sum) with one rank-1 float
# rescale + the EXACT diagonal's fused multiply-add at the end — halving
# the value traffic of the bf16 BSR tier at the bf16 coupling-accuracy
# class. XLA path only: the BSR action is gather-bound and the XLA gather
# beats the Pallas DMA variant (PERF.md), so the quantized tier rides the
# winning path.


def check_int8_accum_headroom(row_idx, bn: int,
                              context: str = "BSRMatrixInt8") -> None:
    """Exact-int32 accumulation headroom guard (same hazard as
    symm_int8._check_acc_headroom): each output entry receives one int8 dot
    per block in its row, each bounded by 127*127*bn — int32 wraparound
    would be silent finite garbage, so refuse loudly. Shared by every
    int8-BSR construction path (from_bsr, ShardedBSRInt8.from_int8, and
    direct-constructor callers like benchmarks/phenol_scale.py)."""
    rows = np.asarray(row_idx)
    max_bpr = int(np.bincount(rows).max()) if rows.size else 0
    if max_bpr * 127 * 127 * bn >= 2 ** 31:
        limit = 2 ** 31 // (127 * 127)
        raise ValueError(
            f"{context}: densest block row has {max_bpr} blocks x "
            f"bn={bn} (effective {max_bpr * bn} columns) — exceeds the "
            f"exact-int32 accumulation headroom (~{limit} effective "
            "columns); split the operator over a mesh or use a float "
            "tier")


@dataclasses.dataclass
class BSRMatrixInt8:
    """Quantized BSR: one int8 plane + row/col equilibration + exact diag."""

    q: Array             # (n_blocks, bm, bn) int8
    rq: Array            # (n_pad_rows,) f32 row equilibration (incl. 1/sqrt127)
    cq: Array            # (n_pad_cols,) f32 col equilibration
    col_idx: Array       # (n_blocks,) int32
    row_idx: Array       # (n_blocks,) int32
    row_ptr: Array       # (n_row_blocks + 1,) int32
    shape: Tuple[int, int]
    bm: int
    bn: int
    diagonal: Optional[Array] = None   # (n_pad,) f32 EXACT diagonal (square)

    @property
    def n_blocks(self) -> int:
        return self.q.shape[0]

    @property
    def nnz(self) -> int:
        return self.n_blocks * self.bm * self.bn

    @classmethod
    def from_bsr(cls, bsr: BSRMatrix) -> "BSRMatrixInt8":
        """Quantize an existing BSR operator (keeps its block topology)."""
        sqrt127 = float(np.sqrt(127.0))
        vals = np.asarray(bsr.values, dtype=np.float64)
        rows = np.asarray(bsr.row_idx)
        cols = np.asarray(bsr.col_idx)
        bm, bn = bsr.bm, bsr.bn
        n_pad, m_pad = bsr.shape
        check_int8_accum_headroom(rows, bn)
        # the diagonal split needs the matrix diagonal to align with the
        # diagonal BLOCKS — square matrix and square blocks only
        square = n_pad == m_pad and bm == bn and bsr.diagonal is not None
        if square:
            # only rows whose diagonal BLOCK exists in the topology get the
            # split: a tol-dropped diagonal block contributes NOTHING in the
            # float path, so adding its diagonal back here would diverge
            # from the bsr_matmat twin by up to the drop tolerance
            has_diag_block = np.zeros(n_pad // bm, dtype=bool)
            rows_np = np.asarray(bsr.row_idx)
            cols_np = np.asarray(bsr.col_idx)
            has_diag_block[rows_np[rows_np == cols_np]] = True
        diag = (np.asarray(bsr.diagonal, dtype=np.float64)
                if square else np.zeros(n_pad))
        if square:
            diag = np.where(np.repeat(has_diag_block, bm), diag, 0.0)
        # subtract the exact diagonal from the stored blocks (square only),
        # all vectorized — per-block Python loops are the slow-host trap
        E = vals.copy()
        ar_m = np.arange(bm)
        row_gidx = rows[:, None] * bm + ar_m[None, :]          # (nb, bm)
        col_gidx = cols[:, None] * bn + np.arange(bn)[None, :]  # (nb, bn)
        if square and E.shape[0]:
            dmask = np.where(rows == cols)[0]
            E[dmask[:, None], ar_m[None, :], ar_m[None, :]] -= diag[row_gidx[dmask]]
        # global row/col maxima of |E| accumulated across blocks
        rowmax = np.zeros(n_pad)
        colmax = np.zeros(m_pad)
        absE = np.abs(E)
        np.maximum.at(rowmax, row_gidx, absE.max(axis=2))
        np.maximum.at(colmax, col_gidx, absE.max(axis=1))
        r = np.sqrt(np.where(rowmax > 0.0, rowmax, 1.0))
        c = np.sqrt(np.where(colmax > 0.0, colmax, 1.0))
        scaled = E / (r[row_gidx][:, :, None] * c[col_gidx][:, None, :])
        q = np.clip(np.rint(127.0 * scaled), -127, 127).astype(np.int8)
        return cls(
            q=jnp.asarray(q),
            rq=jnp.asarray((r / sqrt127).astype(np.float32)),
            cq=jnp.asarray((c / sqrt127).astype(np.float32)),
            col_idx=bsr.col_idx,
            row_idx=bsr.row_idx,
            row_ptr=bsr.row_ptr,
            shape=bsr.shape,
            bm=bm,
            bn=bn,
            diagonal=jnp.asarray(diag, dtype=jnp.float32) if square else None,
        )

    @classmethod
    def from_dense(cls, matrix: np.ndarray, bm: Optional[int] = None,
                   bn: Optional[int] = None, tol: float = 0.0) -> "BSRMatrixInt8":
        return cls.from_bsr(BSRMatrix.from_dense(matrix, bm=bm, bn=bn, tol=tol))


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _bsr_matmat_int8_xla(qx, q, col_idx, row_idx, bm, bn, n_rb):
    """Exact-int32 twin of _bsr_matmat_xla."""
    m = qx.shape[0]
    xt = qx.reshape(m, -1, bn).transpose(1, 0, 2).astype(jnp.int32)
    x_blocks = xt[col_idx]
    contrib = jnp.einsum("kmn,kin->kmi", x_blocks, q.astype(jnp.int32))
    y_blocks = jax.ops.segment_sum(contrib, row_idx, num_segments=n_rb)
    return y_blocks.transpose(1, 0, 2).reshape(m, n_rb * bm)


def bsr_matmat_int8(x: Array, bsr: BSRMatrixInt8) -> Array:
    """Quantized BSR action y = x E^T * scales + x * diag, any backend."""
    from .symm_int8 import quantize_rows

    n_rb = bsr.shape[0] // bsr.bm
    xf = x.astype(jnp.float32)
    qx, sx = quantize_rows(xf * bsr.cq[None, :])
    acc = _bsr_matmat_int8_xla(qx, bsr.q, bsr.col_idx, bsr.row_idx,
                               bsr.bm, bsr.bn, n_rb)
    y = acc.astype(jnp.float32) * sx * bsr.rq[None, :]
    if bsr.diagonal is not None:
        y = y + xf * bsr.diagonal[None, :]
    return y.astype(x.dtype)
