"""Int8-quantized packed symmetric operator action: half the HBM bytes of
the bf16 tier, double-rate MXU dots, exact integer accumulation.

The packed-triangle kernels (symm_pallas.py) are DMA-bound at solver row
widths: the tile stream sets the wall, so halving bytes/element halves the
matvec time (measured n=8192 m=16 on one v5e: 36 us vs the bf16 tier's
125 us inside the same loop). Int8 does exactly that — IF the quantization
error stays in the bf16 class and the per-tile float work stays off the
critical path. Two tricks deliver both:

**Diagonal split.** A = diag(d) + E. The diagonal is stored EXACTLY (f32)
and applied as one fused multiply-add on the final store; only the
off-diagonal part E is quantized. Subspace operators are routinely
diagonally dominant (FCI hamiltonians: large diagonal, small couplings) —
quantizing A whole would scale the error by the diagonal magnitude and
destroy the couplings that drive convergence. With the split, a purely
diagonal operator is represented exactly and the quantization error scales
with the COUPLING magnitudes only.

**Symmetric equilibration with one global scale vector.**

    g[P] = sqrt(max_Q |E[P,Q]|)            (guarded against zero rows)
    B    = D^-1 E D^-1,  D = diag(g)   =>  |B[P,Q]| <= 1

(|E[P,Q]| <= min(rowmax_P, rowmax_Q) <= g[P] g[Q] by symmetry), so B
quantizes with the SCALAR scale 1/127:

    E[P,Q] ~= gq[P] gq[Q] Q[P,Q],   Q = round(127 B) in int8,  gq = g/sqrt(127)

and the action factors through the quantized operand:

    y[m,P] = sum_Q x[m,Q] E[P,Q] + x[m,P] d[P]
          ~= gq[P] * sx[m] * (qx @ Q^T)[m,P] + x[m,P] d[P]

with x row-quantized AFTER the gq pre-scale (xs = x*gq, sx[m] =
rowmax|xs|/127, qx = round(xs/sx)). Every per-tile step is then a pure
int8 x int8 -> int32 MXU dot accumulated in an EXACT int32 scratch — the
sx/gq rank-1 dequantization and the diagonal fused multiply-add happen
once, on the final (m, n) store, not per tile. Two tiers:

- ``SymmetricBlockedInt8``  one int8 plane: half the bf16 tier's tile
  bytes, coupling error ~ g[P]g[Q]/254 (the bf16 accuracy class for
  equilibrated couplings). NOTE the bound is the GEOMETRIC MEAN of the two
  off-diagonal row scales: couplings joining a weak row to a strong one
  carry larger relative error than bf16 storage would give them. The
  spectral floor (what sets a Davidson residual plateau) matches bf16's.
- ``SymmetricBlockedInt8Split``  two int8 planes (Q1 + Q2/254 quantizing
  the first plane's residual): the split double-bf16 accuracy class
  (~2^-16 of the coupling scale) at HALF its bytes, and 6 double-rate
  int8 dots per pair where split-bf16 spends 6 single-rate bf16 dots
  (measured 101 us vs 203 us at n=8192 b=512).

Reference twin: the packed kernels replace the buffered dgemm over
DistrArray chunks (array/util/gemm.h:100-152, BufferManager.h:136-173);
quantized storage has no reference counterpart — it is the TPU-native
low-bit serving technique applied to the symmetric operator stream.

Int32 accumulator headroom: each accumulator entry receives one bounded
contribution (<= 127*127*b) per int8 dot per tile column, so the exact
range holds up to 2^31/127^2 ~= 133k columns for the one-plane tier and
HALF that (~66k) for the split tier, whose lo accumulator takes two dots
per tile (p1@Q2 + p2@Q1). ``from_dense`` refuses oversized operators
loudly (_check_acc_headroom) — wraparound would be silent finite garbage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# one shared Mosaic params helper — symm_pallas owns the VMEM-limit
# rationale; a second copy here would drift when the limit is retuned
from .symm_pallas import _params  # noqa: E402,F401


_SQRT127 = float(np.sqrt(127.0))


def _pack_lower(matrix: np.ndarray, b: int):
    """Shared padded working copy (mirrors SymmetricBlocked). Returns a
    MUTABLE copy the equilibration then edits in place — the whole packing
    pipeline holds one full-size temporary, not three (an n=32768 operator
    is 8.6 GB; every avoidable copy is minutes of host wall)."""
    matrix = np.asarray(matrix, dtype=np.float64)
    n = matrix.shape[0]
    assert matrix.shape == (n, n), "operator must be square"
    if not np.allclose(matrix, matrix.T, atol=0.0, rtol=0.0):
        raise ValueError("int8 symmetric packing requires an exactly symmetric matrix")
    b = min(b, n)
    n_pad = ((n + b - 1) // b) * b
    if n_pad == n:
        work = matrix.astype(np.float64, copy=True)
    else:
        work = np.zeros((n_pad, n_pad))
        work[:n, :n] = matrix
    return work, n_pad, b


def _equilibrate_inplace(work: np.ndarray):
    """Diagonal split + off-diagonal row maxima, editing ``work`` in place:
    on return ``work`` holds E = A - diag(d). Returns (g, d) with
    g[P] = sqrt(rowmax |E[P,:]|) (1.0 on zero rows)."""
    d = np.diagonal(work).copy()
    np.fill_diagonal(work, 0.0)
    rowmax = np.abs(work).max(axis=1)
    g = np.sqrt(np.where(rowmax > 0.0, rowmax, 1.0))
    return g, d


def _check_acc_headroom(n_pad: int, b: int, dots_per_tile: int, what: str):
    """The kernels accumulate in int32: each output entry receives one
    contribution per tile column, each bounded by 127*127*b per int8 dot.
    One-plane kernels run 1 dot per accumulator per tile; the split
    kernel's lo accumulator receives TWO (p1@Q2 + p2@Q1). Wraparound is
    silent finite garbage, so refuse loudly instead."""
    worst = dots_per_tile * (n_pad // b) * 127 * 127 * b  # = dots*127^2*n_pad
    if worst >= 2 ** 31:
        limit = 2 ** 31 // (dots_per_tile * 127 * 127)
        raise ValueError(
            f"{what}: operator dimension {n_pad} exceeds the exact-int32 "
            f"accumulation headroom (max ~{limit} columns for this tier); "
            "shard the operator over a mesh (ShardedSymmetric.from_int8 "
            "bounds the per-device tile count) or use a float tier")


def _tile_pairs(B: np.ndarray, n_pad: int, b: int, tol_mask):
    """Vectorized lower-pair extraction: one reshape/swap view + fancy
    index instead of a per-tile Python loop (the loop costs minutes at
    n=8192 on a slow host; this is one gather)."""
    nb = n_pad // b
    iis, jjs = np.tril_indices(nb)
    if tol_mask is not None:
        keep = tol_mask[iis, jjs]
        iis, jjs = iis[keep], jjs[keep]
    if iis.size == 0:
        iis = np.zeros(1, dtype=np.int64)
        jjs = np.zeros(1, dtype=np.int64)
    grid = B.reshape(nb, b, nb, b).swapaxes(1, 2)   # (nb, nb, b, b) view
    return (grid[iis, jjs], iis.astype(np.int32), jjs.astype(np.int32))


def _tol_mask(E_scaled_src: np.ndarray, n_pad: int, b: int, tol: Optional[float]):
    if tol is None:
        return None
    nb = n_pad // b
    grid = E_scaled_src.reshape(nb, b, nb, b).swapaxes(1, 2)
    return np.abs(grid).max(axis=(2, 3)) > tol


@dataclasses.dataclass
class SymmetricBlockedInt8:
    """Packed lower triangle of the off-diagonal part, one int8 plane,
    plus the exact diagonal and the equilibration vector."""

    q: Array             # (n_pairs, b, b) int8, round(127 * B) tiles
    gq: Array            # (n_pad,) f32 equilibration, g/sqrt(127)
    ii: Array            # (n_pairs,) int32 block row
    jj: Array            # (n_pairs,) int32 block col (jj <= ii)
    shape: Tuple[int, int]
    b: int
    diagonal: Optional[Array] = None   # (n_pad,) f32 EXACT diagonal (applied
                                       # unquantized on the final store)

    @property
    def n_pairs(self) -> int:
        return self.q.shape[0]

    @classmethod
    def from_dense(cls, matrix: np.ndarray, b: int = 512,
                   tol: Optional[float] = None) -> "SymmetricBlockedInt8":
        work, n_pad, b = _pack_lower(matrix, b)
        _check_acc_headroom(n_pad, b, 1, "SymmetricBlockedInt8")
        g, d = _equilibrate_inplace(work)             # work == E
        mask = _tol_mask(work, n_pad, b, tol)
        work /= g[:, None]
        work /= g[None, :]                            # work == B, in place
        tiles, ii, jj = _tile_pairs(work, n_pad, b, mask)
        del work
        q = np.clip(np.rint(127.0 * tiles), -127, 127).astype(np.int8)
        return cls(
            q=jnp.asarray(q),
            gq=jnp.asarray((g / _SQRT127).astype(np.float32)),
            ii=jnp.asarray(ii),
            jj=jnp.asarray(jj),
            shape=(n_pad, n_pad),
            b=b,
            diagonal=jnp.asarray(d, dtype=jnp.float32),
        )


@dataclasses.dataclass
class SymmetricBlockedInt8Split:
    """Two int8 planes: E ~= gq gq^T ⊙ unpack(Q1 + Q2/254) — the ~2^-16
    accuracy class of split double-bf16 at half the streamed bytes — plus
    the exact diagonal."""

    q1: Array            # (n_pairs, b, b) int8, round(127 B)
    q2: Array            # (n_pairs, b, b) int8, round(254 (127 B - Q1))
    gq: Array            # (n_pad,) f32
    ii: Array
    jj: Array
    shape: Tuple[int, int]
    b: int
    diagonal: Optional[Array] = None   # (n_pad,) f32 EXACT diagonal

    @property
    def n_pairs(self) -> int:
        return self.q1.shape[0]

    @classmethod
    def from_dense(cls, matrix: np.ndarray, b: int = 512,
                   tol: Optional[float] = None) -> "SymmetricBlockedInt8Split":
        work, n_pad, b = _pack_lower(matrix, b)
        # the split kernel's lo accumulator takes TWO dots per tile
        _check_acc_headroom(n_pad, b, 2, "SymmetricBlockedInt8Split")
        g, d = _equilibrate_inplace(work)             # work == E
        mask = _tol_mask(work, n_pad, b, tol)
        work /= g[:, None]
        work /= g[None, :]                            # work == B, in place
        tiles, ii, jj = _tile_pairs(work, n_pad, b, mask)
        del work
        b127 = 127.0 * tiles
        q1 = np.clip(np.rint(b127), -127, 127)
        q2 = np.clip(np.rint(254.0 * (b127 - q1)), -127, 127).astype(np.int8)
        return cls(
            q1=q1.astype(np.int8),
            q2=q2,
            gq=jnp.asarray((g / _SQRT127).astype(np.float32)),
            ii=jnp.asarray(ii),
            jj=jnp.asarray(jj),
            shape=(n_pad, n_pad),
            b=b,
            diagonal=jnp.asarray(d, dtype=jnp.float32),
        )


def _diag_or_zeros(sym) -> Array:
    """The ``diagonal`` field is Optional (a directly-constructed operand
    without a diagonal split is legal); consumers treat None as zeros."""
    if sym.diagonal is not None:
        return sym.diagonal
    return jnp.zeros(sym.shape[0], jnp.float32)


def quantize_rows(xs: Array):
    """Per-row int8 quantization of a pre-scaled row block: xs ~= sx * qx.

    Returns (qx int8 (m, n), sx f32 (m, 1)). Zero rows quantize to zeros
    with sx = 1 (guarded divide)."""
    xs = xs.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xs), axis=1, keepdims=True)
    sx = jnp.where(amax > 0.0, amax, 1.0) / 127.0
    qx = jnp.clip(jnp.round(xs / sx), -127, 127).astype(jnp.int8)
    return qx, sx


def quantize_rows_split(xs: Array):
    """Double-int8 row split: xs ~= sx*(p1 + p2/254), error ~2^-16 rowmax."""
    xs = xs.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xs), axis=1, keepdims=True)
    sx = jnp.where(amax > 0.0, amax, 1.0) / 127.0
    scaled = xs / sx
    p1 = jnp.clip(jnp.round(scaled), -127, 127)
    p2 = jnp.clip(jnp.round(254.0 * (scaled - p1)), -127, 127).astype(jnp.int8)
    return p1.astype(jnp.int8), p2, sx


# ---------------------------------------------------------------------------
# Portable XLA paths — identical quantized arithmetic (exact int32 einsums),
# so CPU tests pin the same numerics the Pallas kernels produce.


@functools.partial(jax.jit, static_argnums=(3, 4))
def _symm_matmat_int8_xla(qx, q, ii_jj, b, nb):
    ii, jj = ii_jj
    m = qx.shape[0]
    xt = qx.reshape(m, nb, b).transpose(1, 0, 2).astype(jnp.int32)   # (nb, m, b)
    qt = q.astype(jnp.int32)
    contrib_i = jnp.einsum("kmn,kin->kmi", xt[jj], qt)
    acc = jax.ops.segment_sum(contrib_i, ii, num_segments=nb)
    strict = (ii != jj).astype(jnp.int32)
    contrib_j = jnp.einsum("kmn,kni->kmi", xt[ii], qt)
    acc = acc + jax.ops.segment_sum(contrib_j * strict[:, None, None], jj,
                                    num_segments=nb)
    return acc.transpose(1, 0, 2).reshape(m, nb * b)


def symm_matmat_int8(x: Array, sym: SymmetricBlockedInt8) -> Array:
    """XLA path of the int8 action (any backend)."""
    nb = sym.shape[0] // sym.b
    xf = x.astype(jnp.float32)
    qx, sx = quantize_rows(xf * sym.gq[None, :])
    acc = _symm_matmat_int8_xla(qx, sym.q, (sym.ii, sym.jj), sym.b, nb)
    y = acc.astype(jnp.float32) * sx * sym.gq[None, :] + xf * _diag_or_zeros(sym)[None, :]
    return y.astype(x.dtype)


def symm_matmat_int8_split(x: Array, sym: SymmetricBlockedInt8Split) -> Array:
    """XLA path of the double-int8 action: three int32 contractions
    (p1 Q1 + (p1 Q2 + p2 Q1)/254), dropping the O(2^-16 * 2^-8) p2 Q2 term."""
    nb = sym.shape[0] // sym.b
    xf = x.astype(jnp.float32)
    p1, p2, sx = quantize_rows_split(xf * sym.gq[None, :])
    pair = (sym.ii, sym.jj)
    a1 = _symm_matmat_int8_xla(p1, sym.q1, pair, sym.b, nb)
    a2 = _symm_matmat_int8_xla(p1, sym.q2, pair, sym.b, nb)
    a2 = a2 + _symm_matmat_int8_xla(p2, sym.q1, pair, sym.b, nb)
    acc = a1.astype(jnp.float32) + a2.astype(jnp.float32) * (1.0 / 254.0)
    y = acc * sx * sym.gq[None, :] + xf * _diag_or_zeros(sym)[None, :]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels: quantized x planes resident in VMEM, tile stream through
# the automatic pipeline, int32 accumulator scratch, one dequantized store
# fusing the rank-1 rescale and the exact-diagonal multiply-add.


@functools.lru_cache(maxsize=64)
def _pallas_int8_fn(m, n, b, n_pairs, interpret):
    return jax.jit(functools.partial(
        _symm_matmat_int8_impl, m=m, n=n, b=b, n_pairs=n_pairs, interpret=interpret))


def symm_matmat_int8_pallas(x: Array, sym: SymmetricBlockedInt8,
                            interpret: bool = False) -> Array:
    """Half-of-bf16-traffic symmetric action from one int8 plane."""
    m, n = x.shape
    assert n == sym.shape[0], "x width must match the operator dimension"
    xf = x.astype(jnp.float32)
    qx, sx = quantize_rows(xf * sym.gq[None, :])
    fn = _pallas_int8_fn(m, n, sym.b, sym.n_pairs, interpret)
    return fn(sym.ii, sym.jj, qx, sym.q, xf, sx, sym.gq.reshape(1, n),
              _diag_or_zeros(sym).reshape(1, n)).astype(x.dtype)


def _symm_matmat_int8_impl(ii, jj, qx, q, xf, sx, gq, dg,
                           *, m, n, b, n_pairs, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ii_ref, jj_ref, qx_ref, q_ref, xf_ref, sx_ref, gq_ref, dg_ref,
               y_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        i = ii_ref[t]
        j = jj_ref[t]
        a = q_ref[0]                            # (b, b) int8 tile

        # y_i += x_j Q^T : exact int32 accumulation, no per-tile float work
        yi = jax.lax.dot_general(
            qx_ref[:, pl.ds(j * b, b)], a,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[:, pl.ds(i * b, b)] += yi

        @pl.when(i != j)
        def _():
            yj = jax.lax.dot_general(
                qx_ref[:, pl.ds(i * b, b)], a,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc[:, pl.ds(j * b, b)] += yj

        @pl.when(t == n_pairs - 1)
        def _():
            y_ref[...] = (acc[...].astype(jnp.float32) * sx_ref[...] * gq_ref[...]
                          + xf_ref[...] * dg_ref[...])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ii, jj
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                # qx, resident
            pl.BlockSpec((1, b, b), lambda t, *_: (t, 0, 0)),     # int8 tile stream
            pl.BlockSpec(memory_space=pltpu.VMEM),                # xf (exact diag path)
            pl.BlockSpec(memory_space=pltpu.VMEM),                # sx (m, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),                # gq (1, n)
            pl.BlockSpec(memory_space=pltpu.VMEM),                # diagonal (1, n)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n_pairs * b * b,
            bytes_accessed=n_pairs * b * b + m * n * 5 + 2 * m * n * 4,
            transcendentals=0,
        ),
    )(ii, jj, qx, q, xf, sx, gq, dg)


@functools.lru_cache(maxsize=64)
def _pallas_int8_split_fn(m, n, b, n_pairs, interpret):
    return jax.jit(functools.partial(
        _symm_matmat_int8_split_impl, m=m, n=n, b=b, n_pairs=n_pairs,
        interpret=interpret))


def symm_matmat_int8_split_pallas(x: Array, sym: SymmetricBlockedInt8Split,
                                  interpret: bool = False) -> Array:
    """Split-bf16-class accuracy at half its traffic: two int8 planes."""
    m, n = x.shape
    assert n == sym.shape[0], "x width must match the operator dimension"
    xf = x.astype(jnp.float32)
    p1, p2, sx = quantize_rows_split(xf * sym.gq[None, :])
    fn = _pallas_int8_split_fn(m, n, sym.b, sym.n_pairs, interpret)
    return fn(sym.ii, sym.jj, p1, p2, sym.q1, sym.q2, xf, sx,
              sym.gq.reshape(1, n), _diag_or_zeros(sym).reshape(1, n)).astype(x.dtype)


def _symm_matmat_int8_split_impl(ii, jj, p1, p2, q1, q2, xf, sx, gq, dg,
                                 *, m, n, b, n_pairs, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ii_ref, jj_ref, p1_ref, p2_ref, q1_ref, q2_ref, xf_ref, sx_ref,
               gq_ref, dg_ref, y_ref, acc1, acc2):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc1[...] = jnp.zeros_like(acc1)
            acc2[...] = jnp.zeros_like(acc2)

        i = ii_ref[t]
        j = jj_ref[t]
        a1 = q1_ref[0]
        a2 = q2_ref[0]

        def dots(src, transpose):
            dn = (((1,), (1 if transpose else 0,)), ((), ()))
            x1 = p1_ref[:, pl.ds(src * b, b)]
            x2 = p2_ref[:, pl.ds(src * b, b)]
            hi = jax.lax.dot_general(x1, a1, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
            lo = jax.lax.dot_general(x1, a2, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
            lo += jax.lax.dot_general(x2, a1, dimension_numbers=dn,
                                      preferred_element_type=jnp.int32)
            return hi, lo

        hi, lo = dots(j, True)
        acc1[:, pl.ds(i * b, b)] += hi
        acc2[:, pl.ds(i * b, b)] += lo

        @pl.when(i != j)
        def _():
            hi2, lo2 = dots(i, False)
            acc1[:, pl.ds(j * b, b)] += hi2
            acc2[:, pl.ds(j * b, b)] += lo2

        @pl.when(t == n_pairs - 1)
        def _():
            y = acc1[...].astype(jnp.float32) + acc2[...].astype(jnp.float32) * (1.0 / 254.0)
            y_ref[...] = y * sx_ref[...] * gq_ref[...] + xf_ref[...] * dg_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                # p1, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),                # p2, resident
            pl.BlockSpec((1, b, b), lambda t, *_: (t, 0, 0)),     # Q1 stream
            pl.BlockSpec((1, b, b), lambda t, *_: (t, 0, 0)),     # Q2 stream
            pl.BlockSpec(memory_space=pltpu.VMEM),                # xf (exact diag path)
            pl.BlockSpec(memory_space=pltpu.VMEM),                # sx
            pl.BlockSpec(memory_space=pltpu.VMEM),                # gq
            pl.BlockSpec(memory_space=pltpu.VMEM),                # diagonal
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.int32),
                        pltpu.VMEM((m, n), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _params(),
        cost_estimate=pl.CostEstimate(
            flops=3 * 4 * m * n_pairs * b * b,
            bytes_accessed=2 * n_pairs * b * b + m * n * 6 + 2 * m * n * 4,
            transcendentals=0,
        ),
    )(ii, jj, p1, p2, q1, q2, xf, sx, gq, dg)


def make_int8_matvec(matrix, b: int = 512, two_plane: bool = False,
                     tol: Optional[float] = None, use_pallas=None):
    """One-call builder for the quantized tiers: returns (matvec, operand,
    sym) where ``matvec(x, operand)`` runs the Pallas kernel on TPU and the
    portable XLA path elsewhere, with every array (planes, scales, exact
    diagonal, topology) as a traced operand — never a baked constant.

    The single source of truth for the tier dispatch shared by
    FusedDavidson/FusedLinearEquations.from_dense_symmetric and bench legs
    (keeping six call sites from drifting apart)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if two_plane:
        sym = SymmetricBlockedInt8Split.from_dense(matrix, b=b, tol=tol)
        operand = (sym.q1, sym.q2, sym.gq, sym.diagonal, sym.ii, sym.jj)

        def matvec(x, op):
            s = dataclasses.replace(sym, q1=op[0], q2=op[1], gq=op[2],
                                    diagonal=op[3], ii=op[4], jj=op[5])
            if use_pallas:
                return symm_matmat_int8_split_pallas(x, s)
            return symm_matmat_int8_split(x, s).astype(x.dtype)

    else:
        sym = SymmetricBlockedInt8.from_dense(matrix, b=b, tol=tol)
        operand = (sym.q, sym.gq, sym.diagonal, sym.ii, sym.jj)

        def matvec(x, op):
            s = dataclasses.replace(sym, q=op[0], gq=op[1], diagonal=op[2],
                                    ii=op[3], jj=op[4])
            if use_pallas:
                return symm_matmat_int8_pallas(x, s)
            return symm_matmat_int8(x, s).astype(x.dtype)

    return matvec, operand, sym
