"""Symmetric dense operator action streaming only the lower triangle.

The reference exploits hermiticity on the subspace tier — H's new columns
are filled by transposing the new rows instead of recomputing them
(XSpace.h:51-64). This kernel applies the same idea to the O(N²) tier,
where it buys real bandwidth: a dense symmetric matvec ``y = x A`` is
HBM-bound, and every off-diagonal tile A_ij carries BOTH contributions

    y_i += x_j A_ijᵀ        and        y_j += x_i A_ij,

so streaming only the packed lower triangle halves the HBM traffic — the
dense-operator action drops from the full-matrix roof (~360 us for an f32
8192² on one v5e) to ~half. XLA cannot do this: a jnp expression of the two
contributions reads the buffer twice. The kernel holds the x block and a
(m, N) f32 accumulator resident in VMEM, streams the packed tiles through
the automatic Pallas pipeline (the reference's GEMM_BUFFERS=2 double
buffering, BufferManager.h:136-173), and adds both per-tile products on the
MXU.

Storage dtype is a choice: float32 packs exact HIGHEST-precision semantics
at half traffic; bfloat16 quarters the traffic at ~1e-3 relative operator
error (the split-K/`ops/precise.py` pipeline recovers eigenvalue accuracy).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

def _params():
    """Mosaic compiler params for the packed kernels: raise the scoped-VMEM
    limit above the 16 MB default — the r64/b1024 configuration's resident
    x + accumulator + double-buffered tiles legitimately need ~18-24 MB and
    the chip has far more; the default limit is a lint, not the hardware."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class SymmetricBlocked:
    """Packed lower triangle of a symmetric matrix in (b, b) tiles.

    ``values[t]`` is the tile A[ii[t]*b:(ii[t]+1)*b, jj[t]*b:(jj[t]+1)*b]
    for the row-major lower-pair enumeration (i, j <= i)."""

    values: Array        # (n_pairs, b, b)
    ii: Array            # (n_pairs,) int32 block row
    jj: Array            # (n_pairs,) int32 block col (jj <= ii)
    shape: Tuple[int, int]
    b: int
    diagonal: Optional[Array] = None

    @property
    def n_pairs(self) -> int:
        return self.values.shape[0]

    @classmethod
    def from_dense(cls, matrix: np.ndarray, b: int = 512, dtype=None,
                   tol: Optional[float] = None) -> "SymmetricBlocked":
        """Pack the lower triangle in (b, b) tiles. With ``tol`` set, tiles
        whose largest magnitude is <= tol are dropped entirely — the packed
        layout then doubles as a sparse-symmetric format (block-sparse FCI
        hamiltonians are symmetric; storing only nonzero lower tiles halves
        the value traffic of the BSR action on top of the triangle halving)."""
        matrix = np.asarray(matrix, dtype=np.float64)
        n = matrix.shape[0]
        assert matrix.shape == (n, n), "operator must be square"
        if not np.allclose(matrix, matrix.T, atol=0.0, rtol=0.0):
            raise ValueError("SymmetricBlocked requires an exactly symmetric matrix")
        b = min(b, n)
        n_pad = ((n + b - 1) // b) * b
        padded = np.zeros((n_pad, n_pad))
        padded[:n, :n] = matrix
        nb = n_pad // b
        # vectorized lower-pair gather (a per-tile Python loop costs minutes
        # at n=8192 on a slow host): one reshape/swap view + fancy index
        iis, jjs = np.tril_indices(nb)
        grid = padded.reshape(nb, b, nb, b).swapaxes(1, 2)
        if tol is not None:
            keep = (np.abs(grid).max(axis=(2, 3)) > tol)[iis, jjs]
            iis, jjs = iis[keep], jjs[keep]
        if iis.size == 0:  # all-zero operator: keep one zero tile
            iis = np.zeros(1, dtype=np.int64)
            jjs = np.zeros(1, dtype=np.int64)
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        return cls(
            values=jnp.asarray(grid[iis, jjs], dtype=dtype),
            ii=jnp.asarray(iis.astype(np.int32)),
            jj=jnp.asarray(jjs.astype(np.int32)),
            shape=(n_pad, n_pad),
            b=b,
            diagonal=jnp.asarray(np.diagonal(padded).copy(), dtype=dtype),
        )


@functools.partial(jax.jit, static_argnums=(3, 4))
def _symm_matmat_xla(x, values, ii_jj, b, nb):
    """Backend-portable reference path: reads every tile twice (once per
    contribution) — correct everywhere, but without the bandwidth win."""
    ii, jj = ii_jj
    m = x.shape[0]
    xt = x.reshape(m, nb, b).transpose(1, 0, 2)           # (nb, m, b)
    # y_i += x_j A_ij^T for all pairs
    contrib_i = jnp.einsum("kmn,kin->kmi", xt[jj], values, precision=_PREC)
    yi = jax.ops.segment_sum(contrib_i, ii, num_segments=nb)
    # y_j += x_i A_ij for strict-lower pairs
    strict = (ii != jj).astype(values.dtype)
    contrib_j = jnp.einsum("kmn,kni->kmi", xt[ii], values, precision=_PREC)
    yj = jax.ops.segment_sum(contrib_j * strict[:, None, None], jj, num_segments=nb)
    return (yi + yj).transpose(1, 0, 2).reshape(m, nb * b)


def symm_matmat(x: Array, sym: SymmetricBlocked) -> Array:
    """XLA path of the symmetric action (any backend, shards over a mesh)."""
    nb = sym.shape[0] // sym.b
    return _symm_matmat_xla(x, sym.values, (sym.ii, sym.jj), sym.b, nb)


@functools.lru_cache(maxsize=64)
def _pallas_symm_fn(m, n, b, n_pairs, vdtype_name, xdtype_name, interpret):
    return jax.jit(
        functools.partial(
            _symm_matmat_pallas_impl, m=m, n=n, b=b, n_pairs=n_pairs, interpret=interpret
        )
    )


def symm_matmat_pallas(x: Array, sym: SymmetricBlocked, interpret: bool = False) -> Array:
    """Half-traffic symmetric action: one pass over the packed lower triangle."""
    m, n = x.shape
    assert n == sym.shape[0], "x width must match the operator dimension"
    fn = _pallas_symm_fn(m, n, sym.b, sym.n_pairs, str(sym.values.dtype),
                         str(x.dtype), interpret)
    return fn(sym.ii, sym.jj, x, sym.values)


def _symm_matmat_pallas_impl(ii, jj, x, values, *, m, n, b, n_pairs, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # f32 accumulation on TPU; f64 only in the CPU-f64 test configuration
    acc_dtype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    # bf16 tile storage selects the single-pass MXU tier: bf16 x bf16
    # products are exact and accumulate in f32, so the only loss is the
    # bf16 rounding of operator and operand (~2^-8 relative) — the same
    # tier as a DEFAULT-precision dense matmul, at a quarter the traffic.
    # f32 tiles keep HIGHEST (6-pass) semantics.
    bf16_tier = values.dtype == jnp.bfloat16 and x.dtype == jnp.float32
    dot_prec = None if bf16_tier else _PREC

    def kernel(ii_ref, jj_ref, x_ref, values_ref, y_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        i = ii_ref[t]
        j = jj_ref[t]
        a = values_ref[0]                       # (b, b) tile A_ij
        if not bf16_tier:
            # cast in-register: Mosaic rejects mixed-dtype matmuls
            a = a.astype(x_ref.dtype)

        def xblk(base):
            blk = x_ref[:, pl.ds(base, b)]
            return blk.astype(jnp.bfloat16) if bf16_tier else blk

        # y_i += x_j A_ij^T
        yi = jax.lax.dot_general(
            xblk(j * b), a, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype, precision=dot_prec,
        )
        acc[:, pl.ds(i * b, b)] += yi

        @pl.when(i != j)
        def _():
            # y_j += x_i A_ij
            yj = jax.lax.dot_general(
                xblk(i * b), a, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype, precision=dot_prec,
            )
            acc[:, pl.ds(j * b, b)] += yj

        @pl.when(t == n_pairs - 1)
        def _():
            y_ref[...] = acc[...].astype(y_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ii, jj
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # x, resident
            pl.BlockSpec((1, b, b), lambda t, *_: (t, 0, 0)),           # tile stream
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), acc_dtype)],
    )
    nbytes = values.dtype.itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n_pairs * b * b,
            bytes_accessed=n_pairs * b * b * nbytes + 2 * m * n * 4,
            transcendentals=0,
        ),
    )(ii, jj, x, values)


# ---------------------------------------------------------------------------
# Split-bf16 packed storage: same HBM bytes as f32, one-pass MXU dots.
#
# The f32 HIGHEST packed kernel above is MXU-bound, not DMA-bound, for
# narrow row blocks: an f32 HIGHEST matmul decomposes into 6 bf16 passes and
# an m=16 operand uses 16/128 of the systolic rows, so the arithmetic
# (~260 us for 8192^2) overtakes the halved tile traffic (~174 us). Storing
# the tile as a bf16 (hi, lo) pair keeps the same bytes/element while each
# contribution needs only 3 single-pass bf16 dots (x_hi A_hi, x_hi A_lo,
# x_lo A_hi) — half the MXU work — pushing the kernel back to the DMA roof.
# The dropped x_lo A_lo term bounds the operator error at ~2^-16 relative
# (vs 2^-8 for plain bf16 and 2^-24 for f32); the hybrid host-refinement
# pipeline (ops/precise.py) still reaches 1e-8 eigenvalues from it.


@dataclasses.dataclass
class SymmetricBlockedSplit:
    """Packed lower triangle in double-bfloat16 tiles: hi + lo sums to the
    f32-grade matrix while every MXU pass is a native one-pass bf16 dot."""

    hi: Array            # (n_pairs, b, b) bfloat16
    lo: Array            # (n_pairs, b, b) bfloat16 residual (A - hi)
    ii: Array            # (n_pairs,) int32 block row
    jj: Array            # (n_pairs,) int32 block col (jj <= ii)
    shape: Tuple[int, int]
    b: int
    diagonal: Optional[Array] = None

    @property
    def n_pairs(self) -> int:
        return self.hi.shape[0]

    @classmethod
    def from_dense(cls, matrix: np.ndarray, b: int = 512) -> "SymmetricBlockedSplit":
        full = SymmetricBlocked.from_dense(matrix, b=b, dtype=jnp.float32)
        vals64 = np.asarray(full.values, dtype=np.float64)
        # numpy has no bfloat16: round-trip through jax for the split
        hi_j = jnp.asarray(vals64, dtype=jnp.bfloat16)
        lo_j = jnp.asarray(vals64 - np.asarray(hi_j, dtype=np.float64), dtype=jnp.bfloat16)
        return cls(
            hi=hi_j,
            lo=lo_j,
            ii=full.ii,
            jj=full.jj,
            shape=full.shape,
            b=full.b,
            diagonal=full.diagonal,
        )


def symm_matmat_split(x: Array, sym: "SymmetricBlockedSplit") -> Array:
    """Backend-portable XLA path of the split double-bf16 action: three
    single-pass contractions (x_h A_h + x_h A_l + x_l A_h) through
    _symm_matmat_xla with the fold-proof bitcast x-split."""
    nb = sym.shape[0] // sym.b
    xh, xl = bf16_split(x.astype(jnp.float32))
    f32 = jnp.float32
    y = _symm_matmat_xla(xh.astype(f32), sym.hi.astype(f32), (sym.ii, sym.jj), sym.b, nb)
    y = y + _symm_matmat_xla(xh.astype(f32), sym.lo.astype(f32), (sym.ii, sym.jj), sym.b, nb)
    y = y + _symm_matmat_xla(xl.astype(f32), sym.hi.astype(f32), (sym.ii, sym.jj), sym.b, nb)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _pallas_symm_split_fn(m, n, b, n_pairs, interpret):
    return jax.jit(
        functools.partial(
            _symm_matmat_split_impl, m=m, n=n, b=b, n_pairs=n_pairs, interpret=interpret
        )
    )


def symm_matmat_split_pallas(x: Array, sym: SymmetricBlockedSplit,
                             interpret: bool = False) -> Array:
    """Half-traffic symmetric action from split-bf16 tiles, 1-pass dots."""
    m, n = x.shape
    assert n == sym.shape[0], "x width must match the operator dimension"
    fn = _pallas_symm_split_fn(m, n, sym.b, sym.n_pairs, interpret)
    return fn(sym.ii, sym.jj, x, sym.hi, sym.lo)


def bf16_split(x):
    """Fold-proof double-bf16 split: x ~= hi + lo with bf16 parts.

    The naive ``x - bf16(x)`` split is ILLEGAL under XLA's
    --xla_allow_excess_precision (set by this TPU runtime): the
    f32->bf16->f32 round-trip gets folded to identity and the lo term
    silently becomes zero. Masking the low mantissa bits through an integer
    bitcast is fold-proof: hi keeps the top mantissa bits (exactly
    bf16-representable), and the f32 subtraction x - hi is exact."""
    if x.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        xh_f32 = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        return xh_f32.astype(jnp.bfloat16), (x - xh_f32).astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    return xh, (x - xh.astype(x.dtype)).astype(jnp.bfloat16)


def _symm_matmat_split_impl(ii, jj, x, hi, lo, *, m, n, b, n_pairs, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # split the (resident) row block once, outside the tile loop
    xh, xl = bf16_split(x)

    def kernel(ii_ref, jj_ref, xh_ref, xl_ref, hi_ref, lo_ref, y_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        i = ii_ref[t]
        j = jj_ref[t]
        ah = hi_ref[0]
        al = lo_ref[0]

        def contract(xh_blk, xl_blk, transpose):
            dn = (((1,), (1 if transpose else 0,)), ((), ()))
            y = jax.lax.dot_general(xh_blk, ah, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(xh_blk, al, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(xl_blk, ah, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
            return y

        # y_i += x_j A_ij^T
        acc[:, pl.ds(i * b, b)] += contract(
            xh_ref[:, pl.ds(j * b, b)], xl_ref[:, pl.ds(j * b, b)], True
        )

        @pl.when(i != j)
        def _():
            # y_j += x_i A_ij
            acc[:, pl.ds(j * b, b)] += contract(
                xh_ref[:, pl.ds(i * b, b)], xl_ref[:, pl.ds(i * b, b)], False
            )

        @pl.when(t == n_pairs - 1)
        def _():
            y_ref[...] = acc[...].astype(y_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ii, jj
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # xh, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # xl, resident
            pl.BlockSpec((1, b, b), lambda t, *_: (t, 0, 0)),           # hi tile stream
            pl.BlockSpec((1, b, b), lambda t, *_: (t, 0, 0)),           # lo tile stream
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _params(),
        cost_estimate=pl.CostEstimate(
            flops=3 * 4 * m * n_pairs * b * b,
            bytes_accessed=n_pairs * b * b * 4 + 2 * m * n * 4,
            transcendentals=0,
        ),
    )(ii, jj, xh, xl, hi, lo)


def make_differentiable_symm_action(sym: SymmetricBlocked, use_pallas=None,
                                    interpret: bool = False):
    """Return ``action(x, values) -> y`` with a custom VJP, making the packed
    kernels usable in differentiable workflows (Pallas calls define no
    autodiff rule; this supplies one analytically).

    - x-cotangent: the operator is symmetric, so the adjoint action IS the
      forward packed action applied to the output cotangent — the same
      kernel runs in the backward pass at the same half-traffic cost.
    - values-cotangent (per tile t=(i,j)):
        vbar[t] = ybar_i^T x_j  +  [i != j] x_i^T ybar_j
      computed with batched einsums over the pair list.

    ``values`` is the differentiable argument; the pair topology (ii, jj)
    is closed over. Pass the tile stack through a traced argument (as the
    solvers do) so large operators never bake into the HLO."""
    b = sym.b
    nb = sym.shape[0] // b
    ii, jj = sym.ii, sym.jj
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def _forward(x, values):
        s = dataclasses.replace(sym, values=values)
        if use_pallas:
            return symm_matmat_pallas(x, s, interpret=interpret)
        return symm_matmat(x, s)

    @jax.custom_vjp
    def action(x, values):
        return _forward(x, values)

    def fwd(x, values):
        return _forward(x, values), (x, values)

    def bwd(res, ybar):
        x, values = res
        xbar = _forward(ybar, values).astype(x.dtype)
        m = x.shape[0]
        xt = x.reshape(m, nb, b).transpose(1, 0, 2)
        yt = ybar.reshape(m, nb, b).transpose(1, 0, 2)
        vbar = jnp.einsum("kmp,kmq->kpq", yt[ii], xt[jj], precision=_PREC)
        strict = (ii != jj).astype(vbar.dtype)
        vbar = vbar + strict[:, None, None] * jnp.einsum(
            "kmp,kmq->kpq", xt[ii], yt[jj], precision=_PREC)
        return xbar, vbar.astype(values.dtype)

    action.defvjp(fwd, bwd)
    return action
