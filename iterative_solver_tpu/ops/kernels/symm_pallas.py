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
    def from_dense(cls, matrix: np.ndarray, b: int = 512, dtype=None) -> "SymmetricBlocked":
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
        vals, iis, jjs = [], [], []
        for i in range(nb):
            for j in range(i + 1):
                vals.append(padded[i * b:(i + 1) * b, j * b:(j + 1) * b])
                iis.append(i)
                jjs.append(j)
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        return cls(
            values=jnp.asarray(np.stack(vals), dtype=dtype),
            ii=jnp.asarray(np.asarray(iis, dtype=np.int32)),
            jj=jnp.asarray(np.asarray(jjs, dtype=np.int32)),
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

    def kernel(ii_ref, jj_ref, x_ref, values_ref, y_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        i = ii_ref[t]
        j = jj_ref[t]
        a = values_ref[0]                       # (b, b) tile A_ij
        xj = x_ref[:, pl.ds(j * b, b)]
        # y_i += x_j A_ij^T
        yi = jax.lax.dot_general(
            xj, a, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype, precision=_PREC,
        )
        acc[:, pl.ds(i * b, b)] += yi

        @pl.when(i != j)
        def _():
            xi = x_ref[:, pl.ds(i * b, b)]
            # y_j += x_i A_ij
            yj = jax.lax.dot_general(
                xi, a, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype, precision=_PREC,
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
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n_pairs * b * b,
            bytes_accessed=n_pairs * b * b * nbytes + 2 * m * n * 4,
            transcendentals=0,
        ),
    )(ii, jj, x, values)
