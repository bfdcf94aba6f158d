"""Device block-vector operations (the ArrayHandler layer, TPU-native).

The reference routes every O(N) numeric through virtual ArrayHandler objects
(reference: src/molpro/linalg/array/ArrayHandler.h:184-222) backed by
CBLAS+MPI streaming kernels (array/util/gemm.h:76-153).  Here the same
contract is a set of pure, jitted JAX functions over ``(m, N)`` row-blocks:

- ``gram``        <- gemm_inner: block inner-product matrix, one big matmul on
                     the MXU; when N is sharded over a mesh XLA inserts the
                     psum that replaces the reference's MPI_Allreduce
                     (gemm.h:43-46).
- ``reconstruct`` <- gemm_outer: coefficient matrix x basis stack.
- ``axpy_rows`` / ``scale_rows`` / ``dots_rows`` — fused elementwise sweeps.
- ``select_smallest_*`` <- util/select.h top-n selection via lax.top_k.

All functions take static shapes so each (shape, dtype) pair compiles exactly
once; jax.jit's cache plays the role of the reference's handler registry.
Matmuls request float32 accumulation ("highest" precision) so the f32 TPU
path converges like the f64 host path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PRECISION = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit)
def gram(x: Array, y: Array) -> Array:
    """<x_i, y_j> for row blocks: (m, N) x (k, N) -> (m, k)."""
    return jnp.matmul(x, y.T, precision=_PRECISION)


@functools.partial(jax.jit)
def gram_sym(x: Array) -> Array:
    """<x_i, x_j> overlap of a block with itself: (m, N) -> (m, m)."""
    return jnp.matmul(x, x.T, precision=_PRECISION)


@functools.partial(jax.jit)
def reconstruct(coeff: Array, basis: Array) -> Array:
    """Linear combinations of basis rows: (m, k) x (k, N) -> (m, N)."""
    return jnp.matmul(coeff, basis, precision=_PRECISION)


@functools.partial(jax.jit)
def reconstruct_add(out: Array, coeff: Array, basis: Array) -> Array:
    """out += coeff @ basis (the gemm_outer accumulate form)."""
    return out + jnp.matmul(coeff, basis, precision=_PRECISION)


@functools.partial(jax.jit)
def axpy(alpha, x: Array, y: Array) -> Array:
    """y + alpha * x elementwise (alpha scalar)."""
    return y + alpha * x


@functools.partial(jax.jit)
def axpy_rows(alphas: Array, x: Array, y: Array) -> Array:
    """y[i] + alphas[i] * x[i] for row blocks."""
    return y + alphas[:, None] * x


@functools.partial(jax.jit)
def scale_rows(alphas: Array, x: Array) -> Array:
    return alphas[:, None] * x


@functools.partial(jax.jit)
def dots_rows(x: Array, y: Array) -> Array:
    """Row-wise dot products: (m, N), (m, N) -> (m,)."""
    return jnp.einsum("in,in->i", x, y, precision=_PRECISION)


def chol_jitter(dtype) -> float:
    """Gram jitter that EXCEEDS the dtype's Gram roundoff, for unit-scale
    rows. A nearly linearly dependent block's Gram reads min-eig ~ -eps by
    rounding (f64 ~ -1e-16, f32 ~ -1e-6 measured on TPU) and an
    under-jittered Cholesky NaNs silently — and a NaN error vector reads as
    CONVERGED in every fused while_loop cond (NaN > tol is False)."""
    return 1e-12 if dtype == jnp.float64 else 1e-5


@functools.partial(jax.jit)
def norms_rows(x: Array) -> Array:
    return jnp.sqrt(jnp.abs(jnp.einsum("in,in->i", x, x, precision=_PRECISION)))


@functools.partial(jax.jit)
def normalize_rows(x: Array, thresh: float = 1.0e-14) -> Tuple[Array, Array]:
    """Normalise each row unless its norm is below ``thresh`` (left untouched).

    Mirrors detail::normalise (IterativeSolverTemplate.h:80-93).
    """
    norms = jnp.sqrt(jnp.abs(jnp.einsum("in,in->i", x, x, precision=_PRECISION)))
    safe = jnp.where(norms > thresh, norms, 1.0)
    return x / safe[:, None], norms


@functools.partial(jax.jit, static_argnums=(1,))
def select_smallest(values: Array, n: int) -> Tuple[Array, Array]:
    """Indices and values of the n smallest elements (ascending).

    The reference's handler ``select`` with smallest=true (util/select.h) used
    for diagonal-based initial guesses and P-space selection.
    """
    neg_vals, idx = jax.lax.top_k(-values, n)
    return idx, -neg_vals


@functools.partial(jax.jit, static_argnums=(2,))
def select_max_dot(x: Array, y: Array, n: int) -> Tuple[Array, Array]:
    """Indices and values of the n largest |x_i * y_i| (util/select_max_dot.h)."""
    prod = jnp.abs(x * y)
    vals, idx = jax.lax.top_k(prod, n)
    return idx, vals


@functools.partial(jax.jit)
def fused_axpy(alphas: Array, xs: Array, y: Array) -> Array:
    """y + sum_k alphas[k] * xs[k] in one pass — the batch operation the
    reference's LazyHandle registered and replayed (ArrayHandler.h:271-292).
    Under XLA this is a single fused matvec over the stack."""
    return y + jnp.einsum("k,kn->n", alphas, xs, precision=_PRECISION)


@functools.partial(jax.jit)
def fused_dot(x: Array, ys: Array) -> Array:
    """All <x, ys[k]> in one pass (LazyHandle fused_dot)."""
    return jnp.matmul(ys, x, precision=_PRECISION)


@functools.partial(jax.jit)
def mgs_project(r: Array, xblock: Array, inv_norms: Array) -> Array:
    """Sequential modified-Gram-Schmidt projection of rows of ``r`` against the
    rows of ``xblock`` in order: r -= (r . x_i) * inv_norms[i] * x_i.

    ``inv_norms[i] = 1/|<x_i,x_i>|`` for active rows and 0 for padding rows,
    so a fixed-capacity stack gives one compile for all subspace sizes.
    Mirrors the orthogonalise sweep of propose_rspace.h:433-449 (sequential
    per basis vector, batched over the R block).
    """

    def body(i, r):
        x = xblock[i]
        dots = jnp.matmul(r, x, precision=_PRECISION)
        return r - (dots * inv_norms[i])[:, None] * x[None, :]

    return jax.lax.fori_loop(0, xblock.shape[0], body, r)


def jacobi_precondition_block(
    residual: Array,
    shifts: Array,
    diagonals: Array,
    small: float = 1e-15,
) -> Array:
    """Davidson/Jacobi update r_i /= (d - shift_i + small) for a row block.

    Default preconditioner semantics of IterativeSolver.h:34-63 (note the
    reference adds ``+1e-15`` with no sign guard — reproduced for parity).
    """
    return _jacobi_precondition(residual, shifts, diagonals, small)


@functools.partial(jax.jit, static_argnums=(3,))
def _jacobi_precondition(residual, shifts, diagonals, small):
    denom = diagonals[None, :] - shifts[:, None] + small
    return residual / denom


def adapt_sharding(sharding, ndim: int):
    """Fit a NamedSharding's spec to an array rank: keep the trailing (vector)
    axes, so a (rows, N) block spec applies to an (N,) vector as (N,)."""
    if sharding is None:
        return None
    try:
        from jax.sharding import NamedSharding, PartitionSpec
    except ImportError:  # pragma: no cover
        return sharding
    if not isinstance(sharding, NamedSharding):
        return sharding
    spec = tuple(sharding.spec)
    if len(spec) == ndim:
        return sharding
    if len(spec) > ndim:
        return NamedSharding(sharding.mesh, PartitionSpec(*spec[len(spec) - ndim:]))
    return NamedSharding(sharding.mesh, PartitionSpec(*((None,) * (ndim - len(spec)) + spec)))


def to_device(x, dtype=None, sharding=None) -> Array:
    arr = jnp.asarray(x, dtype=dtype)
    if sharding is not None:
        arr = jax.device_put(arr, adapt_sharding(sharding, arr.ndim))
    return arr


def to_host(x: Array) -> np.ndarray:
    return np.asarray(x)
