"""Built-in problem definitions mirroring the reference's examples and tests.

- ``MatrixProblem``: dense kernel matrix, jitted MXU matmul action
  (reference: examples/ExampleProblem.h / test Problem classes).
- ``load_hamiltonian``: reader for the bundled FCI ``*.hamiltonian`` text
  files — first token n, then n^2 row-major doubles
  (test/itsolv/test_LinearEigensystem.cpp:53-64).
- ``ExampleProblem``: matrix(i,j) = i+1 if i==j else 0.001*((i+j)%n)
  (examples/ExampleProblem.h).
- ``QuadraticOptimizeProblem``: f = 1/2 (x-b)^T H (x-b)
  (test/itsolv/test_Optimize.cpp).
- ``TrigNonlinearProblem``: trigonometric nonlinear equations
  (test/itsolv/test_NonLinearEquations.cpp:174-205).
- ``RayleighQuotientProblem``: nonlinear Rayleigh-quotient minimisation
  (test/itsolv/test_rayleigh_quotient.cpp, python/test).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import Problem

Array = jax.Array

_PREC = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit)
def _matmul_action(params: Array, matrix: Array) -> Array:
    return jnp.matmul(params, matrix.T, precision=_PREC)


def load_hamiltonian(path: str) -> np.ndarray:
    """Parse a bundled .hamiltonian file: dimension token then n^2 doubles."""
    with open(path) as f:
        tokens = f.read().split()
    n = int(tokens[0])
    values = np.asarray([float(t) for t in tokens[1 : 1 + n * n]])
    return values.reshape(n, n)


class MatrixProblem(Problem):
    """Linear problem defined by an explicit (hermitian or not) matrix."""

    def __init__(self, matrix, dtype=None, sharding=None):
        super().__init__()
        matrix = np.asarray(matrix, dtype=np.float64)
        self.dimension = matrix.shape[0]
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.matrix = jnp.asarray(matrix, dtype=dtype)
        if sharding is not None:
            self.matrix = jax.device_put(self.matrix, sharding)
        self.n_actions = 0

    def action(self, parameters: Array) -> Array:
        self.n_actions += parameters.shape[0]
        return _matmul_action(parameters, self.matrix)

    def diagonals(self) -> Array:
        return jnp.diagonal(self.matrix)

    def pp_action_matrix(self, pvectors: Sequence[Dict[int, float]]) -> np.ndarray:
        n_p = len(pvectors)
        mat = np.zeros((n_p, n_p))
        host = np.asarray(self.matrix, dtype=np.float64)
        for i, pi in enumerate(pvectors):
            for j, pj in enumerate(pvectors):
                mat[i, j] = sum(
                    ci * cj * host[int(a), int(b)] for a, ci in pi.items() for b, cj in pj.items()
                )
        return mat

    def p_action(self, p_coefficients: np.ndarray, pvectors: Sequence[Dict[int, float]]) -> Array:
        m = p_coefficients.shape[0]
        dense_p = np.zeros((len(pvectors), self.dimension))
        for i, pvec in enumerate(pvectors):
            for idx, val in pvec.items():
                dense_p[i, int(idx)] = val
        coeff = jnp.asarray(np.asarray(p_coefficients), dtype=self.matrix.dtype)
        pblock = jnp.asarray(dense_p, dtype=self.matrix.dtype)
        return _matmul_action(jnp.matmul(coeff, pblock, precision=_PREC), self.matrix)


class ExampleProblem(MatrixProblem):
    """matrix(i,j) = i+1 on the diagonal, 0.001*((i+j) % n) off it."""

    def __init__(self, n: int, **kwargs):
        i = np.arange(n)[:, None]
        j = np.arange(n)[None, :]
        matrix = np.where(i == j, (i + 1).astype(np.float64), 0.001 * ((i + j) % n))
        super().__init__(matrix, **kwargs)


class QuadraticOptimizeProblem(Problem):
    """f = 1/2 (x-b)^T H (x-b); gradient H (x-b)."""

    def __init__(self, hessian, b=None, dtype=None):
        super().__init__()
        hessian = np.asarray(hessian, dtype=np.float64)
        self.dimension = hessian.shape[0]
        if b is None:
            b = np.ones(self.dimension)
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.hessian = jnp.asarray(hessian, dtype=dtype)
        self.b = jnp.asarray(np.asarray(b), dtype=dtype)

    def residual(self, parameters: Array):
        d = parameters - self.b
        grad = jnp.matmul(self.hessian, d, precision=_PREC)
        value = 0.5 * float(jnp.dot(d, grad))
        return value, grad

    def diagonals(self) -> Array:
        return jnp.diagonal(self.hessian)

    def test_parameters(self, instance: int):
        if instance > 3:
            return None
        rng = np.random.default_rng(instance)
        return rng.standard_normal(self.dimension)


class TrigNonlinearProblem(Problem):
    """Nonlinear equations r_i = x_i + a_i sin(x_i) - b_i (smooth, diagonal-ish)."""

    def __init__(self, n: int, dtype=None):
        super().__init__()
        self.dimension = n
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        rng = np.random.default_rng(42)
        self.a = jnp.asarray(0.3 + 0.2 * rng.random(n), dtype=dtype)
        self.b = jnp.asarray(rng.standard_normal(n), dtype=dtype)

    def residual(self, parameters: Array):
        res = parameters + self.a * jnp.sin(parameters) - self.b
        return 0.0, res

    def diagonals(self) -> Array:
        return 1.0 + self.a


class RayleighQuotientProblem(Problem):
    """Minimise the Rayleigh quotient of a matrix via Optimize — the nonlinear
    cross-check of the eigensolver (test_rayleigh_quotient.cpp)."""

    def __init__(self, matrix, dtype=None):
        super().__init__()
        matrix = np.asarray(matrix, dtype=np.float64)
        self.dimension = matrix.shape[0]
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.matrix = jnp.asarray(matrix, dtype=dtype)

    def residual(self, parameters: Array):
        ax = jnp.matmul(self.matrix, parameters, precision=_PREC)
        xx = float(jnp.dot(parameters, parameters))
        xax = float(jnp.dot(parameters, ax))
        value = xax / xx
        grad = 2.0 * (ax - value * parameters) / xx
        return value, grad

    def precondition(self, residual, shift=None, diagonals=None):
        # The Rayleigh-quotient Hessian is ~2(A - theta); a zero-shift Jacobi
        # update flips the step sign wherever the diagonal is negative, so
        # approximate theta by the smallest diagonal to keep curvature positive.
        d = jnp.diagonal(self.matrix)
        denom = d - jnp.min(d) + 1.0
        return residual / denom[None, :]
