"""Optimize (BFGS/SD) tests mirroring test/itsolv/test_Optimize.cpp:
quadratic form f = 1/2 (x-b)^T H (x-b), convergence + statistics."""

import numpy as np
import pytest

import iterative_solver_tpu as its


def make_hessian(n, rho=0.1):
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return np.where(i == j, i + 1.0, rho * (1.0 / (1.0 + abs(i - j))))


@pytest.mark.parametrize("n", [2, 5, 20])
def test_bfgs_quadratic(n):
    hess = make_hessian(n)
    b = np.ones(n)
    problem = its.models.QuadraticOptimizeProblem(hess, b)
    solver = its.create_optimize(n, "BFGS", "max_size_qspace=8")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-10
    converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
    assert converged
    np.testing.assert_allclose(np.asarray(x)[0], b, atol=1e-7)
    assert solver.stats.iterations > 0
    assert solver.value < 1e-12


def test_bfgs_line_search_on_stiff_problem():
    """A poorly scaled quadratic should trigger at least one line search."""
    n = 10
    hess = np.diag(np.logspace(0, 3, n))
    problem = its.models.QuadraticOptimizeProblem(hess, np.ones(n))

    class NoPrecond(its.Problem):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner
            self.dimension = inner.dimension

        def residual(self, p):
            return self.inner.residual(p)

        def precondition(self, residual, shift=None, diagonals=None):
            return residual  # identity preconditioner forces line searching

    solver = its.create_optimize(n, "BFGS")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-8
    solver.max_iter = 200
    converged, x, _ = solver.solve(np.zeros((1, n)), problem=NoPrecond(problem))
    assert converged
    np.testing.assert_allclose(np.asarray(x)[0], np.ones(n), atol=1e-6)


@pytest.mark.parametrize("n", [2, 10])
def test_sd_quadratic(n):
    hess = make_hessian(n, rho=0.01)
    problem = its.models.QuadraticOptimizeProblem(hess, np.ones(n))
    solver = its.create_optimize(n, "SD")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-8
    solver.max_iter = 300
    converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
    assert converged
    np.testing.assert_allclose(np.asarray(x)[0], np.ones(n), atol=1e-6)


def test_bfgs_statistics_and_options():
    solver = its.create_optimize(
        5, "BFGS", "max_size_qspace=4,convergence_threshold=1e-9,max_iter=50"
    )
    assert solver.max_size_qspace == 4
    assert solver.convergence_threshold == 1e-9
    assert solver.max_iter == 50
