"""DIIS nonlinear-equation tests mirroring test/itsolv/test_NonLinearEquations.cpp
(small quadratic and trigonometric problems)."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its


class SmallQuadraticProblem(its.Problem):
    """r_i = A x - b with mild nonlinearity x_i^2 * eps."""

    def __init__(self, n, eps=0.05):
        super().__init__()
        self.dimension = n
        rng = np.random.default_rng(1)
        a = rng.standard_normal((n, n)) * 0.1
        self.a = jnp.asarray(a + a.T + np.diag(np.arange(2.0, n + 2.0)))
        self.b = jnp.asarray(rng.standard_normal(n))
        self.eps = eps

    def residual(self, parameters):
        res = self.a @ parameters + self.eps * parameters**2 - self.b
        return 0.0, res

    def diagonals(self):
        return jnp.diagonal(self.a)


@pytest.mark.parametrize("n", [3, 8, 30])
def test_diis_quadratic(n):
    problem = SmallQuadraticProblem(n)
    solver = its.create_nonlinear_equations(n, "DIIS", "max_size_qspace=8")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-8
    converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
    assert converged
    _, res = problem.residual(jnp.asarray(np.asarray(x)[0]))
    assert np.linalg.norm(np.asarray(res)) < 2e-8


@pytest.mark.parametrize("n", [5, 20])
def test_diis_trig(n):
    problem = its.models.TrigNonlinearProblem(n)
    solver = its.create_nonlinear_equations(n, "DIIS")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-8
    converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
    assert converged
    _, res = problem.residual(jnp.asarray(np.asarray(x)[0]))
    assert np.linalg.norm(np.asarray(res)) < 2e-8


def test_diis_respects_max_size_qspace():
    n = 30
    problem = its.models.TrigNonlinearProblem(n)
    solver = its.create_nonlinear_equations(n, "DIIS", "max_size_qspace=3")
    solver.verbosity = its.Verbosity.NONE
    converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
    assert converged
    assert solver.xspace.dimensions.nQ <= 4
