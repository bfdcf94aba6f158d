"""One-call Problem-class API tests (mirrors test/itsolv/test_simplified.cpp),
including the test_problem numerical self-check."""

import numpy as np
import pytest

import iterative_solver_tpu as its


def test_solve_simplified_eigensystem():
    n = 30
    problem = its.models.ExampleProblem(n)
    solver = its.create_linear_eigensystem(n, 2)
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    converged, x, r = solver.solve(np.zeros((2, n)), problem=problem, generate_initial_guess=True)
    assert converged
    ref = np.linalg.eigvalsh(np.asarray(problem.matrix))[:2]
    np.testing.assert_allclose(solver.eigenvalues()[:2], ref, atol=2e-9)


def test_test_problem_linear():
    n = 12
    problem = its.models.ExampleProblem(n)

    class Checked(its.models.ExampleProblem):
        def test_parameters(self, instance):
            if instance > 2:
                return None
            rng = np.random.default_rng(instance)
            return rng.standard_normal(self.dimension)

    solver = its.create_linear_eigensystem(n, 1)
    assert solver.test_problem(Checked(n))


def test_test_problem_nonlinear_gradient_check():
    n = 8
    hess = np.diag(np.arange(1.0, n + 1.0))
    problem = its.models.QuadraticOptimizeProblem(hess)
    solver = its.create_optimize(n)
    assert solver.test_problem(problem, threshold=1e-5)


def test_test_problem_detects_bad_gradient():
    n = 8
    hess = np.diag(np.arange(1.0, n + 1.0))

    class BadGradient(its.models.QuadraticOptimizeProblem):
        def residual(self, parameters):
            value, grad = super().residual(parameters)
            return value, grad * 1.5  # inconsistent with value

        def test_parameters(self, instance):
            if instance > 3:
                return None
            rng = np.random.default_rng(instance)
            return rng.standard_normal(self.dimension)

    solver = its.create_optimize(n)
    assert not solver.test_problem(BadGradient(hess), verbosity=-1, threshold=1e-9)
