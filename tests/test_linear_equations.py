"""Linear-equation solver tests mirroring test/itsolv/test_LinearEquations.cpp:
multiple RHS, augmented-Hessian parameter sweep."""

import numpy as np
import pytest

import iterative_solver_tpu as its


def make_system(n, nrhs, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * 0.1
    mat = a + a.T + np.diag(np.arange(5.0, n + 5.0))
    rhs = rng.standard_normal((nrhs, n))
    return mat, rhs


@pytest.mark.parametrize("nrhs", [1, 2, 3])
def test_multiple_rhs(nrhs):
    n = 20
    mat, rhs = make_system(n, nrhs)
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_equations(n, nrhs, "Davidson")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-10
    solver.add_equations(rhs)
    converged, *_ = solver.solve(
        np.zeros((nrhs, n)), problem=problem, generate_initial_guess=True
    )
    assert converged
    x = np.asarray(solver.solution_params(list(range(nrhs))))
    ref = np.linalg.solve(mat, rhs.T).T
    np.testing.assert_allclose(x, ref, atol=1e-7)


@pytest.mark.parametrize("aughes", [0.0, 0.001, 0.01])
def test_augmented_hessian_sweep(aughes):
    n = 15
    mat, rhs = make_system(n, 1, seed=3)
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_equations(
        n, 1, "Davidson", f"augmented_hessian={aughes}"
    )
    solver.verbosity = its.Verbosity.NONE
    # the augmented-hessian level shift leaves a plain-residual floor
    # ~ |lambda| ||x|| / ||b||, so the threshold must sit above it
    solver.convergence_threshold = 1e-9 if aughes == 0.0 else 1e-4
    solver.add_equations(rhs)
    converged, *_ = solver.solve(
        np.zeros((1, n)), problem=problem, generate_initial_guess=True
    )
    assert converged
    x = np.asarray(solver.solution_params([0]))[0]
    if aughes == 0.0:
        ref = np.linalg.solve(mat, rhs[0])
        np.testing.assert_allclose(x, ref, atol=1e-6)
    else:
        # augmented-hessian solves (A - lambda) x = b for a level shift lambda
        lam = solver.subspace_solver.eigenvalues[0]
        resid = (mat - lam * np.eye(n)) @ x - rhs[0]
        assert np.linalg.norm(resid) / np.linalg.norm(rhs[0]) < 1e-4


def test_rhs_accessor():
    n = 10
    mat, rhs = make_system(n, 2)
    solver = its.create_linear_equations(n, 2)
    solver.add_equations(rhs)
    np.testing.assert_allclose(np.asarray(solver.rhs()), rhs, atol=1e-14)
    assert solver.n_roots() == 2
