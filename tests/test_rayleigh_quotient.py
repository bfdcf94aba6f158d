"""Rayleigh-quotient minimisation via Optimize — cross-validates the
eigensolver against the nonlinear path (test/itsolv/test_rayleigh_quotient.cpp
and python/test/test_rayleigh_quotient.py)."""

import numpy as np
import pytest

import iterative_solver_tpu as its


@pytest.mark.parametrize("method", ["BFGS", "SD"])
def test_rayleigh_quotient(hamiltonians, method):
    matrix = hamiltonians["hf"]
    n = matrix.shape[0]
    problem = its.models.RayleighQuotientProblem(matrix)
    solver = its.create_optimize(n, method)
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-7
    solver.max_iter = 500
    x0 = np.zeros((1, n))
    x0[0, int(np.argmin(np.diag(matrix)))] = 1.0
    converged, x, _ = solver.solve(x0, problem=problem)
    assert converged
    e0 = np.linalg.eigvalsh(matrix)[0]
    assert abs(solver.value - e0) < 1e-8


def test_rayleigh_quotient_matches_davidson(hamiltonians):
    matrix = hamiltonians["he"]
    n = matrix.shape[0]
    # nonlinear path
    problem = its.models.RayleighQuotientProblem(matrix)
    opt = its.create_optimize(n, "BFGS")
    opt.verbosity = its.Verbosity.NONE
    opt.convergence_threshold = 1e-9
    x0 = np.zeros((1, n))
    x0[0, int(np.argmin(np.diag(matrix)))] = 1.0
    converged, *_ = opt.solve(x0, problem=problem)
    assert converged
    # linear path
    eig = its.create_linear_eigensystem(n, 1, "Davidson")
    eig.set_hermiticity(True)
    eig.verbosity = its.Verbosity.NONE
    conv2, *_ = eig.solve(
        np.zeros((1, n)), problem=its.models.MatrixProblem(matrix), generate_initial_guess=True
    )
    assert conv2
    assert abs(opt.value - eig.eigenvalues()[0]) < 1e-7
