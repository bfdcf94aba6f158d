"""RSPT perturbation-series tests (mirrors test/itsolv/test_RSPT.cpp):
the series for H = H0 + lambda V must match the analytic expansion at low
orders and sum towards the exact eigenvalue."""

import numpy as np
import pytest

import iterative_solver_tpu as its


def make_problem(n, lam=0.1, seed=0):
    rng = np.random.default_rng(seed)
    h0 = np.diag(np.arange(1.0, n + 1.0))
    v = rng.standard_normal((n, n)) * 0.2
    v = v + v.T
    return h0, v, h0 + lam * v


def analytic_orders_diag_split(h):
    """E0+E1 and E2 of RSPT with the diagonal splitting H = diag(H) + offdiag(H),
    which is the series the solver's Jacobi preconditioner generates."""
    d = np.diag(h)
    e01 = d[0]
    e2 = np.sum(h[0, 1:] ** 2 / (d[0] - d[1:]))
    return e01, e2


@pytest.mark.parametrize("lam", [0.05, 0.1])
def test_rspt_series(lam):
    n = 10
    h0, v, h = make_problem(n, lam)
    problem = its.models.MatrixProblem(h)
    solver = its.create_linear_eigensystem(n, 1, "RSPT")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-12
    solver.max_iter = 40
    converged, *_ = solver.solve(np.zeros((1, n)), problem=problem, generate_initial_guess=True)
    e01, e2 = analytic_orders_diag_split(h)
    vals = solver.rspt_values
    np.testing.assert_allclose(vals[1], e01, atol=1e-10)
    np.testing.assert_allclose(vals[2], e2, atol=1e-10)
    # the resummed series approaches the exact eigenvalue (the drifting
    # variational shift in the preconditioner limits ultimate accuracy)
    exact = np.linalg.eigvalsh(h)[0]
    assert abs(sum(vals) - exact) < 1e-4
    assert abs(sum(vals[:3]) - exact) < 0.05 * max(lam, abs(e2))
