"""Davidson eigensolver integration tests.

Mirrors test/itsolv/test_LinearEigensystem.cpp: solve the bundled FCI
hamiltonians for several root counts, asserting the reference's acceptance
bands — residuals <= 2x threshold, eigenvalues within 2e-9 of the dense
solve, eigenvector overlap ~ 1, and the matvec budget
r_creations <= (nroot+1) * iterations (test_LinearEigensystem.cpp:303-319).
"""

import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.ops import dense


def dense_reference(matrix, nroot):
    evals, evecs = dense.eigenproblem(
        matrix, np.eye(matrix.shape[0]), hermitian=True, svd_thresh=1e-14
    )
    return evals[:nroot], evecs[:nroot]


def run_davidson(matrix, nroot, options="", **kwargs):
    n = matrix.shape[0]
    problem = its.models.MatrixProblem(matrix)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson", options, **kwargs)
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1.0e-8
    params = np.zeros((nroot, n))
    converged, x, r = solver.solve(params, problem=problem, generate_initial_guess=True)
    return solver, converged, np.asarray(x)


def check_eigen(matrix, nroot, options="", **kwargs):
    solver, converged, x = run_davidson(matrix, nroot, options, **kwargs)
    assert converged, f"Davidson did not converge for nroot={nroot}"
    ref_vals, ref_vecs = dense_reference(matrix, nroot)
    np.testing.assert_allclose(solver.eigenvalues()[:nroot], ref_vals, atol=2e-9)
    assert max(solver.errors) <= 2 * solver.convergence_threshold
    # reconstruct solutions and check overlap with the dense eigenvectors;
    # for (near-)degenerate eigenvalues project onto the whole degenerate block
    # (orthonormal eigh basis)
    all_vals, all_vecs_cols = np.linalg.eigh(matrix)
    params = np.asarray(solver.solution_params(list(range(nroot))))
    for i in range(nroot):
        block = np.abs(all_vals - ref_vals[i]) < 1e-8
        proj = all_vecs_cols[:, block].T @ params[i]
        overlap = np.linalg.norm(proj) / np.linalg.norm(params[i])
        np.testing.assert_allclose(overlap, 1.0, atol=1e-6)
    # matvec budget (test_LinearEigensystem.cpp:314-319)
    assert solver.stats.r_creations <= (nroot + 1) * solver.stats.iterations
    return solver


@pytest.mark.parametrize("name,nroots", [("he", [1, 2]), ("hf", [1, 2, 3]), ("bh", [1, 2, 4])])
def test_file_eigen(hamiltonians, name, nroots):
    matrix = hamiltonians[name]
    for nroot in nroots:
        check_eigen(matrix, nroot)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_small_eigen(n):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((n, n))
    matrix = a + a.T + 2 * np.diag(np.arange(n, dtype=float))
    check_eigen(matrix, 1)


def test_n_eigen_example_problem():
    n = 40
    problem = its.models.ExampleProblem(n)
    matrix = np.asarray(problem.matrix, dtype=np.float64)
    for nroot in (1, 2, 3):
        check_eigen(matrix, nroot)


def test_max_size_qspace(hamiltonians):
    matrix = hamiltonians["bh"]
    solver = check_eigen(matrix, 2, options="max_size_qspace=6")
    # Q space must actually have been limited
    assert solver.xspace.dimensions.nQ <= 6 + 2


def test_reset_D(hamiltonians):
    matrix = hamiltonians["bh"]
    check_eigen(matrix, 2, options="reset_D=8,max_size_qspace=10")


def test_nonhermitian_eigen(hamiltonians):
    matrix = hamiltonians["hf"].copy()
    rng = np.random.default_rng(0)
    n = matrix.shape[0]
    skew = rng.standard_normal((n, n))
    for factor in (0.0, 0.1):
        m = matrix + factor * (skew - skew.T)
        problem = its.models.MatrixProblem(m)
        solver = its.create_linear_eigensystem(n, 2, "Davidson")
        solver.set_hermiticity(False)
        solver.verbosity = its.Verbosity.NONE
        converged, x, r = solver.solve(
            np.zeros((2, n)), problem=problem, generate_initial_guess=True
        )
        assert converged
        ref = np.sort(np.linalg.eigvals(m).real)[:2]
        np.testing.assert_allclose(np.sort(solver.eigenvalues()[:2]), ref, atol=1e-7)


def test_solution_consistency(hamiltonians):
    """solution() returns residuals consistent with errors (test_LinearEigensystem.cpp:352-433)."""
    matrix = hamiltonians["hf"]
    n = matrix.shape[0]
    nroot = 2
    solver, converged, x = run_davidson(matrix, nroot)
    params, residuals = solver.solution(list(range(nroot)))
    params = np.asarray(params)
    residuals = np.asarray(residuals)
    for i in range(nroot):
        explicit = matrix @ params[i] - solver.eigenvalues()[i] * params[i]
        np.testing.assert_allclose(residuals[i], explicit, atol=1e-6)
