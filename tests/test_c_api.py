"""Procedural C-ABI-style interface tests (mirror of the reference's
Fortran/Cython usage through IterativeSolverC, SURVEY.md Appendix B)."""

import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.bindings import c_api


@pytest.fixture(autouse=True)
def clean_stack():
    yield
    while c_api._stack:
        c_api.IterativeSolverFinalize()


def drive_linear(problem, n, nroot, diagonals):
    import jax.numpy as jnp

    params = np.zeros((nroot, n))
    actions = np.zeros((nroot, n))
    idx = np.argsort(diagonals)[:nroot]
    for r, i in enumerate(idx):
        params[r, i] = 1.0
    nwork = nroot
    for _ in range(c_api.IterativeSolverMaxIter()):
        act = np.asarray(problem.action(jnp.asarray(params[:nwork])))
        actions[:nwork] = act
        nwork = c_api.IterativeSolverAddVector(nwork, params, actions)
        while c_api.IterativeSolverEndIterationNeeded():
            if nwork > 0:
                ev = np.zeros(nroot)
                c_api.IterativeSolverWorkingSetEigenvalues(ev)
                d = np.zeros(n)
                c_api.IterativeSolverDiagonals(d)
                prec = np.asarray(
                    problem.precondition(jnp.asarray(actions[:nwork]), ev[:nwork], jnp.asarray(d))
                )
                actions[:nwork] = prec
            nwork = c_api.IterativeSolverEndIteration(nwork, params, actions)
        if nwork < 1:
            break
    return nwork


def test_linear_eigensystem_stack_semantics(hamiltonians):
    matrix = hamiltonians["hf"]
    n = matrix.shape[0]
    lo, hi = c_api.IterativeSolverLinearEigensystemInitialize(n, 2, hermitian=True)
    assert (lo, hi) == (0, n)
    problem = its.models.MatrixProblem(matrix)
    c_api.IterativeSolverSetDiagonals(np.diag(matrix))
    assert c_api.IterativeSolverNonLinear() == 0
    assert c_api.IterativeSolverHasEigenvalues() == 1

    nwork = drive_linear(problem, n, 2, np.diag(matrix))
    assert nwork == 0
    ev = np.zeros(2)
    c_api.IterativeSolverEigenvalues(ev)
    ref = np.linalg.eigvalsh(matrix)[:2]
    np.testing.assert_allclose(ev, ref, atol=2e-9)
    errors = np.zeros(2)
    c_api.IterativeSolverErrors(errors)
    assert errors.max() < 2e-8
    # solution retrieval
    p = np.zeros((2, n))
    r = np.zeros((2, n))
    c_api.IterativeSolverSolution(2, np.asarray([0, 1], dtype=np.int32), p, r)
    resid = matrix @ p[0] - ev[0] * p[0]
    np.testing.assert_allclose(np.linalg.norm(resid), 0, atol=1e-7)
    c_api.IterativeSolverFinalize()
    assert not c_api._stack


def test_stack_of_instances():
    c_api.IterativeSolverLinearEigensystemInitialize(4, 1)
    c_api.IterativeSolverOptimizeInitialize(6)
    assert c_api.IterativeSolverNonLinear() == 1  # top is the optimizer
    assert c_api._top().dimension == 6
    c_api.IterativeSolverFinalize()
    assert c_api.IterativeSolverNonLinear() == 0  # back to the eigensolver
    assert c_api._top().dimension == 4


def test_optimize_through_c_api():
    n = 8
    hess = np.diag(np.arange(1.0, n + 1.0))
    problem = its.models.QuadraticOptimizeProblem(hess, b=np.ones(n))
    c_api.IterativeSolverOptimizeInitialize(n, thresh=1e-9)
    c_api.IterativeSolverSetMaxIter(60)
    import jax.numpy as jnp

    params = np.zeros((1, n))
    actions = np.zeros((1, n))
    for _ in range(c_api.IterativeSolverMaxIter()):
        value, res = problem.residual(jnp.asarray(params[0]))
        actions[0] = np.asarray(res)
        nwork = c_api.IterativeSolverAddValue(value, params, actions)
        while c_api.IterativeSolverEndIterationNeeded():
            if nwork > 0:
                actions[0] = np.asarray(
                    problem.precondition(jnp.asarray(actions), np.zeros(1), problem.diagonals())
                )[0]
            nwork = c_api.IterativeSolverEndIteration(1, params, actions)
        if nwork < 1:
            break
    assert c_api.IterativeSolverValue() < 1e-12
    np.testing.assert_allclose(params[0], np.ones(n), atol=1e-6)


def test_linear_equations_through_c_api():
    rng = np.random.default_rng(0)
    n = 10
    a = rng.standard_normal((n, n)) * 0.1
    matrix = a + a.T + np.diag(np.arange(3.0, n + 3.0))
    rhs = rng.standard_normal((1, n))
    c_api.IterativeSolverLinearEquationsInitialize(n, 1, rhs, thresh=1e-10)
    problem = its.models.MatrixProblem(matrix)
    c_api.IterativeSolverSetDiagonals(np.diag(matrix))
    params = np.zeros((1, n))
    params[0, 0] = 1.0
    actions = np.zeros((1, n))
    nwork = 1
    for _ in range(50):
        actions[:nwork] = np.asarray(problem.action(params[:nwork]))
        nwork = c_api.IterativeSolverAddVector(nwork, params, actions)
        while c_api.IterativeSolverEndIterationNeeded():
            if nwork > 0:
                import jax.numpy as jnp

                actions[:nwork] = np.asarray(problem.precondition(
                    jnp.asarray(actions[:nwork]), np.zeros(nwork), problem.diagonals()))
            nwork = c_api.IterativeSolverEndIteration(nwork, params, actions)
        if nwork < 1:
            break
    p = np.zeros((1, n))
    r = np.zeros((1, n))
    c_api.IterativeSolverSolution(1, np.asarray([0], dtype=np.int32), p, r)
    np.testing.assert_allclose(matrix @ p[0], rhs[0], atol=1e-7)


def test_suggest_p_through_c_api():
    """IterativeSolverSuggestP (IterativeSolverC.h:47-48) backed by the real
    top-|solution_i * residual_i| selection (core.py suggest_p), not the
    reference's {} stub: 0-based indices written into the caller's buffer,
    count returned, threshold respected."""
    n = 12
    matrix = np.diag(np.arange(1.0, n + 1.0))
    c_api.IterativeSolverLinearEigensystemInitialize(n, 2)
    solution = np.zeros((2, n))
    residual = np.zeros((2, n))
    solution[0, 3] = 1.0
    residual[0, 3] = 0.5    # contribution 0.5 at index 3
    solution[1, 7] = 0.6
    residual[1, 7] = 0.5    # contribution 0.3 at index 7
    solution[0, 1] = 1e-4
    residual[0, 1] = 1e-4   # below threshold
    idx = np.zeros(4, dtype=np.uint64)
    cnt = c_api.IterativeSolverSuggestP(solution, residual, 4, 1e-3, idx)
    assert cnt == 2
    assert set(int(i) for i in idx[:cnt]) == {3, 7}
    # max_number caps the suggestions
    idx1 = np.zeros(1, dtype=np.uint64)
    cnt1 = c_api.IterativeSolverSuggestP(solution, residual, 1, 1e-3, idx1)
    assert cnt1 == 1 and int(idx1[0]) == 3


def test_suggest_p_writes_through_list_buffer():
    """Regression (round-4 review): np.asarray on a non-ndarray buffer
    copies — results landed in the temporary and the caller's buffer
    stayed zero while the count said otherwise."""
    n = 8
    c_api.IterativeSolverLinearEigensystemInitialize(n, 1)
    solution = np.zeros((1, n))
    residual = np.zeros((1, n))
    solution[0, 5] = 1.0
    residual[0, 5] = 1.0
    buf = [0, 0, 0]  # plain list, not ndarray
    cnt = c_api.IterativeSolverSuggestP(solution, residual, 3, 1e-6, buf)
    assert cnt == 1
    assert buf[0] == 5
