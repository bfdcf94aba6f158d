"""Checkpoint/resume: an interrupted Davidson run resumed from disk must
converge identically to an uninterrupted one."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def drive(solver, problem, params, actions, iterations):
    """Run a fixed number of add_vector/end_iteration cycles."""
    nwork = params.shape[0]
    for _ in range(iterations):
        if nwork <= 0:
            break
        act = problem.action(params[:nwork])
        actions = jnp.concatenate([act, actions[nwork:]], axis=0) if nwork < actions.shape[0] else act
        nwork, params, actions = solver.add_vector(params, actions)
        while solver.end_iteration_needed:
            if nwork > 0:
                shifts = solver.working_set_eigenvalues()[:nwork]
                prec = problem.precondition(actions[:nwork], shifts, problem.diagonals())
                actions = jnp.concatenate([prec, actions[nwork:]], axis=0) if nwork < actions.shape[0] else prec
            nwork, params, actions = solver.end_iteration(params, actions)
    return nwork, params, actions


def test_davidson_checkpoint_resume(tmp_path, hamiltonians):
    matrix = hamiltonians["bh"]
    n = matrix.shape[0]
    problem = its.models.MatrixProblem(matrix)

    def fresh(nroot=2):
        s = its.create_linear_eigensystem(n, nroot, "Davidson")
        s.set_hermiticity(True)
        s.verbosity = its.Verbosity.NONE
        p0 = np.zeros((nroot, n))
        idx = np.argsort(np.diag(matrix))[:nroot]
        for r, i in enumerate(idx):
            p0[r, i] = 1.0
        return s, jnp.asarray(p0), jnp.zeros((nroot, n))

    # uninterrupted run
    ref_solver, p, a = fresh()
    drive(ref_solver, problem, p, a, 30)
    ref_evals = ref_solver.eigenvalues()[:2]

    # interrupted after 3 iterations, checkpointed, resumed
    solver, p, a = fresh()
    nwork, p, a = drive(solver, problem, p, a, 3)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(solver, path)

    resumed = load_checkpoint(path)
    assert resumed.xspace.dimensions.nQ == solver.xspace.dimensions.nQ
    np.testing.assert_allclose(resumed.xspace.h, solver.xspace.h, atol=1e-14)
    np.testing.assert_allclose(resumed.xspace.s, solver.xspace.s, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(resumed.xspace.params_q()), np.asarray(solver.xspace.params_q()), atol=1e-14
    )

    # resume iterating from the restored working-set parameters
    k = max(len(resumed.working_set), 1)
    p2 = jnp.asarray(np.asarray(resumed.solution_params(list(range(2)))))
    a2 = jnp.zeros_like(p2)
    drive(resumed, problem, p2, a2, 30)
    np.testing.assert_allclose(resumed.eigenvalues()[:2], ref_evals, atol=2e-9)
    assert max(resumed.errors) <= 2 * resumed.convergence_threshold


def test_checkpoint_linear_equations(tmp_path):
    rng = np.random.default_rng(0)
    n = 12
    a = rng.standard_normal((n, n)) * 0.1
    mat = a + a.T + np.diag(np.arange(4.0, n + 4.0))
    rhs = rng.standard_normal((1, n))
    solver = its.create_linear_equations(n, 1)
    solver.verbosity = its.Verbosity.NONE
    solver.add_equations(rhs)
    path = str(tmp_path / "le.npz")
    save_checkpoint(solver, path)
    resumed = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(resumed.rhs()), rhs, atol=1e-14)
    assert resumed.xspace.dimensions.nRHS == 1
    conv, *_ = resumed.solve(np.zeros((1, n)), problem=its.models.MatrixProblem(mat),
                             generate_initial_guess=True)
    assert conv
