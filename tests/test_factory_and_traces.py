"""SolverFactory coverage (test_SolverFactory.cpp mirror), a broad
random-matrix sweep (the reference's n_eigen nroot loop), and golden
per-iteration eigenvalue traces that lock the subspace bookkeeping bit-level
drift down to 1e-10."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data")


class TestSolverFactory:
    def test_all_families_by_string(self):
        assert isinstance(
            its.create_linear_eigensystem(4, 1, "Davidson"), its.LinearEigensystemDavidson
        )
        assert isinstance(its.create_linear_eigensystem(4, 1, "RSPT"), its.LinearEigensystemRSPT)
        assert isinstance(its.create_linear_equations(4, 1, "Davidson"), its.LinearEquationsDavidson)
        assert isinstance(its.create_nonlinear_equations(4, "DIIS"), its.NonLinearEquationsDIIS)
        assert isinstance(its.create_optimize(4, "BFGS"), its.OptimizeBFGS)
        assert isinstance(its.create_optimize(4, "SD"), its.OptimizeSD)

    def test_default_methods(self):
        assert isinstance(its.create_linear_eigensystem(4, 1), its.LinearEigensystemDavidson)
        assert isinstance(its.create_optimize(4), its.OptimizeBFGS)

    @pytest.mark.parametrize(
        "factory,bad",
        [
            (lambda: its.create_linear_eigensystem(4, 1, "Lanczos"), "Lanczos"),
            (lambda: its.create_linear_equations(4, 1, "GMRES"), "GMRES"),
            (lambda: its.create_nonlinear_equations(4, "Broyden"), "Broyden"),
            (lambda: its.create_optimize(4, "Adam"), "Adam"),
        ],
    )
    def test_unknown_methods_raise(self, factory, bad):
        with pytest.raises(ValueError, match=bad):
            factory()

    def test_defaults_match_reference(self):
        """Hard-coded defaults from SURVEY.md Appendix A."""
        s = its.create_linear_eigensystem(4, 1)
        assert s.convergence_threshold == 1e-8
        assert s.max_iter == 100
        assert s.max_p == 0
        assert s.propose_rspace_norm_thresh == 1e-10
        assert s.propose_rspace_svd_thresh == 1e-12
        assert s.subspace_solver.svd_solver_threshold == 1e-14
        b = its.create_optimize(4, "BFGS")
        assert b.wolfe_1 == 1e-4 and b.wolfe_2 == 0.9
        assert b.linesearch_tolerance == 0.2 and b.linesearch_grow_factor == 2


def collect_trace(matrix, nroot=2, max_iter=12):
    """Eigenvalue sequence per iteration of the parity Davidson."""
    import jax.numpy as jnp

    n = matrix.shape[0]
    problem = its.models.MatrixProblem(matrix)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    params = np.zeros((nroot, n))
    for r, i in enumerate(np.argsort(np.diag(matrix))[:nroot]):
        params[r, i] = 1.0
    params = jnp.asarray(params)
    actions = jnp.zeros((nroot, n))
    trace = []
    nwork = nroot
    for _ in range(max_iter):
        act = problem.action(params[:nwork])
        actions = jnp.concatenate([act, actions[nwork:]], axis=0) if nwork < nroot else act
        nwork, params, actions = solver.add_vector(params, actions)
        trace.append([float(v) for v in solver.eigenvalues()[:nroot]])
        if nwork == 0:
            break
        while solver.end_iteration_needed:
            prec = problem.precondition(
                actions[:nwork], solver.working_set_eigenvalues()[:nwork], problem.diagonals()
            )
            actions = jnp.concatenate([prec, actions[nwork:]], axis=0) if nwork < nroot else prec
            nwork, params, actions = solver.end_iteration(params, actions)
    return trace


@pytest.mark.parametrize("name", ["he", "bh", "hf"])
def test_golden_traces(hamiltonians, name):
    """Per-iteration eigenvalue sequences frozen at round-1 behaviour: any
    drift in propose_rspace ordering/conditioning shows up here at 1e-10."""
    nroot = min(2, hamiltonians[name].shape[0])
    trace = collect_trace(hamiltonians[name], nroot=nroot)
    path = os.path.join(GOLDEN_DIR, f"{name}_trace.json")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(trace, f, indent=1)
        pytest.skip("golden trace recorded")
    with open(path) as f:
        golden = json.load(f)
    assert len(trace) == len(golden), f"iteration count changed: {len(trace)} vs {len(golden)}"
    for it, (got, want) in enumerate(zip(trace, golden)):
        np.testing.assert_allclose(got, want, atol=1e-10, err_msg=f"iteration {it}")


@pytest.mark.parametrize("nroot", [1, 3, 5])
def test_random_matrix_sweep(nroot):
    """The reference's n_eigen-style sweep on random hermitian matrices."""
    n = 48
    rng = np.random.default_rng(nroot)
    a = rng.standard_normal((n, n)) * 0.05
    matrix = a + a.T + np.diag(np.linspace(0.0, 12.0, n))
    problem = its.models.MatrixProblem(matrix)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((nroot, n)), problem=problem, generate_initial_guess=True)
    assert conv
    ref = np.sort(np.linalg.eigvalsh(matrix))[:nroot]
    np.testing.assert_allclose(solver.eigenvalues()[:nroot], ref, atol=2e-9)
    assert solver.stats.r_creations <= (nroot + 1) * solver.stats.iterations
