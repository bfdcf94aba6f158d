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


# ---------------------------------------------------------------------------
# golden traces for the non-eigensolver families: per-iteration error
# sequences frozen at round-1 behaviour (the reference pins its behaviour
# through gtest expected values; these are the equivalent drift locks for
# linear equations, quasi-Newton, DIIS and the RSPT series)


def _trace_errors(solver, *solve_args, **solve_kw):
    """Run the one-call driver recording solver.errors at each report tick."""
    rec = []

    def report(iteration=None):
        rec.append([float(e) for e in solver.errors])

    solver.report = report
    solver.verbosity = its.Verbosity.ITERATION
    conv, *_ = solver.solve(*solve_args, **solve_kw)
    return conv, rec


def _check_golden(name, trace):
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
        np.testing.assert_allclose(got, want, atol=1e-9, err_msg=f"iteration {it}")


def test_golden_trace_linear_equations(hamiltonians):
    mat = hamiltonians["bh"]
    n = mat.shape[0]
    # shift to diagonal dominance so the plain-residual path converges
    mat = mat + np.eye(n) * (1.0 - np.min(np.linalg.eigvalsh(mat)))
    rng = np.random.default_rng(7)
    rhs = rng.standard_normal((2, n))
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_equations(n, 2, "Davidson")
    solver.convergence_threshold = 1e-10
    solver.add_equations(rhs)
    conv, trace = _trace_errors(
        solver, np.zeros((2, n)), problem=problem, generate_initial_guess=True
    )
    assert conv
    _check_golden("lineq_bh", trace)


def test_golden_trace_bfgs():
    n = 24
    rng = np.random.default_rng(8)
    a = rng.standard_normal((n, n)) * 0.1
    hess = a @ a.T + np.eye(n) * 2.0
    b = rng.standard_normal(n)
    problem = its.models.QuadraticOptimizeProblem(hess, b)
    solver = its.create_optimize(n, "BFGS")
    solver.convergence_threshold = 1e-10
    conv, trace = _trace_errors(solver, rng.standard_normal((1, n)), problem=problem)
    assert conv
    _check_golden("bfgs_quadratic", trace)


def test_golden_trace_diis():
    problem = its.models.TrigNonlinearProblem(6)
    solver = its.create_nonlinear_equations(6, "DIIS")
    solver.convergence_threshold = 1e-10
    conv, trace = _trace_errors(solver, np.full((1, 6), 0.3), problem=problem)
    assert conv
    _check_golden("diis_trig", trace)


def test_golden_trace_rspt(hamiltonians):
    """RSPT perturbation-series energies on he: the E_n sequence itself is
    the trace (test_RSPT.cpp pins the analytic expansion)."""
    mat = hamiltonians["he"]
    n = mat.shape[0]
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_eigensystem(n, 1, "RSPT")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-12
    conv, *_ = solver.solve(
        np.zeros((1, n)), problem=problem, generate_initial_guess=True
    )
    series = [float(v) for v in solver.rspt_values]
    _check_golden("rspt_he_series", [series])
    # the truncated series (order ~14 at the solver's own stopping rule)
    # approaches the lowest eigenvalue; the trace above is the drift lock
    ref = np.linalg.eigvalsh(mat)[0]
    assert abs(sum(series) - ref) < 1e-4
