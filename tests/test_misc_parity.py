"""Small parity utilities: gram_schmidt transformation matrix, ambient config,
fused handler ops."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu import config
from iterative_solver_tpu.array import vector_ops as vops
from iterative_solver_tpu.ops import dense


class TestGramSchmidtTransform:
    def test_orthogonalises(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal((5, 20))
        s = v @ v.T
        l = dense.gram_schmidt_transform(s)
        w = l @ v
        g = w @ w.T
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() < 1e-10
        assert np.allclose(np.diag(l), 1.0)

    def test_null_rows_skipped(self):
        v = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        s = v @ v.T
        l = dense.gram_schmidt_transform(s, norm_thresh=1e-14)
        w = l @ v
        assert np.linalg.norm(w[1]) < 1e-12  # duplicate row nulled
        assert abs(np.dot(w[2], w[0])) < 1e-12


class TestAmbientConfig:
    def test_defaults(self):
        assert config.get_option("BSR_BLOCK") == 128
        assert config.get_option("GEMM_BUFFERS") == 2

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("ITERATIVE_SOLVER_BSR_BLOCK", "64")
        assert config.get_option("BSR_BLOCK") == 64

    def test_programmatic_override(self):
        config.set_option("PROFILER_DEPTH", 3)
        try:
            assert config.get_option("PROFILER_DEPTH") == 3
        finally:
            config.clear_options()


class TestFusedOps:
    def test_fused_axpy(self):
        rng = np.random.default_rng(1)
        xs = rng.standard_normal((4, 30))
        y = rng.standard_normal(30)
        alphas = rng.standard_normal(4)
        out = np.asarray(vops.fused_axpy(jnp.asarray(alphas), jnp.asarray(xs), jnp.asarray(y)))
        np.testing.assert_allclose(out, y + alphas @ xs, atol=1e-12)

    def test_fused_dot(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(30)
        ys = rng.standard_normal((4, 30))
        out = np.asarray(vops.fused_dot(jnp.asarray(x), jnp.asarray(ys)))
        np.testing.assert_allclose(out, ys @ x, atol=1e-12)


class TestProfiler:
    def test_region_tree(self):
        from iterative_solver_tpu.utils import Profiler

        prof = Profiler()
        with prof.push("outer"):
            with prof.push("inner", flops=100):
                pass
            with prof.push("inner"):
                pass
        report = prof.report()
        assert "outer" in report and "inner" in report and "x2" in report

    def test_disabled(self):
        from iterative_solver_tpu.utils import Profiler

        prof = Profiler(max_depth=0)
        with prof.push("anything"):
            pass
        assert prof.report() == ""


class TestReviewRegressions:
    """Fixes from the round-1 self code-review."""

    def test_bfgs_wolfe_options_parsed(self):
        import iterative_solver_tpu as its

        s = its.create_optimize(5, "BFGS", "Wolfe_2=0.5,strong_Wolfe=false,linesearch_tolerance=0.3")
        assert s.wolfe_2 == 0.5
        assert s.strong_wolfe is False
        assert s.linesearch_tolerance == 0.3

    def test_linear_equations_reset_d_option(self):
        import iterative_solver_tpu as its

        s = its.create_linear_equations(5, 1, options="reset_D=5,reset_D_max_Q_size=4")
        assert s.dspace_resetter.nreset == 5
        assert s.dspace_resetter.max_qsize_after_reset == 4

    def test_fused_linear_zero_rhs_raises(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

        def mv(x, op):
            return x

        solver = FusedLinearEquations(mv, np.ones(8), 8, 1, operand=None)
        with _pytest.raises(RuntimeError, match="zero"):
            solver.solve(np.zeros((1, 8)))

    def test_max_p_clamped_to_dimension(self):
        import iterative_solver_tpu as its

        n = 6
        problem = its.models.ExampleProblem(n)
        solver = its.create_linear_eigensystem(n, 1, "Davidson", f"max_p={n * 4}")
        solver.set_hermiticity(True)
        solver.verbosity = its.Verbosity.NONE
        conv, *_ = solver.solve(np.zeros((1, n)), problem=problem, generate_initial_guess=True)
        assert conv

    def test_split_operator_indivisible_n(self):
        from iterative_solver_tpu.ops.precise import SplitOperator, precise_matmat

        rng = np.random.default_rng(0)
        matrix = rng.standard_normal((100, 100))
        op = SplitOperator.from_dense(matrix, n_chunks=64)
        assert 100 % op.n_chunks == 0
        x = jnp.asarray(rng.standard_normal((2, 100)), dtype=jnp.float32)
        out = np.asarray(precise_matmat(x, op))
        np.testing.assert_allclose(out, np.asarray(x, dtype=np.float64) @ matrix.T, atol=1e-4)

    def test_addp_none_callback_keeps_guard(self):
        from iterative_solver_tpu.bindings import c_api

        c_api.IterativeSolverLinearEigensystemInitialize(4, 1, hermitian=True)
        try:
            params = np.zeros((1, 4))
            actions = np.zeros((1, 4))
            offsets = np.asarray([0, 1], dtype=np.int64)
            c_api.IterativeSolverAddP(1, 1, offsets, np.asarray([0]), np.asarray([1.0]),
                                      np.asarray([[2.0]]), params, actions, func=None)
            # apply_p must remain None so the template's guard can fire
            assert c_api._top().solver.apply_p is None
        finally:
            c_api.IterativeSolverFinalize()


def test_normalise_solution_flag():
    """solution() rescales reconstructed parameters (and residuals by the
    same factor) to unit norm when normalise_solution is set
    (IterativeSolverTemplate construct_solution semantics)."""
    n, nroot = 24, 2
    rng = np.random.default_rng(81)
    a = rng.standard_normal((n, n)) * 0.05
    mat = a + a.T + np.diag(np.linspace(1.0, 8.0, n))
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    solver.normalise_solution = True
    conv, *_ = solver.solve(np.zeros((nroot, n)), problem=problem,
                            generate_initial_guess=True)
    assert conv
    params, resid = solver.solution([0, 1])
    norms = np.linalg.norm(np.asarray(params), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)


def test_convergence_threshold_value():
    """Eigenvalue-change (value-error) convergence: with a loose residual
    threshold but a tight value threshold, roots only leave the working set
    when their eigenvalue stops moving (LinearEigensystemDavidson value
    errors, :106-113)."""
    n, nroot = 32, 1
    rng = np.random.default_rng(82)
    a = rng.standard_normal((n, n)) * 0.05
    mat = a + a.T + np.diag(np.linspace(1.0, 9.0, n))
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-2       # loose residual
    solver.convergence_threshold_value = 1e-12  # tight eigenvalue change
    conv, *_ = solver.solve(np.zeros((nroot, n)), problem=problem,
                            generate_initial_guess=True)
    assert conv
    # the converged eigenvalue is far better than the loose residual band
    ref = np.linalg.eigvalsh(mat)[0]
    assert abs(solver.eigenvalues()[0] - ref) < 1e-9
