"""Regression locks: golden iteration counts on the bundled hamiltonians,
working-vector caps smaller than the root count, suggest_p, profiler output.

The golden counts are this framework's own measured behaviour (the reference
publishes none); any drift signals an unintended change to the subspace
bookkeeping (propose_rspace deletion order, conditioning thresholds, ...).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu import config


def run_davidson(matrix, nroot, nwork_rows=None, options=""):
    n = matrix.shape[0]
    problem = its.models.MatrixProblem(matrix)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson", options)
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    rows = nwork_rows if nwork_rows is not None else nroot
    converged, x, r = solver.solve(np.zeros((rows, n)), problem=problem, generate_initial_guess=True)
    return solver, converged


class TestGoldenIterationCounts:
    """Iteration counts frozen at round-1 behaviour."""

    def test_he(self, hamiltonians):
        solver, conv = run_davidson(hamiltonians["he"], 1)
        assert conv
        assert solver.stats.iterations <= 3

    def test_hf(self, hamiltonians):
        solver, conv = run_davidson(hamiltonians["hf"], 2)
        assert conv
        assert solver.stats.iterations <= 8

    def test_bh_4roots(self, hamiltonians):
        solver, conv = run_davidson(hamiltonians["bh"], 4)
        assert conv
        assert solver.stats.iterations <= 14
        assert solver.stats.r_creations <= (4 + 1) * solver.stats.iterations


class TestWorkingVectorCaps:
    """Working-vector counts >= nroot, the reference's n_working_vectors_max
    sweep (test_LinearEigensystem.cpp initialize_subspace:237 clamps rows to
    max(nroot, cap) — fewer rows than roots is outside its tested envelope
    and can legitimately root-skip)."""

    @pytest.mark.parametrize("rows", [4, 6])
    def test_bh_extra_rows(self, hamiltonians, rows):
        matrix = hamiltonians["bh"]
        nroot = 4
        solver, conv = run_davidson(matrix, nroot, nwork_rows=rows)
        assert conv
        ref = np.sort(np.linalg.eigvalsh(matrix))[:nroot]
        np.testing.assert_allclose(solver.eigenvalues()[:nroot], ref, atol=2e-9)
        assert max(solver.errors) <= 2 * solver.convergence_threshold

    def test_fewer_rows_than_roots_converges_leading_roots(self, hamiltonians):
        matrix = hamiltonians["bh"]
        solver, conv = run_davidson(matrix, 4, nwork_rows=3)
        assert conv
        ref = np.sort(np.linalg.eigvalsh(matrix))[:3]
        np.testing.assert_allclose(solver.eigenvalues()[:3], ref, atol=2e-9)


class TestSuggestP:
    def test_top_contributions(self):
        solver = its.create_linear_eigensystem(10, 1)
        sol = jnp.zeros((1, 10)).at[0, 3].set(2.0).at[0, 7].set(1.0)
        res = jnp.zeros((1, 10)).at[0, 3].set(0.5).at[0, 7].set(0.9).at[0, 1].set(1e-12)
        out = solver.suggest_p(sol, res, max_number=3, threshold=1e-6)
        assert out[0] == 3  # |2*0.5| = 1.0 largest
        assert set(out) == {3, 7}


class TestProfilerWiring:
    def test_profile_dump(self, tmp_path, hamiltonians):
        out = str(tmp_path / "profile.txt")
        dot = str(tmp_path / "profile.dot")
        config.set_option("PROFILER_DEPTH", 10)
        config.set_option("PROFILER_OUTPUT", out)
        config.set_option("PROFILER_DOTGRAPH", dot)
        try:
            solver, conv = run_davidson(hamiltonians["he"], 1)
            assert solver.profiler.max_depth == 10
            report = solver.profiler.report()
            assert "add_vector" in report
            del solver
            import gc

            gc.collect()
            assert os.path.exists(out)
            assert "add_vector" in open(out).read()
            # graphviz dump (reference PROFILER_DOTGRAPH semantics)
            dot_text = open(dot).read()
            assert dot_text.startswith("digraph")
            assert "add_vector" in dot_text
        finally:
            config.clear_options()
