"""FusedNonSymDavidson — the chunked-dispatch non-hermitian path.

Mirrors the reference's nonhermitian_eigen sweep
(test_LinearEigensystem.cpp:364-375: hmat = ones, diag i*param, lower
triangle scaled by 1-strength for strength in {0, 0.1, 0.2}) at fused
scale, plus a genuinely complex-spectrum operator exercising the real
2x2 pair blocks end-to-end.
"""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from iterative_solver_tpu.solvers.fused_nonsym import (
    FusedNonSymDavidson,
    ritz_nonsym,
)


def reference_matrix(n, param=1.0, strength=0.0):
    """test_LinearEigensystem.cpp:41-51 construction."""
    m = np.ones((n, n))
    np.fill_diagonal(m, np.arange(n) * param)
    if strength:
        for i in range(n):
            m[i, :i] *= 1.0 - strength
    return m


def gapped_nonsym(n, nlow=8, strength=0.1, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    d = np.concatenate([np.linspace(-2.0, 0.0, nlow),
                        np.linspace(2.0, 20.0, n - nlow)])
    m = a + a.T + np.diag(d)
    m[np.tril_indices(n, -1)] *= 1.0 - strength
    return m


def dense_matvec(x, op):
    import jax

    return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)


def dense_lowest(m, nroots):
    w = scipy.linalg.eigvals(m)
    order = np.argsort(w.real, kind="stable")
    return w[order][:nroots]


def guess(m, nroots):
    v0 = np.zeros((nroots, m.shape[0]))
    for row, i in enumerate(np.argsort(np.diag(m))[:nroots]):
        v0[row, i] = 1.0
    return v0


class TestRitzNonsym:
    def test_real_spectrum_matches_eig(self):
        rng = np.random.default_rng(0)
        h = rng.standard_normal((12, 12)) * 0.1 + np.diag(np.arange(12.0))
        evals, coeff, lam, shifts = ritz_nonsym(h, 4)
        ref = dense_lowest(h, 4)
        np.testing.assert_allclose(evals, ref, atol=1e-10)
        # lam reproduces H-action on the coefficient rows: C H^T = LAM C
        np.testing.assert_allclose(coeff @ h.T, lam @ coeff, atol=1e-10)

    def test_complex_pair_block(self):
        # 2x2 rotation block: eigenvalues 1 +- 2i, then separated real tail
        h = np.diag(np.arange(6.0) + 3.0)
        h[0, 0] = h[1, 1] = 1.0
        h[0, 1], h[1, 0] = -2.0, 2.0
        evals, coeff, lam, shifts = ritz_nonsym(h, 3)
        assert evals[0] == pytest.approx(1 + 2j)
        assert evals[1] == pytest.approx(1 - 2j)
        assert evals[2] == pytest.approx(5.0)  # diag entries are 3..8 with
                                               # slots 0,1 overwritten to 1
        np.testing.assert_allclose(coeff @ h.T, lam @ coeff, atol=1e-12)
        # the 2x2 block carries the pair structure
        assert lam[0, 0] == pytest.approx(1.0)
        assert lam[0, 1] * lam[1, 0] == pytest.approx(-4.0)

    def test_pair_straddling_window_shrinks(self):
        h = np.diag(np.arange(6.0) + 3.0)
        h[3, 3] = h[4, 4] = 30.0
        h[3, 4], h[4, 3] = -1.0, 1.0  # pair at positions 4,5 of the order
        evals, coeff, lam, shifts = ritz_nonsym(h, 2)
        assert len(evals) == 2  # no straddle at 2
        evals4, coeff4, _, _ = ritz_nonsym(h, 4)
        # sorted real parts: 3,4,5,(30 pair straddles beyond) -> full 4 real?
        assert len(evals4) <= 4


class TestFusedNonSymDavidson:
    @pytest.mark.parametrize("strength", [0.0, 0.1, 0.2])
    def test_reference_sweep_matrix(self, strength):
        n, nroots = 64, 3
        m = reference_matrix(n, param=1.0, strength=strength)
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-9, max_iter=60, operand=jnp.asarray(m))
        evals, x, errs, it = solver.solve(guess(m, nroots))
        ref = dense_lowest(m, nroots)
        assert np.all(errs <= 1e-8), errs
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-7)
        # residuals against the true operator in f64, pair-aware
        x64 = np.asarray(x, np.float64)
        ax = x64 @ m.T
        for i in range(len(evals)):
            if evals[i].imag == 0:
                r = ax[i] - evals[i].real * x64[i]
                assert np.linalg.norm(r) <= 1e-7 * max(np.linalg.norm(x64[i]), 1)

    @pytest.mark.parametrize("strength", [0.1, 0.3])
    def test_gapped_nonsym(self, strength):
        n, nroots = 512, 4
        m = gapped_nonsym(n, strength=strength)
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-9, max_iter=80, operand=jnp.asarray(m))
        evals, x, errs, it = solver.solve(guess(m, nroots))
        ref = dense_lowest(m, nroots)
        assert np.all(errs <= 1e-8), (errs, it)
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-8)

    def test_symmetric_matches_eigh(self):
        n, nroots = 256, 4
        m = gapped_nonsym(n, strength=0.0, seed=3)
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-10, max_iter=60, operand=jnp.asarray(m))
        evals, x, errs, it = solver.solve(guess(m, nroots))
        ref = np.linalg.eigvalsh(m)[:nroots]
        np.testing.assert_allclose(evals.real, ref, atol=1e-9)
        assert np.all(np.abs(evals.imag) == 0)

    def test_complex_pair_invariant_subspace(self):
        """Lowest eigenvalues form a conjugate pair; the returned real rows
        span the A-invariant 2D subspace with the 2x2 block structure."""
        n, nroots = 128, 3
        rng = np.random.default_rng(5)
        m = np.diag(np.linspace(5.0, 25.0, n))
        m += rng.standard_normal((n, n)) * 0.01
        # plant the pair well below the rest: eigenvalues 1 +- 1.5i
        m[0, 0] = m[1, 1] = 1.0
        m[0, 1], m[1, 0] = -1.5, 1.5
        m[0, 2:] = m[1, 2:] = m[2:, 0] = m[2:, 1] = 0.0
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-9, max_iter=80, operand=jnp.asarray(m))
        evals, x, errs, it = solver.solve(guess(m, nroots))
        assert np.all(errs <= 1e-8), errs
        pair = sorted(evals[:2], key=lambda z: -z.imag)
        assert pair[0] == pytest.approx(1 + 1.5j, abs=1e-8)
        assert pair[1] == pytest.approx(1 - 1.5j, abs=1e-8)
        # A-invariance of span(x_p, x_q): A X = LAM X for some 2x2 LAM
        x64 = np.asarray(x, np.float64)[:2]
        ax = x64 @ m.T
        lam2, *_ = np.linalg.lstsq(x64.T, ax.T, rcond=None)
        np.testing.assert_allclose(ax, lam2.T @ x64, atol=1e-7)
        tr, det = np.trace(lam2), np.linalg.det(lam2)
        assert tr / 2 == pytest.approx(1.0, abs=1e-7)          # real part
        assert det == pytest.approx(1.0 + 1.5 ** 2, abs=1e-6)  # |lambda|^2

    def test_iteration_economy_vs_parity(self):
        """The chunked path must not cost materially more iterations than
        the host-driven parity solver on the reference sweep matrix."""
        import iterative_solver_tpu as its

        n, nroots = 64, 2
        m = reference_matrix(n, strength=0.2)
        fused = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-9, max_iter=60, operand=jnp.asarray(m))
        _, _, errs, it_fused = fused.solve(guess(m, nroots))
        assert np.all(errs <= 1e-8)

        solver = its.create_linear_eigensystem(n, nroots, "Davidson",
                                               "max_size_qspace=16")
        solver.set_hermiticity(False)
        solver.verbosity = its.Verbosity.NONE
        problem = its.models.MatrixProblem(m)
        conv, _, _ = solver.solve(guess(m, nroots), problem=problem,
                                  max_iter=60)
        assert conv
        assert it_fused <= 3 * max(solver.stats.iterations, 1)


class TestDeviceRR:
    """rr="device": the single-dispatch loop (make_nonsym_device_loop) —
    simultaneous Rayleigh-shifted inverse iteration replaces the per-cycle
    host eig; host LAPACK runs once at the end on the (r, r) G."""

    @pytest.mark.parametrize("strength", [0.1, 0.2])
    def test_matches_host_mode(self, strength):
        n, nroots = 512, 4
        m = gapped_nonsym(n, strength=strength)
        ref = dense_lowest(m, nroots)
        results = {}
        for mode in ("host", "device"):
            s = FusedNonSymDavidson(
                dense_matvec, np.diag(m), n, nroots, m_max=16,
                convergence_threshold=1e-9, max_iter=120,
                operand=jnp.asarray(m), rr=mode)
            evals, x, errs, it = s.solve(guess(m, nroots))
            assert np.all(errs <= 1e-8), (mode, errs)
            np.testing.assert_allclose(np.sort(evals.real),
                                       np.sort(ref.real), atol=1e-8)
            results[mode] = it
            if mode == "device":
                # the REPORTED errors must BE the true per-root residuals
                # (regression: rotating with right instead of LEFT
                # eigenvectors of G left a (zG - lam z)X term the
                # Gram-based errors cannot see — true residual 5e-4 at
                # reported 1e-10)
                x64 = np.asarray(x, np.float64)
                for i in range(len(evals)):
                    if evals[i].imag == 0:
                        true_r = np.linalg.norm(
                            x64[i] @ m.T - evals[i].real * x64[i])
                        assert true_r <= 10 * max(errs[i], 1e-12), (
                            i, true_r, errs[i])
        # RQI tracking must not cost materially more iterations than
        # exact per-cycle RR (measured: identical on these spectra)
        assert results["device"] <= 2 * results["host"] + 2, results

    def test_complex_pair_device_mode(self):
        n, nroots = 128, 3
        rng = np.random.default_rng(5)
        m = np.diag(np.linspace(5.0, 25.0, n))
        m += rng.standard_normal((n, n)) * 0.01
        m[0, 0] = m[1, 1] = 1.0
        m[0, 1], m[1, 0] = -1.5, 1.5
        m[0, 2:] = m[1, 2:] = m[2:, 0] = m[2:, 1] = 0.0
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-9, max_iter=160,
            operand=jnp.asarray(m), rr="device", rr_steps=2)
        evals, x, errs, it = solver.solve(guess(m, nroots))
        assert np.all(errs <= 1e-8), errs
        pair = sorted(evals[:2], key=lambda z: -z.imag)
        assert pair[0] == pytest.approx(1 + 1.5j, abs=1e-7)
        assert pair[1] == pytest.approx(1 - 1.5j, abs=1e-7)
        # true-operator invariance of the returned real rows
        x64 = np.asarray(x, np.float64)[:2]
        ax = x64 @ m.T
        lam2, *_ = np.linalg.lstsq(x64.T, ax.T, rcond=None)
        np.testing.assert_allclose(ax, lam2.T @ x64, atol=1e-7)

    def test_multi_chunk_continuation(self):
        """chunk_iters smaller than the iteration count exercises run_cont
        (state threading across dispatch boundaries)."""
        n, nroots = 300, 4
        m = gapped_nonsym(n, strength=0.1, seed=2)
        ref = dense_lowest(m, nroots)
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=16,
            convergence_threshold=1e-9, max_iter=120,
            operand=jnp.asarray(m), rr="device", chunk_iters=2)
        evals, x, errs, it = s.solve(guess(m, nroots))
        assert np.all(errs <= 1e-8), errs
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-8)

    def test_tight_m_max_restarts_in_loop(self):
        """m_max=3r forces the in-loop lax.cond restart every second
        iteration; device mode must converge like host mode does.
        (m_max=2r stalls IDENTICALLY in both modes — restart-every-append
        Davidson is weak by construction, measured resid 7.1e-2 at 300
        iters for host AND device on this operator.)"""
        n, nroots = 256, 4
        m = gapped_nonsym(n, strength=0.1, seed=4)
        ref = dense_lowest(m, nroots)
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=3 * nroots,
            convergence_threshold=1e-7, max_iter=300,
            operand=jnp.asarray(m), rr="device")
        evals, x, errs, it = s.solve(guess(m, nroots))
        assert np.all(errs <= 1e-7), (errs, it)
        assert it <= 40, it  # host mode: 16 iters; device measured 14
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-6)

    def test_f32_floor_returns_best(self):
        """Unreachable tolerance in f32: the in-loop best-snapshot guard
        returns floor-class residuals, not a contaminated state."""
        n, nroots = 512, 3
        m = gapped_nonsym(n, nlow=8, strength=0.1, seed=6)
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=12,
            dtype=jnp.float32, convergence_threshold=1e-12,
            max_iter=40, operand=jnp.asarray(m, jnp.float32), rr="device")
        evals, x, errs, it = s.solve(guess(m, nroots))
        assert errs.max() < 1e-3, errs
        ref = dense_lowest(m, nroots)
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-3)

    def test_rejects_bad_rr(self):
        with pytest.raises(ValueError, match="rr must be"):
            FusedNonSymDavidson(dense_matvec, np.zeros(8), 8, 2, rr="wat")


class TestFloorRobustness:
    def test_iterating_past_the_floor_returns_best_not_explosion(self):
        """Non-symmetric eig is not variational: noise appends at the
        residual floor can move its solutions anywhere (measured 2.1e-5 ->
        0.69 after a contaminated restart). An unreachable tolerance must
        come back with the best state seen, not the explosion."""
        import jax

        n, nroots = 512, 3
        rng = np.random.default_rng(6)
        a = rng.standard_normal((n, n)) * (0.02 / np.sqrt(n))
        d = np.concatenate([np.linspace(-2.0, 0.0, 8),
                            np.linspace(2.0, 12.0, n - 8)])
        m = a + a.T + np.diag(d)
        m[np.tril_indices(n, -1)] *= 0.9
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=12,
            dtype=jnp.float32,  # force the f32 floor under the f64 suite
            convergence_threshold=1e-12,  # unreachable in f32
            max_iter=40, operand=jnp.asarray(m, jnp.float32))
        evals, x, errs, it = solver.solve(guess(m, nroots))
        # the returned state is floor-class, not the post-contamination one
        assert errs.max() < 1e-3, errs
        ref = dense_lowest(m, nroots)
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-3)


class TestFusedNonSymLinearEquations:
    def _problem(self, n, strength, seed=0, nrhs=3):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
        m = a + a.T + np.diag(np.linspace(1.0, 20.0, n))
        m[np.tril_indices(n, -1)] *= 1.0 - strength
        b = rng.standard_normal((nrhs, n))
        return m, b

    @pytest.mark.parametrize("strength", [0.0, 0.1, 0.3])
    def test_matches_dense_solve(self, strength):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n, nrhs = 384, 3
        m, b = self._problem(n, strength)
        solver = FusedNonSymLinearEquations(
            dense_matvec, np.diag(m), n, nrhs, m_max=18,
            convergence_threshold=1e-10, max_iter=120, operand=jnp.asarray(m))
        x, errs, it = solver.solve(b)
        assert np.all(errs <= 1e-10), (errs, it)
        ref = np.linalg.solve(m, b.T).T
        x64 = np.asarray(x, np.float64)
        rel = np.linalg.norm(x64 - ref) / np.linalg.norm(ref)
        assert rel <= 1e-9, rel

    def test_inner_enrichment_cuts_dispatches(self):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n, nrhs = 384, 2
        m, b = self._problem(n, 0.2, seed=4, nrhs=nrhs)
        walls = {}
        for inner in (1, 2):
            s = FusedNonSymLinearEquations(
                dense_matvec, np.diag(m), n, nrhs, m_max=16, inner=inner,
                convergence_threshold=1e-10, max_iter=120,
                operand=jnp.asarray(m))
            x, errs, it = s.solve(b)
            assert np.all(errs <= 1e-10)
            walls[inner] = it
        # enrichment may cost some extra iterations but must stay sane
        assert walls[2] <= 3 * walls[1]

    def test_singular_rhs_zero_row(self):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n, nrhs = 128, 2
        m, b = self._problem(n, 0.1, seed=2, nrhs=nrhs)
        b[1] = 0.0  # zero RHS: solution 0, relative error measured vs 1.0
        solver = FusedNonSymLinearEquations(
            dense_matvec, np.diag(m), n, nrhs, m_max=12,
            convergence_threshold=1e-10, max_iter=80, operand=jnp.asarray(m))
        x, errs, it = solver.solve(b)
        assert np.all(errs <= 1e-10)
        assert np.linalg.norm(np.asarray(x)[1]) <= 1e-8

    def test_per_rhs_2d_diagonals_default_x0(self):
        """(nrhs, N) per-RHS shifted diagonals must work without an explicit
        x0 (the chunk supports diag.ndim == 2; the default-guess path once
        broadcast it to 3-D and crashed in the jitted reset)."""
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n, nrhs = 128, 2
        m, b = self._problem(n, 0.1, seed=7, nrhs=nrhs)
        # (nrhs, N) diagonals tune the PRECONDITIONER per RHS row (the
        # operator itself is shared — a shared-subspace method cannot
        # solve per-RHS operators; that is FusedBlockCG's territory)
        diag2 = np.stack([np.diag(m), np.diag(m) * 1.5])
        solver = FusedNonSymLinearEquations(
            dense_matvec, diag2, n, nrhs, m_max=12,
            convergence_threshold=1e-10, max_iter=80, operand=jnp.asarray(m))
        x, errs, it = solver.solve(b)
        assert np.all(errs <= 1e-10), errs
        ref = np.linalg.solve(m, b.T).T
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-7)

    def test_zero_rhs_f32_underflow_raises_cleanly(self):
        """A b row that underflows to zero at the solver dtype must raise
        the clean zero-RHS error, not burn max_iter (symmetric family)."""
        from iterative_solver_tpu.solvers.fused_linear import (
            FusedLinearEquations,
        )

        n = 64
        m, b = self._problem(n, 0.0, seed=9, nrhs=2)
        b[1] = 1e-60  # nonzero in f64, zero in f32
        solver = FusedLinearEquations(
            dense_matvec, np.diag(m), n, 2, m_max=12, dtype=jnp.float32,
            convergence_threshold=1e-5, max_iter=40,
            operand=jnp.asarray(m, jnp.float32))
        with pytest.raises(RuntimeError, match="cannot be zero"):
            solver.solve(b)


class TestNonSymSoak:
    def test_200_cycles_at_the_floor_stay_sane(self):
        """Long iteration at an unreachable tolerance: the best-snapshot
        guard must hold the returned state at the floor through many
        contamination/restart cycles (f32, 200 outer iterations)."""
        n, nroots = 256, 3
        rng = np.random.default_rng(11)
        a = rng.standard_normal((n, n)) * (0.03 / np.sqrt(n))
        d = np.concatenate([np.linspace(-2.0, 0.0, 8),
                            np.linspace(2.0, 15.0, n - 8)])
        m = a + a.T + np.diag(d)
        m[np.tril_indices(n, -1)] *= 0.85
        solver = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, nroots, m_max=12,
            dtype=jnp.float32, convergence_threshold=1e-13, max_iter=200,
            operand=jnp.asarray(m, jnp.float32))
        evals, x, errs, it = solver.solve(guess(m, nroots))
        assert errs.max() < 1e-3, errs
        ref = dense_lowest(m, nroots)
        np.testing.assert_allclose(np.sort(evals.real), np.sort(ref.real),
                                   atol=1e-3)


class TestLineqDeviceMode:
    """FusedNonSymLinearEquations(rr="device"): the whole Petrov-Galerkin
    loop in ONE while_loop — projected solve ON DEVICE (LU + iterative
    refinement) instead of host f64 between chunks."""

    def _problem(self, n, strength, seed=0, nrhs=3):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
        m = a + a.T + np.diag(np.linspace(1.0, 20.0, n))
        m[np.tril_indices(n, -1)] *= 1.0 - strength
        b = rng.standard_normal((nrhs, n))
        return m, b

    @pytest.mark.parametrize("strength", [0.1, 0.3])
    def test_matches_host_mode(self, strength):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n = 400
        m, b = self._problem(n, strength)
        ref = np.linalg.solve(m, b.T).T
        its = {}
        for mode in ("host", "device"):
            s = FusedNonSymLinearEquations(
                dense_matvec, np.diag(m), n, 3, m_max=24,
                convergence_threshold=1e-10, max_iter=200,
                operand=jnp.asarray(m), rr=mode)
            x, errs, it = s.solve(b)
            assert np.all(errs <= 1e-10), (mode, errs)
            rel = (np.linalg.norm(np.asarray(x, np.float64) - ref)
                   / np.linalg.norm(ref))
            assert rel <= 1e-9, (mode, rel)
            its[mode] = it
        # measured identical (6 vs 6) on these problems
        assert its["device"] <= 2 * its["host"] + 2, its

    def test_multi_chunk_and_restarts(self):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n = 300
        m, b = self._problem(n, 0.2, seed=3)
        ref = np.linalg.solve(m, b.T).T
        s = FusedNonSymLinearEquations(
            dense_matvec, np.diag(m), n, 3, m_max=9,  # restart-heavy
            convergence_threshold=1e-9, max_iter=200,
            operand=jnp.asarray(m), rr="device", chunk_iters=2)
        x, errs, it = s.solve(b)
        assert np.all(errs <= 1e-9), (errs, it)
        rel = (np.linalg.norm(np.asarray(x, np.float64) - ref)
               / np.linalg.norm(ref))
        assert rel <= 1e-8, rel

    def test_f32_refinement_accuracy(self):
        """f32 device solve + 2 refinement passes must reach the same
        floor class as the host-f64 projected solve (measured 5.2e-6 both
        at n=8192 on TPU; asserted at f32-class here)."""
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        n = 512
        m, b = self._problem(n, 0.1, seed=5)
        results = {}
        for mode in ("host", "device"):
            s = FusedNonSymLinearEquations(
                dense_matvec, np.diag(m), n, 3, m_max=24,
                dtype=jnp.float32, convergence_threshold=1e-5, max_iter=60,
                operand=jnp.asarray(m, jnp.float32), rr=mode)
            x, errs, it = s.solve(b)
            results[mode] = errs.max()
            assert errs.max() <= 1e-5, (mode, errs)
        assert results["device"] <= 10 * max(results["host"], 1e-7), results

    def test_rejects_bad_rr(self):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymLinearEquations,
        )

        with pytest.raises(ValueError, match="rr must be"):
            FusedNonSymLinearEquations(dense_matvec, np.zeros(8), 8, 2,
                                       rr="wat")


class TestBatchedNonSym:
    """make_batched_nonsym_solve: many non-hermitian eigenproblems in one
    dispatch — only possible because the device-RR loop has no host stage
    (the chunked host-eig path cannot vmap). Measured 5.4x vs sequential
    device-RR solves for 8 x n=1024 systems on TPU."""

    def _batch(self, B, n, r, seed=0):
        rng = np.random.default_rng(seed)
        ops, diags, v0s, refs = [], [], [], []
        for b in range(B):
            a = rng.standard_normal((n, n)) * (0.04 / np.sqrt(n))
            m = a + a.T + np.diag(np.linspace(1.0 + 0.2 * b, 20.0, n))
            m[np.tril_indices(n, -1)] *= 0.9
            ops.append(m)
            diags.append(np.diag(m).copy())
            v0 = np.zeros((r, n))
            for i, j in enumerate(np.argsort(np.diag(m))[:r]):
                v0[i, j] = 1.0
            v0s.append(v0)
            refs.append(dense_lowest(m, r))
        return ops, diags, v0s, refs

    def test_batched_matches_dense_and_single(self):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            FusedNonSymDavidson,
            finalize_nonsym_batch,
            make_batched_nonsym_solve,
        )

        B, n, r = 4, 200, 3
        ops, diags, v0s, refs = self._batch(B, n, r)
        ops_b = jnp.asarray(np.stack(ops))
        v0_b = jnp.asarray(np.stack(v0s))
        diag_b = jnp.asarray(np.stack(diags))
        binit, bsolve = make_batched_nonsym_solve(dense_matvec, r, 12)
        state = binit(v0_b, ops_b)
        x, errs, best_err, bx, bG, bR, iters = bsolve(
            *state, ops_b, diag_b, 1e-9, 200)
        evals, x_rot, errors = finalize_nonsym_batch(bx, bG, bR)
        for b in range(B):
            assert np.max(errors[b]) <= 1e-8, (b, errors[b])
            ev = np.sort(np.asarray(evals[b]).real)
            np.testing.assert_allclose(
                ev, np.sort(refs[b].real)[: len(ev)], atol=1e-8)
        # element 0 agrees with the single-system device solver
        s = FusedNonSymDavidson(
            dense_matvec, diags[0], n, r, m_max=12,
            convergence_threshold=1e-9, max_iter=200,
            operand=jnp.asarray(ops[0]), rr="device")
        ev0, _, _, _ = s.solve(v0s[0])
        np.testing.assert_allclose(
            np.sort(np.asarray(ev0).real),
            np.sort(np.asarray(evals[0]).real), atol=1e-10)

    def test_batched_rotated_rows_are_true_solutions(self):
        """The finalize rotation must produce rows whose TRUE per-root
        residuals match the reported errors (the left-eigenvector rule)."""
        from iterative_solver_tpu.solvers.fused_nonsym import (
            finalize_nonsym_batch,
            make_batched_nonsym_solve,
        )

        B, n, r = 3, 150, 2
        ops, diags, v0s, refs = self._batch(B, n, r, seed=7)
        ops_b = jnp.asarray(np.stack(ops))
        v0_b = jnp.asarray(np.stack(v0s))
        diag_b = jnp.asarray(np.stack(diags))
        binit, bsolve = make_batched_nonsym_solve(dense_matvec, r, 10)
        state = binit(v0_b, ops_b)
        out = bsolve(*state, ops_b, diag_b, 1e-10, 300)
        evals, x_rot, errors = finalize_nonsym_batch(out[3], out[4], out[5])
        x_host = np.asarray(x_rot, np.float64)
        for b in range(B):
            for i in range(len(evals[b])):
                if evals[b][i].imag == 0:
                    true_r = np.linalg.norm(
                        x_host[b, i] @ ops[b].T
                        - evals[b][i].real * x_host[b, i])
                    assert true_r <= 10 * max(errors[b][i], 1e-13), (
                        b, i, true_r, errors[b][i])


class TestBatchedShiftedLineq:
    """make_batched_nonsym_lineq_solve with operand_axes=(None, 0): shifted
    systems (A + sigma_k I) x_k = b share ONE operator across the batch —
    non-symmetric response equations in one dispatch with no B-fold
    operator storage."""

    def test_shifted_share_one_operator(self):
        from iterative_solver_tpu.solvers.fused_nonsym import (
            make_batched_nonsym_lineq_solve,
        )

        n, nrhs, B = 300, 2, 4
        rng = np.random.default_rng(0)
        a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
        A = a + a.T + np.diag(np.linspace(1.0, 20.0, n))
        A[np.tril_indices(n, -1)] *= 0.85
        sigmas = np.array([0.0, 0.4, 0.9, 1.5])
        b = rng.standard_normal((nrhs, n))

        def mv(x, op):
            mat, s = op
            import jax

            return jnp.matmul(x, mat.T,
                              precision=jax.lax.Precision.HIGHEST) + s * x

        A_dev = jnp.asarray(A)
        diag_b = jnp.asarray(np.stack([np.diag(A) + s for s in sigmas]))
        b_b = jnp.asarray(np.broadcast_to(b, (B, nrhs, n)))
        b_norm = jnp.asarray(
            np.broadcast_to(np.linalg.norm(b, axis=1), (B, nrhs)))
        x0_b = jnp.asarray(
            np.stack([b / (np.diag(A)[None, :] + s) for s in sigmas]))
        binit, bsolve = make_batched_nonsym_lineq_solve(
            mv, nrhs, 12, operand_axes=(None, 0))
        operand = (A_dev, jnp.asarray(sigmas))
        state = binit(x0_b, operand, b_b)
        x, errs, best_err, bx, berrs, iters = bsolve(
            *state, operand, diag_b, b_b, b_norm, 1e-10, 200)
        for k in range(B):
            assert np.asarray(berrs[k]).max() <= 1e-10, (k, berrs)
            ref = np.linalg.solve(A + sigmas[k] * np.eye(n), b.T).T
            rel = (np.linalg.norm(np.asarray(bx[k], np.float64) - ref)
                   / np.linalg.norm(ref))
            assert rel < 1e-9, (k, rel)


def test_inner_rejected_with_device_rr():
    """inner enrichment belongs to the host-RR chunked path; rr="device"
    must reject it rather than silently ignore the option."""
    with pytest.raises(ValueError, match="inner enrichment"):
        FusedNonSymDavidson(dense_matvec, np.zeros(8), 8, 2,
                            rr="device", inner=2)
    from iterative_solver_tpu.solvers.fused_nonsym import (
        FusedNonSymLinearEquations,
    )

    with pytest.raises(ValueError, match="inner enrichment"):
        FusedNonSymLinearEquations(dense_matvec, np.zeros(8), 8, 2,
                                   rr="device", inner=2)


def test_device_rr_finds_interior_root_hf():
    """Regression (round-4 review follow-up): per-root RQI tracking alone
    converged onto a WRONG interior root with a genuinely small residual
    on the reference hf hamiltonian (eigenvalue error 0.214 = the
    root-2/3 spacing, in f64) — the gated global leftmost-selection step
    in _make_refine fixes the selection. Pinned here against host mode
    and dense eig."""
    import os

    import iterative_solver_tpu as its

    path = "/root/reference/examples/hf.hamiltonian"
    if not os.path.exists(path):
        pytest.skip("hf.hamiltonian not mounted")
    m = its.models.load_hamiltonian(path)
    m = 0.5 * (m + m.T)
    n = m.shape[0]
    mns = m.copy()
    mns[np.tril_indices(n, -1)] *= 0.9
    ref = np.sort(scipy.linalg.eigvals(mns).real)[:2]
    v0 = np.zeros((2, n))
    for r_, i in enumerate(np.argsort(np.diag(mns))[:2]):
        v0[r_, i] = 1.0
    s = FusedNonSymDavidson.from_dense(
        mns, 2, convergence_threshold=5e-4, max_iter=60, rr="device",
        m_max=8)
    ev, x, errs, it = s.solve(v0)
    assert np.max(np.abs(np.sort(np.asarray(ev).real)
                         - ref[: len(ev)])) < 1e-5, (
        "device-RR landed on a wrong root", np.sort(np.asarray(ev).real), ref)


def test_convergence_history_recorded():
    """self.history carries (iteration, max_residual) pairs — per eig
    cycle in host mode, per chunk in device mode — monotone-ish descent
    ending at/below tol."""
    m = gapped_nonsym(300, strength=0.15, seed=1)
    v0 = guess(m, 3)
    for mode, ci in (("host", 64), ("device", 3)):
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), 300, 3, m_max=12,
            convergence_threshold=1e-9, max_iter=100, rr=mode,
            chunk_iters=ci, operand=jnp.asarray(m))
        ev, x, errs, it = s.solve(v0)
        hs = s.history
        assert len(hs) >= 2, (mode, hs)
        assert hs[-1][1] <= 1e-9, (mode, hs[-1])
        assert hs[0][1] > hs[-1][1], (mode, hs)
        # second solve resets the record
        s.solve(v0)
        assert s.history[-1][1] <= 1e-9


def test_device_rr_soak_1500_iterations_past_the_floor():
    """Soak: 1500 device-RR iterations at an unreachable tolerance in f32
    (restart-heavy m_max). Everything must stay finite, the live basis
    orthonormal, and the best-snapshot answer correct — the
    non-variational floor-noise mode must not corrupt the return."""
    n, nroots, m_max = 96, 3, 12
    rng = np.random.default_rng(11)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(0.0, 12.0, n))
    mat[np.tril_indices(n, -1)] *= 0.9
    solver = FusedNonSymDavidson(
        dense_matvec, np.diag(mat), n, nroots, m_max=m_max,
        dtype=jnp.float32, convergence_threshold=1e-14,  # unreachable
        max_iter=1500, chunk_iters=500, rr="device",
        operand=jnp.asarray(mat, jnp.float32))
    evals, x, errs, it = solver.solve(guess(mat, nroots))
    assert np.all(np.isfinite(errs))
    assert np.all(np.isfinite(np.asarray(x, np.float64)))
    # best snapshot stays floor-class, never the contaminated state
    assert errs.max() < 1e-3, errs
    ref = dense_lowest(mat, nroots)
    np.testing.assert_allclose(np.sort(np.asarray(evals).real),
                               np.sort(ref.real)[: len(evals)], atol=1e-3)


class TestAutoEscalatingRR:
    """VERDICT r4 #4: pair-heavy spectra escalate the device-RR refinement
    automatically (no user knob); real spectra never trigger it."""

    @staticmethod
    def pair_heavy(n, seed, rot, cpl, gap, npairs=6):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((n, n)) * (cpl / np.sqrt(n))
        lows = np.arange(2 * npairs) * gap - 2.0
        m = a + a.T + np.diag(np.concatenate(
            [lows, np.linspace(2.0, 20.0, n - 2 * npairs)]))
        for k in range(0, 2 * npairs, 2):
            m[k, k + 1] += rot
            m[k + 1, k] -= rot
        m[np.tril_indices(n, -1)] *= 0.85
        return m

    # golden-pinned (CPU f64, deterministic): default args converge in the
    # rr_steps=2 class (pure rr_steps=2: 137/129 single-device; the pre-escalation fixed
    # rr_steps=1 loop needed 360/288 — measured 2026-08)
    @pytest.mark.parametrize("r,mm,gap,golden", [(6, 24, 0.10, 171),
                                                 (4, 16, 0.12, 159)])
    def test_pair_heavy_escalates_and_converges(self, r, mm, gap, golden):
        import scipy.linalg

        n = 400
        m = self.pair_heavy(n, 0, 0.8, 0.1, gap)
        v0 = guess(m, r)
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), n, r, m_max=mm,
            convergence_threshold=1e-9, max_iter=500, rr="device",
            operand=jnp.asarray(m))
        ev, x, errs, it = s.solve(v0)
        assert s.rr_steps_active == 2, "pair churn did not escalate"
        assert errs.max() <= 1e-9
        assert it == golden, f"iteration count drifted: {it} != {golden}"
        w = scipy.linalg.eigvals(m)
        ref = w[np.argsort(w.real)][:r]
        np.testing.assert_allclose(np.sort(np.asarray(ev).real),
                                   np.sort(ref.real), atol=1e-7)

    def test_real_spectrum_never_escalates(self):
        m = gapped_nonsym(300, strength=0.2, seed=3)
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), 300, 3, m_max=12,
            convergence_threshold=1e-9, max_iter=200, rr="device",
            chunk_iters=8, operand=jnp.asarray(m))
        ev, x, errs, it = s.solve(guess(m, 3))
        assert errs.max() <= 1e-9
        assert s.rr_steps_active == 1, "real spectrum must not escalate"

    def test_explicit_rr_steps_2_is_respected(self):
        m = self.pair_heavy(400, 0, 0.8, 0.1, 0.10)
        s = FusedNonSymDavidson(
            dense_matvec, np.diag(m), 400, 6, m_max=24,
            convergence_threshold=1e-9, max_iter=500, rr="device",
            rr_steps=2, operand=jnp.asarray(m))
        ev, x, errs, it = s.solve(guess(m, 6))
        assert errs.max() <= 1e-9
        assert s.rr_steps_active == 2
        assert it == 137, f"pure rr_steps=2 golden drifted: {it}"
