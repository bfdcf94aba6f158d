"""Dense subspace kernel tests against scipy/numpy references.

Mirrors the reference's helper tests + test_svd_system.cpp acceptance style.
"""

import numpy as np
import pytest
import scipy.linalg

from iterative_solver_tpu.ops import dense


def random_spd(n, rng, cond=1e3):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.logspace(0, -np.log10(cond), n)
    return q @ np.diag(vals) @ q.T


class TestEigenproblem:
    @pytest.mark.parametrize("n", [1, 2, 5, 12, 30])
    def test_hermitian_identity_metric(self, n):
        rng = np.random.default_rng(n)
        a = rng.standard_normal((n, n))
        h = a + a.T
        s = np.eye(n)
        evals, evecs = dense.eigenproblem(h, s, hermitian=True, svd_thresh=1e-14)
        ref_vals, ref_vecs = np.linalg.eigh(h)
        np.testing.assert_allclose(evals, ref_vals, atol=1e-10)
        for i in range(n):
            overlap = abs(np.dot(evecs[i], ref_vecs[:, i]))
            np.testing.assert_allclose(overlap, 1.0, atol=1e-8)
            # residual in the generalized problem
            r = h @ evecs[i] - evals[i] * evecs[i]
            assert np.linalg.norm(r) < 1e-8

    @pytest.mark.parametrize("n", [3, 8, 20])
    def test_hermitian_general_metric(self, n):
        rng = np.random.default_rng(n + 100)
        a = rng.standard_normal((n, n))
        h = a + a.T
        s = random_spd(n, rng, cond=1e4)
        evals, evecs = dense.eigenproblem(h, s, hermitian=True, svd_thresh=1e-14)
        ref_vals = scipy.linalg.eigh(h, s, eigvals_only=True)
        np.testing.assert_allclose(evals, ref_vals, atol=1e-8)
        for i in range(n):
            r = h @ evecs[i] - evals[i] * (s @ evecs[i])
            assert np.linalg.norm(r) < 1e-6

    def test_singular_metric_reduces_rank(self):
        # rank-deficient overlap: duplicate basis vector
        rng = np.random.default_rng(7)
        n = 6
        a = rng.standard_normal((n - 1, n - 1))
        h_small = a + a.T
        c = np.zeros((n, n - 1))
        c[: n - 1] = np.eye(n - 1)
        c[n - 1] = c[n - 2]  # duplicate last basis vector
        h = c @ h_small @ c.T

        s = c @ c.T
        evals, evecs = dense.eigenproblem(h, s, hermitian=True, svd_thresh=1e-12)
        assert len(evals) == n - 1  # null direction removed

    @pytest.mark.parametrize("skew", [0.0, 0.1, 0.2])
    def test_nonhermitian(self, skew):
        rng = np.random.default_rng(3)
        n = 10
        a = rng.standard_normal((n, n))
        h = a + a.T + skew * (a - a.T)
        s = np.eye(n)
        evals, evecs = dense.eigenproblem(h, s, hermitian=False, svd_thresh=1e-14)
        ref = np.sort(np.linalg.eigvals(h).real)
        np.testing.assert_allclose(np.sort(evals), ref, atol=1e-8)

    def test_phase_convention(self):
        h = np.diag([1.0, 2.0, 3.0])
        s = np.eye(3)
        _, evecs = dense.eigenproblem(h, s, hermitian=True, svd_thresh=1e-14)
        for i in range(3):
            imax = np.argmax(np.abs(evecs[i]))
            assert evecs[i][imax] > 0


class TestLinearEquations:
    def test_direct(self):
        rng = np.random.default_rng(0)
        n, nrhs = 8, 3
        h = rng.standard_normal((n, n)) + 5 * np.eye(n)
        rhs = rng.standard_normal((n, nrhs))
        sol, _ = dense.solve_linear_equations(h, np.eye(n), rhs)
        np.testing.assert_allclose(h @ sol.T, rhs, atol=1e-10)

    def test_augmented_hessian(self):
        rng = np.random.default_rng(1)
        n = 6
        a = rng.standard_normal((n, n))
        h = a + a.T + 5 * np.eye(n)
        rhs = rng.standard_normal((n, 1))
        sol, evals = dense.solve_linear_equations(h, np.eye(n), rhs, augmented_hessian=0.01)
        # aug-hessian solution approaches the direct solve for well-conditioned H
        direct = np.linalg.solve(h - evals[0] * np.eye(n), rhs[:, 0])
        np.testing.assert_allclose(sol[0], direct, rtol=1e-6, atol=1e-8)


class TestDIIS:
    def test_interpolation_sums_to_one(self):
        rng = np.random.default_rng(2)
        m = 5
        a = rng.standard_normal((m, m))
        b = a @ a.T + np.eye(m)
        coeffs = dense.solve_diis(b)
        np.testing.assert_allclose(coeffs.sum(), 1.0, atol=1e-10)
        # optimality: B c - lambda 1 = 0 for some lambda
        resid = b @ coeffs
        lam = resid.mean()
        np.testing.assert_allclose(resid, lam * np.ones(m), atol=1e-8)


class TestSvdSystem:
    def test_null_space_detection(self):
        rng = np.random.default_rng(4)
        n = 6
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        vals = np.array([1.0, 0.8, 0.5, 0.2, 1e-16, 1e-18])
        m = q @ np.diag(vals) @ q.T
        systems = dense.svd_system(m, threshold=1e-12, hermitian=True)
        assert len(systems) == 2
        for sys_ in systems:
            assert np.linalg.norm(m @ sys_.v) < 1e-10

    def test_get_rank(self):
        values = [1.0, 0.5, 1e-15]
        assert dense.get_rank(values, 1e-12) == 2
