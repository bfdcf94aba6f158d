"""Fused on-device linear-equation and L-BFGS solvers: correctness vs direct
solves, restart path, sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.parallel import block_sharding, make_mesh, matrix_row_sharding
from iterative_solver_tpu.solvers.fused_lbfgs import FusedLBFGS
from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations


def make_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * 0.1
    return a + a.T + np.diag(np.linspace(3.0, 30.0, n))


def dense_matvec(x, mat):
    return jnp.matmul(x, mat.T, precision=jax.lax.Precision.HIGHEST)


class TestFusedLinear:
    @pytest.mark.parametrize("nrhs", [1, 3])
    def test_matches_direct_solve(self, nrhs):
        n = 96
        mat = make_spd(n)
        rng = np.random.default_rng(1)
        b = rng.standard_normal((nrhs, n))
        solver = FusedLinearEquations(
            dense_matvec, np.diag(mat), n, nrhs, m_max=32,
            operand=jnp.asarray(mat), convergence_threshold=1e-10,
        )
        x, errors, iters = solver.solve(b)
        ref = np.linalg.solve(mat, b.T).T
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-8)
        assert np.all(errors <= 1e-10)

    def test_restart_path(self):
        n = 128
        mat = make_spd(n, seed=2)
        b = np.random.default_rng(2).standard_normal((2, n))
        solver = FusedLinearEquations(
            dense_matvec, np.diag(mat), n, 2, m_max=6,
            operand=jnp.asarray(mat), convergence_threshold=1e-9, max_iter=400,
        )
        x, errors, iters = solver.solve(b)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(mat, b.T).T, atol=1e-7)

    def test_sharded(self):
        mesh = make_mesh()
        n = 128
        mat = make_spd(n, seed=3)
        mat_sh = jax.device_put(jnp.asarray(mat), matrix_row_sharding(mesh))
        b = np.random.default_rng(3).standard_normal((2, n))
        solver = FusedLinearEquations(
            dense_matvec, np.diag(mat), n, 2, m_max=24,
            operand=mat_sh, sharding=block_sharding(mesh), convergence_threshold=1e-10,
        )
        x, errors, iters = solver.solve(b)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(mat, b.T).T, atol=1e-8)


class TestFusedLBFGS:
    def test_quadratic(self):
        n = 50
        hess = np.diag(np.linspace(1.0, 20.0, n))
        hd = jnp.asarray(hess)
        bvec = jnp.ones(n)

        def vg(x, operand):
            d = x - bvec
            g = jnp.matmul(operand, d, precision=jax.lax.Precision.HIGHEST)
            return 0.5 * jnp.matmul(d, g), g

        solver = FusedLBFGS(vg, n, history=10, operand=hd, convergence_threshold=1e-9)
        x, f, gnorm, iters = solver.run(np.zeros(n))
        np.testing.assert_allclose(x, np.ones(n), atol=1e-7)
        assert gnorm <= 1e-9

    def test_rosenbrock(self):
        n = 8

        def vg(x, operand):
            f = jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)
            g = jax.grad(lambda z: jnp.sum(100.0 * (z[1:] - z[:-1] ** 2) ** 2 + (1.0 - z[:-1]) ** 2))(x)
            return f, g

        solver = FusedLBFGS(vg, n, history=10, convergence_threshold=1e-8, max_iter=2000)
        x, f, gnorm, iters = solver.run(np.full(n, -0.5))
        np.testing.assert_allclose(x, np.ones(n), atol=1e-6)
        assert f < 1e-12

    def test_matches_parity_bfgs_minimum(self):
        import iterative_solver_tpu as its

        n = 12
        hess = np.diag(np.arange(1.0, n + 1.0))
        hess[0, n - 1] = hess[n - 1, 0] = 0.4
        hd = jnp.asarray(hess)
        ones = jnp.ones(n)

        def vg(x, operand):
            d = x - ones
            g = jnp.matmul(operand, d, precision=jax.lax.Precision.HIGHEST)
            return 0.5 * jnp.matmul(d, g), g

        fused = FusedLBFGS(vg, n, operand=hd, convergence_threshold=1e-10)
        xf, *_ = fused.run(np.zeros(n))

        problem = its.models.QuadraticOptimizeProblem(hess, b=np.ones(n))
        parity = its.create_optimize(n, "BFGS")
        parity.verbosity = its.Verbosity.NONE
        parity.convergence_threshold = 1e-10
        conv, xp, _ = parity.solve(np.zeros((1, n)), problem=problem)
        assert conv
        np.testing.assert_allclose(xf, np.asarray(xp)[0], atol=1e-8)


def test_fused_linear_with_packed_symmetric_action():
    """The packed-triangle symmetric operator composes with the fused
    linear-equations solver (A X = B with A symmetric — the (H-E)x=b shape
    of response equations)."""
    import dataclasses

    import jax.numpy as jnp

    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlocked,
        symm_matmat,
    )
    from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

    n, b, nrhs = 96, 32, 2
    rng = np.random.default_rng(17)
    a = rng.standard_normal((n, n)) * 0.1
    mat = a + a.T + np.diag(np.arange(4.0, n + 4.0))
    sym = SymmetricBlocked.from_dense(mat, b=b)

    def matvec(x, op):
        s = dataclasses.replace(sym, values=op[0], ii=op[1], jj=op[2])
        return symm_matmat(x, s)

    solver = FusedLinearEquations(
        matvec, np.diag(mat), n, nrhs, m_max=24,
        convergence_threshold=1e-10, max_iter=100,
        operand=(sym.values, sym.ii, sym.jj),
    )
    rhs = rng.standard_normal((nrhs, n))
    x, errors, iters = solver.solve(rhs)
    assert np.max(np.asarray(errors)) < 1e-10
    ref = np.linalg.solve(mat, rhs.T).T
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-7)


@pytest.mark.parametrize("scale", [1e-15, 1e15])
def test_fused_linear_scale_invariance(scale):
    """The fused linear solver's thresholds are scale-invariant too."""
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

    n, nrhs = 96, 2
    rng = np.random.default_rng(19)
    a = rng.standard_normal((n, n)) * 0.1
    mat = (a + a.T + np.diag(np.arange(4.0, n + 4.0))) * scale
    rhs = rng.standard_normal((nrhs, n)) * scale

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    solver = FusedLinearEquations(
        matvec, np.diag(mat), n, nrhs, m_max=24,
        convergence_threshold=1e-10, max_iter=100, operand=jnp.asarray(mat),
    )
    x, errors, iters = solver.solve(rhs)
    assert np.max(np.asarray(errors)) < 1e-10   # errors are |Ax-b|/|b|: scale-free
    assert iters < 50
    ref = np.linalg.solve(mat, rhs.T).T
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-7)


@pytest.mark.parametrize("tier,tol", [("exact", 1e-10), ("precise", 1e-5)])
def test_fused_linear_from_dense_symmetric(tier, tol):
    from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

    n, nrhs = 96, 2
    rng = np.random.default_rng(23)
    a = rng.standard_normal((n, n)) * 0.1
    mat = a + a.T + np.diag(np.arange(4.0, n + 4.0))
    solver = FusedLinearEquations.from_dense_symmetric(
        mat, nrhs, tier=tier, b=32,
        convergence_threshold=tol, max_iter=200,
    )
    rhs = rng.standard_normal((nrhs, n))
    x, errors, iters = solver.solve(rhs)
    assert np.max(np.asarray(errors)) < tol
    ref = np.linalg.solve(mat, rhs.T).T
    np.testing.assert_allclose(np.asarray(x), ref, atol=100 * tol)


def test_fused_linear_from_dense_rejects_indivisible():
    from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

    mat = np.eye(100)
    with pytest.raises(ValueError):
        FusedLinearEquations.from_dense_symmetric(mat, 1, b=32)
