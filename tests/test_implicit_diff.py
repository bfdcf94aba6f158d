"""Differentiable eigenvalues (solvers/implicit_diff.py): the
Hellmann-Feynman custom VJP against finite differences and the analytic
dense formula."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.implicit_diff import (
    make_differentiable_eigenvalues,
)


def _mat(theta, base, pert):
    return base + theta * pert


def test_gradient_matches_dense_analytic():
    n, nroots = 64, 3
    rng = np.random.default_rng(41)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    base = jnp.asarray(a + a.T + np.diag(np.linspace(0.0, 10.0, n)))
    p = rng.standard_normal((n, n)) * 0.1
    pert = jnp.asarray(p + p.T)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    eigfn = make_differentiable_eigenvalues(matvec, nroots, 6 * nroots, tol=1e-11,
                                            max_iter=400)
    diag = jnp.diagonal(base)
    v0 = jnp.zeros((nroots, n)).at[jnp.arange(nroots), jnp.arange(nroots)].set(1.0)

    def objective(theta):
        evals = eigfn(v0, _mat(theta, base, pert), diag)
        return jnp.sum(evals * jnp.asarray([1.0, -0.5, 2.0]))

    theta0 = 0.3
    g = jax.grad(objective)(theta0)
    # analytic: sum_i w_i x_i^T P x_i from the dense eigendecomposition
    m0 = np.asarray(_mat(theta0, base, pert))
    wv, xv = np.linalg.eigh(m0)
    analytic = sum(
        w * (xv[:, i] @ np.asarray(pert) @ xv[:, i])
        for i, w in enumerate([1.0, -0.5, 2.0])
    )
    np.testing.assert_allclose(float(g), analytic, rtol=1e-7)
    # and finite differences of the solver itself
    eps = 1e-5
    fd = (objective(theta0 + eps) - objective(theta0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_gradient_through_packed_operand_pytree():
    """The operand can be any pytree: gradients flow to every leaf the
    matvec touches (here a (values, scale) pair)."""
    n, nroots = 48, 2
    rng = np.random.default_rng(42)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    base = jnp.asarray(a + a.T + np.diag(np.linspace(1.0, 9.0, n)))

    def matvec(x, op):
        mat, scale = op
        return scale * jnp.matmul(x, mat.T, precision=jax.lax.Precision.HIGHEST)

    eigfn = make_differentiable_eigenvalues(matvec, nroots, 6 * nroots, tol=1e-11,
                                            max_iter=300)
    diag = jnp.diagonal(base)
    v0 = jnp.zeros((nroots, n)).at[jnp.arange(nroots), jnp.arange(nroots)].set(1.0)

    def lowest(scale):
        return eigfn(v0, (base, scale), diag * scale)[0]

    g = jax.grad(lowest)(1.0)
    # lambda(s) = s * lambda(1): d lambda / ds = lambda(1)
    lam1 = float(lowest(1.0))
    np.testing.assert_allclose(float(g), lam1, rtol=1e-8)


def test_eigenpair_gradient_expectation_value():
    """Eigenvector adjoint: gradient of <x0|M|x0> through the response
    solve matches finite differences and the dense perturbation formula."""
    from iterative_solver_tpu.solvers.implicit_diff import (
        make_differentiable_eigenpairs,
    )

    n, nroots = 72, 2
    rng = np.random.default_rng(51)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    base = jnp.asarray(a + a.T + np.diag(np.linspace(0.0, 9.0, n)))
    p = rng.standard_normal((n, n)) * 0.1
    pert = jnp.asarray(p + p.T)
    mo = rng.standard_normal((n, n)) * 0.2
    M = jnp.asarray(mo + mo.T)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    pairfn = make_differentiable_eigenpairs(
        matvec, nroots, 8 * nroots, tol=1e-11, max_iter=500,
        response_tol=1e-10, response_max_iter=400, response_m_max=10 * nroots,
    )
    diag = jnp.diagonal(base)
    v0 = jnp.zeros((nroots, n)).at[jnp.arange(nroots), jnp.arange(nroots)].set(1.0)

    def expval(theta):
        lam, x = pairfn(v0, base + theta * pert, diag)
        return x[0] @ M @ x[0]

    theta0 = 0.2
    g = jax.grad(expval)(theta0)
    eps = 1e-5
    fd = (expval(theta0 + eps) - expval(theta0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-4)
    # dense perturbation-theory formula
    m0 = np.asarray(base + theta0 * pert)
    w, v = np.linalg.eigh(m0)
    x0 = v[:, 0]
    Mx0 = np.asarray(M) @ x0
    analytic = sum(
        2.0 * (Mx0 @ v[:, j]) * (v[:, j] @ np.asarray(pert) @ x0) / (w[0] - w[j])
        for j in range(1, n)
    )
    np.testing.assert_allclose(float(g), analytic, rtol=1e-6)


def test_eigenpair_gradient_eigenvalue_part_consistent():
    """The eigenpair adjoint's lambda-bar path agrees with the
    eigenvalue-only adjoint."""
    from iterative_solver_tpu.solvers.implicit_diff import (
        make_differentiable_eigenpairs,
        make_differentiable_eigenvalues,
    )

    n, nroots = 48, 2
    rng = np.random.default_rng(52)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    base = jnp.asarray(a + a.T + np.diag(np.linspace(1.0, 8.0, n)))
    p = rng.standard_normal((n, n)) * 0.1
    pert = jnp.asarray(p + p.T)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    diag = jnp.diagonal(base)
    v0 = jnp.zeros((nroots, n)).at[jnp.arange(nroots), jnp.arange(nroots)].set(1.0)
    eigfn = make_differentiable_eigenvalues(matvec, nroots, 8 * nroots, tol=1e-11,
                                            max_iter=400)
    pairfn = make_differentiable_eigenpairs(matvec, nroots, 8 * nroots, tol=1e-11,
                                            max_iter=400)

    g1 = jax.grad(lambda t: jnp.sum(eigfn(v0, base + t * pert, diag)))(0.1)
    g2 = jax.grad(lambda t: jnp.sum(pairfn(v0, base + t * pert, diag)[0]))(0.1)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-9)


def test_gradient_through_packed_xla_action():
    """The packed symmetric XLA path (symm_matmat) differentiates: gradients
    flow to the tile values. (The Pallas kernels define no autodiff rule —
    use the XLA path for differentiable workflows.)"""
    import dataclasses

    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlocked,
        symm_matmat,
    )
    from iterative_solver_tpu.solvers.implicit_diff import (
        make_differentiable_eigenvalues,
    )

    n, b, nroots = 64, 16, 2
    rng = np.random.default_rng(61)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(1.0, 8.0, n))
    sym = SymmetricBlocked.from_dense(mat, b=b)

    def matvec(x, op):
        s = dataclasses.replace(sym, values=op)
        return symm_matmat(x, s)

    eigfn = make_differentiable_eigenvalues(matvec, nroots, 8 * nroots,
                                            tol=1e-11, max_iter=400)
    diag = jnp.diagonal(jnp.asarray(mat))
    v0 = jnp.zeros((nroots, n)).at[jnp.arange(nroots), jnp.arange(nroots)].set(1.0)

    def e0(scale):
        return eigfn(v0, sym.values * scale, diag * scale)[0]

    g = jax.grad(e0)(1.0)
    # lambda(s) = s lambda(1) => dlambda/ds = lambda(1)
    np.testing.assert_allclose(float(g), float(e0(1.0)), rtol=1e-8)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_gradient_through_packed_custom_vjp(use_pallas):
    """make_differentiable_symm_action supplies the packed kernels' VJP:
    eigenvalue gradients w.r.t. the tile values match the dense analytic
    outer-product formula, through both the XLA and (interpret) Pallas
    forwards."""
    import dataclasses

    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlocked,
        make_differentiable_symm_action,
    )
    from iterative_solver_tpu.solvers.implicit_diff import (
        make_differentiable_eigenvalues,
    )

    n, b, nroots = 64, 16, 1
    rng = np.random.default_rng(71)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(1.0, 8.0, n))
    sym = SymmetricBlocked.from_dense(mat, b=b)
    act = make_differentiable_symm_action(sym, use_pallas=use_pallas,
                                          interpret=True)

    def matvec(x, op):
        return act(x, op)

    eigfn = make_differentiable_eigenvalues(matvec, nroots, 8, tol=1e-11,
                                            max_iter=400)
    diag = jnp.diagonal(jnp.asarray(mat))
    v0 = jnp.zeros((nroots, n)).at[0, 0].set(1.0)

    def e0(values):
        return eigfn(v0, values, diag)[0]

    g = jax.grad(e0)(sym.values)
    # dense analytic: d lambda0 / dA = x0 x0^T; map onto the packed tiles
    w, v = np.linalg.eigh(mat)
    x0 = v[:, 0]
    outer = np.outer(x0, x0)
    g_np = np.asarray(g)
    ii, jj = np.asarray(sym.ii), np.asarray(sym.jj)
    for t in range(len(ii)):
        i, j = int(ii[t]), int(jj[t])
        blk = outer[i * b:(i + 1) * b, j * b:(j + 1) * b]
        expect = blk if i == j else 2 * blk  # off-diag tile feeds A and A^T
        np.testing.assert_allclose(g_np[t], expect, atol=1e-9,
                                   err_msg=f"tile {t} ({i},{j})")
