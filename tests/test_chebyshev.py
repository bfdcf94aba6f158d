"""Chebyshev-filtered subspace expansion (solvers/chebyshev.py).

The reference has no polynomial filtering; these tests pin the TPU-only
feature: Lanczos spectral-bound estimation, filter correctness (damping
outside / amplification inside the wanted window), convergence of the
filtered FusedDavidson to the dense reference, and matvec accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.chebyshev import (
    estimate_spectral_bounds,
    make_chebyshev_davidson,
    make_chebyshev_expand,
)
from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

_PREC = jax.lax.Precision.HIGHEST


def make_matrix(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * 0.01
    return a + a.T + np.diag(np.linspace(1.0, spread, n))


def dense_matvec(x, mat):
    return jnp.matmul(x, mat.T, precision=_PREC)


def initial_guess(matrix, nroots):
    n = matrix.shape[0]
    idx = np.argsort(np.diag(matrix))[:nroots]
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(idx):
        v0[row, i] = 1.0
    return v0


def test_spectral_bounds_contain_spectrum():
    n = 80
    matrix = make_matrix(n, seed=1)
    w = np.linalg.eigvalsh(matrix)
    lo, hi = estimate_spectral_bounds(dense_matvec, n, operand=jnp.asarray(matrix))
    assert lo <= w[0] + 1e-6
    assert hi >= w[-1] - 1e-6
    # and not absurdly loose: within 3x the true spectral width
    assert hi - lo <= 3.0 * (w[-1] - w[0])


def test_filter_damps_unwanted_amplifies_wanted():
    """Apply the expand hook directly to known eigenvector combinations:
    components above the filter edge must shrink relative to those below."""
    n = 60
    matrix = make_matrix(n, seed=2)
    w, vecs = np.linalg.eigh(matrix)
    mdev = jnp.asarray(matrix)
    degree = 6
    expand = make_chebyshev_expand(dense_matvec, degree, lambda_max=float(w[-1]) * 1.01)

    # probe block = even mix of a wanted (lowest) and an unwanted (highest)
    # mode, passed in the Ritz slot (the quantity the filter acts on)
    x = (vecs[:, 0] + vecs[:, -1]).reshape(1, -1)
    evals = jnp.asarray([w[0]])
    # fake subspace spectrum resolving up to the 21st eigenvalue: filter
    # edge a = w[20], so the wanted mode sits well below the damping window
    nact = 21
    evals_all = jnp.asarray(np.concatenate([w[:nact], np.full(5, 1e6)]))
    mask = jnp.asarray([1.0] * nact + [0.0] * 5)
    t = expand(jnp.asarray(x), None, evals, evals_all, mask, None, mdev)
    t = np.asarray(t)[0]
    wanted = abs(t @ vecs[:, 0])
    unwanted = abs(t @ vecs[:, -1])
    # degree-6 filter with this gap: orders of magnitude separation, and
    # the sigma scaling keeps the wanted component O(1)
    assert wanted > 1e3 * unwanted
    assert 0.1 < wanted < 10.0


@pytest.mark.parametrize("nroots", [1, 3])
def test_chebyshev_davidson_matches_dense(nroots):
    n = 96
    matrix = make_matrix(n, seed=3)
    mdev = jnp.asarray(matrix)
    solver = make_chebyshev_davidson(
        dense_matvec, np.diag(matrix), n, nroots=nroots, degree=4,
        m_max=20, operand=mdev,
    )
    evals, x, errors, iters = solver.run(initial_guess(matrix, nroots))
    ref = np.linalg.eigvalsh(matrix)[:nroots]
    np.testing.assert_allclose(evals, ref, atol=1e-8)
    assert np.all(errors <= solver.tol)
    # matvec accounting counts the degree extra applications
    assert solver.matvecs == nroots + iters * nroots * 4


def test_chebyshev_beats_jacobi_on_flat_diagonal():
    """On a matrix whose diagonal carries no information the Jacobi
    preconditioner stalls; the Chebyshev filter converges in far fewer
    subspace iterations — the case the feature exists for."""
    n = 128
    rng = np.random.default_rng(4)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.linspace(1.0, 50.0, n)
    matrix = (q * w) @ q.T  # dense eigenbasis, nearly-flat diagonal
    mdev = jnp.asarray(matrix)
    v0 = rng.standard_normal((2, n))

    jac = FusedDavidson(dense_matvec, np.diag(matrix), n, 2, m_max=16,
                        max_iter=300, operand=mdev)
    jac.run(v0)

    cheb = make_chebyshev_davidson(dense_matvec, np.diag(matrix), n, nroots=2,
                                   degree=8, m_max=16, max_iter=300, operand=mdev)
    evals, _, errors, iters = cheb.run(v0)
    ref = np.linalg.eigvalsh(matrix)[:2]
    np.testing.assert_allclose(evals, ref, atol=1e-8)
    assert np.all(errors <= cheb.tol)
    assert iters < jac.iterations / 2


def test_chebyshev_on_device_single_dispatch():
    """The filtered solver also runs through the fused while_loop driver."""
    n = 64
    matrix = make_matrix(n, seed=5)
    mdev = jnp.asarray(matrix)
    solver = make_chebyshev_davidson(
        dense_matvec, np.diag(matrix), n, nroots=2, degree=3,
        m_max=12, operand=mdev,
    )
    evals, x, errors, iters = solver.run_on_device(initial_guess(matrix, 2))
    ref = np.linalg.eigvalsh(matrix)[:2]
    np.testing.assert_allclose(evals, ref, atol=1e-8)
    assert np.all(errors <= solver.tol)


def test_chebyshev_sharded_mesh():
    """Filtered expansion under the 8-device CPU mesh: matvecs inside the
    expand hook ride the same sharding as the solver's own."""
    from iterative_solver_tpu.parallel import block_sharding, make_mesh, matrix_row_sharding

    n = 128
    matrix = make_matrix(n, seed=6)
    mesh = make_mesh()
    mat_sharded = jax.device_put(jnp.asarray(matrix), matrix_row_sharding(mesh))
    solver = make_chebyshev_davidson(
        dense_matvec, np.diag(matrix), n, nroots=2, degree=3, m_max=14,
        operand=mat_sharded, sharding=block_sharding(mesh),
    )
    evals, x, errors, iters = solver.run(initial_guess(matrix, 2))
    ref = np.linalg.eigvalsh(matrix)[:2]
    np.testing.assert_allclose(evals, ref, atol=1e-8)
    assert np.all(errors <= solver.tol)
