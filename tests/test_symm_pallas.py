"""Symmetric packed-triangle operator action (ops/kernels/symm_pallas.py).

The reference exploits hermiticity only on the subspace tier (XSpace.h:51-64,
transpose instead of recompute); these tests pin the TPU build's extension of
that idea to the O(N^2) tier: a dense symmetric action streaming only the
lower triangle, in both the portable XLA path and the Pallas kernel
(interpret mode on CPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.ops.kernels.symm_pallas import (
    SymmetricBlocked,
    symm_matmat,
    symm_matmat_pallas,
)


def _random_symmetric(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return (a + a.T) / 2


@pytest.mark.parametrize("n,b", [(96, 32), (128, 64), (64, 64)])
def test_xla_path_matches_dense(n, b):
    mat = _random_symmetric(n)
    sym = SymmetricBlocked.from_dense(mat, b=b)
    x = np.random.default_rng(1).standard_normal((3, n))
    y = np.asarray(symm_matmat(jnp.asarray(x), sym))[:, :n]
    np.testing.assert_allclose(y, x @ mat, rtol=0, atol=1e-12)


@pytest.mark.parametrize("n,b", [(96, 32), (128, 64)])
def test_pallas_interpret_matches_dense(n, b):
    mat = _random_symmetric(n, seed=2)
    sym = SymmetricBlocked.from_dense(mat, b=b)
    x = np.random.default_rng(3).standard_normal((4, n))
    y = np.asarray(symm_matmat_pallas(jnp.asarray(x), sym, interpret=True))[:, :n]
    np.testing.assert_allclose(y, x @ mat, rtol=0, atol=1e-12)


def test_padding_to_block_multiple():
    # n=80 pads to 96 with b=32; padded rows/cols are zero so the result
    # in the padded region must be exactly zero and the live region exact.
    n, b = 80, 32
    mat = _random_symmetric(n, seed=4)
    sym = SymmetricBlocked.from_dense(mat, b=b)
    assert sym.shape == (96, 96)
    x = np.zeros((2, 96))
    x[:, :n] = np.random.default_rng(5).standard_normal((2, n))
    y = np.asarray(symm_matmat(jnp.asarray(x), sym))
    np.testing.assert_allclose(y[:, :n], x[:, :n] @ mat, atol=1e-12)
    np.testing.assert_allclose(y[:, n:], 0.0, atol=0.0)
    yp = np.asarray(symm_matmat_pallas(jnp.asarray(x), sym, interpret=True))
    np.testing.assert_allclose(yp, y, atol=1e-12)


def test_rejects_asymmetric():
    mat = np.arange(16.0).reshape(4, 4)
    with pytest.raises(ValueError):
        SymmetricBlocked.from_dense(mat, b=4)


def test_fused_davidson_with_symm_action():
    """The packed-symmetric action drops into FusedDavidson as a traced
    operand and reproduces the dense-matvec eigenvalues."""
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    n, b, nroots = 128, 32, 3
    rng = np.random.default_rng(6)
    dvals = np.concatenate([np.linspace(-2.0, 0.0, 8), np.linspace(2.0, 30.0, n - 8)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(dvals)
    sym = SymmetricBlocked.from_dense(mat, b=b)
    nb = sym.shape[0] // b

    from iterative_solver_tpu.ops.kernels.symm_pallas import _symm_matmat_xla

    def matvec(x, op):
        values, ii, jj = op
        return _symm_matmat_xla(x, values, (ii, jj), b, nb)

    solver = FusedDavidson(
        matvec, np.diag(mat), n, nroots, m_max=24,
        convergence_threshold=1e-9, max_iter=60,
        operand=(sym.values, sym.ii, sym.jj),
    )
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    evals, _, errors, _ = solver.run_on_device(v0)
    assert np.max(errors) < 1e-9
    ref = np.linalg.eigvalsh(mat)[:nroots]
    np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-8)
