"""Symmetric packed-triangle operator action (ops/kernels/symm_pallas.py).

The reference exploits hermiticity only on the subspace tier (XSpace.h:51-64,
transpose instead of recompute); these tests pin the TPU build's extension of
that idea to the O(N^2) tier: a dense symmetric action streaming only the
lower triangle, in both the portable XLA path and the Pallas kernel
(interpret mode on CPU).
"""

import jax
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


# ---------------------------------------------------------------------------
# split double-bf16 storage + bf16 fast tier


def test_split_storage_reconstructs_f32_grade():
    """hi + lo must carry ~2^-16 relative storage error (vs 2^-8 for hi
    alone) — this is the property the fold-proof bitmask split protects."""
    from iterative_solver_tpu.ops.kernels.symm_pallas import SymmetricBlockedSplit

    mat = _random_symmetric(96, seed=7) * 10.0
    sym = SymmetricBlockedSplit.from_dense(mat, b=32)
    hi = np.asarray(sym.hi, dtype=np.float64)
    lo = np.asarray(sym.lo, dtype=np.float64)
    assert np.abs(lo).max() > 0.0, "lo tiles must not be folded away"
    scale = np.abs(mat).max()
    # reconstruct the packed region and compare tile-wise
    err_hi, err_hilo = 0.0, 0.0
    b = sym.b
    for t in range(hi.shape[0]):
        i, j = int(sym.ii[t]), int(sym.jj[t])
        ref = mat[i * b:(i + 1) * b, j * b:(j + 1) * b]
        err_hi = max(err_hi, np.abs(ref - hi[t]).max())
        err_hilo = max(err_hilo, np.abs(ref - hi[t] - lo[t]).max())
    assert err_hilo < 1e-4 * scale
    assert err_hilo < err_hi / 50


@pytest.mark.parametrize("n,b", [(96, 32), (128, 64)])
def test_split_pallas_interpret_matches_dense(n, b):
    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlockedSplit,
        symm_matmat_split_pallas,
    )

    mat = _random_symmetric(n, seed=8)
    sym = SymmetricBlockedSplit.from_dense(mat, b=b)
    x = np.random.default_rng(9).standard_normal((4, n)).astype(np.float32)
    y = np.asarray(
        symm_matmat_split_pallas(jnp.asarray(x), sym, interpret=True),
        dtype=np.float64,
    )[:, :n]
    ref = x.astype(np.float64) @ mat
    # 3-term double-bf16: ~2^-16 relative accuracy
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4


def test_bf16_tier_interpret_matches_dense_loosely():
    """bf16 tiles select the single-pass tier: ~2^-8 operator accuracy."""
    n, b = 96, 32
    mat = _random_symmetric(n, seed=10)
    sym = SymmetricBlocked.from_dense(mat, b=b, dtype=jnp.bfloat16)
    x = np.random.default_rng(11).standard_normal((3, n)).astype(np.float32)
    y = np.asarray(
        symm_matmat_pallas(jnp.asarray(x), sym, interpret=True), dtype=np.float64
    )[:, :n]
    ref = x.astype(np.float64) @ mat
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 3e-2
    assert rel > 0  # it did compute something


def test_fused_davidson_split_action_converges():
    """Full solve through the split-bf16 packed action (interpret on CPU)."""
    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlockedSplit,
        symm_matmat_split_pallas,
    )
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson
    import dataclasses

    n, b, nroots = 128, 32, 2
    rng = np.random.default_rng(12)
    dvals = np.concatenate([np.linspace(-2.0, 0.0, 8), np.linspace(2.0, 30.0, n - 8)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(dvals)
    sym = SymmetricBlockedSplit.from_dense(mat, b=b)
    op = (sym.hi, sym.lo, sym.ii, sym.jj)

    def matvec(x, o):
        s = dataclasses.replace(sym, hi=o[0], lo=o[1], ii=o[2], jj=o[3])
        return symm_matmat_split_pallas(x.astype(jnp.float32), s, interpret=True).astype(x.dtype)

    solver = FusedDavidson(
        matvec, np.diag(mat), n, nroots, m_max=16,
        convergence_threshold=5e-5, max_iter=80, operand=op,
    )
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    evals, x, errors, _ = solver.run(v0)
    assert np.max(errors) < 5e-5
    ref = np.linalg.eigvalsh(mat)[:nroots]
    # double-bf16 operator: eigenvalues good to ~1e-5 relative
    np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=5e-4)


# ---------------------------------------------------------------------------
# window Rayleigh-Ritz (rr="window")


@pytest.mark.parametrize("rr", ["full", "window", "window3"])
def test_window_rr_converges_to_reference(rr):
    """rr="window" (2r x 2r locally-optimal RR) reaches the same eigenpairs
    as the full-basis RR; it may take more iterations (LOBPCG-grade local
    optimality without the momentum block) but must not change the answer."""
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    n, nroots = 192, 3
    rng = np.random.default_rng(13)
    dvals = np.concatenate([np.linspace(-2.0, 1.0, 12), np.linspace(3.0, 40.0, n - 12)])
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    mat = a + a.T + np.diag(dvals)
    matj = jnp.asarray(mat)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    solver = FusedDavidson(
        matvec, np.diag(mat), n, nroots, m_max=8 * nroots,
        convergence_threshold=1e-9, max_iter=300, operand=matj, rr=rr,
    )
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    evals, x, errors, iters = solver.run_on_device(v0)
    assert np.max(errors) < 1e-9
    ref = np.linalg.eigvalsh(mat)[:nroots]
    np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-8)


def test_window3_momentum_beats_window():
    """The LOBPCG momentum block must cut the plain window's iteration count
    (it restores the three-term recursion the 2r window lacks)."""
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    n, nroots = 256, 4
    rng = np.random.default_rng(14)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(0.0, 10.0, n))  # gapless: hard
    matj = jnp.asarray(mat)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    iters = {}
    for rr in ("window", "window3"):
        solver = FusedDavidson(
            matvec, np.diag(mat), n, nroots, m_max=8 * nroots,
            convergence_threshold=1e-9, max_iter=400, operand=matj, rr=rr,
        )
        v0 = np.zeros((nroots, n))
        for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
            v0[row, i] = 1.0
        evals, x, errors, it = solver.run_on_device(v0)
        assert np.max(errors) < 1e-9
        np.testing.assert_allclose(
            np.sort(np.asarray(evals)), np.linalg.eigvalsh(mat)[:nroots], atol=1e-8
        )
        iters[rr] = it
    assert iters["window3"] < iters["window"]


def test_sparse_symmetric_tile_dropping():
    """tol-based tile dropping turns the packed layout into a sparse-
    symmetric format: fewer stored tiles, same action (storage halves vs
    BSR for block-sparse symmetric operators; throughput is gather-bound
    at small scale, so this is a memory feature, not a speed one)."""
    from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr

    bsr, dense = synthetic_fci_bsr(512, block=64, density=0.3, seed=3)
    full = SymmetricBlocked.from_dense(dense, b=64)
    sparse = SymmetricBlocked.from_dense(dense, b=64, tol=0.0)
    assert sparse.n_pairs < full.n_pairs
    # fewer tiles than the BSR stores (lower triangle only)
    assert sparse.n_pairs < bsr.n_blocks
    x = np.random.default_rng(4).standard_normal((3, 512))
    y_full = np.asarray(symm_matmat(jnp.asarray(x), full))
    y_sparse = np.asarray(symm_matmat(jnp.asarray(x), sparse))
    np.testing.assert_allclose(y_sparse, y_full, rtol=0, atol=1e-11)
    yp = np.asarray(symm_matmat_pallas(jnp.asarray(x), sparse, interpret=True))
    np.testing.assert_allclose(yp, y_full, rtol=0, atol=1e-11)


class TestFromDenseSymmetric:
    """FusedDavidson.from_dense_symmetric — the ergonomic packed-operator
    entry, including transparent padding to the tile multiple."""

    def _mat(self, n, seed=20):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
        return a + a.T + np.diag(np.linspace(0.0, 12.0, n))

    # per-tier (residual tol, eigenvalue band): fast stores bf16 tiles on
    # every backend, so its floor is the bf16 operator error even on CPU
    @pytest.mark.parametrize("tier,tol,ev_band", [
        ("exact", 1e-9, 1e-8),
        ("precise", 1e-4, 1e-4),
        ("fast", 5e-2, 5e-2),
    ])
    def test_tiers_converge(self, tier, tol, ev_band):
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        n, nroots = 96, 3
        mat = self._mat(n)
        solver = FusedDavidson.from_dense_symmetric(
            mat, nroots, tier=tier, b=32,
            convergence_threshold=tol, max_iter=300,
        )
        v0 = np.zeros((nroots, n))
        for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
            v0[row, i] = 1.0
        evals, x, errors, iters = solver.run_on_device(v0)
        assert np.max(errors) < tol
        ref = np.linalg.eigvalsh(mat)[:nroots]
        np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=ev_band)
        assert solver.unpad(x).shape == (nroots, n)

    def test_auto_tile_size_policy(self):
        """Auto b: the fast tier takes b=1024 only when it adds no zero
        padding over b=512 (the padding traffic outweighs the measured
        ~13 us/call grid saving); other tiers and awkward n stay at 512."""
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        # n=1500: 1024-tiles would pad to 2048; auto must keep 512 (pad 1536)
        solver = FusedDavidson.from_dense_symmetric(self._mat(1500, seed=30), 1)
        assert solver.n == 1536
        # n=2048 divides both: the fast tier may take the bigger tile
        solver = FusedDavidson.from_dense_symmetric(
            self._mat(2048, seed=31), 1, tier="fast")
        assert solver.n == 2048

    def test_linear_auto_tile_degrades_to_divisor(self):
        """FusedLinearEquations auto b: linear systems cannot pad, so the
        auto choice must fall to the largest power-of-two tile dividing n
        (b=256 for n=1280) instead of raising."""
        from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

        n, nrhs = 1280, 2
        mat = self._mat(n, seed=32) + 3.0 * np.eye(n)
        rng = np.random.default_rng(33)
        b = rng.standard_normal((nrhs, n))
        solver = FusedLinearEquations.from_dense_symmetric(
            mat, nrhs, tier="fast", convergence_threshold=1e-6)
        x, errors, iters = solver.solve(b)
        resid = np.max(np.abs(np.asarray(x, np.float64) @ mat.T - b))
        assert resid < 2e-2 * np.max(np.abs(b))  # bf16 tier floor

    def test_padded_dimension(self):
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        n, nroots = 100, 2  # pads to 128 with b=32
        mat = self._mat(n, seed=21)
        solver = FusedDavidson.from_dense_symmetric(
            mat, nroots, b=32, convergence_threshold=1e-9, max_iter=300,
        )
        assert solver.n == 128 and solver.n_orig == 100
        v0 = np.zeros((nroots, n))
        for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
            v0[row, i] = 1.0
        evals, x, errors, iters = solver.run_on_device(v0)
        assert np.max(errors) < 1e-9
        ref = np.linalg.eigvalsh(mat)[:nroots]
        np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-8)
        xs = solver.unpad(x)
        assert xs.shape == (nroots, n)
        # padded coordinates never contaminate the solution
        assert np.abs(np.asarray(x)[:, n:]).max() < 1e-12

    def test_rejects_unknown_tier(self):
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        with pytest.raises(ValueError):
            FusedDavidson.from_dense_symmetric(self._mat(32), 1, tier="banana")
