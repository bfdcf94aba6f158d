"""BSR sparse-action kernel tests: XLA path vs dense, Pallas kernel in
interpreter mode, and use as a solver action."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.ops.kernels import BSRMatrix, bsr_matmat, bsr_matmat_pallas


def make_block_sparse(n, bm, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    n_b = n // bm
    matrix = np.zeros((n, n))
    for rb in range(n_b):
        for cb in range(rb + 1):
            if rb == cb or rng.random() < density:
                block = rng.standard_normal((bm, bm)) * 0.05
                matrix[rb * bm:(rb + 1) * bm, cb * bm:(cb + 1) * bm] = block
    matrix = matrix + matrix.T + np.diag(np.linspace(1.0, 10.0, n))
    return matrix


class TestBSR:
    def test_from_dense_roundtrip(self):
        matrix = make_block_sparse(64, 16)
        bsr = BSRMatrix.from_dense(matrix, bm=16, bn=16)
        x = np.random.default_rng(1).standard_normal((3, 64))
        y = np.asarray(bsr_matmat(jnp.asarray(x), bsr))
        np.testing.assert_allclose(y, x @ matrix.T, atol=1e-10)

    def test_sparsity_prunes_blocks(self):
        matrix = make_block_sparse(64, 16, density=0.1)
        bsr = BSRMatrix.from_dense(matrix, bm=16, bn=16)
        assert bsr.n_blocks < (64 // 16) ** 2

    def test_padding(self):
        matrix = make_block_sparse(48, 16)[:40, :40]  # not a multiple of 16
        bsr = BSRMatrix.from_dense(matrix, bm=16, bn=16)
        assert bsr.shape == (48, 48)
        x = np.random.default_rng(2).standard_normal((2, 48))
        x[:, 40:] = 0.0
        y = np.asarray(bsr_matmat(jnp.asarray(x), bsr))
        np.testing.assert_allclose(y[:, :40], x[:, :40] @ matrix.T, atol=1e-10)

    def test_pallas_interpret_matches_xla(self):
        matrix = make_block_sparse(64, 16)
        bsr = BSRMatrix.from_dense(matrix, bm=16, bn=16, dtype=jnp.float32)
        x = np.random.default_rng(3).standard_normal((8, 64)).astype(np.float32)
        y_ref = np.asarray(bsr_matmat(jnp.asarray(x), bsr))
        y_pallas = np.asarray(bsr_matmat_pallas(jnp.asarray(x), bsr, interpret=True))
        np.testing.assert_allclose(y_pallas, y_ref, atol=1e-4)


def test_bsr_as_solver_action(hamiltonians):
    """Davidson through a BSR action reproduces the dense eigenvalues."""
    matrix = hamiltonians["bh"]
    n = matrix.shape[0]
    bsr = BSRMatrix.from_dense(matrix, bm=8, bn=8)

    class BSRProblem(its.Problem):
        def __init__(self):
            super().__init__()
            self.dimension = bsr.shape[0]

        def action(self, parameters):
            return bsr_matmat(parameters, bsr)

        def diagonals(self):
            return bsr.diagonal

    n_pad = bsr.shape[0]
    solver = its.create_linear_eigensystem(n_pad, 2, "Davidson")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((2, n_pad)), problem=BSRProblem(), generate_initial_guess=True)
    assert conv
    ref = np.sort(np.linalg.eigvalsh(matrix))[:2]
    np.testing.assert_allclose(np.sort(solver.eigenvalues()[:2]), ref, atol=2e-9)


def test_fused_davidson_with_bsr():
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    matrix = make_block_sparse(128, 16, density=0.2, seed=5)
    bsr = BSRMatrix.from_dense(matrix, bm=16, bn=16)

    def matvec(x, op):
        values, col_idx, row_idx = op
        from iterative_solver_tpu.ops.kernels.spmv_pallas import _bsr_matmat_xla
        return _bsr_matmat_xla(x, values, col_idx, row_idx, bsr.bm, bsr.bn, bsr.shape[0] // bsr.bm)

    solver = FusedDavidson(
        matvec, np.diag(matrix), 128, 2, m_max=16,
        operand=(bsr.values, bsr.col_idx, bsr.row_idx),
    )
    v0 = np.zeros((2, 128))
    idx = np.argsort(np.diag(matrix))[:2]
    for r, i in enumerate(idx):
        v0[r, i] = 1.0
    evals, x, errors, iters = solver.run(v0)
    ref = np.linalg.eigvalsh(matrix)[:2]
    np.testing.assert_allclose(evals, ref, atol=1e-8)


class TestMaskedGramPallas:
    def test_interpret_matches_reference(self):
        from iterative_solver_tpu.ops.kernels import masked_gram_pallas

        rng = np.random.default_rng(0)
        m, n = 16, 1024
        v = rng.standard_normal((m, n)).astype(np.float32)
        w = rng.standard_normal((m, n)).astype(np.float32)
        mask = np.zeros(m, dtype=np.float32)
        mask[:10] = 1.0
        out = np.asarray(masked_gram_pallas(jnp.asarray(v), jnp.asarray(w), jnp.asarray(mask), interpret=True))
        h = (v @ w.T) * np.outer(mask, mask)
        ref = 0.5 * (h + h.T)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_tile_sweep(self):
        from iterative_solver_tpu.ops.kernels import masked_gram_pallas

        rng = np.random.default_rng(1)
        m, n = 8, 512
        v = rng.standard_normal((m, n)).astype(np.float32)
        mask = np.ones(m, dtype=np.float32)
        ref = 0.5 * ((v @ v.T) + (v @ v.T).T)
        for tile in (128, 256, 512):
            out = np.asarray(masked_gram_pallas(jnp.asarray(v), jnp.asarray(v), jnp.asarray(mask),
                                                tile=tile, interpret=True))
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


class TestBSRInt8:
    """Quantized BSR tier (BSRMatrixInt8): two-sided equilibration + exact
    diagonal, exact-int32 action."""

    def test_accuracy_class_vs_dense(self):
        from iterative_solver_tpu.ops.kernels.spmv_pallas import (
            BSRMatrixInt8, bsr_matmat_int8)

        matrix = make_block_sparse(128, 16, seed=20)
        q = BSRMatrixInt8.from_dense(matrix, bm=16, bn=16)
        x = np.random.default_rng(21).standard_normal((3, 128)).astype(np.float32)
        y = np.asarray(bsr_matmat_int8(jnp.asarray(x), q), np.float64)
        ref = x.astype(np.float64) @ matrix.T
        # bf16-class coupling error, exact diagonal
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-2

    def test_diag_dominant_error_scales_with_couplings(self):
        from iterative_solver_tpu.ops.kernels.spmv_pallas import (
            BSRMatrixInt8, bsr_matmat_int8)

        matrix = make_block_sparse(96, 16, seed=22)
        # amplify the diagonal: error must stay at the coupling scale
        matrix += np.diag(np.linspace(50.0, 500.0, 96))
        q = BSRMatrixInt8.from_dense(matrix, bm=16, bn=16)
        x = np.random.default_rng(23).standard_normal((2, 96)).astype(np.float32)
        y = np.asarray(bsr_matmat_int8(jnp.asarray(x), q), np.float64)
        ref = x.astype(np.float64) @ matrix.T
        offdiag = matrix - np.diag(np.diagonal(matrix))
        coupling = np.abs(offdiag).max()
        assert np.abs(y - ref).max() < coupling * 0.3  # not diag-scale (~500)

    def test_keeps_block_topology(self):
        from iterative_solver_tpu.ops.kernels.spmv_pallas import BSRMatrixInt8

        matrix = make_block_sparse(64, 16, seed=24)
        bsr = BSRMatrix.from_dense(matrix, bm=16, bn=16)
        q = BSRMatrixInt8.from_bsr(bsr)
        np.testing.assert_array_equal(np.asarray(q.col_idx), np.asarray(bsr.col_idx))
        np.testing.assert_array_equal(np.asarray(q.row_idx), np.asarray(bsr.row_idx))
        assert q.nnz == bsr.nnz

    def test_nonsquare_blocks_skip_diag_split(self):
        from iterative_solver_tpu.ops.kernels.spmv_pallas import (
            BSRMatrixInt8, bsr_matmat_int8)

        matrix = make_block_sparse(96, 16, seed=25)
        q = BSRMatrixInt8.from_dense(matrix, bm=32, bn=16)
        assert q.diagonal is None
        x = np.random.default_rng(26).standard_normal((2, 96)).astype(np.float32)
        y = np.asarray(bsr_matmat_int8(jnp.asarray(x), q), np.float64)
        ref = x.astype(np.float64) @ matrix.T
        # without the diag split accuracy is relative to sqrt(rowmax colmax)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 5e-2

    def test_synthetic_fci_action(self):
        from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr
        from iterative_solver_tpu.ops.kernels.spmv_pallas import (
            BSRMatrixInt8, bsr_matmat_int8)

        bsr, dense = synthetic_fci_bsr(256, block=32, density=0.3, seed=27)
        q = BSRMatrixInt8.from_bsr(bsr)
        x = np.random.default_rng(28).standard_normal((4, 256)).astype(np.float32)
        y = np.asarray(bsr_matmat_int8(jnp.asarray(x), q), np.float64)
        ref = x.astype(np.float64) @ dense.T
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-2
