"""Int8-quantized packed symmetric action (ops/kernels/symm_int8.py).

Pins the quantized tiers' accuracy classes and the exact agreement between
the portable XLA paths and the Pallas kernels (interpret mode on CPU):

- one-plane int8 + symmetric equilibration: error bounded by
  ~g[P]g[Q]/254 (the bf16 class for equilibrated matrices);
- two-plane split (Q1 + Q2/254): the split double-bf16 class (~2^-16)
  at half its streamed bytes.

The quantized storage has no reference counterpart (the reference streams
f64 chunks through BufferManager, array/util/gemm.h:100-152); it is the
TPU-native low-bit serving technique applied to the operator stream.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.ops.kernels.symm_int8 import (
    SymmetricBlockedInt8,
    SymmetricBlockedInt8Split,
    quantize_rows,
    quantize_rows_split,
    symm_matmat_int8,
    symm_matmat_int8_pallas,
    symm_matmat_int8_split,
    symm_matmat_int8_split_pallas,
)


def _random_symmetric(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * scale
    return (a + a.T) / 2


def _rel(y, ref):
    return np.abs(np.asarray(y, dtype=np.float64) - ref).max() / np.abs(ref).max()


class TestQuantization:
    def test_row_quantization_roundtrip(self):
        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32) * 7.0)
        qx, sx = quantize_rows(xs)
        assert qx.dtype == jnp.int8
        back = np.asarray(qx, dtype=np.float64) * np.asarray(sx, dtype=np.float64)
        # per-row error bounded by half a quantization step
        err = np.abs(back - np.asarray(xs, dtype=np.float64)).max(axis=1)
        step = np.asarray(sx, dtype=np.float64).ravel()
        assert np.all(err <= 0.5 * step + 1e-12)

    def test_row_quantization_zero_row_guard(self):
        xs = jnp.zeros((2, 32), dtype=jnp.float32)
        qx, sx = quantize_rows(xs)
        assert np.all(np.asarray(qx) == 0)
        assert np.all(np.isfinite(np.asarray(sx)))

    def test_split_quantization_two_planes(self):
        rng = np.random.default_rng(2)
        xs = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
        p1, p2, sx = quantize_rows_split(xs)
        sxv = np.asarray(sx, dtype=np.float64)
        back = (np.asarray(p1, np.float64) + np.asarray(p2, np.float64) / 254.0) * sxv
        err = np.abs(back - np.asarray(xs, np.float64)).max()
        # ~2^-16 of the row scale (127 * sx)
        assert err <= (127.0 * sxv.max()) * 1.6e-5

    def test_equilibration_bounds_tiles(self):
        mat = _random_symmetric(96, seed=3) * np.exp(
            np.random.default_rng(4).uniform(-3, 3, 96)
        )[:, None]
        mat = (mat + mat.T) / 2  # wide dynamic range, still symmetric
        sym = SymmetricBlockedInt8.from_dense(mat, b=32)
        assert np.abs(np.asarray(sym.q, dtype=np.int64)).max() <= 127
        # diagonal is stored exactly; tiles quantize E = mat - diag with the
        # reconstruction error bounded by the equilibrated step, per element
        np.testing.assert_array_equal(
            np.asarray(sym.diagonal), np.diagonal(mat).astype(np.float32))
        E = mat - np.diag(np.diagonal(mat))
        gq = np.asarray(sym.gq, dtype=np.float64)
        b = sym.b
        for t in range(sym.n_pairs):
            i, j = int(sym.ii[t]), int(sym.jj[t])
            gi = gq[i * b:(i + 1) * b]
            gj = gq[j * b:(j + 1) * b]
            ref = E[i * b:(i + 1) * b, j * b:(j + 1) * b] if (i + 1) * b <= 96 else None
            if ref is None:
                continue
            back = np.outer(gi, gj) * np.asarray(sym.q[t], dtype=np.float64)
            bound = 0.5 * np.outer(gi, gj) + 1e-12
            assert np.all(np.abs(back - ref) <= bound)

    def test_diagonal_matrix_is_exact(self):
        """The diagonal split makes a purely diagonal operator exact: the
        quantized plane is all zero and the action reduces to the f32
        multiply-add."""
        d = np.linspace(-3.0, 50.0, 64)
        sym = SymmetricBlockedInt8.from_dense(np.diag(d), b=32)
        assert np.abs(np.asarray(sym.q, np.int64)).max() == 0
        x = np.random.default_rng(40).standard_normal((3, 64)).astype(np.float32)
        y = np.asarray(symm_matmat_int8(jnp.asarray(x), sym), dtype=np.float64)
        np.testing.assert_allclose(y, x.astype(np.float64) * d, rtol=2e-7)

    def test_diag_dominant_error_scales_with_couplings(self):
        """The bench-shaped operator (large diagonal, tiny couplings): the
        quantization error must scale with the COUPLING magnitudes, not the
        diagonal — quantizing A whole would be ~1000x worse here."""
        n = 128
        rng = np.random.default_rng(41)
        e = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
        E = e + e.T
        np.fill_diagonal(E, 0.0)
        mat = E + np.diag(np.linspace(6.0, 50.0, n))
        sym = SymmetricBlockedInt8.from_dense(mat, b=32)
        x = rng.standard_normal((3, n)).astype(np.float32)
        y = np.asarray(symm_matmat_int8(jnp.asarray(x), sym), np.float64)
        ref = x.astype(np.float64) @ mat
        # error budget: coupling rowmax / 254 per element, accumulated over n
        # columns in rms — far below the diagonal scale
        coupling_max = np.abs(E).max()
        err = np.abs(y - ref).max()
        assert err < 3.0 * coupling_max * np.sqrt(n) / 254.0 * np.abs(x).max() * 30
        assert err < 1e-3 * np.abs(ref).max()


class TestXLAPaths:
    @pytest.mark.parametrize("n,b", [(96, 32), (128, 64), (64, 64)])
    def test_int8_accuracy_class(self, n, b):
        mat = _random_symmetric(n, seed=5)
        sym = SymmetricBlockedInt8.from_dense(mat, b=b)
        x = np.random.default_rng(6).standard_normal((3, n)).astype(np.float32)
        ref = x.astype(np.float64) @ mat
        y = np.asarray(symm_matmat_int8(jnp.asarray(x), sym))[:, :n]
        assert _rel(y, ref) < 3e-2  # bf16 class

    @pytest.mark.parametrize("n,b", [(96, 32), (128, 64)])
    def test_int8_split_accuracy_class(self, n, b):
        mat = _random_symmetric(n, seed=7)
        sym = SymmetricBlockedInt8Split.from_dense(mat, b=b)
        x = np.random.default_rng(8).standard_normal((3, n)).astype(np.float32)
        ref = x.astype(np.float64) @ mat
        y = np.asarray(symm_matmat_int8_split(jnp.asarray(x), sym))[:, :n]
        assert _rel(y, ref) < 2e-4  # split double-bf16 class

    def test_split_beats_single_plane(self):
        n, b = 128, 32
        mat = _random_symmetric(n, seed=9)
        x = np.random.default_rng(10).standard_normal((2, n)).astype(np.float32)
        ref = x.astype(np.float64) @ mat
        e1 = _rel(symm_matmat_int8(jnp.asarray(x),
                                   SymmetricBlockedInt8.from_dense(mat, b=b))[:, :n], ref)
        e2 = _rel(symm_matmat_int8_split(jnp.asarray(x),
                                         SymmetricBlockedInt8Split.from_dense(mat, b=b))[:, :n], ref)
        assert e2 < e1 / 20

    def test_wide_dynamic_range_geometric_mean_bound(self):
        """Symmetric equilibration bounds the element error by the GEOMETRIC
        MEAN of the two row scales, sqrt(rowmax_P rowmax_Q)/254 — NOT by the
        small row's own scale. On badly scaled matrices small rows therefore
        see larger relative error than bf16 storage would give them (the
        documented accuracy trade of the int8 tier); this pins the bound
        actually guaranteed."""
        n, b = 96, 32
        base = _random_symmetric(n, seed=11)
        s = np.exp(np.linspace(0.0, 6.0, n))  # 400x scale spread
        mat = base * np.outer(s, s)
        sym = SymmetricBlockedInt8.from_dense(mat, b=b)
        E = mat - np.diag(np.diagonal(mat))
        rowmax = np.abs(E).max(axis=1)
        x = np.eye(n, dtype=np.float32)[:4]  # unit vectors probe single rows
        y = np.asarray(symm_matmat_int8(jnp.asarray(x), sym))[:, :n]
        ref = x.astype(np.float64) @ mat
        for r in range(4):
            # per-element bound: coupling quantization 0.5*g_r*g_Q/127 plus
            # the exact diagonal's f32 rounding (unit-vector x is exact)
            bound = (0.55 * np.sqrt(rowmax[r] * rowmax) / 127.0
                     + 1e-6 * np.abs(np.diagonal(mat)) + 1e-9)
            assert np.all(np.abs(y[r] - ref[r]) <= bound)

    def test_padding_and_zero_region(self):
        n, b = 80, 32  # pads to 96
        mat = _random_symmetric(n, seed=12)
        sym = SymmetricBlockedInt8.from_dense(mat, b=b)
        assert sym.shape == (96, 96)
        x = np.zeros((2, 96), dtype=np.float32)
        x[:, :n] = np.random.default_rng(13).standard_normal((2, n))
        y = np.asarray(symm_matmat_int8(jnp.asarray(x), sym))
        ref = x[:, :n].astype(np.float64) @ mat
        assert _rel(y[:, :n], ref) < 3e-2
        np.testing.assert_allclose(y[:, n:], 0.0, atol=0.0)

    def test_rejects_asymmetric(self):
        with pytest.raises(ValueError):
            SymmetricBlockedInt8.from_dense(np.arange(16.0).reshape(4, 4), b=4)

    def test_sparse_tile_dropping(self):
        from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr

        _, dense = synthetic_fci_bsr(256, block=32, density=0.3, seed=14)
        full = SymmetricBlockedInt8.from_dense(dense, b=32)
        sparse = SymmetricBlockedInt8.from_dense(dense, b=32, tol=0.0)
        assert sparse.n_pairs < full.n_pairs
        x = np.random.default_rng(15).standard_normal((3, 256)).astype(np.float32)
        yf = np.asarray(symm_matmat_int8(jnp.asarray(x), full))
        ys = np.asarray(symm_matmat_int8(jnp.asarray(x), sparse))
        np.testing.assert_allclose(ys, yf, rtol=0, atol=1e-6 * np.abs(yf).max())


class TestPallasInterpret:
    """The Pallas kernels run the SAME integer arithmetic as the XLA paths,
    so interpret mode must agree bit-for-bit (int32 accumulation is exact;
    the only float ops are the final rank-1 dequantization)."""

    @pytest.mark.parametrize("n,b", [(96, 32), (128, 64)])
    def test_int8_pallas_matches_xla_exactly(self, n, b):
        mat = _random_symmetric(n, seed=16)
        sym = SymmetricBlockedInt8.from_dense(mat, b=b)
        x = jnp.asarray(
            np.random.default_rng(17).standard_normal((4, n)).astype(np.float32))
        y_xla = np.asarray(symm_matmat_int8(x, sym))
        y_pl = np.asarray(symm_matmat_int8_pallas(x, sym, interpret=True))
        # int32 accumulation is exact; only the final f32 dequantization
        # FMA order can differ between the kernel and the XLA path
        np.testing.assert_allclose(y_pl, y_xla, rtol=1e-6,
                                   atol=1e-6 * np.abs(y_xla).max())

    @pytest.mark.parametrize("n,b", [(96, 32), (128, 64)])
    def test_int8_split_pallas_matches_xla_exactly(self, n, b):
        mat = _random_symmetric(n, seed=18)
        sym = SymmetricBlockedInt8Split.from_dense(mat, b=b)
        x = jnp.asarray(
            np.random.default_rng(19).standard_normal((4, n)).astype(np.float32))
        y_xla = np.asarray(symm_matmat_int8_split(x, sym))
        y_pl = np.asarray(symm_matmat_int8_split_pallas(x, sym, interpret=True))
        np.testing.assert_allclose(y_pl, y_xla, rtol=1e-6,
                                   atol=1e-6 * np.abs(y_xla).max())


class TestFusedDavidsonInt8:
    def _mat(self, n, seed=20):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
        return a + a.T + np.diag(np.linspace(0.0, 12.0, n))

    @pytest.mark.parametrize("tier,tol,ev_band", [
        ("int8", 5e-2, 5e-2),
        ("int8_precise", 1e-4, 1e-4),
    ])
    def test_tiers_converge(self, tier, tol, ev_band):
        """The quantized tiers drop into from_dense_symmetric and converge
        to their operator floors (the same bands the bf16/split tiers hold,
        TestFromDenseSymmetric.test_tiers_converge)."""
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


class TestFusedLinearInt8:
    @pytest.mark.parametrize("tier,x_band", [
        ("int8", 3e-2),
        ("int8_precise", 2e-4),
    ])
    def test_tiers_solve(self, tier, x_band):
        from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

        n, nrhs = 128, 2
        rng = np.random.default_rng(30)
        a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
        mat = a + a.T + np.diag(np.linspace(3.0, 12.0, n))
        rhs = rng.standard_normal((nrhs, n))
        solver = FusedLinearEquations.from_dense_symmetric(
            mat, nrhs, tier=tier, b=32, convergence_threshold=x_band / 10,
            max_iter=200)
        x, errors, iters = solver.solve(rhs)
        x_ref = np.linalg.solve(mat, rhs.T).T
        err = np.abs(np.asarray(x, np.float64) - x_ref).max() / np.abs(x_ref).max()
        assert err < x_band, (tier, err)


class TestPPCGInt8:
    def test_ppcg_int8_precise_tier(self):
        """FusedPPCG inherits the int8 tiers through its from_dense
        delegation to FusedDavidson — full solve to the two-plane floor."""
        from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

        n, nroots = 192, 3
        rng = np.random.default_rng(50)
        a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
        mat = a + a.T + np.diag(np.linspace(0.0, 15.0, n))
        solver = FusedPPCG.from_dense_symmetric(
            mat, nroots, tier="int8_precise", b=32, rr_every=4,
            convergence_threshold=1e-4, max_iter=400)
        v0 = np.zeros((nroots, n))
        for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
            v0[row, i] = 1.0
        evals, x, errors, iters = solver.run_on_device(v0)
        assert np.max(errors) < 1e-4
        ref = np.linalg.eigvalsh(mat)[:nroots]
        np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-4)
