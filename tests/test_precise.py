"""High-precision matvec + hybrid refinement tests.

Accuracy comparisons run in a simulated-f32 regime on CPU (x64 disabled per
array) so they measure exactly what the TPU path would see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.ops.precise import (
    SplitOperator,
    precise_matmat,
    precise_matvec_fn,
    refine_on_host,
)


def make_matrix(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    return a + a.T + np.diag(np.linspace(-2.0, 50.0, n))


class TestSplitMatvec:
    def test_beats_plain_f32(self):
        n = 2048
        matrix = make_matrix(n)
        rng = np.random.default_rng(1)
        x64 = rng.standard_normal((4, n))
        x32 = jnp.asarray(x64, dtype=jnp.float32)
        ref = x64 @ matrix.T

        plain = np.asarray(
            jnp.matmul(x32, jnp.asarray(matrix, dtype=jnp.float32).T,
                       precision=jax.lax.Precision.HIGHEST)
        ).astype(np.float64)
        op = SplitOperator.from_dense(matrix, n_chunks=128)
        precise = np.asarray(precise_matmat(x32, op)).astype(np.float64)

        err_plain = np.abs(plain - ref).max()
        err_precise = np.abs(precise - ref).max()
        assert err_precise < err_plain / 5
        # representation of x32 itself bounds the remaining error
        x_rep = np.abs(x64 - np.asarray(x32, dtype=np.float64)).max() * np.abs(matrix).sum(1).max()
        assert err_precise < max(5e-4, 10 * x_rep)

    def test_matches_exactly_when_exact(self):
        # integer-valued inputs: no representation error, checks the split +
        # compensated accumulation plumbing end-to-end
        n = 512
        rng = np.random.default_rng(2)
        matrix = rng.integers(-3, 4, size=(n, n)).astype(np.float64)
        x = rng.integers(-2, 3, size=(2, n)).astype(np.float64)
        op = SplitOperator.from_dense(matrix, n_chunks=16)
        out = np.asarray(precise_matmat(jnp.asarray(x, dtype=jnp.float32), op))
        np.testing.assert_allclose(out, x @ matrix.T, atol=0)


class TestFusedWithPrecise:
    def test_fused_davidson_precise_operand(self):
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        n = 512
        matrix = make_matrix(n, seed=3)
        op = SplitOperator.from_dense(matrix, n_chunks=16)
        solver = FusedDavidson(
            precise_matvec_fn(op), op.diagonal, n, 2, m_max=16,
            dtype=jnp.float32, convergence_threshold=5e-5, max_iter=100,
            operand=op.operand(),
        )
        v0 = np.zeros((2, n))
        for r, i in enumerate(np.argsort(op.diagonal)[:2]):
            v0[r, i] = 1.0
        evals, x, errors, iters = solver.run(v0)
        ref = np.linalg.eigvalsh(matrix)[:2]
        # f32 storage of vectors still limits, but eigenvalues come out tight
        x64 = np.asarray(x, dtype=np.float64)
        for i in range(2):
            xi = x64[i] / np.linalg.norm(x64[i])
            assert abs(xi @ matrix @ xi - ref[i]) < 1e-7


class TestHybridRefinement:
    def test_tpu_then_host_reaches_reference_band(self):
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        n = 768
        nroots = 3
        matrix = make_matrix(n, seed=4)
        # phase 1: f32 fused solve (simulating the TPU stage)
        mat32 = jnp.asarray(matrix, dtype=jnp.float32)

        def matvec(x, m):
            return jnp.matmul(x, m.T, precision=jax.lax.Precision.HIGHEST)

        fused = FusedDavidson(
            matvec, np.diag(matrix), n, nroots, m_max=20, dtype=jnp.float32,
            convergence_threshold=3e-4, max_iter=200, operand=mat32,
        )
        v0 = np.zeros((nroots, n))
        for r, i in enumerate(np.argsort(np.diag(matrix))[:nroots]):
            v0[r, i] = 1.0
        evals32, x32, errors32, iters32 = fused.run(v0)

        # phase 2: warm-started f64 refinement on the host (pure numpy)
        evals, vectors, info = refine_on_host(matrix, np.asarray(x32), nroots)
        ref = np.linalg.eigvalsh(matrix)[:nroots]
        np.testing.assert_allclose(evals, ref, atol=2e-9)
        assert max(info.errors) <= 1e-8
        # the refinement phase should be cheap relative to a cold start
        assert info.iterations <= 8
