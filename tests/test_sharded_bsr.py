"""Distributed block-sparse action + distributed sparse Davidson on the
8-device virtual mesh — the phenol-scale configuration (BASELINE.md item 5)
with a synthetic FCI operator standing in for the stripped data file."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr, synthetic_fci_dense
from iterative_solver_tpu.ops.kernels import BSRMatrix, bsr_matmat
from iterative_solver_tpu.parallel import block_sharding, make_mesh
from iterative_solver_tpu.parallel.sharded_bsr import ShardedBSR
from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson


def test_sharded_action_matches_dense():
    mesh = make_mesh()
    bsr, dense = synthetic_fci_bsr(512, block=16, seed=1)
    sbsr = ShardedBSR.from_bsr(bsr, mesh)
    matvec, operand = sbsr.matvec_fn()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 512))
    xd = jax.device_put(jnp.asarray(x), block_sharding(mesh))
    y = np.asarray(jax.jit(matvec)(xd, operand))
    np.testing.assert_allclose(y, x @ dense.T, atol=1e-10)


def test_sharded_action_uneven_row_blocks():
    """Row-block count not divisible by the mesh: padded row range stays zero."""
    mesh = make_mesh()
    bsr, dense = synthetic_fci_bsr(336, block=16, seed=2)
    assert (336 // 16) % 8 != 0
    sbsr = ShardedBSR.from_bsr(bsr, mesh)
    matvec, operand = sbsr.matvec_fn()
    n_pad = sbsr.n
    rng = np.random.default_rng(1)
    x = np.zeros((2, n_pad))
    x[:, :336] = rng.standard_normal((2, 336))
    xd = jax.device_put(jnp.asarray(x), block_sharding(mesh))
    y = np.asarray(jax.jit(matvec)(xd, operand))
    np.testing.assert_allclose(y[:, :336], x[:, :336] @ dense.T, atol=1e-10)
    np.testing.assert_allclose(y[:, 336:], 0.0, atol=1e-12)


def test_distributed_sparse_davidson():
    """Multi-root Davidson, row-sharded sparse operator, 8 devices."""
    mesh = make_mesh()
    n = 1024
    bsr, dense = synthetic_fci_bsr(n, block=32, seed=3)
    sbsr = ShardedBSR.from_bsr(bsr, mesh)
    matvec, operand = sbsr.matvec_fn()
    nroots = 4
    solver = FusedDavidson(
        matvec,
        np.asarray(sbsr.diagonal),
        sbsr.n,
        nroots,
        m_max=24,
        sharding=block_sharding(mesh),
        operand=operand,
        max_iter=100,
    )
    v0 = np.zeros((nroots, sbsr.n))
    diag = np.asarray(sbsr.diagonal)
    for r, i in enumerate(np.argsort(diag[:n])[:nroots]):
        v0[r, i] = 1.0
    evals, x, errors, iters = solver.run_on_device(v0)
    ref = np.linalg.eigvalsh(dense)[:nroots]
    np.testing.assert_allclose(evals, ref, atol=1e-8)
    assert np.all(errors <= 1e-8)


def test_synthetic_generator_properties():
    dense = synthetic_fci_dense(256, seed=0)
    np.testing.assert_allclose(dense, dense.T)
    bsr, dense2 = synthetic_fci_bsr(256, block=16)
    np.testing.assert_allclose(dense2, dense2.T, atol=1e-14)
    assert bsr.n_blocks < (256 // 16) ** 2  # genuinely sparse
    x = np.random.default_rng(0).standard_normal((2, 256))
    np.testing.assert_allclose(
        np.asarray(bsr_matmat(jnp.asarray(x), bsr)), x @ dense2.T, atol=1e-10
    )


class TestShardedBSRInt8:
    def _setup(self, n=1024, block=128, seed=3):
        import os
        import sys
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from benchmarks.phenol_scale import synthetic_int8_bsr_direct
        from iterative_solver_tpu.parallel.sharded_bsr import ShardedBSRInt8
        from iterative_solver_tpu.parallel.mesh import make_mesh

        bsr_q, diag, s = synthetic_int8_bsr_direct(n, block=block, n_low=16,
                                                   seed=seed)
        mesh = make_mesh()
        sq = ShardedBSRInt8.from_int8(bsr_q, mesh)
        return bsr_q, diag, s, sq, mesh

    def test_matches_unsharded_int8_action(self):
        """Sharded int8 action == single-device bsr_matmat_int8 exactly up
        to activation-quantization determinism (same global row scales)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from benchmarks.phenol_scale import make_device_int8_matvec

        n = 1024
        bsr_q, diag, s, sq, mesh = self._setup(n)
        x = np.random.default_rng(0).standard_normal((4, n))

        mv_ref = make_device_int8_matvec(bsr_q.bm, bsr_q.bn, n // bsr_q.bm)
        op_ref = (jnp.asarray(bsr_q.q), jnp.asarray(bsr_q.rq),
                  jnp.asarray(bsr_q.cq), jnp.asarray(bsr_q.diagonal),
                  jnp.asarray(bsr_q.col_idx), jnp.asarray(bsr_q.row_idx))
        want = np.asarray(mv_ref(jnp.asarray(x, jnp.float32), op_ref),
                          dtype=np.float64)

        mv, operand = sq.matvec_fn()
        xs = jax.device_put(jnp.asarray(x, jnp.float32),
                            NamedSharding(mesh, P(None, "data")))
        got = np.asarray(mv(xs, operand), dtype=np.float64)
        # same int8 operator, same global activation scale -> identical
        # int32 accumulation; only f32 dequant rounding differs
        np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())

    def test_matches_exact_f64_within_activation_error(self):
        from benchmarks.phenol_scale import host_f64_action
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = 1024
        bsr_q, diag, s, sq, mesh = self._setup(n, seed=5)
        x = np.random.default_rng(1).standard_normal((4, n))
        want = host_f64_action(bsr_q, diag, s)(x)
        mv, operand = sq.matvec_fn()
        xs = jax.device_put(jnp.asarray(x, jnp.float32),
                            NamedSharding(mesh, P(None, "data")))
        got = np.asarray(mv(xs, operand), dtype=np.float64)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 2e-4 * max(scale, 1.0)

    def test_fused_davidson_over_sharded_int8(self):
        """Whole fused solve through the sharded quantized sparse action."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        n, nroots = 1024, 4
        bsr_q, diag, s, sq, mesh = self._setup(n, seed=7)
        mv, operand = sq.matvec_fn()
        solver = FusedDavidson(
            mv, diag, n, nroots, m_max=16,
            sharding=NamedSharding(mesh, P(None, "data")), operand=operand,
            convergence_threshold=5e-4, max_iter=80, dtype=jnp.float32,
            check_symmetric=True,
        )
        v0 = np.zeros((nroots, n))
        for row, i in enumerate(np.argsort(diag)[:nroots]):
            v0[row, i] = 1.0
        evals, x, errs, it = solver.run_on_device(v0)
        assert np.all(np.asarray(errs) <= 5e-4), errs
        # eigenvalues vs the dense f64 reconstruction of the SAME operator
        from test_phenol_scale import dense_from_int8_bsr

        dense = dense_from_int8_bsr(bsr_q, diag, s)
        ref = np.linalg.eigvalsh(dense)[:nroots]
        assert np.abs(np.asarray(evals) - ref).max() <= 5e-3
