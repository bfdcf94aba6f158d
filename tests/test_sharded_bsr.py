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
