"""Mesh-sharded packed-triangle symmetric action (parallel/sharded_symm.py).

Runs on the conftest-provided 8-virtual-device CPU mesh — the stand-in for
the reference's `mpiexec -n 2` parallel suite (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.ops.kernels.symm_pallas import SymmetricBlocked
from iterative_solver_tpu.parallel import make_mesh
from iterative_solver_tpu.parallel.sharded_symm import ShardedSymmetric


def _problem(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    return a + a.T + np.diag(np.linspace(1.0, 20.0, n))


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_matches_dense(ndev):
    n, b = 256, 32
    mat = _problem(n)
    mesh = make_mesh(jax.devices()[:ndev])
    sym = SymmetricBlocked.from_dense(mat, b=b)
    ssym = ShardedSymmetric.from_symmetric(sym, mesh)
    matvec, op = ssym.matvec_fn()
    x = np.random.default_rng(1).standard_normal((3, n))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, ssym.axis)))
    y = np.asarray(jax.jit(matvec)(xs, op))
    np.testing.assert_allclose(y, x @ mat, rtol=0, atol=1e-10)


def test_sharded_output_sharding():
    n, b, ndev = 128, 16, 8
    mat = _problem(n, seed=2)
    mesh = make_mesh(jax.devices()[:ndev])
    ssym = ShardedSymmetric.from_symmetric(SymmetricBlocked.from_dense(mat, b=b), mesh)
    matvec, op = ssym.matvec_fn()
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(
        jnp.asarray(np.random.default_rng(3).standard_normal((2, n))),
        NamedSharding(mesh, P(None, ssym.axis)),
    )
    y = jax.jit(matvec)(xs, op)
    # output keeps the canonical (replicated rows, sharded vector) layout
    assert y.sharding.spec == P(None, ssym.axis)


def test_rejects_indivisible_dimension():
    mesh = make_mesh(jax.devices()[:8])
    mat = _problem(96)  # 96 blocks of 32 -> n=96 not divisible by 8... it is (12)
    sym = SymmetricBlocked.from_dense(_problem(100), b=25)  # n=100, 8 devices
    with pytest.raises(ValueError):
        ShardedSymmetric.from_symmetric(sym, mesh)


def test_sharded_fused_davidson_converges():
    """End-to-end: fused Davidson whose action is the mesh-sharded packed
    kernel; eigenvalues must match the dense reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    n, b, nroots, ndev = 256, 32, 3, 8
    mat = _problem(n, seed=4)
    mesh = make_mesh(jax.devices()[:ndev])
    ssym = ShardedSymmetric.from_symmetric(SymmetricBlocked.from_dense(mat, b=b), mesh)
    matvec, op = ssym.matvec_fn()
    solver = FusedDavidson(
        matvec, np.diag(mat), n, nroots, m_max=6 * nroots,
        sharding=NamedSharding(mesh, P(None, ssym.axis)),
        convergence_threshold=1e-9, max_iter=200, operand=op,
    )
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    evals, x, errors, iters = solver.run(v0)
    assert np.max(errors) < 1e-9
    ref = np.linalg.eigvalsh(mat)[:nroots]
    np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-8)


def test_sharded_split_tier_matches_dense():
    """Precise (double-bf16) tier sharded over the mesh: ~2^-16 accuracy."""
    from iterative_solver_tpu.ops.kernels.symm_pallas import SymmetricBlockedSplit
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, b, ndev = 256, 32, 8
    mat = _problem(n, seed=5)
    mesh = make_mesh(jax.devices()[:ndev])
    ssym = ShardedSymmetric.from_split(SymmetricBlockedSplit.from_dense(mat, b=b), mesh)
    matvec, op = ssym.matvec_fn()
    x = np.random.default_rng(6).standard_normal((3, n)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, ssym.axis)))
    y = np.asarray(jax.jit(matvec)(xs, op), dtype=np.float64)
    ref = x.astype(np.float64) @ mat
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel


# ---------------------------------------------------------------------------
# int8 quantized tiers over the mesh (ops/kernels/symm_int8.py)


@pytest.mark.parametrize("ndev,two_plane", [(4, False), (8, False), (8, True)])
def test_sharded_int8_matches_single_device(ndev, two_plane):
    """The sharded int8 action must reproduce the single-device quantized
    action exactly up to f32 reduction order: same planes, same x
    quantization on every device, exact int32 partials."""
    from iterative_solver_tpu.ops.kernels.symm_int8 import (
        SymmetricBlockedInt8,
        SymmetricBlockedInt8Split,
        symm_matmat_int8,
        symm_matmat_int8_split,
    )

    n, b = 256, 32
    mat = _problem(n, seed=10)
    mesh = make_mesh(jax.devices()[:ndev])
    if two_plane:
        sym = SymmetricBlockedInt8Split.from_dense(mat, b=b)
    else:
        sym = SymmetricBlockedInt8.from_dense(mat, b=b)
    ssym = ShardedSymmetric.from_int8(sym, mesh)
    matvec, op = ssym.matvec_fn()
    x = np.random.default_rng(11).standard_normal((3, n)).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, ssym.axis)))
    y = np.asarray(jax.jit(matvec)(xs, op), dtype=np.float64)
    xj = jnp.asarray(x)
    y_ref = np.asarray(
        symm_matmat_int8_split(xj, sym) if two_plane else symm_matmat_int8(xj, sym),
        dtype=np.float64,
    )
    np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-6 * np.abs(y_ref).max())
    # and the quantized action itself is in its accuracy class vs dense f64
    dense = x.astype(np.float64) @ mat
    tol = 2e-4 if two_plane else 3e-2
    assert np.abs(y - dense).max() / np.abs(dense).max() < tol


def test_sharded_int8_output_sharding_and_diag_once():
    """Output keeps the canonical sharding; the exact diagonal is counted
    exactly once (a purely diagonal operator reproduces x*d exactly)."""
    from iterative_solver_tpu.ops.kernels.symm_int8 import SymmetricBlockedInt8

    n, b, ndev = 128, 16, 8
    d = np.linspace(-2.0, 30.0, n)
    mesh = make_mesh(jax.devices()[:ndev])
    sym = SymmetricBlockedInt8.from_dense(np.diag(d), b=b)
    ssym = ShardedSymmetric.from_int8(sym, mesh)
    matvec, op = ssym.matvec_fn()
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = np.random.default_rng(12).standard_normal((2, n)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, ssym.axis)))
    y = jax.jit(matvec)(xs, op)
    assert y.sharding.spec == P(None, ssym.axis)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), x.astype(np.float64) * d, rtol=2e-6)


def test_sharded_int8_fused_davidson_converges():
    """End to end: FusedDavidson over the sharded int8_precise action on
    the 8-device mesh reaches the two-plane floor."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iterative_solver_tpu.ops.kernels.symm_int8 import SymmetricBlockedInt8Split
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    n, b, nroots = 256, 32, 3
    mat = _problem(n, seed=13)
    mesh = make_mesh(jax.devices()[:8])
    sym = SymmetricBlockedInt8Split.from_dense(mat, b=b)
    ssym = ShardedSymmetric.from_int8(sym, mesh)
    matvec, op = ssym.matvec_fn()
    sharding = NamedSharding(mesh, P(None, ssym.axis))
    solver = FusedDavidson(
        matvec, np.diag(mat), n, nroots, m_max=24, dtype=jnp.float32,
        convergence_threshold=1e-4, max_iter=200, operand=op, sharding=sharding,
    )
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    evals, x, errors, iters = solver.run_on_device(v0)
    assert np.max(errors) < 1e-4
    ref = np.linalg.eigvalsh(mat)[:nroots]
    np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-4)
