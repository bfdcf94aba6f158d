"""Direct-generated packed int8 operator (models/synthetic_fci.py:
synthetic_packed_int8) — the bench's n=32768 flagship operator is built
this way (no dense f64 intermediate; the dense build costs ~10 min of host
time and cannot fit the driver's bench wall).

Pins: the implied dense operator is exactly symmetric, the packed matvec
matches the implied dense action to the activation-quantization class, and
the layout is identical to what from_dense produces (same kernel runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_solver_tpu.models.synthetic_fci import (
    implied_dense_int8 as implied_dense,
    synthetic_packed_int8,
)
from iterative_solver_tpu.ops.kernels.symm_int8 import symm_matmat_int8


@pytest.fixture(scope="module")
def small():
    sym, diag = synthetic_packed_int8(512, b=128, seed=3)
    return sym, diag, implied_dense(sym, diag)


def test_implied_operator_symmetric(small):
    _, _, a = small
    np.testing.assert_array_equal(a, a.T)


def test_matvec_matches_implied_dense(small):
    sym, diag, a = small
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float64)
    y = np.asarray(symm_matmat_int8(x, sym), dtype=np.float64)
    y_ref = np.asarray(x, np.float64) @ a.T
    # activation quantization (~1/254 relative on the off-diagonal part)
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() <= 2e-2 * scale


def test_spectrum_class(small):
    """The low diagonal entries dominate: the lowest eigenvalues track
    linspace(-2, 3, 64)'s head to within the coupling radius."""
    _, diag, a = small
    evals = np.linalg.eigvalsh(a)
    lows = np.sort(diag)[:8]
    assert np.abs(evals[:8] - lows).max() < 0.5


def test_guard_non_multiple():
    with pytest.raises(ValueError, match="multiple"):
        synthetic_packed_int8(500, b=128)


def test_solve_through_fused_davidson():
    """End-to-end: the direct operator drives a fused solve to its int8
    screening floor (same path as the bench flagship leg)."""
    from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

    sym, diag = synthetic_packed_int8(512, b=128, seed=1)
    a = implied_dense(sym, diag)
    op = (sym.q, sym.gq, sym.diagonal, sym.ii, sym.jj)

    import dataclasses

    def matvec(x, t):
        s = dataclasses.replace(sym, q=t[0], gq=t[1], diagonal=t[2],
                                ii=t[3], jj=t[4])
        return symm_matmat_int8(x, s).astype(x.dtype)

    r = 8
    ppcg = FusedPPCG(matvec, diag, 512, r, rr_every=8,
                     convergence_threshold=5e-3, max_iter=300, operand=op)
    v0 = np.zeros((r, 512))
    for row, i in enumerate(np.argsort(diag)[:r]):
        v0[row, i] = 1.0
    st = ppcg.init_state(v0)
    fin, it = ppcg._solve(st, op, ppcg.diag, 5e-3, 300)
    errs = np.asarray(fin.errors)
    assert errs.max() <= 5e-3, errs
    ref = np.linalg.eigvalsh(a)[:r]
    evals = np.sort(np.asarray(fin.evals))
    # activation quantization bounds the eigenvalue accuracy here, not
    # the solver: the screening-class bar
    assert np.abs(evals - ref).max() <= 5e-2


def test_direct_operator_shards_and_solves(eight_devices_mesh=None):
    """The flagship composition: direct int8 generation -> mesh-sharded
    packed action (int8 halo, exact int32 partials) -> PPCG whole solve.
    This is exactly the bench's n32768 leg shape at toy size."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from iterative_solver_tpu.parallel.sharded_symm import ShardedSymmetric
    from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    n, r = 1024, 8
    sym, diag = synthetic_packed_int8(n, b=128, seed=2)
    ssym = ShardedSymmetric.from_int8(sym, mesh)
    mv, op = ssym.matvec_fn()
    ppcg = FusedPPCG(mv, diag, n, r, rr_every=8, dtype=jnp.float32,
                     sharding=NamedSharding(mesh, P(None, "data")),
                     convergence_threshold=5e-3, max_iter=300, operand=op)
    v0 = np.zeros((r, n))
    for row, i in enumerate(np.argsort(diag)[:r]):
        v0[row, i] = 1.0
    st = ppcg.init_state(v0)
    fin, it = ppcg._solve(st, op, ppcg.diag, 5e-3, 300)
    errs = np.asarray(fin.errors)
    assert errs.max() <= 5e-3, errs
    # against the single-device implied dense operator
    a = implied_dense(sym, diag)
    ref = np.linalg.eigvalsh(a)[:r]
    evals = np.sort(np.asarray(fin.evals))
    assert np.abs(evals - ref).max() <= 5e-2
