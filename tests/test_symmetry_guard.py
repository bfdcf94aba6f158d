"""Non-hermitian guard on the fused families (VERDICT r1 #10).

The fused solvers are symmetric-only by design; the reference handles
non-hermitian problems through its Davidson path
(LinearEigensystemDavidson.h:130-184), mirrored here by the parity solvers.
These tests pin that a non-symmetric operator raises immediately with a
pointer to the parity solver, that symmetric operators (including per-RHS
shifted row-wise ones) pass, and that the guard can be disabled.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.fused_cg import FusedBlockCG
from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson
from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations
from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

N = 48


def _nonsym():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N))
    a = a + 0.3 * rng.standard_normal((N, N))  # clearly non-symmetric
    return jnp.asarray(a)


def _sym():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((N, N))
    a = (a + a.T) / 2 + np.diag(np.arange(N, dtype=float))
    return jnp.asarray(a)


def _matvec(v, op):
    return jnp.matmul(v, op.T)


def test_fused_davidson_rejects_nonsymmetric():
    a = _nonsym()
    solver = FusedDavidson(_matvec, np.diag(np.asarray(a)), N, nroots=2,
                           operand=a)
    with pytest.raises(ValueError, match="symmetric"):
        solver.init_state(np.eye(N)[:2])


def test_fused_davidson_guard_disable_and_symmetric_pass():
    a = _sym()
    d = np.diag(np.asarray(a))
    # symmetric operator passes the guard
    FusedDavidson(_matvec, d, N, nroots=2, operand=a).init_state(np.eye(N)[:2])
    # guard off: non-symmetric operator no longer raises at init
    s = FusedDavidson(_matvec, d, N, nroots=2, operand=_nonsym(),
                      check_symmetric=False)
    s.init_state(np.eye(N)[:2])


def test_fused_ppcg_rejects_nonsymmetric():
    a = _nonsym()
    solver = FusedPPCG(_matvec, np.diag(np.asarray(a)), N, nroots=2, operand=a)
    with pytest.raises(ValueError, match="symmetric"):
        solver.init_state(np.eye(N)[:2])


def test_fused_linear_rejects_nonsymmetric():
    a = _nonsym()
    solver = FusedLinearEquations(_matvec, np.diag(np.asarray(a)), N, nrhs=2,
                                  operand=a)
    with pytest.raises(ValueError, match="symmetric"):
        solver.solve(np.eye(N)[:2])


def test_fused_cg_rejects_nonsymmetric():
    a = _nonsym()
    solver = FusedBlockCG(_matvec, np.abs(np.diag(np.asarray(a))) + 1.0, N,
                          nrhs=2, operand=a)
    with pytest.raises(ValueError, match="symmetric"):
        solver.solve(np.eye(N)[:2])


def test_fused_cg_shifted_rowwise_operator_passes():
    # the response-equation form: row i sees A - sigma_i I — per-row
    # symmetric, so the probe must NOT flag it. A kept SPD after the shift.
    rng = np.random.default_rng(2)
    s = rng.standard_normal((N, N))
    a = jnp.asarray(0.05 * (s + s.T) + np.diag(np.linspace(2.0, 10.0, N)))
    sigmas = jnp.asarray([0.1, 0.7])

    def shifted(v, op):
        return jnp.matmul(v, op.T) - sigmas[:, None] * v

    d = np.diag(np.asarray(a))[None, :] - np.asarray(sigmas)[:, None]
    solver = FusedBlockCG(shifted, np.abs(d) + 1.0, N, nrhs=2, operand=a,
                          convergence_threshold=1e-10)
    b = np.asarray(np.eye(N)[:2])
    x, errors, iters = solver.solve(b)
    assert np.all(errors <= 1e-10)
