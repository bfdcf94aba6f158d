"""Shifted response equations (A + sigma_k) x_k = b with block CG.

The static-polarizability / response-function shape: one SPD operator,
several spectral shifts, one right-hand side family. FusedBlockCG solves
all shifted systems SIMULTANEOUSLY in one fused dispatch — the shift lives
in the matvec (rank-row broadcast) and in the per-RHS (nrhs, N) diagonal
the Jacobi preconditioner accepts, so each system is preconditioned with
its own shifted diagonal. One matvec + a handful of row ops per iteration,
converged systems freeze individually.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from iterative_solver_tpu import FusedBlockCG  # noqa: E402

n = 512
shifts = np.array([0.0, 0.5, 1.0, 2.0])
nrhs = len(shifts)

rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
mat = a + a.T + np.diag(np.linspace(1.0, 9.0, n))   # SPD, spectrum > 0
b_vec = rng.standard_normal(n)                       # one perturbation vector
b = np.tile(b_vec, (nrhs, 1))

shifts_j = jnp.asarray(shifts)


def shifted_matvec(x, op):
    # row k of the block sees A + shifts[k]
    return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST) \
        + shifts_j[:, None] * x


# per-RHS diagonals: each system preconditioned with ITS shifted diagonal
diag_rows = np.diag(mat)[None, :] + shifts[:, None]

solver = FusedBlockCG(shifted_matvec, diag_rows, n, nrhs,
                      convergence_threshold=1e-11, max_iter=500,
                      operand=jnp.asarray(mat))
x, errors, iters = solver.solve(b)
print(f"solved {nrhs} shifted systems in {iters} CG iterations, "
      f"max rel residual {np.max(errors):.2e}")

for k, s in enumerate(shifts):
    ref = np.linalg.solve(mat + s * np.eye(n), b_vec)
    err = np.max(np.abs(np.asarray(x)[k] - ref))
    # the response function <b, (A+s)^-1 b> per shift
    resp = float(b_vec @ np.asarray(x)[k])
    print(f"  sigma={s:4.1f}: response={resp:12.6f}  err_vs_direct={err:.2e}")
    assert err < 1e-8

print("response-equations example OK")

# --- NON-SYMMETRIC response: (A + sigma_k) x_k = b where A is NOT
# symmetric (similarity-transformed/CC-like operators). Block CG needs
# SPD; the batched nonsym lineq device loop shares ONE operator across
# the shift batch (operand_axes=(None, 0)) and solves every shifted
# system in a single dispatch. -----------------------------------------
from iterative_solver_tpu import make_batched_nonsym_lineq_solve

mat_ns = mat.copy()
mat_ns[np.tril_indices(n, -1)] *= 0.9  # 0.1-strength skew
b2 = rng.standard_normal((2, n))
B = len(shifts)


def mv_shift(x, op):
    a_, s_ = op
    return jnp.matmul(x, a_.T, precision=jax.lax.Precision.HIGHEST) + s_ * x


diag_b = jnp.asarray(np.stack([np.diag(mat_ns) + s for s in shifts]))
b_b = jnp.asarray(np.broadcast_to(b2, (B, 2, n)))
b_norm = jnp.asarray(np.broadcast_to(np.linalg.norm(b2, axis=1), (B, 2)))
x0_b = jnp.asarray(np.stack([b2 / (np.diag(mat_ns)[None, :] + s)
                             for s in shifts]))
operand = (jnp.asarray(mat_ns), jnp.asarray(shifts))
binit, bsolve = make_batched_nonsym_lineq_solve(mv_shift, 2, 12,
                                                operand_axes=(None, 0))
state = binit(x0_b, operand, b_b)
xb, errsb, best_err, bxb, berrsb, itersb = bsolve(
    *state, operand, diag_b, b_b, b_norm, 1e-10, 200)
print("non-symmetric shifted batch (one dispatch, shared operator):")
for k, s in enumerate(shifts):
    ref = np.linalg.solve(mat_ns + s * np.eye(n), b2.T).T
    rel = (np.linalg.norm(np.asarray(bxb[k], np.float64) - ref)
           / np.linalg.norm(ref))
    print(f"  sigma={s:4.1f}: iters={int(itersb[k]):3d} "
          f"errs={np.asarray(berrsb[k]).max():.2e} rel={rel:.2e}")
    assert rel < 1e-8

print("non-symmetric response OK")
