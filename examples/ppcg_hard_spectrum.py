"""PPCG vs Davidson window modes on a weakly diagonally dominant operator.

The Davidson families' window RR modes are cheap per iteration but lean on
Jacobi preconditioning; on spectra with weak diagonal dominance they stall.
FusedPPCG (per-root 3x3 Rayleigh-Ritz + conjugate momentum + periodic full
RR, arXiv:1407.7506) keeps the 3-term recurrence that powers LOBPCG-grade
convergence at a per-iteration cost BELOW the window modes (no per-step
eigh at all).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from iterative_solver_tpu import FusedPPCG  # noqa: E402
from iterative_solver_tpu.solvers.fused_davidson import (  # noqa: E402
    make_davidson_init,
    make_davidson_solve,
)

n, nroots, tol = 768, 8, 1e-9
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)) * (0.4 / np.sqrt(n))  # weak dominance
mat = a + a.T + np.diag(np.linspace(0.0, 6.0, n))
mj = jnp.asarray(mat)
ref = np.linalg.eigvalsh(mat)[:nroots]

v0 = np.zeros((nroots, n))
for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
    v0[row, i] = 1.0

t0 = time.perf_counter()
ppcg = FusedPPCG(lambda x, op: jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST),
                 np.diag(mat), n, nroots, rr_every=5,
                 convergence_threshold=tol, max_iter=500, operand=mj)
evals, x, errors, it_ppcg = ppcg.run(v0)
print(f"PPCG:            {it_ppcg:4d} iterations ({time.perf_counter()-t0:.2f} s), "
      f"eig err {np.max(np.abs(evals - ref)):.1e}")
assert np.max(np.abs(evals - ref)) < 1e-8

for rr in ("window", "window3", "full"):
    matvec = lambda x, op: jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)
    init = make_davidson_init(matvec, nroots, 4 * nroots)
    solve = make_davidson_solve(matvec, nroots, 4 * nroots, rr=rr)
    t0 = time.perf_counter()
    final, iters = solve(init(jnp.asarray(v0), mj), mj, jnp.diagonal(mj), tol, 500)
    print(f"Davidson {rr:8s}{int(iters):4d} iterations ({time.perf_counter()-t0:.2f} s), "
          f"max resid {float(jnp.max(final.errors)):.1e}")

assert it_ppcg < 200
print("PPCG hard-spectrum example OK")
