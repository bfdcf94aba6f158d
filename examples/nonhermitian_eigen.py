"""Non-hermitian eigenproblems at production speed.

The reference solves non-hermitian problems through its one Davidson
template (hermiticity option, LinearEigensystemDavidson.h:130-184). Here
the production path is FusedNonSymDavidson with two RR modes:

- rr="host" (default, reference-parity): one jitted device chunk per
  block append, host LAPACK `eig` between chunks (the small nonsym
  eigenproblem has no TPU lowering), conjugate pairs in REAL arithmetic;
- rr="device" (fastest on a tunneled/remote chip): the WHOLE solve as one
  dispatched while_loop — simultaneous Rayleigh-shifted inverse iteration
  replaces the per-append host eig; measured 1.2x the fused symmetric
  wall (docs/PERF.md round-4), against ~100x for a host-driven loop.

Shows: a real-spectrum non-symmetric solve checked against dense eig (in
BOTH modes), a genuinely complex lowest pair, and the multi-RHS
linear-equations twin with its own in-loop projected solve.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import scipy.linalg  # noqa: E402

from iterative_solver_tpu import (  # noqa: E402
    FusedNonSymDavidson,
    FusedNonSymLinearEquations,
)


def matvec(x, op):
    return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)


# --- 1. real-spectrum non-symmetric operator (reference style: the lower
# triangle scaled by 1-strength) -------------------------------------------
n, nroots = 512, 4
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
diag = np.concatenate([np.linspace(-2.0, 0.0, 8), np.linspace(2.0, 20.0, n - 8)])
mat = a + a.T + np.diag(diag)
mat[np.tril_indices(n, -1)] *= 0.8  # strength 0.2

solver = FusedNonSymDavidson.from_dense(mat, nroots, m_max=16,
                                        convergence_threshold=1e-10,
                                        max_iter=80)
v0 = np.zeros((nroots, n))
for row, i in enumerate(np.argsort(diag)[:nroots]):
    v0[row, i] = 1.0
evals, x, errs, it = solver.solve(v0)
ref = np.sort(scipy.linalg.eigvals(mat).real)[:nroots]
print(f"real spectrum: {it} iterations, max residual {errs.max():.2e}")
print(f"  eigenvalues   {np.round(np.sort(evals.real), 8)}")
print(f"  dense eig ref {np.round(ref, 8)}")
assert np.abs(np.sort(evals.real) - ref).max() < 1e-8

# same solve through the single-dispatch device-RR mode
s_dev = FusedNonSymDavidson.from_dense(mat, nroots, m_max=16,
                                       convergence_threshold=1e-10,
                                       max_iter=120, rr="device")
evals_d, _, errs_d, it_d = s_dev.solve(v0)
print(f"device-RR:     {it_d} iterations, max residual {errs_d.max():.2e}")
assert np.abs(np.sort(evals_d.real) - ref).max() < 1e-8

# --- 2. complex conjugate pair as the LOWEST roots ------------------------
m2 = np.diag(np.linspace(5.0, 25.0, n)) + rng.standard_normal((n, n)) * 0.01
m2[0, 0] = m2[1, 1] = 1.0
m2[0, 1], m2[1, 0] = -1.5, 1.5      # eigenvalues 1 +- 1.5i
m2[0, 2:] = m2[1, 2:] = m2[2:, 0] = m2[2:, 1] = 0.0
s2 = FusedNonSymDavidson.from_dense(m2, 3, m_max=16,
                                    convergence_threshold=1e-9, max_iter=80)
v0 = np.zeros((3, n))
for row, i in enumerate(np.argsort(np.diag(m2))[:3]):
    v0[row, i] = 1.0
evals2, x2, errs2, _ = s2.solve(v0)
print(f"complex pair:  eigenvalues {np.round(evals2, 6)} "
      f"(max residual {errs2.max():.2e})")
assert abs(sorted(evals2[:2], key=lambda z: -z.imag)[0] - (1 + 1.5j)) < 1e-7

# --- 3. multi-RHS linear equations with the same operator character -------
b = rng.standard_normal((3, n))
mat_pd = a + a.T + np.diag(np.linspace(1.0, 20.0, n))
mat_pd[np.tril_indices(n, -1)] *= 0.9
lin = FusedNonSymLinearEquations(matvec, np.diag(mat_pd), n, 3, m_max=18,
                                 convergence_threshold=1e-11, max_iter=120,
                                 operand=jnp.asarray(mat_pd))
xs, errs3, it3 = lin.solve(b)
ref_x = np.linalg.solve(mat_pd, b.T).T
rel = np.linalg.norm(np.asarray(xs) - ref_x) / np.linalg.norm(ref_x)
print(f"linear eqs:    {it3} iterations, max rel residual {errs3.max():.2e}, "
      f"|x - dense| / |x| = {rel:.2e}")
assert rel < 1e-9
print("OK")
