"""Packed-triangle symmetric action: the flagship dense-operator path.

A symmetric operator's tile (i, j) carries both y_i += x_j A_ij^T and
y_j += x_i A_ij, so streaming only the lower triangle halves the HBM
traffic of the matvec — the capability the reference exploits only on its
subspace tier (XSpace.h:51-64) pushed down to the O(N^2) tier where the
bandwidth lives. Three storage tiers trade accuracy for MXU passes:

- f32 tiles + HIGHEST dots: exact-f32 semantics;
- bf16 tiles + single-pass dots: ~2^-8 operator, fastest (the bench's
  fast tier: 105 us for an 8192^2 action on one v5e);
- split double-bf16 (hi+lo) tiles: ~2^-16 operator at f32 bytes, and the
  per-tile f32 accumulator acts as split-K, flooring residuals ~50x below
  a plain dense matmul.

On CPU this demo uses the portable XLA path / interpret-mode kernels; on a
TPU the same calls hit the Pallas kernels.
"""
import os

import jax

if os.environ.get("ITS_EXAMPLE_TPU") != "1":
    # demo default: CPU portable/interpret paths. Set ITS_EXAMPLE_TPU=1 on a
    # TPU host to exercise the Pallas kernels instead.
    jax.config.update("jax_platforms", "cpu")

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses

import jax.numpy as jnp
import numpy as np

from iterative_solver_tpu.ops.kernels.symm_pallas import (
    SymmetricBlocked,
    SymmetricBlockedSplit,
    symm_matmat,
    symm_matmat_split_pallas,
)
from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

n, b, nroots = 512, 64, 4
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
matrix = a + a.T + np.diag(np.concatenate([
    np.linspace(-2.0, 1.0, 16), np.linspace(3.0, 40.0, n - 16)]))
diag = np.diag(matrix)
on_tpu = jax.default_backend() == "tpu"

# ---- f32 packed tier (portable XLA path; Pallas on TPU) ----
sym = SymmetricBlocked.from_dense(matrix, b=b, dtype=jnp.float32)


def matvec_f32(x, op):
    s = dataclasses.replace(sym, values=op[0], ii=op[1], jj=op[2])
    if on_tpu:
        from iterative_solver_tpu.ops.kernels.symm_pallas import symm_matmat_pallas

        return symm_matmat_pallas(x.astype(jnp.float32), s).astype(x.dtype)
    return symm_matmat(x.astype(jnp.float32), s).astype(x.dtype)


solver = FusedDavidson(
    matvec_f32, diag, n, nroots, m_max=4 * nroots, dtype=jnp.float32,
    convergence_threshold=2e-4, max_iter=100,
    operand=(sym.values, sym.ii, sym.jj),
    rr="window",  # 2r x 2r Rayleigh-Ritz: the small eigh dominates on TPU
)
v0 = np.zeros((nroots, n))
for r, i in enumerate(np.argsort(diag)[:nroots]):
    v0[r, i] = 1.0
evals, x, errors, iters = solver.run_on_device(v0)
ref = np.linalg.eigvalsh(matrix)[:nroots]
print(f"f32 packed + window RR: {iters} iterations, residuals {errors}")
print("  eigenvalue error:", np.abs(np.sort(np.asarray(evals)) - ref).max())

# ---- split double-bf16 tier: f32-bytes storage, 1-pass dots, split-K ----
syms = SymmetricBlockedSplit.from_dense(matrix, b=b)


def matvec_split(x, op):
    s = dataclasses.replace(syms, hi=op[0], lo=op[1], ii=op[2], jj=op[3])
    return symm_matmat_split_pallas(
        x.astype(jnp.float32), s, interpret=not on_tpu
    ).astype(x.dtype)


solver2 = FusedDavidson(
    matvec_split, diag, n, nroots, m_max=4 * nroots, dtype=jnp.float32,
    convergence_threshold=2e-4, max_iter=100,
    operand=(syms.hi, syms.lo, syms.ii, syms.jj),
)
evals2, x2, errors2, iters2 = solver2.run_on_device(v0)
x64 = np.asarray(x2, dtype=np.float64)
res = max(
    np.linalg.norm(matrix @ (xi / np.linalg.norm(xi))
                   - ((xi / np.linalg.norm(xi)) @ matrix @ (xi / np.linalg.norm(xi)))
                   * (xi / np.linalg.norm(xi)))
    for xi in x64[:nroots]
)
print(f"split double-bf16: {iters2} iterations, true f64 residual {res:.2e}")
print("  eigenvalue error:", np.abs(np.sort(np.asarray(evals2)) - ref).max())
