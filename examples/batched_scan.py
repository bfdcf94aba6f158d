"""Batched eigen-solves: a whole parameter scan in ONE device dispatch.

Quantum-chemistry workloads often sweep a geometry/parameter and solve the
same-sized eigenproblem at every point. The reference handles one system
per MPI world; on TPU the entire scan vmaps through the fused while_loop —
the dispatch constant and per-op overheads amortise across the batch and
the batched matvecs keep the MXU fed (measured 5.9x for 8 x n=1024 solves
on one chip)."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from iterative_solver_tpu.solvers.fused_davidson import make_batched_davidson_solve

n, nroots, m_max, npoints = 256, 3, 18, 6
rng = np.random.default_rng(0)
base = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
base = base + base.T

# the "scan": a coupling strength lambda sweeping 0.2 .. 1.2
lams = np.linspace(0.2, 1.2, npoints)
mats = np.stack([lam * base + np.diag(np.linspace(0.0, 12.0, n)) for lam in lams])
diags = np.stack([np.diag(m) for m in mats])


def matvec(x, op):
    return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)


binit, bsolve = make_batched_davidson_solve(matvec, nroots, m_max)
v0 = np.zeros((npoints, nroots, n))
for p in range(npoints):
    for row, i in enumerate(np.argsort(diags[p])[:nroots]):
        v0[p, row, i] = 1.0

states = binit(jnp.asarray(v0), jnp.asarray(mats))
final, iters = bsolve(states, jnp.asarray(mats), jnp.asarray(diags), 1e-9, 800)

for p in range(npoints):
    ref = np.linalg.eigvalsh(mats[p])[:nroots]
    err = np.abs(np.sort(np.asarray(final.evals[p])) - ref).max()
    assert np.asarray(final.errors[p]).max() < 1e-9, (p, "not converged")
    assert err < 1e-8, (p, err)
    print(f"lambda={lams[p]:.2f}: iters={int(iters[p]):3d} "
          f"E0..E{nroots-1} = {np.sort(np.asarray(final.evals[p]))}")
print("scan complete: every point converged in one dispatch")

# --- the NON-HERMITIAN scan: same economics, only possible on the
# device-RR tier (the host-eig chunked path cannot vmap its per-append
# LAPACK stage). Restarts hoist to sweep boundaries; the per-element host
# eig runs once, in the batch finalize. ---------------------------------
from iterative_solver_tpu.solvers.fused_nonsym import (
    finalize_nonsym_batch,
    make_batched_nonsym_solve,
)

mats_ns = mats.copy()
for p in range(npoints):
    mats_ns[p][np.tril_indices(n, -1)] *= 0.9  # strength-0.1 skew
diags_ns = np.stack([np.diag(m) for m in mats_ns])

binit_ns, bsolve_ns = make_batched_nonsym_solve(matvec, nroots, m_max)
state = binit_ns(jnp.asarray(v0), jnp.asarray(mats_ns))
x, errs, best_err, bx, bG, bR, iters_ns = bsolve_ns(
    *state, jnp.asarray(mats_ns), jnp.asarray(diags_ns), 1e-9, 800)
evals_ns, x_rot, errors_ns = finalize_nonsym_batch(bx, bG, bR)

import scipy.linalg

for p in range(npoints):
    w = scipy.linalg.eigvals(mats_ns[p])
    ref = np.sort(w.real)[:nroots]
    ev = np.sort(np.asarray(evals_ns[p]).real)
    assert np.max(errors_ns[p]) < 1e-8, (p, "not converged")
    assert np.abs(ev - ref[: len(ev)]).max() < 1e-8, p
    print(f"lambda={lams[p]:.2f} (nonsym): iters={int(iters_ns[p]):3d} "
          f"Re E = {np.round(ev, 8)}")
print("non-hermitian scan: every point converged in one dispatch")
