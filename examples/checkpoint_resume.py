"""Checkpoint/resume: interrupt a Davidson run, save the solver state to one
.npz, restore in a 'new process', and finish the solve."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import iterative_solver_tpu as its
from iterative_solver_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

n = 200
problem = its.models.ExampleProblem(n)
matrix = np.asarray(problem.matrix, dtype=np.float64)
solver = its.create_linear_eigensystem(n, 2, "Davidson")
solver.set_hermiticity(True)
solver.verbosity = its.Verbosity.NONE

# run three iterations, then "preemption"
params = jnp.zeros((2, n)).at[0, 0].set(1.0).at[1, 1].set(1.0)
actions = jnp.zeros((2, n))
nwork = 2
for _ in range(3):
    actions = problem.action(params[:nwork])
    nwork, params, actions = solver.add_vector(params, actions)
    while solver.end_iteration_needed:
        if nwork > 0:
            actions = problem.precondition(actions[:nwork],
                                           solver.working_set_eigenvalues()[:nwork],
                                           problem.diagonals())
        nwork, params, actions = solver.end_iteration(params, actions)
print("interrupted with errors:", [f"{e:.1e}" for e in solver.errors])
save_checkpoint(solver, "/tmp/davidson_ckpt.npz")

# ... new process ...
resumed = load_checkpoint("/tmp/davidson_ckpt.npz")
p2 = jnp.asarray(np.asarray(resumed.solution_params([0, 1])))
conv, *_ = resumed.solve(np.asarray(p2), problem=problem)
print("resumed and converged:", conv)
print("eigenvalues:", resumed.eigenvalues()[:2], "vs dense", np.linalg.eigvalsh(matrix)[:2])

# --- the NON-HERMITIAN device tier checkpoints MID-SOLVE (round 4): the
# single-dispatch while_loop state persists between chunks; resume()
# continues at the identical total iteration count an uninterrupted run
# would take. ------------------------------------------------------------
import scipy.linalg

from iterative_solver_tpu import FusedNonSymDavidson

mns = matrix.copy()
mns[np.tril_indices(n, -1)] *= 0.9
v0 = np.zeros((2, n))
for r_, i in enumerate(np.argsort(np.diag(mns))[:2]):
    v0[r_, i] = 1.0
interrupted = FusedNonSymDavidson.from_dense(
    mns, 2, convergence_threshold=1e-9, max_iter=4, chunk_iters=2,
    rr="device", m_max=12)
_, _, errs_i, it_i = interrupted.solve(
    v0, checkpoint_path="/tmp/nonsym_ckpt.h5")
print(f"nonsym interrupted at iteration {it_i}, "
      f"residual {errs_i.max():.1e}")
fresh = FusedNonSymDavidson.from_dense(
    mns, 2, convergence_threshold=1e-9, max_iter=200, rr="device", m_max=12)
evals, x, errs, it = fresh.resume("/tmp/nonsym_ckpt.h5")
ref = np.sort(scipy.linalg.eigvals(mns).real)[:2]
print(f"nonsym resumed to iteration {it}, residual {errs.max():.1e}, "
      f"eigenvalue error "
      f"{np.max(np.abs(np.sort(np.asarray(evals).real) - ref[:len(evals)])):.1e}")
assert errs.max() <= 1e-9
