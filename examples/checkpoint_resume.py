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
