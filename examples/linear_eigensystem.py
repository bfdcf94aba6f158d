"""Simple eigensystem example (reference: examples/LinearEigensystemExample.cpp).

Finds the lowest eigenpair of the ExampleProblem matrix
(diag i+1, off-diagonal 0.001*((i+j) % n)).
"""
import jax

# Demo problems are tiny: run on host CPU in f64. (In this sandbox the axon
# plugin force-selects the tunneled TPU at import, so the config update —
# not the JAX_PLATFORMS env var — is what actually switches backends.)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import iterative_solver_tpu as its

n = 100
problem = its.models.ExampleProblem(n)
solver = its.create_linear_eigensystem(n, 1, "Davidson")
solver.set_hermiticity(True)
converged, x, r = solver.solve(np.zeros((1, n)), problem=problem, generate_initial_guess=True)
print("converged:", converged)
print("lowest eigenvalue:", solver.eigenvalues()[0])
print("matvecs:", problem.n_actions, "iterations:", solver.stats.iterations)
