"""Multi-root Davidson with a P-space model (reference:
examples/LinearEigensystemMultirootExample.cpp + P-space Fortran examples)."""
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
from iterative_solver_tpu.models import load_hamiltonian

matrix = load_hamiltonian("/root/reference/examples/bh.hamiltonian")
n = matrix.shape[0]
nroot = 4
problem = its.models.MatrixProblem(matrix)
solver = its.create_linear_eigensystem(n, nroot, "Davidson", "max_size_qspace=12,max_p=6")
solver.set_hermiticity(True)
converged, *_ = solver.solve(np.zeros((nroot, n)), problem=problem, generate_initial_guess=True)
print("converged:", converged)
print("eigenvalues:", solver.eigenvalues()[:nroot])
print("P-space size:", solver.xspace.dimensions.nP)
print(solver.stats)
