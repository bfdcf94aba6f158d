"""DIIS nonlinear equations (reference: examples/NonLinearEquationsExample.cpp)."""
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

n = 30
problem = its.models.TrigNonlinearProblem(n)
solver = its.create_nonlinear_equations(n, "DIIS", "max_size_qspace=8")
converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
value, res = problem.residual(np.asarray(x)[0])
print("converged:", converged, " |residual|:", float(np.linalg.norm(np.asarray(res))))
