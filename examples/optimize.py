"""L-BFGS optimisation (reference: examples/OptimizeExample.cpp and
python/OptimizeExample.ipynb)."""
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

n = 20
hessian = np.diag(np.arange(1.0, n + 1.0))
hessian[0, n - 1] = hessian[n - 1, 0] = 0.5
problem = its.models.QuadraticOptimizeProblem(hessian, b=np.ones(n))
solver = its.create_optimize(n, "BFGS", "max_size_qspace=6")
converged, x, _ = solver.solve(np.zeros((1, n)), problem=problem)
print("converged:", converged, " value:", solver.value)
print("solution error:", np.abs(np.asarray(x)[0] - 1.0).max())
print(solver.stats)
