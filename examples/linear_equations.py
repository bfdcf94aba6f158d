"""Linear equations A x = b with multiple right-hand sides
(reference: examples/LinearEquationsExample.cpp)."""
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

n, nrhs = 50, 2
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)) * 0.05
matrix = a + a.T + np.diag(np.arange(2.0, n + 2.0))
rhs = rng.standard_normal((nrhs, n))
solver = its.create_linear_equations(n, nrhs)
solver.add_equations(rhs)
converged, *_ = solver.solve(np.zeros((nrhs, n)),
                             problem=its.models.MatrixProblem(matrix),
                             generate_initial_guess=True)
x = np.asarray(solver.solution_params(list(range(nrhs))))
print("converged:", converged, " max |Ax-b|:", np.abs(matrix @ x.T - rhs.T).max())
