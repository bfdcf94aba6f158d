"""Hybrid-precision pipeline: f32 TPU Davidson -> split-K precise matvec ->
pure-numpy f64 host refinement, reaching the reference's 1e-8 residual band
on hardware without native f64.

Runs on whatever backend is available (CPU here for the demo).
"""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_dense
from iterative_solver_tpu.ops.precise import SplitOperator, precise_matvec_fn, refine_on_host
from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson
import jax.numpy as jnp

n, nroots = 1024, 3
matrix = synthetic_fci_dense(n, seed=0)

# phase 1: accelerator solve with the double-f32 split-K operator
op = SplitOperator.from_dense(matrix, n_chunks=32)
solver = FusedDavidson(precise_matvec_fn(op), op.diagonal, n, nroots, m_max=20,
                       dtype=jnp.float32, convergence_threshold=2e-5, max_iter=100,
                       operand=op.operand())
v0 = np.zeros((nroots, n))
for r, i in enumerate(np.argsort(op.diagonal)[:nroots]):
    v0[r, i] = 1.0
evals32, x32, errors32, iters32 = solver.run(v0)
print(f"accelerator phase: {iters32} iterations, f32 residuals {errors32}")

# phase 2: warm-started f64 refinement on the host
evals, vectors, info = refine_on_host(matrix, np.asarray(x32), nroots)
ref = np.linalg.eigvalsh(matrix)[:nroots]
print(f"host refinement: {info.iterations} iterations, residuals {info.errors}")
print("eigenvalue error vs dense:", np.abs(evals - ref).max())
