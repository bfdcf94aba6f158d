"""Mesh-sharded Davidson (reference: examples/LinearEigensystemDistrArrayExample.cpp).

Run with a virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/distributed_eigensystem.py
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import iterative_solver_tpu as its
from iterative_solver_tpu.parallel import block_sharding, make_mesh, matrix_row_sharding
from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson
import jax.numpy as jnp

mesh = make_mesh()
print("devices:", mesh.devices.size)
n = 1024
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)) * 0.01
matrix = a + a.T + np.diag(np.linspace(1.0, 10.0, n))
mat = jax.device_put(jnp.asarray(matrix), matrix_row_sharding(mesh))

def matvec(x, op):
    return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

solver = FusedDavidson(matvec, np.diag(matrix), n, 2, m_max=16,
                       sharding=block_sharding(mesh), operand=mat)
v0 = np.zeros((2, n)); v0[0, 0] = v0[1, 1] = 1.0
evals, x, errors, iters = solver.run_on_device(v0)
print("eigenvalues:", evals, " iterations:", iters)
print("vs dense:", np.linalg.eigvalsh(matrix)[:2])
