"""Differentiable eigensolves: forces along a model potential curve.

jax.grad flows through the fused Davidson solve via the Hellmann-Feynman
custom VJP (solvers/implicit_diff.py): the backward pass costs ONE
matvec-VJP, never differentiating the iteration. Here a model Hamiltonian
H(theta) = T + theta * V is scanned and the ground-state "force"
-dE0/dtheta is compared against finite differences at every point."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from iterative_solver_tpu import make_differentiable_eigenvalues

n, nroots = 200, 1
rng = np.random.default_rng(0)
t = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
T = jnp.asarray(t + t.T + np.diag(np.linspace(0.0, 15.0, n)))
v = rng.standard_normal((n, n)) * (0.3 / np.sqrt(n))
V = jnp.asarray(v + v.T)


def matvec(x, op):
    theta, = op
    return jnp.matmul(x, (T + theta * V).T, precision=jax.lax.Precision.HIGHEST)


eigfn = make_differentiable_eigenvalues(matvec, nroots, 8, tol=1e-11, max_iter=300)
diag = jnp.diagonal(T)
v0 = jnp.zeros((nroots, n)).at[0, 0].set(1.0)


def energy(theta):
    return eigfn(v0, (theta,), diag)[0]


force = jax.grad(lambda th: -energy(th))
for theta in np.linspace(-0.5, 0.5, 5):
    e = float(energy(theta))
    f = float(force(theta))
    eps = 1e-6
    fd = -(float(energy(theta + eps)) - float(energy(theta - eps))) / (2 * eps)
    assert abs(f - fd) < 1e-5 * max(1.0, abs(fd)), (theta, f, fd)
    print(f"theta={theta:+.2f}: E0={e:+.6f}  force={f:+.6f}  (fd {fd:+.6f})")
print("gradients match finite differences at every scan point")
