"""Eigenvector adjoints: property gradients through the fused Davidson.

``make_differentiable_eigenpairs`` (solvers/implicit_diff.py) makes the
converged eigenVECTORS differentiable w.r.t. the operator data: the
backward pass solves the projected response systems

    P (A - lambda) P y = P xbar,   P = 1 - x x^T

with the fused linear-equation machinery and pulls the result back through
one matvec-VJP — the coupled-perturbed adjoint used for dipole/density
property gradients in quantum chemistry. No reference analogue exists
(the C++ library has no autodiff at all).

Here the ground state of H(theta) = T + theta*V carries a "property"
p(theta) = <x0(theta)| M |x0(theta)>, and d p / d theta from jax.grad is
checked against central finite differences along a scan of theta.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from iterative_solver_tpu.solvers.implicit_diff import make_differentiable_eigenpairs

_PREC = jax.lax.Precision.HIGHEST

n = 160
rng = np.random.default_rng(3)
t = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
T = jnp.asarray(t + t.T + np.diag(np.linspace(0.0, 12.0, n)))
v = rng.standard_normal((n, n)) * (0.3 / np.sqrt(n))
V = jnp.asarray(v + v.T)
m = rng.standard_normal((n, n)) * (1.0 / np.sqrt(n))
M = jnp.asarray(m + m.T)  # the "dipole" operator


def matvec(x, op):
    (theta,) = op
    return jnp.matmul(x, (T + theta * V).T, precision=_PREC)


pairs = make_differentiable_eigenpairs(
    matvec, nroots=1, m_max=12, tol=1e-11, max_iter=400,
    response_tol=1e-10, response_max_iter=400,
)
diag = jnp.diagonal(T)
v0 = jnp.zeros((1, n)).at[0, 0].set(1.0)


def prop(theta):
    """<x0|M|x0> — depends on theta only through the eigenVECTOR."""
    _, x = pairs(v0, (theta,), diag)
    x0 = x[0]
    return x0 @ (M @ x0)


grad = jax.grad(prop)
print(f"{'theta':>6} {'p':>12} {'dp/dtheta':>12} {'fin.diff':>12} {'|err|':>9}")
h = 1e-5
worst = 0.0
for theta in np.linspace(0.0, 1.0, 5):
    p = float(prop(theta))
    g = float(grad(theta))
    fd = (float(prop(theta + h)) - float(prop(theta - h))) / (2 * h)
    err = abs(g - fd)
    worst = max(worst, err)
    print(f"{theta:6.2f} {p:12.7f} {g:12.7f} {fd:12.7f} {err:9.2e}")

assert worst < 5e-5, worst
print("eigenvector adjoint matches finite differences")
