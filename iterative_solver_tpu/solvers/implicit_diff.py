"""Differentiable eigensolves: gradients through the fused Davidson.

A JAX-native capability with no reference analogue: the converged lowest
eigenvalues become differentiable functions of the operator data via the
Hellmann-Feynman theorem,

    d lambda_i / d theta = x_i^T (dA/d theta) x_i     (x_i normalised),

implemented as a custom VJP that never differentiates through the
iteration: the forward pass runs the single-dispatch solve, the backward
pass costs one matvec-VJP. This is the adjoint of choice for forces /
property gradients where lambda feeds an outer objective under jax.grad.

Eigenvector adjoints (which need (A - lambda)^+ solves) are out of scope
here; pair the eigenvalue adjoint with an explicit FusedLinearEquations
response solve when needed.

DEGENERACY CAVEAT: for (near-)degenerate eigenvalues the individual
eigenvectors — and therefore the per-root gradients — are only defined up
to a rotation of the degenerate subspace; the solver lands in an arbitrary
basis and the per-root gradient follows it. Only symmetric functions of a
complete degenerate cluster (its sum/trace) have basis-independent
gradients. Check the eigenvalue gaps before trusting per-root derivatives.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .fused_davidson import make_davidson_init, make_davidson_solve

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


def make_differentiable_eigenvalues(
    matvec: Callable[..., Array],
    nroots: int,
    m_max: int,
    tol: float = 1e-8,
    max_iter: int = 200,
    rr: str = "full",
):
    """Return ``eigenvalues(v0, operand, diag) -> (nroots,)`` differentiable
    w.r.t. ``operand`` (any pytree the matvec consumes).

    The returned eigenvalues are the converged Ritz values refined by a
    full-length Rayleigh quotient of the normalised Ritz vectors — exactly
    the quantity whose operand-gradient Hellmann-Feynman gives. The solve
    itself is non-differentiable internals (lax.while_loop); only the
    stationarity of the converged pair is used, so the adjoint is accurate
    to O(residual^2). Per-root gradients are basis-dependent across
    degenerate clusters (see module docstring)."""
    solve = make_davidson_solve(matvec, nroots, m_max, rr=rr)
    init = make_davidson_init(matvec, nroots, m_max)

    def _solve_vectors(v0, operand, diag):
        state = init(v0, operand)
        final, _ = solve(state, operand, diag, tol, max_iter)
        x = final.x
        norms = jnp.sqrt(jnp.einsum("in,in->i", x, x, precision=_PREC))
        return x / jnp.where(norms > 0, norms, 1.0)[:, None]

    def _rayleigh(x, operand):
        ax = matvec(x, operand)
        return jnp.einsum("in,in->i", x, ax, precision=_PREC)

    @jax.custom_vjp
    def eigenvalues(v0, operand, diag):
        x = _solve_vectors(v0, operand, diag)
        return _rayleigh(x, operand)

    def fwd(v0, operand, diag):
        x = _solve_vectors(v0, operand, diag)
        return _rayleigh(x, operand), (x, operand, v0, diag)

    def bwd(res, bar):
        x, operand, v0, diag = res
        # d lambda_i = x_i^T dA x_i: cotangent on the matvec OUTPUT rows is
        # bar_i * x_i; pull it back through the matvec onto the operand.
        # x is stationary (Hellmann-Feynman), so no solve adjoint is needed.
        _, vjp_fn = jax.vjp(lambda op: matvec(x, op), operand)
        (d_operand,) = vjp_fn(bar[:, None] * x)
        # the converged eigenvalues do not depend on the guess or the
        # preconditioner diagonal (to O(residual^2)): zero cotangents
        zeros = partial(jax.tree_util.tree_map, jnp.zeros_like)
        return zeros(v0), d_operand, zeros(diag)

    eigenvalues.defvjp(fwd, bwd)
    return eigenvalues
