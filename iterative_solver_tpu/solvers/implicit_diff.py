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

The matvec must be differentiable w.r.t. the operand: the XLA operator
paths (dense matmuls, symm_matmat, _symm_matmat_xla, BSR einsum) are, and
the packed symmetric kernels gain an analytic custom VJP through
``symm_pallas.make_differentiable_symm_action`` (the adjoint of a
symmetric action is the same packed kernel; tile cotangents are batched
outer products). Other raw Pallas calls define no autodiff rule.

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


def make_differentiable_eigenpairs(
    matvec: Callable[..., Array],
    nroots: int,
    m_max: int,
    tol: float = 1e-9,
    max_iter: int = 300,
    rr: str = "full",
    response_tol: float = 1e-8,
    response_max_iter: int = 200,
    response_m_max: int = None,
):
    """Return ``eigenpairs(v0, operand, diag) -> (evals, x)`` differentiable
    w.r.t. ``operand`` INCLUDING the eigenvectors.

    The eigenvector adjoint solves the response (coupled-perturbed) systems

        P_i (A - lambda_i) P_i  y_i = P_i xbar_i,   P_i = 1 - x_i x_i^T

    with the fused linear-equation machinery (shifted + projected operator,
    row-wise diag - lambda_i Jacobi preconditioning), then pulls
    ``lambdabar_i x_i - y_i`` back through one matvec-VJP. This is the
    property-gradient adjoint (dipoles, densities: d<x|M|x>/d theta).

    Same degeneracy caveat as the eigenvalue adjoint, and additionally the
    response systems are singular across an exactly degenerate cluster —
    gaps must be resolved at the response tolerance."""
    from .fused_linear import make_linear_solve

    solve = make_davidson_solve(matvec, nroots, m_max, rr=rr)
    init = make_davidson_init(matvec, nroots, m_max)
    r_m_max = response_m_max if response_m_max is not None else m_max

    def _solve_pairs(v0, operand, diag):
        state = init(v0, operand)
        final, _ = solve(state, operand, diag, tol, max_iter)
        x = final.x
        norms = jnp.sqrt(jnp.einsum("in,in->i", x, x, precision=_PREC))
        x = x / jnp.where(norms > 0, norms, 1.0)[:, None]
        lam = jnp.einsum("in,in->i", x, matvec(x, operand), precision=_PREC)
        return lam, x

    def _project(xs, z):
        return z - xs * jnp.einsum("in,in->i", xs, z, precision=_PREC)[:, None]

    def _response_matvec(z, op_aug):
        operand, lam, xs = op_aug
        zp = _project(xs, z)
        w = matvec(zp, operand) - lam[:, None] * zp
        w = _project(xs, w)
        # identity on span(x_i): keeps the system nonsingular; solutions of
        # rhs ⊥ x_i stay ⊥ x_i
        return w + (z - zp)

    response_solve = make_linear_solve(
        _response_matvec, nroots, r_m_max, response_tol, response_max_iter
    )

    @jax.custom_vjp
    def eigenpairs(v0, operand, diag):
        return _solve_pairs(v0, operand, diag)

    def fwd(v0, operand, diag):
        lam, x = _solve_pairs(v0, operand, diag)
        return (lam, x), (lam, x, operand, diag, v0)

    def bwd(res, bars):
        lam, x, operand, diag, v0 = res
        lam_bar, x_bar = bars
        rhs = _project(x, x_bar)
        d_resp = jnp.broadcast_to(diag[None, :], x.shape) - lam[:, None]
        from .fused_linear import LinearState

        n = x.shape[1]
        zeros = jnp.zeros((r_m_max, n), dtype=x.dtype)
        st = LinearState(
            v=zeros, w=zeros, mask=jnp.zeros((r_m_max,), x.dtype),
            k=jnp.asarray(0, jnp.int32),
            x=jnp.zeros_like(x), r=jnp.zeros_like(x),
            errors=jnp.ones((nroots,), x.dtype),
        )
        # seed the basis with the preconditioned rhs via the solver itself:
        # make_linear_solve starts from the given state and appends
        # preconditioned residuals, so the zero state is a valid start
        b_norm = jnp.sqrt(jnp.einsum("in,in->i", rhs, rhs, precision=_PREC))
        b_norm = jnp.where(b_norm > 0, b_norm, 1.0)
        final, _ = response_solve(st, (operand, lam, x), d_resp, rhs, b_norm)
        y = _project(x, final.x)  # numerical hygiene: re-project
        cot_rows = lam_bar[:, None] * x - y
        _, vjp_fn = jax.vjp(lambda op: matvec(x, op), operand)
        (d_operand,) = vjp_fn(cot_rows)
        zeros_like = partial(jax.tree_util.tree_map, jnp.zeros_like)
        return zeros_like(v0), d_operand, zeros_like(diag)

    eigenpairs.defvjp(fwd, bwd)
    return eigenpairs
