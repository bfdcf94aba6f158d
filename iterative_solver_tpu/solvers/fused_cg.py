"""Fused preconditioned block conjugate gradient for SPD systems A X = B.

The subspace family (`fused_linear.FusedLinearEquations`, the reference's
LinearEquationsDavidson redesign) carries an (m_max, N) basis and solves a
projected system every iteration — robust for indefinite/ill-scaled
operators.
For the symmetric positive definite case the textbook production solver is
preconditioned CG: three (nrhs, N) blocks of state (x, r, p), one matvec and ~8 small
row-wise ops per iteration, no small eigh/Cholesky at all. Each right-hand
side runs its own scalar CG recurrence (batched over rows on the VPU);
Jacobi preconditioning reuses the solver family's diagonals contract.

Like the other fused families the whole solve is ONE lax.while_loop
dispatch with static shapes, sharding over the vector axis via GSPMD.
Converged systems freeze (alpha forced to 0) so late RHS cannot corrupt
early ones — the analogue of the working-set shrinking in the reference
(IterativeSolverTemplate.h:105-117) without dynamic shapes.

Beyond-the-reference entry (the reference has no CG family); numerics are
the standard PCG recurrence, residuals tracked against ||b|| like
LinearEquationsDavidson.h:173-184.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..array.vector_ops import dots_rows as _rows_dot

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


class CGState(NamedTuple):
    x: Array        # (nrhs, N) iterates
    r: Array        # (nrhs, N) residuals b - A x
    p: Array        # (nrhs, N) search directions
    rz: Array       # (nrhs,) <r, z> carried for beta
    errors: Array   # (nrhs,) |r| / |b|


def _jacobi_inverse(diag: Array) -> Array:
    """Loop-invariant reciprocal of the regularised Jacobi denominator
    (computed ONCE per solve — the preconditioner depends only on diag)."""
    d = diag if diag.ndim == 2 else diag[None, :]
    return 1.0 / (d + 1e-15 * jnp.max(jnp.abs(d)) + 1e-300)


def _step_body(matvec: Callable[..., Array]):
    def step(state: CGState, operand, dinv: Array, b_norm: Array,
             tol_) -> CGState:
        x, r, p, rz = state.x, state.r, state.p, state.rz
        ap = matvec(p, operand)
        pap = _rows_dot(p, ap)
        # frozen systems (converged or p annihilated) take a zero step; the
        # guard also protects against a non-SPD or ill-conditioned operator
        # driving pap toward/below 0 (the iterate then stops moving instead
        # of exploding). RELATIVE to rz: alpha = rz/pap stays bounded by
        # 1/eps; an absolute denormal threshold would underflow to 0 in f32
        # and let pap ~ 1e-20 produce an inf step.
        eps = 1e-12 if pap.dtype == jnp.float64 else 1e-6
        active = (state.errors > tol_) & (pap > eps * rz)
        alpha = jnp.where(active, rz / jnp.where(active, pap, 1.0), 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * ap
        z = r * dinv
        rz_new = _rows_dot(r, z)
        beta = jnp.where(active, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta[:, None] * p
        errors = jnp.sqrt(jnp.abs(_rows_dot(r, r))) / b_norm
        return CGState(x, r, p, rz_new, errors)

    return step


def make_cg_solve(matvec: Callable[..., Array]):
    """Whole A X = B solve in one dispatch:
    (state, operand, diag, b_norm, tol, max_iter) -> (state, iterations)."""
    step = _step_body(matvec)

    def solve(state: CGState, operand, diag: Array, b_norm: Array, tol_,
              max_iter_):
        dinv = _jacobi_inverse(diag)

        def cond(carry):
            s, it = carry
            return (it < max_iter_) & (jnp.max(s.errors) > tol_)

        def body(carry):
            s, it = carry
            return step(s, operand, dinv, b_norm, tol_), it + 1

        return jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))

    return jax.jit(solve)


def make_batched_cg_solve(matvec: Callable[..., Array]):
    """Many independent SPD systems in ONE dispatch: the whole-solve
    while_loop vmapped over a leading batch axis of (operand, diag, B).

    Unlike the Davidson families (whose restart lax.cond lowers to
    select-over-both-branches under vmap, forcing the chunked workaround),
    the CG step is branch-free — plain vmap of the plain solve works, and
    the combined loop runs until the slowest element converges while done
    elements freeze through the per-row active mask. Returns
    ``(batched_init, batched_solve)`` with a leading batch axis on every
    array. The matvec must be vmap-compatible (XLA paths are; the Pallas
    packed kernels are not)."""
    init = make_cg_init(matvec)
    solve = make_cg_solve(matvec)

    batched_init = jax.jit(jax.vmap(init, in_axes=(0, 0, 0, 0, 0)))
    batched_solve = jax.jit(
        jax.vmap(solve, in_axes=(0, 0, 0, 0, None, None)))
    return batched_init, batched_solve


def make_cg_init(matvec: Callable[..., Array]):
    def init(x0: Array, b: Array, operand, diag: Array, b_norm: Array) -> CGState:
        r = b - matvec(x0, operand)
        z = r * _jacobi_inverse(diag)
        rz = _rows_dot(r, z)
        errors = jnp.sqrt(jnp.abs(_rows_dot(r, r))) / b_norm
        return CGState(x0, r, z, rz, errors)

    return jax.jit(init)


class FusedBlockCG:
    """Driver: Jacobi-preconditioned block CG, whole solve in one dispatch.

    For SPD operators only (the CG invariant); use FusedLinearEquations for
    indefinite/general symmetric systems. Shares the (matvec, diagonals, n,
    nrhs, operand) constructor shape of the other fused families."""

    def __init__(
        self,
        matvec: Callable[..., Array],
        diagonals,
        n: int,
        nrhs: int,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 1000,
        operand=None,
        check_symmetric: bool = True,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.matvec = matvec
        self.n = n
        self.nrhs = nrhs
        self.dtype = dtype
        self.tol = convergence_threshold
        self.max_iter = max_iter
        self.operand = operand
        self.sharding = sharding
        from ..array.vector_ops import adapt_sharding

        self.diag = jnp.asarray(np.asarray(diagonals), dtype=dtype)
        if sharding is not None:
            # rank-aware: per-RHS (nrhs, N) diagonals shard by the LAST
            # axis, not by nrhs (sharding dim 0 of a (2, N) array over an
            # 8-device mesh is a hard error — and the wrong axis regardless)
            self.diag = jax.device_put(
                self.diag, adapt_sharding(sharding, self.diag.ndim))
        self._init = make_cg_init(matvec)
        self._solve = make_cg_solve(matvec)
        self.check_symmetric = check_symmetric
        self._symmetry_checked = False

    def solve(self, b, x0=None):
        """Returns (x, errors, iterations); errors are |A x - b| / |b|.

        ``x`` stays a device array (same convention as
        FusedLinearEquations.solve — chained workflows keep the block on
        device instead of paying a host round-trip); errors come back as
        numpy."""
        b = jnp.asarray(np.asarray(b), dtype=self.dtype)
        if x0 is None:
            x0 = jnp.zeros_like(b)
        else:
            x0 = jnp.asarray(np.asarray(x0), dtype=self.dtype)
        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            sh = adapt_sharding(self.sharding, 2)
            b = jax.device_put(b, sh)
            x0 = jax.device_put(x0, sh)
        b_norm = jnp.sqrt(jnp.abs(_rows_dot(b, b)))
        b_norm = jnp.where(b_norm > 0, b_norm, 1.0)
        if self.check_symmetric and not self._symmetry_checked:
            from ._symmetry import check_symmetric_operator

            # row-wise shifted SPD systems (per-RHS diagonals) stay
            # term-by-term symmetric under the block contraction, so the
            # probe is valid for the response-equation form too
            check_symmetric_operator(
                self.matvec, self.operand, b.shape, self.dtype,
                "FusedBlockCG",
                "solvers.linear_equations.LinearEquationsDavidson"
                "(hermitian=False)",
                sharding=b.sharding if self.sharding is not None else None,
            )
            self._symmetry_checked = True
        state = self._init(x0, b, self.operand, self.diag, b_norm)
        final, iters = self._solve(state, self.operand, self.diag, b_norm,
                                   self.tol, self.max_iter)
        errors = np.asarray(final.errors)
        from ._finite import check_finite

        check_finite(errors, "FusedBlockCG")
        return final.x, errors, int(iters)
