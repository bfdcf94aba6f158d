"""Fused on-device L-BFGS minimiser.

The production TPU counterpart of `OptimizeBFGS` for objectives that are
themselves jittable: the entire optimisation — value+gradient, two-loop
recursion over a fixed-size (s, y) ring buffer, backtracking Armijo line
search, history update — runs in one lax.while_loop dispatch. History lives
in fixed-capacity stacks with a ring index, so shapes are static and the
solve compiles once; everything shards over the vector axis like the other
fused solvers.

(The parity `OptimizeBFGS` keeps the reference's host-side Wolfe/cubic line
search for black-box callbacks; this module is for jittable objectives where
device-side iteration wins.)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


class LBFGSState(NamedTuple):
    x: Array        # (N,) parameters
    f: Array        # scalar value
    g: Array        # (N,) gradient
    s_hist: Array   # (m, N) steps
    y_hist: Array   # (m, N) gradient differences
    rho: Array      # (m,) 1/(s.y), 0 for empty slots
    head: Array     # int32 ring index of next write
    count: Array    # int32 number of valid pairs
    gnorm: Array    # scalar


def make_lbfgs_solve(
    value_and_grad: Callable[..., Tuple[Array, Array]],
    history: int,
    tol: float,
    max_iter: int,
    max_ls: int = 20,
    c1: float = 1e-4,
):
    """Build the single-dispatch solver. ``value_and_grad(x, operand)`` must
    be jittable and return (f, grad)."""

    m = history

    def two_loop(g, s_hist, y_hist, rho, head, count):
        """Standard L-BFGS two-loop recursion over the ring buffer."""
        q = g
        alphas = jnp.zeros((m,), dtype=g.dtype)

        def bwd(i, carry):
            q, alphas = carry
            idx = jnp.mod(head - 1 - i, m)
            valid = i < count
            alpha = jnp.where(valid, rho[idx] * jnp.matmul(s_hist[idx], q, precision=_PREC), 0.0)
            q = q - alpha * y_hist[idx]
            return q, alphas.at[idx].set(alpha)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))
        # initial Hessian scale gamma = s.y / y.y of the newest pair
        newest = jnp.mod(head - 1, m)
        yy = jnp.matmul(y_hist[newest], y_hist[newest], precision=_PREC)
        sy = jnp.where(rho[newest] != 0, 1.0 / jnp.where(rho[newest] != 0, rho[newest], 1.0), 1.0)
        gamma = jnp.where((count > 0) & (yy > 0), sy / jnp.where(yy > 0, yy, 1.0), 1.0)
        r = gamma * q

        def fwd(i, r):
            idx = jnp.mod(head - count + i, m)
            valid = i < count
            beta = jnp.where(valid, rho[idx] * jnp.matmul(y_hist[idx], r, precision=_PREC), 0.0)
            return r + (alphas[idx] - beta) * s_hist[idx]

        return jax.lax.fori_loop(0, m, fwd, r)

    def step(state: LBFGSState, operand) -> LBFGSState:
        d = -two_loop(state.g, state.s_hist, state.y_hist, state.rho, state.head, state.count)
        gd = jnp.matmul(state.g, d, precision=_PREC)
        # fall back to steepest descent if not a descent direction
        d = jnp.where(gd < 0, d, -state.g)
        gd = jnp.where(gd < 0, gd, -jnp.matmul(state.g, state.g, precision=_PREC))

        # backtracking Armijo line search, fully on-device
        def ls_cond(carry):
            alpha, f_new, g_new, tries = carry[0], carry[1], carry[2], carry[3]
            return (tries < max_ls) & (f_new > state.f + c1 * alpha * gd)

        def ls_body(carry):
            alpha, _, _, tries = carry
            alpha = alpha * 0.5
            f_new, g_new = value_and_grad(state.x + alpha * d, operand)
            return alpha, f_new, g_new, tries + 1

        f1, g1 = value_and_grad(state.x + d, operand)
        alpha, f_new, g_new, _ = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(1.0, state.x.dtype), f1, g1, jnp.asarray(0, jnp.int32))
        )

        s = alpha * d
        y = g_new - state.g
        sy = jnp.matmul(s, y, precision=_PREC)
        good = sy > 1e-12 * jnp.sqrt(
            jnp.matmul(s, s, precision=_PREC) * jnp.matmul(y, y, precision=_PREC)
        )
        head = state.head
        s_hist = jnp.where(good, state.s_hist.at[head].set(s), state.s_hist)
        y_hist = jnp.where(good, state.y_hist.at[head].set(y), state.y_hist)
        rho = jnp.where(good, state.rho.at[head].set(1.0 / jnp.where(sy != 0, sy, 1.0)), state.rho)
        head = jnp.where(good, jnp.mod(head + 1, m), head)
        count = jnp.where(good, jnp.minimum(state.count + 1, m), state.count)
        gnorm = jnp.sqrt(jnp.matmul(g_new, g_new, precision=_PREC))
        return LBFGSState(state.x + s, f_new, g_new, s_hist, y_hist, rho, head, count, gnorm)

    def solve(state: LBFGSState, operand):
        def cond(carry):
            s, it = carry
            return (it < max_iter) & (s.gnorm > tol)

        def body(carry):
            s, it = carry
            return step(s, operand), it + 1

        return jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))

    return jax.jit(solve)


class FusedLBFGS:
    def __init__(
        self,
        value_and_grad: Callable[..., Tuple[Array, Array]],
        n: int,
        history: int = 10,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 500,
        operand=None,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.n = n
        self.history = history
        self.dtype = dtype
        self.sharding = sharding
        self.operand = operand
        self._solve = make_lbfgs_solve(value_and_grad, history, convergence_threshold, max_iter)
        self._vg = value_and_grad

    def run(self, x0):
        x0 = jnp.asarray(np.asarray(x0), dtype=self.dtype)
        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            x0 = jax.device_put(x0, adapt_sharding(self.sharding, 1))
        f0, g0 = self._vg(x0, self.operand)
        m = self.history
        zeros_s = jnp.zeros((m, self.n), dtype=self.dtype)
        zeros_y = jnp.zeros((m, self.n), dtype=self.dtype)
        state = LBFGSState(
            x0, f0, g0, zeros_s, zeros_y, jnp.zeros((m,), self.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.sqrt(jnp.matmul(g0, g0, precision=jax.lax.Precision.HIGHEST)),
        )
        final, iters = self._solve(state, self.operand)
        # ONE batched fetch — separate float()/np.asarray() calls each cost
        # a ~28 ms tunnel round-trip
        x_h, f_h, g_h, it_h = jax.device_get(
            (final.x, final.f, final.gnorm, iters))
        from ._finite import check_finite

        check_finite([float(f_h), float(g_h)], "FusedLBFGS")
        return np.asarray(x_h), float(f_h), float(g_h), int(it_h)
