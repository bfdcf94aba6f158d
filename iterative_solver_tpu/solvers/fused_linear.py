"""Fused on-device linear-equation solver (A X = B, multiple RHS).

The production TPU counterpart of `LinearEquationsDavidson` — the same
fixed-capacity masked-basis design as the fused Davidson (fused_davidson.py)
but the subspace step solves the projected system instead of an
eigenproblem:

  matvec -> masked projected matrix H = V (A V)^T and rhs beta = V B^T ->
  small solve -> X = C V, residual R = (A X - B) -> Jacobi preconditioning ->
  Gram-Schmidt -> whiten -> append

The whole solve runs in one lax.while_loop dispatch; everything shards over
a 1-D mesh by the vector axis with XLA-inserted psums.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


class LinearState(NamedTuple):
    v: Array        # (m_max, N) basis
    w: Array        # (m_max, N) A·basis
    mask: Array     # (m_max,)
    k: Array        # int32
    x: Array        # (nrhs, N) current solutions
    r: Array        # (nrhs, N) current residuals
    errors: Array   # (nrhs,) |A x - b| / |b|


def _step_body(matvec: Callable[..., Array], nrhs: int, m_max: int, null_thresh: float = 1e-10,
               fuse_chain: bool = False):
    if m_max < 2 * nrhs:
        # room for the carried block plus one append — below this the
        # post-restart dynamic_update_slice clamps and silently overwrites
        # live basis rows (cf. fused_davidson._validate_rr)
        raise ValueError(f"m_max must be >= 2*nrhs ({2 * nrhs}), got {m_max}")

    def step(state: LinearState, operand, diag: Array, b: Array, b_norm: Array) -> LinearState:
        v, w, mask, k = state.v, state.w, state.mask, state.k
        h = jnp.matmul(v, w.T, precision=_PREC)
        m2 = mask[:, None] * mask[None, :]
        # inactive slots solve a trivial identity system with zero rhs.
        # This fused path targets hermitian operators (the parity solver
        # handles the general case), so the projected solve goes through an
        # eigh — much cheaper to compile inside a while_loop than LU.
        h = 0.5 * (h + h.T)
        h = h * m2 + (1.0 - mask)[:, None] * (1.0 - mask)[None, :] * jnp.eye(m_max, dtype=h.dtype)
        beta = jnp.matmul(v, b.T, precision=_PREC) * mask[:, None]  # (m_max, nrhs)
        evals_h, c = jnp.linalg.eigh(h)
        safe = jnp.where(jnp.abs(evals_h) > 1e-30, evals_h, 1.0)

        def hsolve(rhs):
            # HIGHEST precision: a default bf16 pass costs ~2e-3 relative —
            # at kappa(h) ~ 1e3 the refinement contraction would exceed 1
            # and the stall this refinement exists to fix would return
            return jnp.matmul(
                c, jnp.matmul(c.T, rhs, precision=_PREC) / safe[:, None],
                precision=_PREC)

        co = hsolve(beta)
        # two passes of iterative refinement: the TPU f32 eigh is only
        # ~1e-3..1e-4 accurate (far below LAPACK's f32 ssyev), and the
        # subspace SOLUTION inherits that error directly — measured: the
        # whole solver stalls at ~5e-3 relative residual on TPU at every
        # size while CPU f32 reaches 6e-6. Each refinement squares the
        # factorisation error at the cost of two (m, m) matmuls.
        for _ in range(2):
            co = co + hsolve(beta - jnp.matmul(h, co, precision=_PREC))
        coeff = co.T * mask[None, :]  # (nrhs, m_max)
        x = jnp.matmul(coeff, v, precision=_PREC)
        ax = jnp.matmul(coeff, w, precision=_PREC)
        r = ax - b
        errors = jnp.sqrt(jnp.abs(jnp.einsum("in,in->i", r, r, precision=_PREC))) / b_norm

        # diag may be (N,) shared or (nrhs, N) row-wise (shifted systems:
        # the eigenvector-response adjoint preconditions row i with
        # diag - lambda_i)
        d = diag if diag.ndim == 2 else diag[None, :]
        # relative regulariser: the absolute 1e-15 swamps operators scaled
        # near/below it (cf. fused_davidson)
        t = r / (d + 1e-15 * jnp.max(jnp.abs(d)) + 1e-300)
        from ..ops.kernels.chain_pallas import fused_expand_chain, whiten_after_chain

        if fuse_chain:
            # GS + norms + Gram as ONE Pallas kernel (raw mode: this family's
            # preconditioner shape differs from the Davidson one, so it stays
            # in XLA above); see chain_pallas.py for the dispatch-floor story
            t, n0_2, n2, g = fused_expand_chain(t, v, mask)
            t, keep = whiten_after_chain(t, n0_2, n2, nrhs, null_thresh, g=g)
        else:
            n0_2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
            for _ in range(2):
                proj = jnp.matmul(t, v.T, precision=_PREC) * mask[None, :]
                t = t - jnp.matmul(proj, v, precision=_PREC)
            n2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
            t, keep = whiten_after_chain(t, n0_2, n2, nrhs, null_thresh)

        v_new = jax.lax.dynamic_update_slice(v, t.astype(v.dtype), (k, jnp.zeros((), k.dtype)))
        w_new = jax.lax.dynamic_update_slice(w, matvec(t, operand).astype(w.dtype), (k, jnp.zeros((), k.dtype)))
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (m_max, 1), 0)[:, 0]
        new_rows = (slot_ids >= k) & (slot_ids < k + nrhs)
        keep_full = jnp.zeros((m_max,), dtype=bool).at[:nrhs].set(keep)
        mask_new = jnp.where(new_rows & jnp.roll(keep_full, k), 1.0, mask)
        return LinearState(v_new, w_new, mask_new, k + nrhs, x, r, errors)

    return step


def _restart_body(matvec, nrhs: int, m_max: int, n_p: int = 0):
    def restart(state: LinearState, operand) -> LinearState:
        x = state.x
        if n_p:
            # frozen P slots survive the collapse (basis AND action rows);
            # the solution block is orthogonalised against them and
            # eigh-whitened with null-drop (a solution converged INTO the
            # P span projects to zero — Cholesky would NaN)
            from .fused_davidson import _eigh_whiten_cols

            pv = state.v[:n_p]
            pw = state.w[:n_p]
            for _ in range(2):
                x = x - jnp.matmul(jnp.matmul(x, pv.T, precision=_PREC), pv,
                                   precision=_PREC)
            xo_t, keep = _eigh_whiten_cols(x.T, thresh=1e-10)
            xo = xo_t.T
            live = keep.astype(state.mask.dtype)
            v = jnp.zeros_like(state.v).at[:n_p].set(pv)
            v = jax.lax.dynamic_update_slice(v, xo.astype(v.dtype), (n_p, 0))
            w = jnp.zeros_like(state.w).at[:n_p].set(pw)
            w = jax.lax.dynamic_update_slice(
                w, (matvec(xo, operand) * live[:, None]).astype(w.dtype),
                (n_p, 0))
            mask = jnp.zeros_like(state.mask).at[:n_p].set(1.0)
            mask = jax.lax.dynamic_update_slice(mask, live, (n_p,))
            return LinearState(v, w, mask,
                               jnp.asarray(n_p + nrhs, state.k.dtype),
                               state.x, state.r, state.errors)
        g = jnp.matmul(x, x.T, precision=_PREC)
        l = jnp.linalg.cholesky(g + 1e-30 * jnp.eye(nrhs, dtype=g.dtype))
        xo = jax.scipy.linalg.solve_triangular(l, x, lower=True)
        v = jnp.zeros_like(state.v).at[:nrhs].set(xo)
        w = jnp.zeros_like(state.w).at[:nrhs].set(matvec(xo, operand))
        mask = jnp.zeros_like(state.mask).at[:nrhs].set(1.0)
        return LinearState(v, w, mask, jnp.asarray(nrhs, state.k.dtype), state.x, state.r, state.errors)

    return restart


def make_linear_solve(matvec, nrhs: int, m_max: int, tol: float, max_iter: int,
                      fuse_chain: bool = False, n_p: int = 0):
    """Whole A X = B solve in one dispatch (cf. make_davidson_solve). The
    step needs no P-awareness at all: the projected solve runs over every
    masked slot, so frozen P rows [0, n_p) enter H, beta and the solution
    reconstruction through the ordinary mask (the design win of the
    masked-stack layout)."""
    if m_max < 2 * nrhs + n_p:
        raise ValueError(
            f"m_max must be >= 2*nrhs + n_p ({2 * nrhs + n_p}), got {m_max}")
    step = _step_body(matvec, nrhs, m_max, fuse_chain=fuse_chain)
    restart = _restart_body(matvec, nrhs, m_max, n_p)

    def solve(state: LinearState, operand, diag: Array, b: Array, b_norm: Array):
        def cond(carry):
            s, it = carry
            return (it < max_iter) & (jnp.max(s.errors) > tol)

        def body(carry):
            s, it = carry
            s = jax.lax.cond(
                s.k + nrhs > m_max,
                lambda ss: restart(ss, operand),
                lambda ss: ss,
                s,
            )
            return step(s, operand, diag, b, b_norm), it + 1

        return jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))

    return jax.jit(solve)


def make_linear_init(matvec, nrhs: int, m_max: int, n_p: int = 0,
                     p_actions: bool = False):
    """Whole initialisation (normalise + whiten the start block, apply the
    operator, lay out the stacks) as ONE jitted dispatch — the previous
    host-side preamble cost ~5 tunnel round-trips (~150 ms) per solve,
    comparable to the entire while_loop for well-conditioned systems.

    ``n_p > 0`` adds two traced arguments (densified P rows + their action
    rows) and freezes the whitened P block into slots [0, n_p) — cf.
    fused_davidson._init_body; with ``p_actions`` the user-supplied exact
    action rows ride the same whitening transform."""
    from ..array.vector_ops import chol_jitter

    @jax.jit
    def init_p(b, v0raw, operand, p, wp):
        from .fused_davidson import _eigh_whiten_cols

        b_norm = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", b, b, precision=_PREC)))
        gp = jnp.matmul(p, p.T, precision=_PREC)
        lp = jnp.linalg.cholesky(gp + 1e-30 * jnp.eye(n_p, dtype=gp.dtype))
        pwhite = jax.scipy.linalg.solve_triangular(lp, p, lower=True)
        if p_actions:
            wpw = jax.scipy.linalg.solve_triangular(lp, wp, lower=True)
        else:
            wpw = matvec(pwhite, operand)
        n0 = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", v0raw, v0raw, precision=_PREC)))
        v0 = v0raw / jnp.where(n0 > 0, n0, 1.0)[:, None]
        for _ in range(2):
            v0 = v0 - jnp.matmul(jnp.matmul(v0, pwhite.T, precision=_PREC),
                                 pwhite, precision=_PREC)
        v0o_t, keep = _eigh_whiten_cols(v0.T, thresh=1e-10)
        v0o = v0o_t.T
        live = keep.astype(b.dtype)
        w0 = matvec(v0o, operand) * live[:, None]
        n = b.shape[1]
        v = jnp.zeros((m_max, n), b.dtype).at[:n_p].set(pwhite.astype(b.dtype))
        v = jax.lax.dynamic_update_slice(v, v0o.astype(b.dtype), (n_p, 0))
        w = jnp.zeros((m_max, n), b.dtype).at[:n_p].set(wpw.astype(b.dtype))
        w = jax.lax.dynamic_update_slice(w, w0.astype(b.dtype), (n_p, 0))
        mask = jnp.zeros((m_max,), b.dtype).at[:n_p].set(1.0)
        mask = jax.lax.dynamic_update_slice(mask, live, (n_p,))
        state = LinearState(
            v, w, mask, jnp.asarray(n_p + nrhs, jnp.int32),
            jnp.zeros((nrhs, n), b.dtype),
            jnp.zeros((nrhs, n), b.dtype),
            jnp.full((nrhs,), jnp.inf, b.dtype),
        )
        return state, b_norm

    if n_p:
        return init_p

    @jax.jit
    def init(b, v0raw, operand):
        b_norm = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", b, b, precision=_PREC)))
        n0 = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", v0raw, v0raw, precision=_PREC)))
        v0 = v0raw / jnp.where(n0 > 0, n0, 1.0)[:, None]
        g = jnp.matmul(v0, v0.T, precision=_PREC)
        g = 0.5 * (g + g.T) + chol_jitter(g.dtype) * jnp.eye(
            nrhs, dtype=g.dtype)
        l = jnp.linalg.cholesky(g)
        v0 = jax.scipy.linalg.solve_triangular(l, v0, lower=True)
        w0 = matvec(v0, operand)
        n = b.shape[1]
        v = jnp.zeros((m_max, n), b.dtype).at[:nrhs].set(v0.astype(b.dtype))
        w = jnp.zeros((m_max, n), b.dtype).at[:nrhs].set(w0.astype(b.dtype))
        mask = jnp.zeros((m_max,), b.dtype).at[:nrhs].set(1.0)
        state = LinearState(
            v, w, mask, jnp.asarray(nrhs, jnp.int32),
            jnp.zeros((nrhs, n), b.dtype),
            jnp.zeros((nrhs, n), b.dtype),
            jnp.full((nrhs,), jnp.inf, b.dtype),
        )
        return state, b_norm

    return init


class FusedLinearEquations:
    """Driver: whole multi-RHS solve in one device dispatch."""

    def __init__(
        self,
        matvec: Callable[..., Array],
        diagonals,
        n: int,
        nrhs: int,
        m_max: Optional[int] = None,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 200,
        operand=None,
        fuse_chain: Optional[bool] = None,
        check_symmetric: bool = True,
        p_space=None,
        p_actions=None,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.matvec = matvec
        self.n = n
        self.nrhs = nrhs
        self.check_symmetric = check_symmetric
        self._symmetry_checked = False
        from .fused_davidson import validate_p_inputs

        self.p_dense, self.n_p, self.p_action_rows = validate_p_inputs(
            p_space, p_actions, n)
        self.m_max = m_max if m_max is not None else max(
            4 * nrhs + self.n_p, min(n, 24))
        self.dtype = dtype
        self.sharding = sharding
        self.tol = convergence_threshold
        self.max_iter = max_iter
        from ..array.vector_ops import adapt_sharding

        self.diag = jnp.asarray(np.asarray(diagonals), dtype=dtype)
        if sharding is not None:
            # rank-aware: the step accepts per-RHS (nrhs, N) diagonals
            # (shifted systems) — those shard by the LAST axis, not nrhs
            self.diag = jax.device_put(
                self.diag, adapt_sharding(sharding, self.diag.ndim))
        self.operand = operand
        if fuse_chain is None:
            # same auto policy as FusedDavidson: single-device TPU f32 states
            # whose stacks fit the grid-free kernel's VMEM budget
            from ..ops.kernels.chain_pallas import fits_vmem

            fuse_chain = (
                jax.default_backend() == "tpu"
                and sharding is None
                and dtype == jnp.float32
                and fits_vmem(nrhs, self.m_max, n)
            )
        self.fuse_chain = fuse_chain
        self._solve = make_linear_solve(matvec, nrhs, self.m_max, self.tol, self.max_iter,
                                        fuse_chain=fuse_chain, n_p=self.n_p)

    @classmethod
    def from_dense_symmetric(cls, matrix, nrhs: int, tier: str = None,
                             b: Optional[int] = None, **kwargs) -> "FusedLinearEquations":
        """Build the solver around the packed-triangle symmetric action
        (symmetric A X = B — the response-equation shape). Same tier
        semantics as FusedDavidson.from_dense_symmetric; the operator
        dimension must already be a multiple of the tile size (linear
        systems have no harmless padding: a padded row makes A singular)."""
        import dataclasses

        import numpy as _np

        from ..ops.kernels.symm_pallas import (
            SymmetricBlocked,
            SymmetricBlockedSplit,
            symm_matmat,
            symm_matmat_pallas,
            symm_matmat_split,
            symm_matmat_split_pallas,
        )

        matrix = _np.asarray(matrix, dtype=_np.float64)
        n = matrix.shape[0]
        on_tpu = jax.default_backend() == "tpu"
        if tier is None:
            tier = "precise" if on_tpu else "exact"
        if tier not in ("fast", "precise", "exact", "int8", "int8_precise"):
            raise ValueError(
                f"unknown tier {tier!r}: use 'fast', 'precise', 'exact', "
                "'int8' or 'int8_precise'")
        if b is None:
            # same measured tile-size policy as FusedDavidson: bf16 single
            # stack streams at the DMA roof with b=1024, the split tier's
            # two stacks prefer b=512. Linear systems cannot pad (a padded
            # row makes A singular), so the auto choice degrades to the
            # largest power-of-two tile that divides n (down to 128, the
            # lane width); below that the explicit divisibility error fires.
            # int8_precise joined the b=1024 group in round 3 (two int8
            # planes are a quarter of the f32 bytes — measured 108 vs 119
            # us/matvec), same as FusedDavidson.from_dense_symmetric
            start = 1024 if tier in ("fast", "int8", "int8_precise") else 512
            b = start
            while b > 128 and n % min(b, n) != 0:
                b //= 2
            if n % min(b, n) != 0:
                b = start  # no admissible tile: report against the preferred size
        b = min(b, n)
        if n % b != 0:
            raise ValueError(
                f"operator dimension {n} must be a multiple of the tile size {b} "
                f"(zero padding would make the linear system singular)")

        if tier in ("int8", "int8_precise"):
            from ..ops.kernels.symm_int8 import make_int8_matvec

            matvec, operand, sym = make_int8_matvec(
                matrix, b=b, two_plane=(tier == "int8_precise"),
                use_pallas=on_tpu)

        elif tier == "precise":
            sym = SymmetricBlockedSplit.from_dense(matrix, b=b)
            operand = (sym.hi, sym.lo, sym.ii, sym.jj)

            def matvec(x, op):
                s = dataclasses.replace(sym, hi=op[0], lo=op[1], ii=op[2], jj=op[3])
                if on_tpu:
                    return symm_matmat_split_pallas(x, s)
                return symm_matmat_split(x, s).astype(x.dtype)

        else:
            tile_dtype = jnp.bfloat16 if tier == "fast" else None
            sym = SymmetricBlocked.from_dense(matrix, b=b, dtype=tile_dtype)
            operand = (sym.values, sym.ii, sym.jj)

            def matvec(x, op):
                s = dataclasses.replace(sym, values=op[0], ii=op[1], jj=op[2])
                if on_tpu:
                    return symm_matmat_pallas(x, s)
                return symm_matmat(x, s).astype(x.dtype)

        return cls(matvec, _np.diagonal(matrix).copy(), n, nrhs,
                   operand=operand, **kwargs)

    def solve(self, b, x0=None):
        """Returns (x, errors, iterations). b is (nrhs, N)."""
        b_host = np.atleast_2d(np.asarray(b))
        # validate at the SOLVER dtype: a b row that underflows to zero in
        # f32 would otherwise divide the errors by zero and burn max_iter
        # before dying in check_finite instead of raising cleanly here
        b_cast = b_host.astype(np.float32 if self.dtype == jnp.float32
                               else np.float64)
        if not np.all(np.linalg.norm(b_cast, axis=1) > 0):
            raise RuntimeError("RHS vector cannot be zero")
        b = jnp.asarray(b_host, dtype=self.dtype)
        if self.sharding is not None:
            b = jax.device_put(b, self.sharding)
        if self.check_symmetric and not getattr(self, "_symmetry_checked", False):
            from ._symmetry import check_symmetric_operator

            check_symmetric_operator(
                self.matvec, self.operand, b.shape, self.dtype,
                "FusedLinearEquations",
                "solvers.linear_equations.LinearEquationsDavidson"
                "(hermitian=False)",
                sharding=b.sharding if self.sharding is not None else None,
            )
            self._symmetry_checked = True
        if x0 is None:
            v0raw = b
        else:
            v0raw = jnp.asarray(np.asarray(x0), dtype=self.dtype)
            if self.sharding is not None:
                v0raw = jax.device_put(v0raw, self.sharding)
        if getattr(self, "_init_cache", None) is None:
            self._init_cache = make_linear_init(
                self.matvec, self.nrhs, self.m_max, n_p=self.n_p,
                p_actions=self.n_p > 0 and self.p_action_rows is not None)
        if self.n_p:
            if getattr(self, "_p_dev", None) is None:
                p = jnp.asarray(self.p_dense, dtype=self.dtype)
                wp = (jnp.asarray(self.p_action_rows, dtype=self.dtype)
                      if self.p_action_rows is not None
                      else jnp.zeros((self.n_p, self.n), dtype=self.dtype))
                if self.sharding is not None:
                    p = jax.device_put(p, self.sharding)
                    wp = jax.device_put(wp, self.sharding)
                self._p_dev = (p, wp)
            state, b_norm = self._init_cache(b, v0raw, self.operand,
                                             *self._p_dev)
        else:
            state, b_norm = self._init_cache(b, v0raw, self.operand)
        if self.sharding is not None:
            # pin the stacks' placement explicitly (the jitted init leaves
            # it to GSPMD propagation, which may replicate the (m_max, N)
            # stacks on a real mesh)
            state = state._replace(
                v=jax.device_put(state.v, self.sharding),
                w=jax.device_put(state.w, self.sharding),
            )
        final, iters = self._solve(state, self.operand, self.diag, b, b_norm)
        errors = np.asarray(final.errors)
        from ._finite import check_finite

        check_finite(errors, "FusedLinearEquations")
        return final.x, errors, int(iters)
