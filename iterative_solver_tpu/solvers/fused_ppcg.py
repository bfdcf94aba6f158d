"""Fused projected-preconditioned-conjugate-gradient (PPCG) eigensolver.

Vecharynski, Yang & Knyazev's PPCG (arXiv:1407.7506) re-arranged for TPU:
instead of a per-iteration Rayleigh-Ritz over a growing basis (the Davidson
families) or over the full 3r-dim [X, W, P] block (LOBPCG / rr="window3"),
each root relaxes in its OWN 3-dim subspace span{x_i, w_i, p_i} — r
independent (3, 3) problems, batched on the VPU — with a full r-dim RR only
every ``rr_every`` iterations to re-couple and re-sort the roots. The
per-iteration small-eigh cost drops from O((2r)^3) to O(r·27) + the
occasional eigh(r): at r=64 that replaces a 315 us eigh(128) with
microseconds of batched 3x3 work.

Why this works where the per-root 2x2 mode failed (CLAUDE.md, settled):
PPCG keeps NO basis stack — new directions are projected only against the
CURRENT X block, not an accumulated history, so the correction never loses
its history-span component; the 3-term recurrence (the P block) carries the
conjugacy information a stack would otherwise hold, and the periodic full
RR restores inter-root coupling. Measured convergence (f64, n=1024, r=16,
tol 1e-9): easy gapped spectrum 14-16 iterations (window 21, full 9); HARD
weakly-dominant spectrum 77-78 iterations where rr="window" stalls past 400
and even full Davidson (m_max=64) needs 230.

One matvec per iteration: AP is carried EXACTLY through every linear
update (projection, normalisation, 3x3 mixing, RR rotation) — the matvec
applies only to the fresh preconditioned block W.

State is O(6 r N) with static shapes; the whole solve runs in one
lax.while_loop dispatch like the other fused families.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..array.vector_ops import chol_jitter as _chol_jitter
from ..array.vector_ops import dots_rows as _rows_dot

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


class PPCGState(NamedTuple):
    x: Array        # (r, N) Ritz block, orthonormal rows
    ax: Array       # (r, N) A·x (carried exactly)
    p: Array        # (r, N) momentum block (row-normalised or zero)
    ap: Array       # (r, N) A·p (carried exactly)
    evals: Array    # (r,) Rayleigh quotients
    errors: Array   # (r,) residual norms
    it: Array       # int32 iteration counter (drives the periodic RR)


def _jacobi3_packed(a00, a11, a22, a01, a02, a12, sweeps: int = 6):
    """Batched symmetric 3x3 Jacobi eigendecomposition in PACKED component
    form: every quantity is a plain (B,) vector and every update a fused
    elementwise chain — no (B, 3, 3) arrays anywhere.

    Why: ``jnp.linalg.eigh`` on a (B, 3, 3) batch costs ~295 us at B=64
    in-loop on one v5e, and even a Jacobi built from batched 3x3 einsums
    + .at-updates costs the same (measured — dozens of tiny batched ops,
    each paying the ~4-6 us per-op floor; CLAUDE.md cost model). The
    packed form is ~15 scalar-vector ops per rotation that XLA fuses into
    a couple of kernels: the whole 18-rotation sweep schedule lands at
    single-digit microseconds.

    Returns ``(w0, w1, w2, V)`` where w_i = a_ii after sweeps (UNSORTED)
    and V = ((v00, v01, v02), (v10, ...), ...) with V[i][j] the i-th
    component of the j-th eigenvector (column-major like eigh's v[:, :, j]).
    3x3 Jacobi converges quadratically; 6 sweeps leave off-diagonals at
    ~eps * ||A|| (validated against np.linalg.eigh to 6e-15 in f64).
    """
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    v = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
    a = {(0, 0): a00, (1, 1): a11, (2, 2): a22,
         (0, 1): a01, (0, 2): a02, (1, 2): a12}

    def off(i, j):
        return a[(i, j)] if i <= j else a[(j, i)]

    def set_off(i, j, val):
        a[(i, j) if i <= j else (j, i)] = val

    for _ in range(sweeps):
        for (p_, q_) in ((0, 1), (0, 2), (1, 2)):
            app, aqq, apq = a[(p_, p_)], a[(q_, q_)], off(p_, q_)
            small = jnp.abs(apq) <= 1e-36
            apq_safe = jnp.where(small, 1.0, apq)
            tau = (aqq - app) / (2.0 * apq_safe)
            # stable angle (Golub & Van Loan); tau == 0 -> t = 1 (45 deg)
            sgn = jnp.where(tau >= 0, 1.0, -1.0)
            t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(small, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            r_ = 3 - p_ - q_
            arp, arq = off(r_, p_), off(r_, q_)
            set_off(r_, p_, c * arp - s * arq)
            set_off(r_, q_, s * arp + c * arq)
            # Jacobi shortcut: app' = app - t*apq, aqq' = aqq + t*apq
            a[(p_, p_)] = app - t * apq
            a[(q_, q_)] = aqq + t * apq
            set_off(p_, q_, zero)
            for i in range(3):
                vip, viq = v[i][p_], v[i][q_]
                v[i][p_] = c * vip - s * viq
                v[i][q_] = s * vip + c * viq
    return a[(0, 0)], a[(1, 1)], a[(2, 2)], v


def _batched_eigh3(a, sweeps: int = 6):
    """(B, 3, 3) symmetric batched eigh via the packed Jacobi core —
    eigenvalues ascending, ``v[:, :, j]`` the j-th eigenvector (the
    jnp.linalg.eigh contract). Convenience/validation wrapper; the PPCG
    step uses the packed core directly to stay off the per-op floor."""
    w0, w1, w2, v = _jacobi3_packed(
        a[:, 0, 0], a[:, 1, 1], a[:, 2, 2],
        a[:, 0, 1], a[:, 0, 2], a[:, 1, 2], sweeps=sweeps)
    w = jnp.stack([w0, w1, w2], axis=-1)
    vm = jnp.stack([jnp.stack(row, axis=-1) for row in v], axis=-2)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    vm = jnp.take_along_axis(vm, order[:, None, :], axis=-1)
    return w, vm


def _batched_rr3(x, ax, w, aw, p, ap, live_w, live_p, nroots):
    """Per-root (3, 3) Rayleigh-Ritz, batched over roots.

    Rows are unit-normalised (or exactly zero when dead), so the metric g
    has a unit diagonal on live directions; dead directions are masked out
    of the whitening and their hw diagonal pushed above the live spectrum so
    the lowest eigenpair never selects them (same masking idiom as
    fused_davidson._masked_eigh)."""
    dtype = x.dtype
    one = jnp.ones((nroots,), dtype)
    lw = live_w.astype(dtype)
    lp = live_p.astype(dtype)
    # everything below is PACKED-component arithmetic on (r,) vectors —
    # the (r, 3, 3)-array formulation (batched eighs + tiny einsums) cost
    # ~1000 us in-loop at r=64 against ~12 us for the dots themselves:
    # dozens of tiny batched ops, each on the ~4-6 us per-op floor
    # (measured 2026-08-21; see _jacobi3_packed)
    xw, xp, wp = _rows_dot(x, w), _rows_dot(x, p), _rows_dot(w, p)
    hxx = _rows_dot(x, ax)
    hxw, hxp = _rows_dot(w, ax), _rows_dot(p, ax)
    hww, hwp, hpp = _rows_dot(w, aw), _rows_dot(p, aw), _rows_dot(p, ap)

    # g rows/cols for dead directions are zero; diagonal one/lw/lp
    gw0, gw1, gw2, gu = _jacobi3_packed(one, lw, lp, xw, xp, wp)
    # dtype-aware whitening floor: rows are unit-normalised so g's entries
    # carry ~eps dot-noise; admitting a direction with gw ~ noise amplifies
    # it by 1/sqrt(gw) into the Ritz update (measured: 1e-10 in f32 with a
    # bf16 operator DIVERGES — residuals grow past the operator norm)
    eps_keep = 1e-10 if dtype == jnp.float64 else 1e-4
    gws = (gw0, gw1, gw2)
    scale = []
    for gwj in gws:
        keepj = gwj > eps_keep
        scale.append(jnp.where(
            keepj, 1.0 / jnp.sqrt(jnp.where(keepj, gwj, 1.0)), 0.0))
    # s_ij = gu_ij * scale_j  (whitening transform, dead columns zeroed)
    s = [[gu[i][j] * scale[j] for j in range(3)] for i in range(3)]
    # hw = s^T h s, computed j <= l so it is exactly symmetric
    h = [[hxx, hxw, hxp], [hxw, hww, hwp], [hxp, hwp, hpp]]
    m = [[h[i][0] * s[0][j] + h[i][1] * s[1][j] + h[i][2] * s[2][j]
          for j in range(3)] for i in range(3)]
    hw = {}
    for j in range(3):
        for l in range(j, 3):
            hw[(j, l)] = (s[0][j] * m[0][l] + s[1][j] * m[1][l]
                          + s[2][j] * m[2][l])
    # dead directions: push their hw diagonal above the live spectrum so
    # the lowest eigenpair never selects them
    absmax = jnp.zeros_like(hxx)
    for val in hw.values():
        absmax = jnp.maximum(absmax, jnp.abs(val))
    big = 4.0 * absmax + 1.0
    for j, gwj in enumerate(gws):
        dead = (gwj <= eps_keep).astype(dtype)
        hw[(j, j)] = hw[(j, j)] + dead * big
    ew0, ew1, ew2, eu = _jacobi3_packed(
        hw[(0, 0)], hw[(1, 1)], hw[(2, 2)],
        hw[(0, 1)], hw[(0, 2)], hw[(1, 2)])
    # lowest eigenpair selection (packed argmin over the 3 diagonals)
    is0 = (ew0 <= ew1) & (ew0 <= ew2)
    is1 = (~is0) & (ew1 <= ew2)
    u = [jnp.where(is0, eu[i][0], jnp.where(is1, eu[i][1], eu[i][2]))
         for i in range(3)]
    c = jnp.stack([s[i][0] * u[0] + s[i][1] * u[1] + s[i][2] * u[2]
                   for i in range(3)], axis=-1)             # (r, 3)
    return c


def _step_body(matvec: Callable[..., Array], nroots: int, rr_every: int):
    def step(state: PPCGState, operand, diag: Array) -> PPCGState:
        x, ax, p, ap = state.x, state.ax, state.p, state.ap

        rho = _rows_dot(x, ax)          # x rows orthonormal
        res = ax - rho[:, None] * x
        errors = jnp.sqrt(jnp.abs(_rows_dot(res, res)))

        # Jacobi-preconditioned correction, projected against X only (the
        # "projected" in PPCG — no history stack to strip information).
        # NOTE: stacking w/p into one Gram matmul was measured a wash at
        # n=32768 r=64 — the concatenate's block copies cost what the
        # saved matmul pass gains (2026-08-21).
        scale_est = jnp.max(jnp.abs(diag)) + jnp.max(jnp.abs(rho))
        w = res / (diag[None, :] - rho[:, None] + 1e-15 * scale_est + 1e-300)
        w = w - jnp.matmul(jnp.matmul(w, x.T, precision=_PREC), x, precision=_PREC)
        cp = jnp.matmul(p, x.T, precision=_PREC)
        p = p - jnp.matmul(cp, x, precision=_PREC)
        ap = ap - jnp.matmul(cp, ax, precision=_PREC)

        wn2 = _rows_dot(w, w)
        live_w = wn2 > 1e-300
        sw = jnp.where(live_w, 1.0 / jnp.sqrt(jnp.where(live_w, wn2, 1.0)), 0.0)
        w = w * sw[:, None]
        pn2 = _rows_dot(p, p)
        # dtype-aware momentum floor: p_new = c1 w + c2 p can nearly cancel,
        # and normalising a ~sqrt(eps) remnant amplifies the CARRIED ap
        # error by 1/|p| — unbounded compounding (measured in f32+bf16:
        # residuals ran to 1e12 past the operator floor). Dropping the
        # momentum row for one iteration is free; amplification stays <=1e3.
        eps_p = 1e-24 if p.dtype == jnp.float64 else 1e-6
        live_p = pn2 > eps_p
        sp = jnp.where(live_p, 1.0 / jnp.sqrt(jnp.where(live_p, pn2, 1.0)), 0.0)
        p = p * sp[:, None]      # sp is exactly 0 on dead rows: this both
        ap = ap * sp[:, None]    # normalises and masks in one multiply

        aw = matvec(w, operand)         # THE matvec of the iteration

        c = _batched_rr3(x, ax, w, aw, p, ap, live_w, live_p, nroots)
        x_new = c[:, 0:1] * x + c[:, 1:2] * w + c[:, 2:3] * p
        ax_new = c[:, 0:1] * ax + c[:, 1:2] * aw + c[:, 2:3] * ap
        p_new = c[:, 1:2] * w + c[:, 2:3] * p
        ap_new = c[:, 1:2] * aw + c[:, 2:3] * ap

        # Cholesky-QR keeps the block exactly orthonormal (rows drift
        # through the independent per-root updates); AX gets the same
        # transform so it stays the exact action of X. The jitter must
        # exceed the Gram's f32 roundoff (a nearly-PSD Gram can read min
        # eigenvalue ~ -1e-6 in f32 and NaN the Cholesky) and caps the
        # whitening amplification when per-root updates drive two rows
        # toward the same eigenvector between full RRs.
        g = jnp.matmul(x_new, x_new.T, precision=_PREC)
        g = g + _chol_jitter(g.dtype) * jnp.eye(nroots, dtype=g.dtype)
        l = jnp.linalg.cholesky(g)
        # invert L against the small identity ONCE, then apply as (r, r)
        # MXU matmuls: a triangular solve against an (r, N) block runs a
        # sequential column sweep per call, and there are two of them.
        # L^-1 of the jittered near-identity Gram is well-conditioned (the
        # jitter bounds the whitening amplification exactly as before).
        li = jax.scipy.linalg.solve_triangular(
            l, jnp.eye(nroots, dtype=g.dtype), lower=True)
        x_new = jnp.matmul(li, x_new, precision=_PREC)
        ax_new = jnp.matmul(li, ax_new, precision=_PREC)

        def full_rr(args):
            x_, ax_, p_, ap_ = args
            h = jnp.matmul(x_, ax_.T, precision=_PREC)
            h = 0.5 * (h + h.T)
            _, cmat = jnp.linalg.eigh(h)
            rot = cmat.T
            x_ = jnp.matmul(rot, x_, precision=_PREC)
            # re-anchor AX with an EXACT action: the carried block picks up
            # roundoff every combination/chol-QR, and an ill-conditioned
            # L^{-1} AMPLIFIES the error component without bound — measured
            # past the bf16 floor, residuals ran 3e-5 -> 314 within 30
            # iterations. One extra matvec per rr_every bounds the drift to
            # a window; the momentum block stays carried (resetting it
            # doubles hard-spectrum iteration counts: 93 -> 198 measured).
            ax_ = matvec(x_, operand)
            return (x_, ax_,
                    jnp.matmul(rot, p_, precision=_PREC),
                    jnp.matmul(rot, ap_, precision=_PREC))

        it = state.it + 1
        x_new, ax_new, p_new, ap_new = jax.lax.cond(
            it % rr_every == 0,
            full_rr,
            lambda args: args,
            (x_new, ax_new, p_new, ap_new),
        )
        return PPCGState(x_new, ax_new, p_new, ap_new, rho, errors, it)

    return step


def make_ppcg_init(matvec: Callable[..., Array], nroots: int):
    """Orthonormalise the guess, run its action, zero momentum — one dispatch."""

    def init(v0: Array, operand) -> PPCGState:
        g = jnp.matmul(v0, v0.T, precision=_PREC)
        # the jitter is calibrated for UNIT-scale rows; the raw user guess
        # can be tiny (row norms ~1e-3 would let an absolute f32 jitter
        # dominate the whole Gram) — scale it to the guess block
        scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(g))), 1e-300)
        l = jnp.linalg.cholesky(
            g + (_chol_jitter(g.dtype) * scale) * jnp.eye(nroots, dtype=g.dtype))
        x = jax.scipy.linalg.solve_triangular(l, v0, lower=True)
        ax = matvec(x, operand)
        rho = _rows_dot(x, ax)
        res = ax - rho[:, None] * x
        errors = jnp.sqrt(jnp.abs(_rows_dot(res, res)))
        return PPCGState(x, ax, jnp.zeros_like(x), jnp.zeros_like(x),
                         rho, errors, jnp.asarray(0, jnp.int32))

    return jax.jit(init)


def make_ppcg_step(matvec, nroots: int, rr_every: int = 5):
    return jax.jit(_step_body(matvec, nroots, rr_every), donate_argnums=(0,))


def make_ppcg_solve(matvec, nroots: int, rr_every: int = 5,
                    history: int = 0):
    """Whole solve in ONE dispatch: while_loop until max error < tol or
    max_iter. Mirrors make_davidson_solve's (state, operand, diag, tol,
    max_iter) -> (state, iterations) contract; ``history > 0`` appends a
    fixed-capacity per-iteration max-residual buffer to the return (same
    semantics as make_davidson_solve's history — entries beyond the run
    stay NaN, runs longer than ``history`` overwrite the last slot)."""
    step = _step_body(matvec, nroots, rr_every)

    def solve(state: PPCGState, operand, diag: Array, tol_, max_iter_):
        hist0 = (jnp.full((history,), jnp.nan, dtype=state.errors.dtype)
                 if history else None)

        def cond(carry):
            s, it = carry[0], carry[1]
            return (it < max_iter_) & (jnp.max(s.errors) > tol_)

        def body(carry):
            s, it = carry[0], carry[1]
            s = step(s, operand, diag)
            if history:
                h = carry[2].at[jnp.minimum(it, history - 1)].set(
                    jnp.max(s.errors))
                return s, it + 1, h
            return s, it + 1

        init = (state, jnp.asarray(0, jnp.int32)) + (
            (hist0,) if history else ())
        out = jax.lax.while_loop(cond, body, init)
        final, iters = out[0], out[1]
        hist_out = out[2] if history else None
        # the step stores the INCOMING iterate's Rayleigh data (the residual
        # is computed before the update); refresh so the returned
        # evals/errors describe the returned x rows — otherwise a max_iter
        # exit pairs stale (and, after a full-RR re-sort, PERMUTED)
        # eigenvalues with the final vectors
        rho = _rows_dot(final.x, final.ax)
        res = final.ax - rho[:, None] * final.x
        errors = jnp.sqrt(jnp.abs(_rows_dot(res, res)))
        final = final._replace(evals=rho, errors=errors)
        if history:
            return final, iters, hist_out
        return final, iters

    return jax.jit(solve)


class FusedPPCG:
    """Driver: whole PPCG solve in one device dispatch.

    Same constructor shape as FusedDavidson minus the basis-capacity knobs
    (there is no basis stack); ``rr_every`` sets the full-RR cadence (the
    measured sweet spot is 3-5: smaller re-couples faster on hard spectra,
    larger amortises the eigh(r)).

    Caveat vs the Davidson families: a root whose guess is degenerate (or
    gets knocked off its target) has no global expanding subspace to
    rediscover an interior eigenvalue — it converges to SOME eigenpair,
    possibly skipping one (measured; Davidson's basis stack recovers).
    Supply linearly independent guesses when the lowest BLOCK matters."""

    def __init__(
        self,
        matvec: Callable[..., Array],
        diagonals,
        n: int,
        nroots: int = 1,
        rr_every: int = 5,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 1000,
        operand=None,
        check_symmetric: bool = True,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        if rr_every < 1:
            raise ValueError("rr_every must be >= 1")
        self.matvec = matvec
        self.n = n
        self.nroots = nroots
        self.rr_every = rr_every
        self.dtype = dtype
        self.tol = convergence_threshold
        self.max_iter = max_iter
        self.operand = operand
        from ..array.vector_ops import adapt_sharding

        self.diag = jnp.asarray(np.asarray(diagonals), dtype=dtype)
        if sharding is not None:
            self.diag = jax.device_put(self.diag, adapt_sharding(sharding, 1))
        self.sharding = sharding
        self._init = make_ppcg_init(matvec, nroots)
        self._solve = make_ppcg_solve(matvec, nroots, rr_every)
        self.n_orig = n
        self.check_symmetric = check_symmetric
        self._symmetry_checked = False

    @classmethod
    def from_dense_symmetric(cls, matrix, nroots: int = 1,
                             tier: Optional[str] = None,
                             b: Optional[int] = None, **kwargs) -> "FusedPPCG":
        """Packed-triangle symmetric operator entry (same tiers and auto
        tile policy as FusedDavidson.from_dense_symmetric)."""
        from .fused_davidson import FusedDavidson

        proto = FusedDavidson.from_dense_symmetric(
            np.asarray(matrix, dtype=np.float64), nroots=nroots, tier=tier, b=b)
        solver = cls(proto.matvec, np.asarray(proto.diag), proto.n, nroots,
                     operand=proto.operand, dtype=proto.dtype, **kwargs)
        solver.n_orig = proto.n_orig
        return solver

    def unpad(self, x) -> np.ndarray:
        return np.asarray(x)[..., : self.n_orig]

    def init_state(self, v0) -> PPCGState:
        v0 = np.asarray(v0)
        if self.n_orig != self.n and v0.shape[-1] == self.n_orig:
            pad = np.zeros((v0.shape[0], self.n - self.n_orig), dtype=v0.dtype)
            v0 = np.concatenate([v0, pad], axis=-1)
        v0j = jnp.asarray(v0, dtype=self.dtype)
        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            v0j = jax.device_put(v0j, adapt_sharding(self.sharding, 2))
        if self.check_symmetric and not self._symmetry_checked:
            from ._symmetry import check_symmetric_operator

            check_symmetric_operator(
                self.matvec, self.operand, v0j.shape, self.dtype,
                "FusedPPCG",
                "solvers.linear_eigensystem.LinearEigensystemDavidson"
                "(hermitian=False)",
                sharding=v0j.sharding if self.sharding is not None else None,
            )
            self._symmetry_checked = True
        return self._init(v0j, self.operand)

    def run_on_device(self, v0):
        """The whole solve in ONE dispatch. Returns (evals, x, errors, iters)
        with eigenvalues/rows sorted ascending (the periodic RR sorts; the
        final state may be mid-window, so sort on exit)."""
        state = self.init_state(v0)
        final, iters = self._solve(state, self.operand, self.diag,
                                   self.tol, self.max_iter)
        # ONE batched fetch (each separate np.asarray costs a tunnel RTT)
        evals, x, errors, iters_h = jax.device_get(
            (final.evals, final.x, final.errors, iters))
        evals = np.asarray(evals)
        order = np.argsort(evals)
        x = np.asarray(x)[order]
        errors = np.asarray(errors)[order]
        from ._finite import check_finite

        check_finite(errors, "FusedPPCG")
        return evals[order], x, errors, int(iters_h)

    run = run_on_device
