"""Fused Davidson eigensolver — the TPU speed-of-light path.

The reference-parity solver (`LinearEigensystemDavidson`) mirrors the C++
control flow with host-side subspace logic; this module is the TPU-first
redesign for production throughput: ONE jitted step function with fully
static shapes that runs the entire Davidson iteration on-device —

  matvec -> masked subspace Rayleigh matrix -> on-device eigh -> Ritz
  reconstruction -> residuals -> Jacobi preconditioning -> Gram-Schmidt
  against the basis -> whitening -> basis append

so the host only checks convergence between steps (one scalar sync). The
basis lives in a fixed-capacity ``(m_max, N)`` stack; slot validity is
tracked with a mask whose inactive diagonal entries are pushed to +inf-like
values before the eigh, replacing the reference's dynamic Q-resizing
(QSpace.h) with compile-once masked arithmetic. Restarts collapse the basis
onto the current Ritz vectors — the DSpaceResetter analogue
(DSpaceResetter.h:69-146) without D-space bookkeeping.

Everything shards over a 1-D device mesh by the vector axis N: the matvec
partitions rows, and XLA inserts the psum for every Gram contraction — the
ICI replacement for the reference's MPI_Allreduce (gemm.h:43-46).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PREC = jax.lax.Precision.HIGHEST


class DavidsonState(NamedTuple):
    v: Array        # (m_max, N) basis stack (rows orthonormal where mask)
    w: Array        # (m_max, N) action stack  A v
    mask: Array     # (m_max,) 1.0 for active slots
    k: Array        # int32 count of appended slots
    evals: Array    # (nroots,) current Ritz values
    x: Array        # (nroots, N) current Ritz vectors
    r: Array        # (nroots, N) current residuals
    errors: Array   # (nroots,) residual norms
    c: Optional[Array] = None   # (m_max, nroots) carried Ritz coefficients
    cm: Optional[Array] = None  # (m_max, nroots) momentum block (rr="window3")


def densify_p_space(p_space, n: int) -> np.ndarray:
    """(n_p, n) f64 dense rows from sparse P vectors.

    Accepts the parity tier's representation (a sequence of
    ``{index: value}`` dicts, subspace/xspace.py::update_pspace /
    reference Pvector = std::map<size_t, double>,
    IterativeSolver.h:131-151), ``(indices, values)`` pairs, or an
    already-dense (n_p, <=n) array (right-padded with zeros — the
    from_dense_symmetric tile padding case)."""
    if hasattr(p_space, "shape") or (
            len(p_space) and hasattr(p_space[0], "shape")
            and np.asarray(p_space[0]).ndim >= 1
            and not isinstance(p_space[0], (tuple, list))):
        arr = np.atleast_2d(np.asarray(p_space, dtype=np.float64))
        if arr.ndim != 2 or arr.shape[1] > n:
            raise ValueError(
                f"dense p_space must be (n_p, <=n), got {arr.shape}")
        rows = np.zeros((arr.shape[0], n))
        rows[:, : arr.shape[1]] = arr
    else:
        rows = np.zeros((len(p_space), n))
        for i, p in enumerate(p_space):
            if isinstance(p, dict):
                for j, val in p.items():
                    rows[i, int(j)] = float(val)
            else:
                idx, vals = p
                rows[i, np.asarray(idx, dtype=np.int64)] = np.asarray(
                    vals, dtype=np.float64)
    # BOTH branches: an all-zero P row would Cholesky-whiten the singular
    # P Gram into a garbage basis row that stays mask=1 forever — silent
    # wrong eigenvalues with near-zero reported errors (measured)
    if not rows.size or not np.all(np.any(rows != 0.0, axis=1)):
        raise ValueError("every P vector must be nonzero")
    return rows


def validate_p_inputs(p_space, p_actions, n: int):
    """Shared constructor-side P-space handling for the fused families
    (FusedDavidson + FusedLinearEquations): densify, validate the action
    rows (shape AND rank — a 1-D row would otherwise die on an opaque
    IndexError), right-pad. Returns ``(p_dense, n_p, p_action_rows)``."""
    if p_space is None:
        if p_actions is not None:
            raise ValueError("p_actions requires p_space")
        return None, 0, None
    p_dense = densify_p_space(p_space, n)
    n_p = p_dense.shape[0]
    p_action_rows = None
    if p_actions is not None:
        pa = np.atleast_2d(np.asarray(p_actions, dtype=np.float64))
        if pa.ndim != 2 or pa.shape[0] != n_p or pa.shape[1] > n:
            raise ValueError(
                f"p_actions must be (n_p, <=n) action rows, got "
                f"{np.asarray(p_actions).shape} for n_p={n_p}, n={n}")
        p_action_rows = np.zeros((n_p, n))
        p_action_rows[:, :pa.shape[1]] = pa
    return p_dense, n_p, p_action_rows


def _masked_eigh(v, w, mask):
    """Rayleigh matrix over active slots; inactive diagonals pushed just above
    the active spectrum so their eigenpairs sort last. The pad value tracks
    the matrix scale dynamically — a huge constant (1e12) would wreck float32
    eigh accuracy through the orthogonal transformations."""
    h = jnp.matmul(v, w.T, precision=_PREC)
    h = 0.5 * (h + h.T)
    m2 = mask[:, None] * mask[None, :]
    h = h * m2
    big = 4.0 * jnp.max(jnp.abs(h)) + 1.0
    h = h + (1.0 - mask)[:, None] * (1.0 - mask)[None, :] * jnp.eye(h.shape[0], dtype=h.dtype) * big
    if (
        jax.config.read("jax_enable_x64")
        and h.dtype != jnp.float64
        and jax.default_backend() != "tpu"
    ):
        # the subspace matrix is tiny: promote the eigh to f64 where f64 is
        # native. On TPU f64 is software-emulated and the emulated eigh costs
        # seconds — there the f32 eigh + Rayleigh-quotient refinement carries
        # the accuracy instead.
        evals, c = jnp.linalg.eigh(h.astype(jnp.float64))
        return evals.astype(h.dtype), c.astype(h.dtype)
    return jnp.linalg.eigh(h)


def _eigh_whiten_cols(p, thresh: float = 1e-8):
    """Orthonormalise the columns of a coefficient block via its Gram
    eigendecomposition, dropping null directions (columns go collinear as
    roots converge — Cholesky jitter would amplify the null directions).
    Returns ``(p_white, keep)``."""
    g = jnp.matmul(p.T, p, precision=_PREC)
    g = 0.5 * (g + g.T)
    gw, gu = jnp.linalg.eigh(g)
    keep = gw > thresh
    scale = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, gw, 1.0)), 0.0)
    return jnp.matmul(p, gu * scale[None, :], precision=_PREC), keep


def _window_rr(v, w, mask, k, c_prev, nroots, m_max, c_mom=None, n_p=0):
    """Locally-optimal window Rayleigh-Ritz: diagonalise H over the 2r-dim
    subspace span[c_prev | newest appended block] instead of the full m-dim
    basis. The newest block's slots are orthonormal to everything older (the
    step Gram-Schmidts new directions against the whole stack), and c_prev
    has no support there, so W is orthonormal by construction — no extra
    factorisation. The small eigh shrinks from (m_max, m_max) to
    (2r, 2r): 163 us -> 71 us at m=64, r=16 on one v5e, which dominates the
    non-matvec cost of a fused iteration. Without ``c_mom`` convergence is
    locally-optimal-without-momentum (LOBPCG minus the p block) — correct
    but slower on hard spectra; passing ``c_mom`` (the coefficient block
    from the step before, rr="window3") appends an eigh-whitened momentum
    group, restoring full LOBPCG three-term recursion at a (3r, 3r) eigh.
    The basis stack still provides full-history orthogonalisation either
    way, so stagnation-by-reintroduction cannot occur.

    ``n_p > 0`` prepends the frozen P-space slots [0, n_p) as an exact
    one-hot group, so every window RR spans the full P space plus the
    carried Ritz block plus the newest appends — the reference's P-space
    is in every subspace solve (IterativeSolverTemplate.h:353-376) and
    this keeps that exactness inside the windowed production path at an
    (n_p + 2r) eigh instead of the full (m, m) one. The carried block is
    projected against P (zeroing its first n_p rows — P slots are unit
    coordinates) and eigh-whitened, since Ritz vectors can develop
    dominant P components as they converge."""
    dtype = v.dtype
    h = jnp.matmul(v, w.T, precision=_PREC)
    h = 0.5 * (h + h.T)
    m2 = mask[:, None] * mask[None, :]
    h = h * m2

    slot = jax.lax.broadcasted_iota(jnp.int32, (m_max, 1), 0)[:, 0]
    groups = []
    keeps = []
    if n_p:
        e_p = jnp.zeros((m_max, n_p), dtype=dtype).at[:n_p, :n_p].set(
            jnp.eye(n_p, dtype=dtype))
        groups.append(e_p)
        keeps.append(jnp.ones((n_p,), dtype=bool))
        # project the carried block against P: P slots are unit
        # coordinates, so the projection is exactly zeroing those rows
        cp = c_prev.at[:n_p].set(0.0)
        cp, keep_c = _eigh_whiten_cols(cp)
    else:
        cp, keep_c = c_prev, jnp.ones((nroots,), dtype=bool)
    # one-hot columns for the newest block's slots [k-r, k), masked by slot
    # validity (appends dropped as null keep mask 0 and must not enter W).
    # With n_p > 0 these slots are always >= n_p (k >= n_p + r), so the
    # group is exactly orthogonal to e_p by construction.
    col = jax.lax.broadcasted_iota(jnp.int32, (m_max, nroots), 1)
    e = jnp.where((slot[:, None] == (k - nroots) + col), 1.0, 0.0).astype(dtype)
    e = e * mask[:, None]
    # project out the carried block (exactly zero overlap except degenerate
    # first step / post-restart, where the newest block IS the carried block)
    e = e - jnp.matmul(cp, jnp.matmul(cp.T, e, precision=_PREC), precision=_PREC)
    n2 = jnp.sum(e * e, axis=0)
    keep = n2 > 0.5  # columns are one-hots: either ~1 or projected to ~0
    e = e * jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, n2, 1.0)), 0.0)[None, :]
    groups += [cp, e]
    keeps += [keep_c, keep]

    if c_mom is not None:
        # momentum group: previous-step Ritz block, projected against the
        # earlier groups then eigh-whitened
        p = c_mom if n_p == 0 else c_mom.at[:n_p].set(0.0)
        p = p - jnp.matmul(cp, jnp.matmul(cp.T, p, precision=_PREC),
                           precision=_PREC)
        p = p - jnp.matmul(e, jnp.matmul(e.T, p, precision=_PREC), precision=_PREC)
        p, keep_p = _eigh_whiten_cols(p)
        groups.append(p)
        keeps.append(keep_p)

    wmat = jnp.concatenate(groups, axis=1)  # (m_max, 2r|3r), orthonormal
    nw = wmat.shape[1]

    hw = jnp.matmul(wmat.T, jnp.matmul(h, wmat, precision=_PREC), precision=_PREC)
    hw = 0.5 * (hw + hw.T)
    colmask = jnp.concatenate([kk.astype(dtype) for kk in keeps])
    hw = hw * (colmask[:, None] * colmask[None, :])
    big = 4.0 * jnp.max(jnp.abs(hw)) + 1.0
    hw = hw + (1.0 - colmask)[:, None] * (1.0 - colmask)[None, :] * jnp.eye(
        nw, dtype=dtype) * big
    evals_all, u = jnp.linalg.eigh(hw)
    cw = u[:, :nroots] * colmask[:, None]
    c_new = jnp.matmul(wmat, cw, precision=_PREC)  # (m_max, r) orthonormal cols
    # eigenvalues of dropped (big-padded) columns sort last; blank them and
    # pad to an (m_max,) vector so expand hooks see the full path's SHAPE.
    # Semantics caveat: the max over active entries is the top Ritz value of
    # the WINDOW (2r/3r values), not of the whole m-dim subspace — hooks
    # that calibrate on the full-subspace top edge (the Chebyshev filter)
    # should run with rr="full"
    n_active = jnp.sum(colmask.astype(jnp.int32))
    idx = jax.lax.broadcasted_iota(jnp.int32, (nw, 1), 0)[:, 0]
    clean = jnp.where(idx < n_active, evals_all, -jnp.inf)
    padded = jnp.full((m_max,), -jnp.inf, dtype=dtype).at[:nw].set(clean)
    return evals_all[:nroots], c_new, padded


def _validate_rr(rr: str, nroots: int, m_max: int, n_p: int = 0) -> None:
    width = {"full": 1, "window": 2, "window3": 3, "anchored": 2}.get(rr)
    if width is None:
        raise ValueError(f"unknown rr mode {rr!r}: use 'full', 'window', "
                         "'window3' or 'anchored'")
    # every mode needs room for the carried block PLUS one full append
    # (PLUS the frozen P slots): with less the post-restart append's
    # dynamic_update_slice CLAMPS its offset and silently overwrites live
    # basis rows — the solve then cycles without converging instead of
    # erroring
    if max(2, width) * nroots + n_p > m_max:
        raise ValueError(
            f"rr={rr!r} needs m_max >= {max(2, width)}*nroots + n_p "
            f"({max(2, width) * nroots + n_p}), got {m_max}")


def _step_body(
    matvec: Callable[..., Array],
    nroots: int,
    m_max: int,
    null_thresh: float = 1e-10,
    expand: Optional[Callable] = None,
    rr: str = "full",
    fuse_chain: bool = False,
    n_p: int = 0,
    anchor_every: int = 4,
):
    """Raw (unjitted) single-iteration body shared by step and sweep.

    ``n_p > 0`` marks the leading n_p stack slots as a frozen, densified
    P space (IterativeSolver.h:131-151): appends and restarts never touch
    them, the GS/RR machinery sees them through the ordinary mask, and
    the window RR carries them as an exact group (_window_rr).

    ``expand(x, r, evals, evals_all, mask, diag, operand) -> t`` produces the
    new direction block; the default is the Jacobi/Davidson preconditioner
    applied to the residuals (IterativeSolver.h:34-44 semantics).

    ``rr`` selects the Rayleigh-Ritz strategy: "full" diagonalises the whole
    masked (m_max, m_max) subspace matrix every step (reference Davidson
    semantics); "window" carries the Ritz coefficient block and solves a
    (2r, 2r) locally-optimal window instead; "window3" adds the LOBPCG
    momentum block — a (3r, 3r) window with near-full-Davidson convergence
    (requires m_max >= 3*nroots; see _window_rr); "anchored" runs the
    window every step but a FULL (m, m) RR every ``anchor_every``-th
    iteration (lax.cond on the loop counter) — the session-3 exploration
    ("anchored window", CLAUDE.md): the periodic full solve restores the
    cross-root subspace coupling the pure window loses, so convergence
    tracks full Davidson while the amortised eigh cost drops toward the
    window's. The anchored step takes the iteration counter as a fourth
    argument (the solve/sweep loops supply theirs; a bare call anchors).

    ``fuse_chain`` runs the precondition + Gram-Schmidt + norms + Gram part
    of the step as ONE Pallas kernel (ops/kernels/chain_pallas.py) instead
    of ~10 individually-dispatched XLA ops — same math, fewer trips through
    the ~5 us per-op floor. Single-device only (do not combine with a
    mesh-sharded basis) and the stacks must fit VMEM (fits_vmem guard);
    FusedDavidson auto-enables it when safe."""
    _validate_rr(rr, nroots, m_max, n_p)

    def step(state: DavidsonState, operand, diag: Array, it=0) -> DavidsonState:
        v, w, mask, k = state.v, state.w, state.mask, state.k
        if rr in ("window", "window3", "anchored"):
            def window_branch(_):
                return _window_rr(
                    v, w, mask, k, state.c, nroots, m_max,
                    c_mom=state.cm if rr == "window3" else None, n_p=n_p,
                )

            if rr == "anchored":
                def full_branch(_):
                    ea, c = _masked_eigh(v, w, mask)
                    return ea[:nroots], c[:, :nroots] * mask[:, None], ea

                evals, c_new, evals_all = jax.lax.cond(
                    jnp.asarray(it, jnp.int32) % anchor_every == 0,
                    full_branch, window_branch, None)
            else:
                evals, c_new, evals_all = window_branch(None)
            coeff = c_new.T  # (nroots, m_max)
        else:
            evals_all, c = _masked_eigh(v, w, mask)
            coeff = (c[:, :nroots] * mask[:, None]).T  # (nroots, m_max)
            evals = evals_all[:nroots]
            c_new = coeff.T
        x = jnp.matmul(coeff, v, precision=_PREC)
        ax = jnp.matmul(coeff, w, precision=_PREC)
        # Rayleigh-quotient refinement: full-length dots are ~eps*||A||
        # accurate, recovering eigenvalue accuracy the small eigh may lack
        # (and minimising the residual norm over the eigenvalue)
        xx = jnp.einsum("in,in->i", x, x, precision=_PREC)
        xax = jnp.einsum("in,in->i", x, ax, precision=_PREC)
        evals = jnp.where(xx > 0, xax / jnp.where(xx > 0, xx, 1.0), evals)
        r = ax - evals[:, None] * x
        errors = jnp.sqrt(jnp.abs(jnp.einsum("in,in->i", r, r, precision=_PREC)))

        from ..ops.kernels.chain_pallas import fused_expand_chain, whiten_after_chain

        if fuse_chain:
            if expand is None:
                # Jacobi preconditioning runs INSIDE the kernel
                t, n0_2, n2, g = fused_expand_chain(r, v, mask, diag, evals)
            else:
                t = expand(x, r, evals, evals_all, mask, diag, operand)
                t, n0_2, n2, g = fused_expand_chain(t.astype(v.dtype), v, mask)
            # the kernel's Gram is over UNnormalised rows; whitening applied
            # as ONE (r, r) @ (r, N) matmul (L^{-1} diag(s) kept at O(r^2))
            t, keep = whiten_after_chain(t, n0_2, n2, nroots, null_thresh, g=g)
        else:
            if expand is None:
                # Jacobi/Davidson preconditioner (IterativeSolver.h:34-44
                # semantics, with the regulariser made RELATIVE to the
                # spectrum scale — the reference's absolute 1e-15 swamps the
                # true denominator for operators scaled near/below 1e-15)
                scale_est = jnp.max(jnp.abs(diag)) + jnp.max(jnp.abs(evals))
                t = r / (diag[None, :] - evals[:, None]
                         + 1e-15 * scale_est + 1e-300)
            else:
                t = expand(x, r, evals, evals_all, mask, diag, operand)

            # null detection must be scale-invariant: compare post-GS norms
            # to the PRE-GS norms (a dependent direction is annihilated
            # relative to its own magnitude, whatever the operator scaling)
            n0_2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
            # orthogonalise against the basis: two classical GS passes, each
            # one matmul pair (the fused analogue of propose_rspace's MGS)
            for _ in range(2):
                proj = jnp.matmul(t, v.T, precision=_PREC) * mask[None, :]
                t = t - jnp.matmul(proj, v, precision=_PREC)
            n2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
            t, keep = whiten_after_chain(t, n0_2, n2, nroots, null_thresh)

        # append at slot k
        v_new = jax.lax.dynamic_update_slice(v, t.astype(v.dtype), (k, jnp.zeros((), k.dtype)))
        w_new = jax.lax.dynamic_update_slice(w, matvec(t, operand).astype(w.dtype), (k, jnp.zeros((), k.dtype)))
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (m_max, 1), 0)[:, 0]
        new_mask_rows = (slot_ids >= k) & (slot_ids < k + nroots)
        keep_full = jnp.zeros((m_max,), dtype=bool).at[:nroots].set(keep)
        keep_rolled = jnp.roll(keep_full, k)
        mask_new = jnp.where(new_mask_rows & keep_rolled, 1.0, mask)
        c_out = c_new if state.c is not None or rr != "full" else None
        # the outgoing Ritz block becomes next step's momentum (window3)
        cm_out = state.c if state.cm is not None else None
        return DavidsonState(v_new, w_new, mask_new, k + nroots, evals, x, r, errors,
                             c_out, cm_out)

    return step


def make_davidson_step(matvec, nroots: int, m_max: int, null_thresh: float = 1e-10,
                       expand: Optional[Callable] = None, rr: str = "full",
                       fuse_chain: bool = False, n_p: int = 0,
                       anchor_every: int = 4):
    """Jitted single iteration: state, operand, diag -> state. The operator
    data and diagonals are traced ARGUMENTS, not closed-over constants, so
    multi-GB operators never get baked into the HLO (essential for
    remote-compile paths and donation)."""
    return jax.jit(_step_body(matvec, nroots, m_max, null_thresh, expand, rr,
                              fuse_chain, n_p, anchor_every),
                   donate_argnums=(0,))


def make_davidson_sweep(matvec, nroots: int, m_max: int, steps: int, null_thresh: float = 1e-10,
                        expand: Optional[Callable] = None, rr: str = "full",
                        fuse_chain: bool = False, n_p: int = 0,
                        anchor_every: int = 4):
    """Jitted multi-iteration sweep: ``steps`` Davidson iterations in ONE
    dispatch (lax.fori_loop), amortising host/tunnel launch latency — the
    analogue of the reference's batched BufferManager passes, but for control
    overhead instead of IO."""
    body = _step_body(matvec, nroots, m_max, null_thresh, expand, rr,
                      fuse_chain, n_p, anchor_every)

    def sweep(state: DavidsonState, operand, diag: Array,
              it0=0) -> DavidsonState:
        # it0: global iteration offset so the anchored cadence does not
        # phase-reset at every sweep boundary (_drive_sweeps passes
        # sweeps_done * steps)
        return jax.lax.fori_loop(
            0, steps, lambda i, s: body(s, operand, diag, it0 + i), state)

    # NOTE: no donation — buffer donation on fori_loop carries trips an
    # INVALID_ARGUMENT in the axon TPU runtime (single-step donation is fine).
    return jax.jit(sweep)


def _restart_body(matvec: Callable[..., Array], nroots: int, m_max: int,
                  n_p: int = 0):
    """Collapse the basis onto the current Ritz vectors (DSpaceResetter
    analogue). With ``n_p > 0`` the frozen P slots [0, n_p) survive the
    collapse untouched (basis AND action rows — no operator re-application)
    and the Ritz block is orthogonalised against them; a Ritz vector that
    has converged INTO the P span projects to (near) zero and its slot
    restarts dead (eigh-whitening with null-drop — Cholesky would NaN on
    the rank deficiency)."""

    def restart(state: DavidsonState, operand) -> DavidsonState:
        x = state.x
        if n_p:
            pv = state.v[:n_p]
            pw = state.w[:n_p]
            pc = jnp.matmul(x, pv.T, precision=_PREC)  # (r, n_p) P coords
            for _ in range(2):
                x = x - jnp.matmul(jnp.matmul(x, pv.T, precision=_PREC), pv,
                                   precision=_PREC)
            xo_t, keep = _eigh_whiten_cols(x.T, thresh=1e-10)
            xo = xo_t.T
            live = keep.astype(state.mask.dtype)
            v = jnp.zeros_like(state.v).at[:n_p].set(pv)
            v = jax.lax.dynamic_update_slice(v, xo.astype(v.dtype),
                                             (n_p, 0))
            w = jnp.zeros_like(state.w).at[:n_p].set(pw)
            w = jax.lax.dynamic_update_slice(
                w, (matvec(xo, operand) * live[:, None]).astype(w.dtype),
                (n_p, 0))
            mask = jnp.zeros_like(state.mask).at[:n_p].set(1.0)
            mask = jax.lax.dynamic_update_slice(mask, live, (n_p,))
            if state.c is not None:
                # exact coordinates of the outgoing Ritz block in the fresh
                # basis: P components + whitened-complement components
                cx = jnp.matmul(xo, x.T, precision=_PREC)  # (r, r)
                c0 = jnp.zeros_like(state.c)
                c0 = c0.at[:n_p, :].set(pc.T)
                c0 = jax.lax.dynamic_update_slice(c0, cx, (n_p, 0))
            else:
                c0 = None
            cm0 = None if state.cm is None else jnp.zeros_like(state.cm)
            return DavidsonState(
                v, w, mask, jnp.asarray(n_p + nroots, dtype=state.k.dtype),
                state.evals, state.x, state.r, state.errors, c0, cm0)
        g = jnp.matmul(x, x.T, precision=_PREC)
        l = jnp.linalg.cholesky(g + 1e-30 * jnp.eye(nroots, dtype=g.dtype))
        xo = jax.scipy.linalg.solve_triangular(l, x, lower=True)
        v = jnp.zeros_like(state.v).at[:nroots].set(xo)
        w = jnp.zeros_like(state.w).at[:nroots].set(matvec(xo, operand))
        mask = jnp.zeros_like(state.mask).at[:nroots].set(1.0)
        if state.c is not None:
            # the carried Ritz block collapses onto the fresh basis slots
            c0 = jnp.zeros_like(state.c).at[:nroots, :nroots].set(
                jnp.eye(nroots, dtype=state.c.dtype))
        else:
            c0 = None
        cm0 = None if state.cm is None else jnp.zeros_like(state.cm)
        return DavidsonState(v, w, mask, jnp.asarray(nroots, dtype=state.k.dtype),
                             state.evals, state.x, state.r, state.errors, c0, cm0)

    return restart


def make_restart(matvec: Callable[..., Array], nroots: int, m_max: int,
                 n_p: int = 0):
    return jax.jit(_restart_body(matvec, nroots, m_max, n_p),
                   donate_argnums=(0,))


def _init_body(matvec: Callable[..., Array], nroots: int, m_max: int,
               n_p: int = 0, p_actions: bool = False):
    """Whole state initialisation as ONE device computation: orthonormalise
    the guess block, run its action, and lay out the fixed-capacity stacks.
    The host version of this (matmul, host Cholesky, scatter, matvec) costs
    ~4-6 dispatches — ~110 ms through the tunnel before the solve even
    starts; fused it is a single dispatch.

    ``n_p > 0``: the init takes two extra arguments — ``p`` (n_p, N)
    densified P rows and ``wp`` their action rows. The P block is whitened
    (Cholesky — the reference requires linearly independent P vectors,
    IterativeSolverTemplate.h:353-376) and frozen into slots [0, n_p);
    the guess block is Gram-Schmidted against it. With ``p_actions=True``
    ``wp`` holds USER-SUPPLIED exact action rows (the fused analogue of
    pp_action_matrix + p_action, IterativeSolver.h:131-151 — supplying
    A·p_i exactly makes every PP and PQ block of the projected matrix
    exact regardless of the operator tier's quantisation); otherwise
    ``wp`` is ignored and the device operator computes the actions."""

    def init_p(v0: Array, operand, p: Array, wp: Array) -> DavidsonState:
        _, n = v0.shape
        gp = jnp.matmul(p, p.T, precision=_PREC)
        lp = jnp.linalg.cholesky(gp + 1e-30 * jnp.eye(n_p, dtype=gp.dtype))
        pw = jax.scipy.linalg.solve_triangular(lp, p, lower=True)
        if p_actions:
            # the whitening transform is linear: exact user actions map
            # through the same triangular solve
            wpw = jax.scipy.linalg.solve_triangular(lp, wp, lower=True)
        else:
            wpw = matvec(pw, operand)
        for _ in range(2):
            v0 = v0 - jnp.matmul(jnp.matmul(v0, pw.T, precision=_PREC), pw,
                                 precision=_PREC)
        # guesses fully inside the P span project to zero: eigh-whitening
        # drops them as dead slots instead of NaN-ing a Cholesky
        v0o_t, keep = _eigh_whiten_cols(v0.T, thresh=1e-10)
        v0o = v0o_t.T
        live = keep.astype(v0.dtype)
        w0 = matvec(v0o, operand) * live[:, None]
        v = jnp.zeros((m_max, n), dtype=v0.dtype).at[:n_p].set(
            pw.astype(v0.dtype))
        v = jax.lax.dynamic_update_slice(v, v0o.astype(v0.dtype), (n_p, 0))
        w = jnp.zeros((m_max, n), dtype=v0.dtype).at[:n_p].set(
            wpw.astype(v0.dtype))
        w = jax.lax.dynamic_update_slice(w, w0.astype(v0.dtype), (n_p, 0))
        mask = jnp.zeros((m_max,), dtype=v0.dtype).at[:n_p].set(1.0)
        mask = jax.lax.dynamic_update_slice(mask, live, (n_p,))
        xx = jnp.einsum("in,in->i", v0o, v0o, precision=_PREC)
        rho = jnp.einsum("in,in->i", v0o, w0, precision=_PREC) / jnp.where(
            xx > 0, xx, 1.0)
        r0 = w0 - rho[:, None] * v0o
        errors = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", r0, r0, precision=_PREC)))
        # a guess swallowed by the P span has a ZERO seed residual — that
        # is "untested", not "converged": the whole-solve while_loop would
        # exit before its first RR. Dead slots seed at inf; the first step
        # replaces them with honest windowed-RR residuals.
        errors = jnp.where(live > 0, errors, jnp.inf)
        c0 = jnp.zeros((m_max, nroots), dtype=v0.dtype)
        c0 = jax.lax.dynamic_update_slice(
            c0, jnp.eye(nroots, dtype=v0.dtype) * live[:, None], (n_p, 0))
        cm0 = jnp.zeros((m_max, nroots), dtype=v0.dtype)
        return DavidsonState(v, w, mask, jnp.asarray(n_p + nroots, jnp.int32),
                             rho, v0o, r0, errors, c0, cm0)

    if n_p:
        return init_p

    def init(v0: Array, operand) -> DavidsonState:
        _, n = v0.shape
        g = jnp.matmul(v0, v0.T, precision=_PREC)
        l = jnp.linalg.cholesky(g + 1e-30 * jnp.eye(nroots, dtype=g.dtype))
        v0o = jax.scipy.linalg.solve_triangular(l, v0, lower=True)
        w0 = matvec(v0o, operand)
        v = jnp.zeros((m_max, n), dtype=v0.dtype).at[:nroots].set(v0o)
        w = jnp.zeros((m_max, n), dtype=v0.dtype).at[:nroots].set(w0)
        mask = jnp.zeros((m_max,), dtype=v0.dtype).at[:nroots].set(1.0)
        # seed evals/x/r/errors with the guess block's HONEST Rayleigh data
        # (also guarantees every state field is a distinct live buffer — two
        # identical constants could be CSE'd into one, which the step's
        # donation would then alias twice)
        xx = jnp.einsum("in,in->i", v0o, v0o, precision=_PREC)
        rho = jnp.einsum("in,in->i", v0o, w0, precision=_PREC) / jnp.where(xx > 0, xx, 1.0)
        r0 = w0 - rho[:, None] * v0o
        errors = jnp.sqrt(jnp.abs(jnp.einsum("in,in->i", r0, r0, precision=_PREC)))
        c0 = jnp.zeros((m_max, nroots), dtype=v0.dtype).at[:nroots, :nroots].set(
            jnp.eye(nroots, dtype=v0.dtype))
        # momentum starts at zero: the whitening drops null columns until a
        # real previous Ritz block exists
        cm0 = jnp.zeros((m_max, nroots), dtype=v0.dtype)
        return DavidsonState(v, w, mask, jnp.asarray(nroots, jnp.int32),
                             rho, v0o, r0, errors, c0, cm0)

    return init


def make_davidson_init(matvec: Callable[..., Array], nroots: int, m_max: int,
                       n_p: int = 0, p_actions: bool = False):
    return jax.jit(_init_body(matvec, nroots, m_max, n_p, p_actions))


def make_davidson_solve(
    matvec,
    nroots: int,
    m_max: int,
    tol: Optional[float] = None,
    max_iter: Optional[int] = None,
    null_thresh: float = 1e-10,
    expand: Optional[Callable] = None,
    rr: str = "full",
    history: int = 0,
    fuse_chain: bool = False,
    n_p: int = 0,
    anchor_every: int = 4,
):
    """The whole solve in ONE dispatch: a lax.while_loop that steps until
    convergence or ``max_iter``, restarting on-device whenever the basis
    fills. This is the production entry — on a remote/tunneled TPU the host
    round-trip otherwise dominates (observed ~28 ms RTT vs ~1 ms of compute
    per iteration).

    ``tol`` and ``max_iter`` are runtime arguments of the returned function
    (traced scalars), so one compilation serves every convergence setting;
    passing them here instead binds them for backward compatibility.

    ``history > 0`` records the max residual norm of each iteration into a
    fixed-capacity ``(history,)`` device buffer (entries beyond the actual
    iteration count stay NaN; if the solve runs LONGER than ``history``,
    the final slot keeps being overwritten with the latest residual — size
    history >= max_iter to capture the whole curve) and returns
    ``(final, iters, errors_history)``
    — convergence curves out of the single-dispatch black box at the cost
    of one scalar store per iteration (the observability the reference gets
    from per-iteration report() printing, IterativeSolverTemplate.h:273-287,
    without breaking the fused loop)."""
    step = _step_body(matvec, nroots, m_max, null_thresh, expand, rr,
                      fuse_chain, n_p, anchor_every)
    restart = _restart_body(matvec, nroots, m_max, n_p)

    def solve(state: DavidsonState, operand, diag: Array, tol_, max_iter_):
        hist0 = (
            jnp.full((history,), jnp.nan, dtype=state.errors.dtype)
            if history else None
        )

        def cond(carry):
            s, it = carry[0], carry[1]
            return (it < max_iter_) & (jnp.max(s.errors) > tol_)

        def body(carry):
            s, it = carry[0], carry[1]
            s = jax.lax.cond(
                s.k + nroots > m_max,
                lambda ss: restart(ss, operand),
                lambda ss: ss,
                s,
            )
            s = step(s, operand, diag, it)
            if history:
                h = carry[2].at[jnp.minimum(it, history - 1)].set(
                    jnp.max(s.errors))
                return s, it + 1, h
            return s, it + 1

        init = (state, jnp.asarray(0, jnp.int32)) + ((hist0,) if history else ())
        final = jax.lax.while_loop(cond, body, init)
        if history:
            return final[0], final[1], final[2]
        return final[0], final[1]

    solve_jit = jax.jit(solve)
    if tol is None and max_iter is None:
        return solve_jit

    def bound(state, operand, diag):
        return solve_jit(state, operand, diag, tol, max_iter)

    return bound


def make_davidson_solve_chunked(
    matvec,
    nroots: int,
    m_max: int,
    null_thresh: float = 1e-10,
    expand: Optional[Callable] = None,
    rr: str = "full",
    fuse_chain: bool = False,
    n_p: int = 0,
    anchor_every: int = 4,
):
    """Whole solve in one dispatch with the convergence check hoisted to
    restart boundaries: the outer lax.while_loop runs one basis-fill sweep
    (a lax.fori_loop of ``(m_max-nroots)//nroots`` steps, no per-iteration
    scalar sync) per trip. Sweeps start by collapsing the basis onto the
    Ritz block whenever a full sweep would not fit, so the fori body never
    needs a capacity branch. Measured at parity with the per-iteration
    while_loop on a single chip (291 vs 291 us/iter) — XLA's on-device cond
    is free there — but the sweep form checks convergence 1/fill as often,
    which matters once the cond's scalar reduction requires a cross-chip
    sync on a sharded mesh. Iteration counts are quantised up to the sweep
    length."""
    step = _step_body(matvec, nroots, m_max, null_thresh, expand, rr,
                      fuse_chain, n_p, anchor_every)
    restart = _restart_body(matvec, nroots, m_max, n_p)
    # with P slots the post-restart basis already holds n_p + nroots rows —
    # a sweep sized without them would append past capacity (DUS clamp =
    # silent corruption)
    fill_steps = max(1, (m_max - n_p - nroots) // nroots)

    def solve(state: DavidsonState, operand, diag: Array, tol_, max_iter_):
        def cond(carry):
            s, it = carry
            return (it < max_iter_) & (jnp.max(s.errors) > tol_)

        def body(carry):
            s, it = carry
            s = jax.lax.cond(
                s.k + fill_steps * nroots > m_max,
                lambda ss: restart(ss, operand),
                lambda ss: ss,
                s,
            )
            # GLOBAL iteration counter for the anchored cadence: a
            # per-sweep i would reset the anchor phase every fill
            s = jax.lax.fori_loop(
                0, fill_steps, lambda i, ss: step(ss, operand, diag, it + i), s)
            return s, it + fill_steps

        final, iters = jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))
        return final, iters

    return jax.jit(solve)


def make_batched_davidson_solve(
    matvec,
    nroots: int,
    m_max: int,
    null_thresh: float = 1e-10,
    expand: Optional[Callable] = None,
    rr: str = "full",
    anchor_every: int = 4,
):
    """Many independent eigenproblems in ONE dispatch: the whole-solve
    while_loop vmapped over a leading operand batch axis.

    A geometry/parameter scan solving B small systems pays the dispatch
    constant and per-op overhead ONCE instead of B times, and the batched
    matvecs keep the MXU fed where a single small-N solve cannot — a
    capability with no reference analogue (one MPI world solves one system
    at a time; measured 6-7x vs sequential dispatches for 8 x n=1024
    solves on one chip). Returns ``(batched_init, batched_solve)``:

        states = batched_init(v0_batch, operand_batch)       # (B, r, N), (B, ...)
        final, iters = batched_solve(states, operand_batch, diag_batch, tol, max_iter)

    Each batch element reports its own iteration count (quantised up to the
    basis-fill sweep length); under vmap the combined loop runs until the
    slowest element converges (converged elements hold their state). The matvec must be vmap-compatible (the
    XLA paths are; the Pallas packed kernels are not — pass the dense or
    `symm_matmat` action for batched work)."""
    # the chunked solve hoists the restart cond to sweep boundaries: under
    # vmap a batched lax.cond lowers to select-over-both-branches, so the
    # per-iteration restart branch of the plain solve would execute (and be
    # discarded) every iteration for every element; per-sweep it amortises
    # over the basis-fill length. Iteration counts quantise to the sweep.
    solve = make_davidson_solve_chunked(matvec, nroots, m_max,
                                        null_thresh=null_thresh,
                                        expand=expand, rr=rr,
                                        anchor_every=anchor_every)
    init = make_davidson_init(matvec, nroots, m_max)
    batched_init = jax.jit(jax.vmap(init, in_axes=(0, 0)))
    batched_solve = jax.jit(jax.vmap(solve, in_axes=(0, 0, 0, None, None)))
    return batched_init, batched_solve


class FusedDavidson:
    """Driver around the jitted step: host only checks errors between steps."""

    def __init__(
        self,
        matvec: Callable[..., Array],
        diagonals,
        n: int,
        nroots: int = 1,
        m_max: Optional[int] = None,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 200,
        operand=None,
        expand: Optional[Callable] = None,
        matvecs_per_direction: int = 1,
        rr: str = "full",
        fuse_chain: Optional[bool] = None,
        check_symmetric: bool = True,
        p_space=None,
        p_actions=None,
        anchor_every: int = 4,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        self.p_dense, self.n_p, self.p_action_rows = validate_p_inputs(
            p_space, p_actions, n)
        eff_m_max = m_max if m_max is not None else max(
            4 * nroots + self.n_p, min(n, 24))
        _validate_rr(rr, nroots, eff_m_max, self.n_p)
        self.matvec = matvec
        self.n = n
        self.nroots = nroots
        self.m_max = eff_m_max
        self.dtype = dtype
        self.sharding = sharding
        self.tol = convergence_threshold
        self.max_iter = max_iter
        self.diag = jnp.asarray(np.asarray(diagonals), dtype=dtype)
        if sharding is not None:
            # blocks shard as (rows, N); the rank-1 diagonal shards by its
            # only axis, which matches the blocks' vector axis
            from jax.sharding import NamedSharding, PartitionSpec

            spec = sharding.spec
            diag_spec = PartitionSpec(spec[-1]) if len(spec) else PartitionSpec()
            self.diag = jax.device_put(self.diag, NamedSharding(sharding.mesh, diag_spec))
        self.operand = operand
        self.expand = expand
        # matvec count per appended direction (Chebyshev expansion applies
        # the operator ``degree`` extra times per block)
        self.matvecs_per_direction = matvecs_per_direction
        self.rr = rr
        if fuse_chain is None:
            # auto: the fused chain kernel is single-device Pallas (a
            # mesh-sharded basis must keep the XLA chain so GSPMD inserts
            # the psums) and grid-free (stacks must fit VMEM)
            from ..ops.kernels.chain_pallas import fits_vmem

            fuse_chain = (
                jax.default_backend() == "tpu"
                and sharding is None
                and dtype == jnp.float32
                and fits_vmem(nroots, eff_m_max, n)
            )
        self.fuse_chain = fuse_chain
        self.anchor_every = max(1, int(anchor_every))
        self.step = make_davidson_step(matvec, nroots, self.m_max, expand=expand, rr=rr,
                                       fuse_chain=fuse_chain, n_p=self.n_p,
                                       anchor_every=self.anchor_every)
        self.restart = make_restart(matvec, nroots, self.m_max, n_p=self.n_p)
        self.iterations = 0
        self.check_symmetric = check_symmetric
        self._symmetry_checked = False
        self.matvecs = 0
        self.n_orig = n   # from_dense_symmetric pads n to the tile multiple

    @classmethod
    def from_dense_symmetric(cls, matrix, nroots: int = 1, tier: Optional[str] = None,
                             b: Optional[int] = None, **kwargs) -> "FusedDavidson":
        """Build the solver around the packed-triangle symmetric action.

        ``tier`` selects the operator storage (see ops/kernels/symm_pallas.py):

        - ``"fast"``    bf16 tiles, single-pass MXU dots — quarter the dense
                        traffic, ~2^-8 operator accuracy. The residual floor
                        scales with the operator norm/structure (2e-4 on the
                        benchmark spectrum) — check convergence_threshold
                        against it or prefer "precise";
        - ``"precise"`` split double-bf16 — f32 bytes, ~2^-16 operator, and
                        the per-tile f32 accumulation floors residuals ~50x
                        below a dense XLA matvec;
        - ``"exact"``   native-precision tiles with HIGHEST dots;
        - ``"int8"``    one quantized plane (ops/kernels/symm_int8.py) —
                        HALF the bf16 tier's bytes and double-rate MXU dots
                        at the same residual-floor class (error bounded by
                        the geometric mean of the equilibrated row scales);
        - ``"int8_precise"`` two quantized planes — the "precise" accuracy
                        class (~2^-16 operator) at half its streamed bytes.

        Default: "precise" on TPU, "exact" elsewhere. On non-TPU backends all
        tiers run through the portable XLA packed path at native precision
        ("fast" simply stores bf16 tiles). The matrix is padded to the tile
        multiple internally; returned Ritz vectors carry the padded width —
        slice with ``solver.unpad(x)``.
        """
        import dataclasses

        from ..ops.kernels.symm_pallas import (
            SymmetricBlocked,
            SymmetricBlockedSplit,
            symm_matmat,
            symm_matmat_pallas,
            symm_matmat_split,
            symm_matmat_split_pallas,
        )

        matrix = np.asarray(matrix, dtype=np.float64)
        n = matrix.shape[0]
        on_tpu = jax.default_backend() == "tpu"
        if tier is None:
            tier = "precise" if on_tpu else "exact"
        if tier not in ("fast", "precise", "exact", "int8", "int8_precise"):
            raise ValueError(
                f"unknown tier {tier!r}: use 'fast', 'precise', 'exact', "
                "'int8' or 'int8_precise'")
        if b is None:
            # measured at n=8192/r=16 on one v5e: bf16 tiles stream at the
            # DMA roof with b=1024 (90 us vs 103 at b=512 — fewer grid steps
            # beat the extra padded-diagonal bytes); the split tier streams
            # TWO tile stacks (double the buffered VMEM) and is fastest at
            # b=512 (401 vs 411 us/iter). Take the larger tile only when it
            # costs no extra zero padding over b=512 — for n far from a
            # 1024 multiple the padding (up to 512 dead rows of HBM traffic
            # and Ritz-vector width every iteration) outweighs the ~13 us
            # grid-step saving.
            b = 512
            if (tier in ("fast", "int8", "int8_precise")
                    and -(-n // 1024) * 1024 == -(-n // 512) * 512):
                # int8 tiles are 1/4 the f32 bytes, so even the two-plane
                # tier's double-buffered VMEM fits at b=1024; measured
                # (r3): two-plane kernel 108 vs 119 us, whole r16/m64 step
                # 0.207 vs 0.243 ms/iter (best-of-plausible marginals)
                b = 1024

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
            # "fast" stores bf16 tiles on EVERY backend so CPU tests see the
            # same operator accuracy the TPU path has
            tile_dtype = jnp.bfloat16 if tier == "fast" else None
            sym = SymmetricBlocked.from_dense(matrix, b=b, dtype=tile_dtype)
            operand = (sym.values, sym.ii, sym.jj)

            def matvec(x, op):
                s = dataclasses.replace(sym, values=op[0], ii=op[1], jj=op[2])
                if on_tpu:
                    return symm_matmat_pallas(x, s)
                return symm_matmat(x, s).astype(x.dtype)

        n_pad = sym.shape[0]
        # padded diagonal entries sit far above the spectrum so diagonal-based
        # guesses and P-space selection never pick the dead coordinates
        diag = np.full(n_pad, np.abs(matrix).sum(axis=1).max() + 1.0)
        diag[:n] = np.diagonal(matrix)
        solver = cls(matvec, diag, n_pad, nroots, operand=operand, **kwargs)
        solver.n_orig = n
        return solver

    def unpad(self, x) -> np.ndarray:
        """Strip the tile padding from a returned (rows, n_pad) block."""
        return np.asarray(x)[..., : self.n_orig]

    def init_state(self, v0) -> DavidsonState:
        v0 = np.asarray(v0)
        if self.n_orig != self.n and v0.shape[-1] == self.n_orig:
            # from_dense_symmetric padded the operator to the tile multiple;
            # transparently pad matching caller guesses with zeros (any other
            # width mismatch should fail loudly downstream)
            v0 = np.concatenate(
                [v0, np.zeros(v0.shape[:-1] + (self.n - v0.shape[-1],))], axis=-1
            )
        v0 = jnp.asarray(v0, dtype=self.dtype)
        if self.sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            spec = self.sharding.spec
            v0 = jax.device_put(v0, NamedSharding(self.sharding.mesh, PartitionSpec(None, spec[-1])))
        if self.check_symmetric and not self._symmetry_checked:
            from ._symmetry import check_symmetric_operator

            check_symmetric_operator(
                self.matvec, self.operand, v0.shape, self.dtype,
                "FusedDavidson",
                "solvers.linear_eigensystem.LinearEigensystemDavidson"
                "(hermitian=False)",
                sharding=v0.sharding if self.sharding is not None else None,
            )
            self._symmetry_checked = True
        if getattr(self, "_init_cache", None) is None:
            self._init_cache = make_davidson_init(
                self.matvec, self.nroots, self.m_max, n_p=self.n_p,
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
            state = self._init_cache(v0, self.operand, *self._p_dev)
        else:
            state = self._init_cache(v0, self.operand)
        if self.sharding is not None:
            state = state._replace(
                v=jax.device_put(state.v, self.sharding),
                w=jax.device_put(state.w, self.sharding),
            )
        self.matvecs += self.nroots
        return state

    def run(self, v0):
        state = self.init_state(v0)
        for it in range(self.max_iter):
            if int(state.k) + self.nroots > self.m_max:
                state = self.restart(state, self.operand)
            state = self.step(state, self.operand, self.diag, it)
            self.iterations += 1
            self.matvecs += self.nroots * self.matvecs_per_direction
            errors = np.asarray(state.errors)
            if np.all(errors <= self.tol):
                break
        from ._finite import check_finite

        check_finite(np.asarray(state.errors), "FusedDavidson")
        return (
            np.asarray(state.evals),
            state.x,
            np.asarray(state.errors),
            self.iterations,
        )

    def run_on_device(self, v0, chunked: bool = False):
        """Entire solve in one dispatch (lax.while_loop driver).

        ``chunked=True`` uses the sweep-chunked loop (convergence checked
        only at restart boundaries): ~50 us/iteration faster, but the
        iteration count is quantised up to the basis-fill length."""
        key = (self.tol, self.max_iter, chunked)
        if getattr(self, "_solve_cache_key", None) != key:
            # cache the jitted whole-solve: rebuilding per call would force a
            # full XLA recompilation every run
            if chunked:
                chunk_fn = make_davidson_solve_chunked(
                    self.matvec, self.nroots, self.m_max, expand=self.expand,
                    rr=self.rr, fuse_chain=self.fuse_chain, n_p=self.n_p,
                    anchor_every=self.anchor_every,
                )
                tol_, max_iter_ = self.tol, self.max_iter
                self._solve_cache = lambda st, op, dg: chunk_fn(st, op, dg, tol_, max_iter_)
            else:
                self._solve_cache = make_davidson_solve(
                    self.matvec, self.nroots, self.m_max, self.tol, self.max_iter,
                    expand=self.expand, rr=self.rr, fuse_chain=self.fuse_chain,
                    n_p=self.n_p, anchor_every=self.anchor_every,
                )
            self._solve_cache_key = key
        solve = self._solve_cache
        state = self.init_state(v0)
        final, iters = solve(state, self.operand, self.diag)
        # ONE batched fetch: separate np.asarray calls each cost a ~28 ms
        # tunnel round-trip (x stays on device — callers fetch if needed)
        evals_h, errors_h, iters_h = jax.device_get(
            (final.evals, final.errors, iters))
        self.iterations += int(iters_h)
        self.matvecs += int(iters_h) * self.nroots * self.matvecs_per_direction
        from ._finite import check_finite

        check_finite(np.asarray(errors_h), "FusedDavidson")
        return (
            np.asarray(evals_h),
            final.x,
            np.asarray(errors_h),
            int(iters_h),
        )

    def run_fast(self, v0, checkpoint_path=None, checkpoint_every: int = 1):
        """Sweep-based driver: fills the basis to capacity in one dispatch per
        sweep, checking convergence only at restart boundaries. Same math as
        ``run`` with far fewer host round-trips — the production TPU path.

        ``checkpoint_path`` persists the DavidsonState every
        ``checkpoint_every`` sweeps; continue an interrupted run with
        :meth:`resume_fast`."""
        state = self.init_state(v0)
        return self._drive_sweeps(state, checkpoint_path, checkpoint_every)

    def resume_fast(self, checkpoint_path: str, keep_checkpointing=True,
                    checkpoint_every: int = 1):
        """Continue a run_fast interrupted after a checkpoint; restores the
        iteration/matvec counters and (by default) keeps checkpointing to
        the same path."""
        from ..utils.checkpoint import load_fused_state

        shard = self.sharding
        state, meta = load_fused_state(checkpoint_path, sharding=shard,
                                       dtype=self.dtype)
        if tuple(state.v.shape) != (self.m_max, self.n):
            raise ValueError(
                f"checkpoint stacks are {tuple(state.v.shape)} but this "
                f"solver is configured (m_max={self.m_max}, n={self.n})")
        # byte-identical shapes can still mean a DIFFERENT solver: an
        # nroots mismatch dies in an obscure jit carry-type error, and an
        # n_p mismatch would silently reinterpret frozen P slots as
        # ordinary basis rows — validate the recorded configuration
        for field, mine in (("nroots", self.nroots), ("n_p", self.n_p),
                            ("rr", self.rr)):
            if field in meta and meta[field] != mine:
                raise ValueError(
                    f"checkpoint was written with {field}={meta[field]!r} "
                    f"but this solver has {field}={mine!r}")
        self.iterations = int(meta.get("iterations", self.iterations))
        self.matvecs = int(meta.get("matvecs", self.matvecs))
        # checkpoints are saved POST-sweep, i.e. with the basis at
        # capacity; run()'s own loop restarts before the next sweep, and
        # sweeping without it makes the appends clamp onto live rows (the
        # DUS silent-corruption mode — measured 4-8x worse residuals on
        # the first resumed sweep). Also skip the sweep entirely when the
        # checkpoint is already converged or out of budget.
        errors = np.asarray(state.errors)
        if np.all(errors <= self.tol) or self.iterations >= self.max_iter:
            from ._finite import check_finite

            check_finite(errors, "FusedDavidson")
            return (np.asarray(state.evals), state.x, errors,
                    self.iterations)
        if int(np.asarray(state.k)) + self.nroots > self.m_max:
            state = self.restart(state, self.operand)
        return self._drive_sweeps(
            state, checkpoint_path if keep_checkpointing else None,
            checkpoint_every)

    def _drive_sweeps(self, state, checkpoint_path, checkpoint_every):
        steps = max(1, (self.m_max - self.n_p - self.nroots) // self.nroots)
        if getattr(self, "_sweep_cache", None) is None:
            self._sweep_cache = make_davidson_sweep(
                self.matvec, self.nroots, self.m_max, steps, expand=self.expand,
                rr=self.rr, fuse_chain=self.fuse_chain, n_p=self.n_p,
                anchor_every=self.anchor_every,
            )
        sweep = self._sweep_cache
        max_sweeps = max(1, self.max_iter // steps + 1)
        sweeps_done = 0
        for _ in range(max_sweeps):
            state = sweep(state, self.operand, self.diag,
                          sweeps_done * steps)
            self.iterations += steps
            self.matvecs += steps * self.nroots * self.matvecs_per_direction
            errors = np.asarray(state.errors)
            sweeps_done += 1
            if checkpoint_path is not None and (
                    sweeps_done % max(1, checkpoint_every) == 0):
                from ..utils.checkpoint import save_fused_state

                save_fused_state(state, checkpoint_path,
                                 iterations=self.iterations,
                                 matvecs=self.matvecs, tol=float(self.tol),
                                 nroots=self.nroots, n_p=self.n_p,
                                 rr=self.rr)
            if np.all(errors <= self.tol) or self.iterations >= self.max_iter:
                break
            state = self.restart(state, self.operand)
        from ._finite import check_finite

        check_finite(np.asarray(state.errors), "FusedDavidson")
        return (
            np.asarray(state.evals),
            state.x,
            np.asarray(state.errors),
            self.iterations,
        )
