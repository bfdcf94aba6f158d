"""Chunked-dispatch non-hermitian Davidson (the TPU production path).

The reference solves non-hermitian eigenproblems through its one Davidson
template (hermiticity option, LinearEigensystemDavidson.h:130-184) with
the complex-pair machinery of helper-implementation.h:382-527. Until this
module, the repo carried that capability only on the host-driven parity
solver — reference-class algorithms at ~100x below the fused symmetric
path's relative speed (one ~28 ms tunnel round-trip per O(N) stage).

TPU constraint shaping the design: the small non-symmetric subspace
eigenproblem has NO TPU lowering (``jnp.linalg.eig`` is CPU-only), so a
single-dispatch ``while_loop`` like fused_davidson's is impossible.
Instead each outer iteration runs as exactly ONE jitted device chunk
containing every O(N) stage —

    Ritz reconstruction  X = C V,  AX = C W
    pair-aware residuals R = AX - LAMBDA X       (one (r,r)@(r,N) matmul)
    Jacobi-preconditioned expansion, two-pass classical Gram-Schmidt
    null-drop + Cholesky whitening (chain_pallas.whiten_after_chain)
    basis append + operator application W_new = matvec(t)
    incremental projected matrix H = (mask V) (mask W)^T

— and the host touches only (m_max, m_max) matrices between chunks:
LAPACK ``eig``, ascending-real-part ordering, complex-pair extraction.
Dispatch economics: 1 chunk round-trip per block append + 1 restart
round-trip per basis fill, against the parity solver's ~10 round-trips
per iteration.

Complex pairs stay in REAL arithmetic end-to-end (the reference's real
instantiation does the same; its complex<double> build is an
assert(false) stub): for a conjugate pair a +- bi with eigenvector
p + iq, the rows x_p = p^T V, x_q = q^T V satisfy

    A x_p ~ a x_p - b x_q          A x_q ~ b x_p + a x_q

so the host packs LAMBDA with 2x2 blocks [[a, -b], [b, a]] (scalars for
real roots) and the device needs no complex dtype — complex arithmetic
would halve MXU rate and double HBM traffic for zero accuracy gain.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST


class NonSymDeviceState(NamedTuple):
    """Checkpointable state of the device-RR loop between chunks — enough
    to re-dispatch ``run_cont`` (x/errs/restarts are recomputed fresh each
    chunk). Serialises through utils.checkpoint.save_fused_state /
    load_named_state like the symmetric DavidsonState."""

    v: Array
    w: Array
    mask: Array
    k: Array
    h: Array
    C: Array
    best_err: Array
    bx: Array
    bG: Array
    bR: Array
    it: Array


class LineqDeviceState(NamedTuple):
    """Checkpointable between-chunks state of the lineq device loop."""

    v: Array
    w: Array
    mask: Array
    k: Array
    h: Array
    beta: Array
    best_err: Array
    bx: Array
    berrs: Array
    it: Array


def ritz_nonsym(h: np.ndarray, nroots: int):
    """Host-side small-matrix stage: right eigenpairs of the projected
    matrix, ascending by real part, complex-conjugate pairs converted to
    real (p, q) coefficient rows with their 2x2 LAMBDA block.

    Returns ``(evals_complex (nroots,), coeff (nroots, k), lam (nroots,
    nroots), shifts (nroots,))`` — coeff rows reconstruct X = coeff @ V;
    lam is the real block-diagonal residual matrix; shifts the real parts
    used by the Jacobi preconditioner. Mirrors the semantics of
    helper-implementation.h:382-448 (sort + pair rotation) on the
    standard-eigenproblem case the fused path maintains (V orthonormal).
    """
    k = h.shape[0]
    nroots = min(nroots, k)
    w, vr = np.linalg.eig(h)
    order = np.argsort(w.real, kind="stable")
    w = w[order]
    vr = vr[:, order]
    coeff = np.zeros((nroots, k))
    lam = np.zeros((nroots, nroots))
    evals = np.zeros((nroots,), dtype=np.complex128)
    i = 0
    while i < nroots:
        li = w[i]
        if abs(li.imag) > 1e-13 * max(1.0, abs(li)):
            # For a REAL h, LAPACK returns exact conjugate pairs adjacent
            # and the stable real-part sort keeps them adjacent (pair
            # members share an exactly equal key). Still, verify before
            # consuming slot i+1: a distinct root with near-equal real
            # part must not be silently overwritten with the synthesized
            # conjugate. If the partner sits elsewhere, swap it in.
            d = np.abs(w[i + 1:] - np.conj(li))
            if d.size:
                j = i + 1 + int(np.argmin(d))
                if d[j - (i + 1)] <= 1e-8 * max(1.0, abs(li)) and j != i + 1:
                    w[[i + 1, j]] = w[[j, i + 1]]
                    vr[:, [i + 1, j]] = vr[:, [j, i + 1]]
            if (d.size == 0
                    or abs(w[i + 1] - np.conj(li)) > 1e-8 * max(1.0, abs(li))):
                # no conjugate partner anywhere (cannot happen for real h;
                # defensive for near-degenerate f32-noise spectra): treat
                # the root independently at its real part rather than
                # fabricating a partner
                y = vr[:, i].real
                nrm = np.linalg.norm(y)
                mx = int(np.argmax(np.abs(y)))
                if y[mx] < 0:
                    y = -y
                coeff[i] = y / (nrm if nrm > 0 else 1.0)
                lam[i, i] = li.real
                evals[i] = li.real
                i += 1
                continue
            if i + 1 >= nroots:
                # pair straddles the window boundary: DROP it rather than
                # split a conjugate pair (the reference never tracks half
                # a pair either); the caller sees r_eff = i < nroots
                return (evals[:i], coeff[:i], lam[:i, :i],
                        np.real(evals[:i]))
            a, b = li.real, abs(li.imag)
            y = vr[:, i] if li.imag > 0 else np.conj(vr[:, i])
            p, q = y.real, y.imag
            sp = np.linalg.norm(p) or 1.0
            sq = np.linalg.norm(q) or 1.0
            coeff[i] = p / sp
            coeff[i + 1] = q / sq
            # rescaling rows rescales the pair coupling: with x_p = p/sp,
            # x_q = q/sq, A x_p = a x_p - b (sq/sp) x_q etc.
            lam[i, i] = a
            lam[i + 1, i + 1] = a
            lam[i, i + 1] = -b * (sq / sp)
            lam[i + 1, i] = b * (sp / sq)
            evals[i] = a + 1j * b
            evals[i + 1] = a - 1j * b
            i += 2
        else:
            y = vr[:, i].real
            nrm = np.linalg.norm(y)
            mx = int(np.argmax(np.abs(y)))
            if y[mx] < 0:
                y = -y
            coeff[i] = y / (nrm if nrm > 0 else 1.0)
            lam[i, i] = li.real
            evals[i] = li.real
            i += 1
    return evals, coeff, lam, evals.real.copy()


def _make_append(matvec: Callable, r: int, m_max: int, null_thresh: float):
    """Shared append stage of both chunked families: two-pass classical GS
    against the live basis, null-drop + Cholesky whitening, stack append,
    operator application, roll-based mask update. One definition so the
    invariants (null test, keep/mask bookkeeping) cannot drift between the
    eigen and linear-equations twins."""
    from ..ops.kernels.chain_pallas import whiten_after_chain

    def append(v, w, mask, k, t, operand):
        vm = v * mask[:, None]
        n0_2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
        tt = t
        for _ in range(2):
            proj = jnp.matmul(tt, vm.T, precision=_PREC)
            tt = tt - jnp.matmul(proj, vm, precision=_PREC)
        n2 = jnp.einsum("in,in->i", tt, tt, precision=_PREC)
        tt, keep = whiten_after_chain(tt, n0_2, n2, r, null_thresh)
        w_rows = matvec(tt, operand).astype(w.dtype)
        v_new = jax.lax.dynamic_update_slice(
            v, tt.astype(v.dtype), (k, jnp.zeros((), k.dtype)))
        w_new = jax.lax.dynamic_update_slice(
            w, w_rows, (k, jnp.zeros((), k.dtype)))
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (m_max, 1), 0)[:, 0]
        new_rows = (slot_ids >= k) & (slot_ids < k + r)
        keep_full = jnp.zeros((m_max,), dtype=bool).at[:r].set(keep)
        mask_new = jnp.where(new_rows & jnp.roll(keep_full, k), 1.0, mask)
        return v_new, w_new, mask_new, k + r, tt, w_rows

    return append


def _incremental_update(h, v, w, mask, k0, rows):
    """Incremental projected-matrix update: only the ``rows`` appended
    slots change (old stack rows are append-only), so two
    (rows, m_max) @ (m_max, N)-shaped products replace the full
    2*m_max^2*N recompute (~a third of a matvec at r16/m64). Returns
    ``(h, new_v)`` — new_v lets the lineq twin update its RHS projection
    from the same slice."""
    vm2 = v * mask[:, None]
    wm2 = w * mask[:, None]
    zero = jnp.zeros((), k0.dtype)
    new_v = jax.lax.dynamic_slice(vm2, (k0, zero), (rows, v.shape[1]))
    new_w = jax.lax.dynamic_slice(wm2, (k0, zero), (rows, w.shape[1]))
    h = jax.lax.dynamic_update_slice(
        h, jnp.matmul(new_v, wm2.T, precision=_PREC), (k0, zero))
    h = jax.lax.dynamic_update_slice(
        h, jnp.matmul(vm2, new_w.T, precision=_PREC), (zero, k0))
    return h, new_v


def _reset_core(matvec: Callable, r: int, m_max: int, x, operand):
    """Shared init/restart core: orthonormalise an (r, N) block with
    zero rows kept DEAD (a straddling-pair window returns r_eff < r rows;
    re-marking them live puts a zero row/column into H whose spurious
    eigenvalue 0 can sort below the true spectrum and come back as a
    "converged" zero eigenvector), apply the operator, lay out fresh
    stacks. Returns (v, w, mask, h)."""
    from ..array.vector_ops import chol_jitter

    g = jnp.matmul(x, x.T, precision=_PREC)
    g = 0.5 * (g + g.T)
    gd = jnp.diagonal(g)
    live = gd > 1e-12 * jnp.maximum(jnp.max(gd), 1e-300)
    g = g + chol_jitter(g.dtype) * jnp.eye(r, dtype=g.dtype)
    l = jnp.linalg.cholesky(g)
    t = jax.scipy.linalg.solve_triangular(l, x, lower=True)
    t = t * live[:, None].astype(t.dtype)
    w_rows = matvec(t, operand)
    v = jnp.zeros((m_max, x.shape[1]), x.dtype).at[:r].set(t)
    w = jnp.zeros((m_max, x.shape[1]), x.dtype).at[:r].set(w_rows)
    mask = jnp.zeros((m_max,), x.dtype).at[:r].set(live.astype(x.dtype))
    h = jnp.matmul(v * mask[:, None], (w * mask[:, None]).T, precision=_PREC)
    return v, w, mask, h


def make_nonsym_chunk(matvec: Callable, nroots: int, m_max: int,
                      null_thresh: float = 1e-10, inner: int = 1):
    """``inner`` appends' worth of O(N) work as a single jitted dispatch.

    Append 1 expands the Jacobi-preconditioned residual at the host-given
    Ritz data; appends 2..inner are frozen-shift Krylov enrichment — the
    new block's residual proxy (A - shift) t reuses the matvec already
    paid for the append, so each extra inner step costs ONE matvec plus
    small ops and no host round-trip (GD+k-style subspace enrichment; the
    shifts go stale within a chunk, which costs a little iteration
    quality for a ``1/inner`` cut in dispatch count — measured trade in
    docs/PERF.md)."""
    append = _make_append(matvec, nroots, m_max, null_thresh)

    @jax.jit
    def chunk(v, w, mask, k, h, coeff, lam, shifts, operand, diag):
        vm = v * mask[:, None]
        wm = w * mask[:, None]
        x = jnp.matmul(coeff, vm, precision=_PREC)      # (r, N)
        ax = jnp.matmul(coeff, wm, precision=_PREC)
        r_blk = ax - jnp.matmul(lam, x, precision=_PREC)
        errors = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", r_blk, r_blk, precision=_PREC)))
        # Jacobi preconditioner at the Ritz real parts (IterativeSolver.h:
        # 34-44 semantics, regulariser relative to the spectrum scale)
        scale_est = jnp.max(jnp.abs(diag)) + jnp.max(jnp.abs(shifts))
        denom = diag[None, :] - shifts[:, None] + 1e-15 * scale_est + 1e-300

        k0 = k
        t = r_blk / denom
        v, w, mask, k, t_app, w_rows = append(v, w, mask, k, t, operand)
        for _ in range(inner - 1):
            # frozen-shift enrichment: residual proxy of the block just
            # appended, using its already-computed operator image
            t = (w_rows - shifts[:, None] * t_app) / denom
            v, w, mask, k, t_app, w_rows = append(v, w, mask, k, t, operand)
        h, _ = _incremental_update(h, v, w, mask, k0, inner * nroots)
        return v, w, mask, k, h, x, errors

    return chunk


def make_nonsym_reset(matvec: Callable, nroots: int, m_max: int):
    """Init/restart: orthonormalise an (r, N) block, apply the operator,
    lay out fresh (m_max, N) stacks + projected matrix. One dispatch."""

    @jax.jit
    def reset(x, operand):
        v, w, mask, h = _reset_core(matvec, nroots, m_max, x, operand)
        return v, w, mask, jnp.asarray(nroots, jnp.int32), h

    return reset


@jax.jit
def _rotate_x(bx, coeff):
    """Final device-side pair rotation of the best snapshot's rows —
    dispatched WITHOUT a fetch (the result stays a device array; errors
    come from the host-rotated (r, r) residual Gram instead), so the
    solve wall pays no O(N) transfer."""
    return jnp.matmul(coeff, bx, precision=_PREC)


def _check_live_p_guess(p_dense, v0, r, n_p, what):
    """A C row seeded on a dead slot stays identically zero forever — its
    residual row reads 0 and a FABRICATED eigenvalue 0.0 displaces a true
    root (reproduced at n_p=1, r=2 with both guesses inside span(P)). P
    slots are always live, so the danger is only n_p < r with guesses
    swallowed by the P span; check on the HOST with the same GS the
    device init applies and refuse loudly."""
    if n_p >= r:
        return
    pd = np.asarray(p_dense, dtype=np.float64)
    q, _ = np.linalg.qr(pd.T)
    pw = q.T[:n_p]
    v = np.asarray(v0, dtype=np.float64)
    for _ in range(2):
        v = v - (v @ pw.T) @ pw
    norms2 = np.einsum("in,in->i", v, v)
    live = int(np.sum(norms2 > 1e-12 * max(float(norms2.max()), 1e-300)))
    if n_p + live < r:
        raise ValueError(
            f"{what}: only {n_p} P rows + {live} guess rows outside the P "
            f"span for {r} requested roots/RHS — provide initial guesses "
            "with components outside span(P) (a dead tracking row would "
            "return a fabricated zero eigenvalue)")


def _whiten_p(p, wp, use_actions, matvec, operand, n_p):
    """Shared P-block whitening for both nonsym device tiers: Cholesky of
    the P Gram with a dtype-aware jitter (a 1e-30 constant is a no-op in
    f32 — nearly-dependent P vectors would NaN the Cholesky and surface
    as an opaque FloatingPointError instead of this message)."""
    from ..array.vector_ops import chol_jitter

    gp = jnp.matmul(p, p.T, precision=_PREC)
    gp = gp + chol_jitter(gp.dtype) * jnp.eye(n_p, dtype=gp.dtype)
    lp = jnp.linalg.cholesky(gp)
    pv = jax.scipy.linalg.solve_triangular(lp, p, lower=True)
    if use_actions:
        pw = jax.scipy.linalg.solve_triangular(lp, wp, lower=True)
    else:
        pw = matvec(pv, operand)
    return pv, pw


def _live_one_hot(mask, r):
    """(r, m_max) one-hot rows over the FIRST r live slots: a guess row
    fully inside the P span dies in the GS (fused_davidson.init_p
    semantics) — seeding C on a dead slot would make x = 0 and read as
    instant convergence with zero vectors. P slots are always live, so
    with n_p >= r the start is a pure-P window the refine rotates."""
    pos = jnp.cumsum(mask) * mask            # 1-based rank among live
    return (pos[None, :]
            == jnp.arange(1, r + 1, dtype=mask.dtype)[:, None]).astype(
                mask.dtype)


def _reset_core_p(matvec: Callable, r: int, m_max: int, x, operand,
                  pv, pw):
    """P-preserving init/collapse core for the non-hermitian device tier:
    the frozen P slots [0, n_p) keep their basis AND action rows (no
    operator re-application), the (r, N) block is Gram-Schmidted against
    them and orthonormalised with dead-row handling (a block row swallowed
    by the P span stays dead — fused_davidson._restart_body semantics)."""
    from ..array.vector_ops import chol_jitter

    n_p = pv.shape[0]
    for _ in range(2):
        x = x - jnp.matmul(jnp.matmul(x, pv.T, precision=_PREC), pv,
                           precision=_PREC)
    g = jnp.matmul(x, x.T, precision=_PREC)
    g = 0.5 * (g + g.T)
    gd = jnp.diagonal(g)
    live = gd > 1e-12 * jnp.maximum(jnp.max(gd), 1e-300)
    g = g + chol_jitter(g.dtype) * jnp.eye(r, dtype=g.dtype)
    l = jnp.linalg.cholesky(g)
    t = jax.scipy.linalg.solve_triangular(l, x, lower=True)
    t = t * live[:, None].astype(t.dtype)
    w_rows = matvec(t, operand) * live[:, None].astype(t.dtype)
    v = jnp.zeros((m_max, x.shape[1]), x.dtype).at[:n_p].set(
        pv.astype(x.dtype))
    v = jax.lax.dynamic_update_slice(v, t.astype(x.dtype), (n_p, 0))
    w = jnp.zeros((m_max, x.shape[1]), x.dtype).at[:n_p].set(
        pw.astype(x.dtype))
    w = jax.lax.dynamic_update_slice(w, w_rows.astype(x.dtype), (n_p, 0))
    mask = jnp.zeros((m_max,), x.dtype).at[:n_p].set(1.0)
    mask = jax.lax.dynamic_update_slice(mask, live.astype(x.dtype), (n_p,))
    h = jnp.matmul(v * mask[:, None], (w * mask[:, None]).T, precision=_PREC)
    return v, w, mask, h, t


def _make_refine(r: int, m_max: int, rr_steps: int):
    """Device-side RR refinement shared by the single-dispatch and the
    batched sweep paths: simultaneous Rayleigh-quotient inverse iteration —
    each row refines through its OWN shifted solve (batched LU); the
    near-singularity at a converged shift amplifies exactly the wanted
    direction, the slight left bias prefers the lower member of a tie, and
    chol-whitening re-orthonormalisation restores independence when
    neighbouring rows contract onto the same eigenvector."""
    from ..array.vector_ops import chol_jitter

    def _orth(ct, eye_r):
        # bound amplification before the Gram (PPCG f32 rule: carried
        # normalisations must not compound)
        ct = ct / jnp.maximum(
            jnp.max(jnp.abs(ct), axis=1, keepdims=True), 1e-30)
        g = jnp.matmul(ct, ct.T, precision=_PREC)
        g = 0.5 * (g + g.T) + chol_jitter(g.dtype) * eye_r
        l = jnp.linalg.cholesky(g)
        return jax.scipy.linalg.solve_triangular(l, ct, lower=True)

    def refine(C, h, mask, do_global):
        mm = mask[:, None] * mask[None, :]
        scale = jnp.max(jnp.abs(h)) + 1.0
        hm = h * mm + jnp.diag((1.0 - mask) * 10.0 * scale)
        eye = jnp.eye(m_max, dtype=h.dtype)
        eye_r = jnp.eye(r, dtype=h.dtype)
        G = jnp.matmul(jnp.matmul(C, hm.T, precision=_PREC), C.T,
                       precision=_PREC)
        for _ in range(rr_steps):
            shifts = jnp.diagonal(G)
            smin = jnp.min(shifts)
            scale_s = jnp.max(jnp.abs(shifts)) + 1.0
            # GLOBAL leftmost-selection step first (one common shift just
            # below the window): per-root RQI alone only TRACKS whatever
            # the block already spans — with a poorly-overlapping guess it
            # converges onto a wrong interior root with a genuinely small
            # residual (hf 11x11: eigenvalue error 0.214 = the root-2/3
            # spacing, in f64, while exact host RR finds the true pair).
            # The common-shift inverse step amplifies the leftmost
            # directions present in the GROWN basis each iteration, so a
            # missed lower root swaps in as the subspace expands; the
            # per-root RQI then supplies the fast local convergence.
            # GATED on ``do_global`` (residuals still far from tol):
            # near the noise floor the step keeps kicking locked rows by
            # floor-level perturbations (measured: 108 vs 27 iterations
            # to the int8_precise f32 floor).
            sigma_g = smin - 0.1 * (jnp.max(shifts) - smin) \
                - 1e-3 * (jnp.abs(smin) + 1.0)

            def global_step(args):
                C, G = args
                ct = jnp.linalg.solve(hm - sigma_g * eye, C.T).T
                Cn = _orth(ct, eye_r)
                Gn = jnp.matmul(jnp.matmul(Cn, hm.T, precision=_PREC),
                                Cn.T, precision=_PREC)
                return Cn, Gn

            C, G = jax.lax.cond(do_global, global_step, lambda a: a, (C, G))
            shifts = jnp.diagonal(G)
            sigmas = shifts - 1e-5 * scale_s
            a_b = hm[None, :, :] - sigmas[:, None, None] * eye[None, :, :]
            ct = jnp.linalg.solve(a_b, C[:, :, None])[..., 0]   # (r, m_max)
            C = _orth(ct, eye_r)
            G = jnp.matmul(jnp.matmul(C, hm.T, precision=_PREC), C.T,
                           precision=_PREC)
        return C, G, jnp.diagonal(G)

    return refine


def _make_nonsym_iterate(matvec: Callable, r: int, m_max: int,
                         null_thresh: float, rr_steps: int):
    """One device-RR Davidson iteration (refine -> Ritz block -> residual
    Gram -> best-snapshot -> preconditioned append -> incremental H), no
    restart — shared by the single-dispatch loop and the batched sweep
    solve so their invariants cannot drift."""
    append = _make_append(matvec, r, m_max, null_thresh)
    refine = _make_refine(r, m_max, rr_steps)

    def iterate(v, w, mask, k, h, C, best_err, bx, bG, bR, operand, diag,
                do_global):
        C, G, shifts = refine(C, h, mask, do_global)
        vm = v * mask[:, None]
        wm = w * mask[:, None]
        x = jnp.matmul(C, vm, precision=_PREC)
        ax = jnp.matmul(C, wm, precision=_PREC)
        rblk = ax - jnp.matmul(G, x, precision=_PREC)
        # (r, r) residual Gram: diag -> row-norm errors; rotated by the
        # final host eig as coeff R_gram coeff^T with no O(N) fetch
        r_gram = jnp.matmul(rblk, rblk.T, precision=_PREC)
        errs = jnp.sqrt(jnp.abs(jnp.diagonal(r_gram)))
        maxe = jnp.max(errs)
        better = maxe < best_err
        best_err = jnp.where(better, maxe, best_err)
        bx = jnp.where(better, x, bx)
        bG = jnp.where(better, G, bG)
        bR = jnp.where(better, r_gram, bR)
        scale_est = jnp.max(jnp.abs(diag)) + jnp.max(jnp.abs(shifts))
        denom = diag[None, :] - shifts[:, None] + 1e-15 * scale_est + 1e-300
        t = rblk / denom
        k0 = k
        v, w, mask, k, _t_app, _w_rows = append(v, w, mask, k, t, operand)
        h, _ = _incremental_update(h, v, w, mask, k0, r)
        return v, w, mask, k, h, C, x, errs, best_err, bx, bG, bR

    return iterate


def _make_nonsym_collapse(matvec: Callable, r: int, m_max: int,
                          n_p: int = 0):
    """Restart: collapse onto the Ritz block x; matvec re-anchors AX
    exactly (carried-quantity rule — a whitening-transform shortcut would
    accumulate f32 drift across restarts). With ``n_p > 0`` the frozen P
    slots [0, n_p) survive untouched (basis and action rows, read from
    the incoming stacks) and the Ritz block re-orthogonalises against
    them."""

    def collapse(x, k, operand, v, w):
        if n_p:
            pv = v[:n_p]
            # EXACT coordinates of the outgoing Ritz block in the fresh
            # basis (fused_davidson._restart_body semantics): restarting
            # C from a P-only window instead resets the refine's progress
            # every basis fill — measured limit cycle at ~1e-5 residual
            # on hf while the coordinate-preserving form descends
            pc = jnp.matmul(x, pv.T, precision=_PREC)        # (r, n_p)
            rv, rw, rmask, rh, t = _reset_core_p(
                matvec, r, m_max, x, operand, pv, w[:n_p])
            xs = x - jnp.matmul(pc, pv, precision=_PREC)
            cx = jnp.matmul(xs, t.T, precision=_PREC)        # (r, r)
            rC = jnp.zeros((r, m_max), x.dtype).at[:, :n_p].set(
                pc.astype(x.dtype))
            rC = jax.lax.dynamic_update_slice(
                rC, cx.astype(x.dtype), (0, n_p))
            return rv, rw, rmask, jnp.asarray(n_p + r, k.dtype), rh, rC
        rv, rw, rmask, rh = _reset_core(matvec, r, m_max, x, operand)
        rC = jnp.zeros((r, m_max), x.dtype).at[:, :r].set(
            jnp.eye(r, dtype=x.dtype))
        return rv, rw, rmask, jnp.asarray(r, k.dtype), rh, rC

    return collapse


def make_nonsym_device_loop(matvec: Callable, r: int, m_max: int,
                            null_thresh: float = 1e-10, rr_steps: int = 1,
                            n_p: int = 0, p_actions: bool = False):
    """Single-dispatch non-hermitian Davidson loop: the whole solve as ONE
    jitted ``while_loop`` with NO host eig inside.

    ``jnp.linalg.eig`` has no TPU lowering, but the iteration never needs
    an explicit eigendecomposition — only the invariant SUBSPACE of the
    leftmost eigenvalues, which inverse subspace iteration reaches with
    ops that DO lower on TPU (`lu`-backed solve, Cholesky):

        C' <- (H_m - sigma I)^{-1} C^T         (right-eigvec directions)
        C  <- chol-whiten(C')                  (orthonormal rows)
        G  =  C H_m^T C^T                      (small Galerkin matrix)

    With basis rows V, action rows W, and projected H[i,j] = <v_i, A v_j>,
    the Ritz block is X = C V, AX = C W, and the residual of the
    invariant-subspace equation is R = C W - G (C V) in REAL arithmetic —
    a complex-conjugate pair is tracked as its real 2D invariant subspace,
    so no step ever forms complex numbers; the one host LAPACK ``eig``
    runs on the FINAL (r, r) G to extract pairs/eigenvalues/rotations
    (ritz_nonsym), after the dispatch returns.

    sigma sits below the smallest Rayleigh quotient (leftmost tracking);
    dead stack slots get a large diagonal so the solve decouples them.
    Divergence guards (the non-variational-eig contamination mode) are
    carried IN the loop: best-snapshot (x, ax, G) under jnp.where.

    Dispatch economics vs the chunked path: ~1 round-trip per chunk of
    ``it_budget`` iterations instead of ~1 per append — the tunnel-RTT
    serial floor (docs/PERF.md round-3 nonsym section) disappears.
    Reference semantics twin: LinearEigensystemDavidson.h:130-184 at
    hermiticity=false (same expansion/restart policy, different RR).
    """
    iterate = _make_nonsym_iterate(matvec, r, m_max, null_thresh, rr_steps)
    collapse = _make_nonsym_collapse(matvec, r, m_max, n_p)

    def _loop(v, w, mask, k, h, C, tol, it0, it_end,
              best_err, bx, bG, bR, operand, diag):
        def cond(state):
            (_v, _w, _mask, _k, _h, _C, _x, errs, it,
             _be, _bx, _bG, _bR, _rs) = state
            return (it < it_end) & (jnp.max(errs) > tol)

        def body(state):
            (v, w, mask, k, h, C, x, errs, it,
             best_err, bx, bG, bR, restarts) = state
            # selection pressure only while far from tol (floor churn
            # otherwise); errs is inf on the first iteration -> True
            do_global = jnp.max(errs) > 30.0 * tol
            (v, w, mask, k, h, C, x, errs,
             best_err, bx, bG, bR) = iterate(
                v, w, mask, k, h, C, best_err, bx, bG, bR, operand, diag,
                do_global)

            def restart(args):
                v, w, mask, k, h, C, restarts = args
                rv, rw, rmask, rk, rh, rC = collapse(x, k, operand, v, w)
                return (rv, rw, rmask, rk, rh, rC, restarts + 1)

            def keep(args):
                return args

            v, w, mask, k, h, C, restarts = jax.lax.cond(
                k + r > m_max, restart, keep,
                (v, w, mask, k, h, C, restarts))
            return (v, w, mask, k, h, C, x, errs, it + 1,
                    best_err, bx, bG, bR, restarts)

        x0 = jnp.zeros((r, v.shape[1]), v.dtype)
        init = (v, w, mask, k, h, C, x0, jnp.full((r,), jnp.inf, v.dtype),
                it0, best_err, bx, bG, bR, jnp.zeros((), jnp.int32))
        return jax.lax.while_loop(cond, body, init)

    def run_init(x0, operand, diag, tol, it_end):
        """First (usually only) dispatch: init/orthonormalise INSIDE the
        jit — no separate reset round-trip — then the whole loop."""
        v, w, mask, h = _reset_core(matvec, r, m_max, x0, operand)
        k = jnp.asarray(r, jnp.int32)
        C = jnp.zeros((r, m_max), x0.dtype).at[:, :r].set(
            jnp.eye(r, dtype=x0.dtype))
        best_err = jnp.asarray(jnp.inf, x0.dtype)
        z = jnp.zeros((r, x0.shape[1]), x0.dtype)
        zr = jnp.zeros((r, r), x0.dtype)
        return _loop(v, w, mask, k, h, C, tol,
                     jnp.zeros((), jnp.int32), it_end,
                     best_err, z, zr, zr, operand, diag)

    def run_init_p(x0, operand, diag, tol, it_end, p, wp):
        """P-space init (fused_davidson.init_p semantics): whiten the P
        block (Cholesky — the reference requires independent P vectors,
        IterativeSolverTemplate.h:353-376), freeze it into slots [0, n_p)
        with exact user action rows mapped through the same linear
        whitening (or device-computed actions), GS the guess block
        against it, then the whole loop. The device-RR refinement needs
        NO further P logic: C spans every masked slot, so the P rows
        participate in the projected solves exactly."""
        pv, pw = _whiten_p(p, wp, p_actions, matvec, operand, n_p)
        v, w, mask, h, _t = _reset_core_p(matvec, r, m_max, x0, operand,
                                          pv, pw)
        k = jnp.asarray(n_p + r, jnp.int32)
        C = _live_one_hot(mask, r).astype(x0.dtype)
        best_err = jnp.asarray(jnp.inf, x0.dtype)
        z = jnp.zeros((r, x0.shape[1]), x0.dtype)
        zr = jnp.zeros((r, r), x0.dtype)
        return _loop(v, w, mask, k, h, C, tol,
                     jnp.zeros((), jnp.int32), it_end,
                     best_err, z, zr, zr, operand, diag)

    def run_cont(v, w, mask, k, h, C, operand, diag, tol, it0, it_end,
                 best_err, bx, bG, bR):
        """Continuation chunks (only for solves longer than chunk_iters)."""
        return _loop(v, w, mask, k, h, C, tol, it0, it_end,
                     best_err, bx, bG, bR, operand, diag)

    return jax.jit(run_init_p if n_p else run_init), jax.jit(run_cont)


def make_nonsym_sweep_solve(matvec: Callable, r: int, m_max: int,
                            null_thresh: float = 1e-10, rr_steps: int = 1):
    """Whole non-hermitian solve with restarts hoisted to basis-fill sweep
    boundaries (the vmap-friendly form, mirroring
    fused_davidson.make_davidson_solve_chunked): the outer while_loop runs
    one sweep of ``(m_max-r)//r`` device-RR iterations per trip, with the
    restart cond checked once per sweep — under vmap a batched lax.cond
    lowers to select-over-both-branches, so a per-iteration restart branch
    would execute (and be discarded) every iteration for every element;
    per-sweep it amortises over the fill length. Iteration counts quantise
    up to the sweep. Returns ``(init, solve)`` (unjitted vmap-ready
    callables are wrapped in jit here for the single-system case)."""
    iterate = _make_nonsym_iterate(matvec, r, m_max, null_thresh, rr_steps)
    collapse = _make_nonsym_collapse(matvec, r, m_max)
    fill_steps = max(1, (m_max - r) // r)

    def init(v0, operand):
        v, w, mask, h = _reset_core(matvec, r, m_max, v0, operand)
        k = jnp.asarray(r, jnp.int32)
        C = jnp.zeros((r, m_max), v0.dtype).at[:, :r].set(
            jnp.eye(r, dtype=v0.dtype))
        return v, w, mask, k, h, C

    def solve(v, w, mask, k, h, C, operand, diag, tol_, max_iter_):
        x0 = jnp.zeros((r, v.shape[1]), v.dtype)
        zr = jnp.zeros((r, r), v.dtype)
        state0 = (v, w, mask, k, h, C, x0,
                  jnp.full((r,), jnp.inf, v.dtype),
                  jnp.asarray(jnp.inf, v.dtype), x0, zr, zr)

        def cond(carry):
            s, it = carry
            return (it < max_iter_) & (jnp.max(s[7]) > tol_)

        def body(carry):
            s, it = carry
            (v, w, mask, k, h, C, x, errs, best_err, bx, bG, bR) = s

            def restart(args):
                v, w, mask, k, h, C = args
                rv, rw, rmask, rk, rh, rC = collapse(x, k, operand, v, w)
                return (rv, rw, rmask, rk, rh, rC)

            def keep(args):
                return args

            v, w, mask, k, h, C = jax.lax.cond(
                k + fill_steps * r > m_max, restart, keep,
                (v, w, mask, k, h, C))

            def step(_i, s2):
                (v, w, mask, k, h, C, _x, _e, best_err, bx, bG, bR) = s2
                do_global = jnp.max(_e) > 30.0 * tol_
                return iterate(v, w, mask, k, h, C, best_err, bx, bG, bR,
                               operand, diag, do_global)

            s = jax.lax.fori_loop(
                0, fill_steps, step,
                (v, w, mask, k, h, C, x, errs, best_err, bx, bG, bR))
            return s, it + fill_steps

        final, iters = jax.lax.while_loop(
            cond, body, (state0, jnp.asarray(0, jnp.int32)))
        (_v, _w, _mask, _k, _h, _C, x, errs, best_err, bx, bG, bR) = final
        return x, errs, best_err, bx, bG, bR, iters

    return init, solve


def make_batched_nonsym_solve(matvec: Callable, nroots: int, m_max: int,
                              null_thresh: float = 1e-10, rr_steps: int = 1,
                              operand_axes=0):
    """Many independent NON-HERMITIAN eigenproblems in ONE dispatch — a
    capability the host-eig chunked path cannot offer at all (its per-append
    host LAPACK stage cannot batch): only the device-RR loop, with no host
    stage inside, vmaps. Same economics as make_batched_davidson_solve
    (dispatch constant paid once, MXU fed by batched matvecs). Usage:

        binit, bsolve = make_batched_nonsym_solve(matvec, r, m_max)
        state = binit(v0_batch, operand_batch)            # each (B, ...)
        x, errs, best_err, bx, bG, bR, iters = bsolve(
            *state, operand_batch, diag_batch, tol, max_iter)
        evals, x_rot, errors = finalize_nonsym_batch(bx, bG, bR)

    The matvec must be vmap-compatible (XLA paths are; opaque Pallas
    kernels are not). ``operand_axes`` is a vmap in_axes prefix for the
    operand tree — e.g. ``(None, 0)`` shares one operator across the
    batch with a per-element parameter (see
    make_batched_nonsym_lineq_solve for the shifted-systems pattern)."""
    init, solve = make_nonsym_sweep_solve(matvec, nroots, m_max,
                                          null_thresh, rr_steps)
    batched_init = jax.jit(jax.vmap(init, in_axes=(0, operand_axes)))
    batched_solve = jax.jit(jax.vmap(
        solve, in_axes=(0, 0, 0, 0, 0, 0, operand_axes, 0, None, None)))
    return batched_init, batched_solve


def _extract_lowest_block(bG_h, r: int, context: str = ""):
    """Host LAPACK eig of a best-snapshot (r, r) G — shared by the batch
    finalizer and both device-driver exit paths so the straddling-pair
    refusal and the TRANSPOSE convention (left eigenvectors; see
    _drive_device_chunks) live in exactly one place.

    Returns ``(evals, coeff, r_eff)``; raises when the lowest root is a
    conjugate pair the window cannot hold (r_eff == 0)."""
    evals, coeff, _lam, _shifts = ritz_nonsym(
        np.asarray(bG_h, dtype=np.float64).T, r)
    r_eff = coeff.shape[0]
    if r_eff == 0:
        raise ValueError(
            f"{context}the lowest subspace root is a complex conjugate "
            f"pair and nroots={r} cannot hold both members — increase "
            "nroots (a pair needs two slots)")
    return evals, coeff, r_eff


def _rotated_errors(coeff, bR_h):
    """Per-root residual norms after the host-eig rotation: the (r, r)
    residual Gram rotated as coeff R coeff^T — no O(N) fetch."""
    bR64 = np.asarray(bR_h, dtype=np.float64)
    return np.sqrt(np.abs(np.diag(coeff @ bR64 @ coeff.T)))


def finalize_nonsym_batch(bx, bG, bR):
    """Host pair extraction for a batch of device-RR solves: per element,
    LAPACK eig of the tiny (r, r) G^T (LEFT eigenvectors — see
    _solve_device_rr's transpose note), errors from the rotated residual
    Gram, then ONE batched einsum dispatch rotates all solution rows.
    Returns ``(evals_list, x_rot (B, r, N) device array, errors_list)`` —
    lists because a straddling conjugate pair can shrink one element's
    root count (r_eff < r; the padded x_rot rows beyond r_eff are zero)."""
    bG_h, bR_h = jax.device_get((bG, bR))
    B, r, _ = bG_h.shape
    evals_out, errors_out = [], []
    coeffs = np.zeros((B, r, r))
    for i in range(B):
        # shared extraction: mirrors the single-system driver's failure
        # surfacing (an empty evals list + zero rows is a silent wrong
        # result for this batch element)
        evals, coeff, r_eff = _extract_lowest_block(
            bG_h[i], r, context=f"batch element {i}: ")
        errors = _rotated_errors(coeff, bR_h[i])
        evals_out.append(evals)
        errors_out.append(errors[:r_eff])
        coeffs[i, :r_eff] = coeff
    x_rot = jnp.einsum("bij,bjn->bin",
                       jnp.asarray(coeffs, bx.dtype), bx, precision=_PREC)
    return evals_out, x_rot, errors_out


def _dense_tier_action(matrix: np.ndarray, tier: str, dtype):
    """(matvec, operand) for a dense possibly-non-symmetric operator at the
    requested storage tier — shared by both from_dense constructors."""
    if tier in ("int8", "int8_precise"):
        from ..ops.kernels.dense_int8 import (
            DenseInt8,
            DenseInt8Split,
            dense_int8_matvec,
            dense_int8_matvec_split,
        )

        if tier == "int8":
            op = DenseInt8.from_dense(matrix)

            def matvec(x, tree):
                return dense_int8_matvec(x, tree)

            return matvec, op.tree()
        op = DenseInt8Split.from_dense(matrix)

        def matvec(x, tree):
            return dense_int8_matvec_split(x, tree)

        return matvec, op.tree()

    prec = (jax.lax.Precision.DEFAULT if tier == "fast"
            else jax.lax.Precision.HIGHEST)
    store = jnp.bfloat16 if tier == "fast" and dtype == jnp.float32 else dtype

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=prec,
                          preferred_element_type=x.dtype)

    return matvec, jnp.asarray(matrix, dtype=store)


class FusedNonSymDavidson:
    """Chunked-dispatch Davidson for non-hermitian operators.

    Same surface shape as FusedDavidson (matvec(x, operand) -> x A^T over
    row blocks, fixed-capacity stacks, any operator tier); eigenvalues may
    come back complex (conjugate pairs), reported in ``eigenvalues``
    (complex ndarray) with the pair's real 2D invariant-subspace rows in
    ``x``. Reference twin: LinearEigensystemDavidson.h:130-184 at
    hermiticity=false.
    """

    def __init__(
        self,
        matvec: Callable,
        diagonals,
        n: int,
        nroots: int,
        m_max: Optional[int] = None,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 100,
        operand=None,
        null_thresh: float = 1e-10,
        inner: int = 1,
        rr: str = "host",
        rr_steps: int = 1,
        chunk_iters: int = 64,
        p_space=None,
        p_actions=None,
    ):
        if dtype is None:
            dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
                     else jnp.float32)
        if rr not in ("host", "device"):
            raise ValueError(f"rr must be 'host' or 'device', got {rr!r}")
        from .fused_davidson import validate_p_inputs

        self.p_dense, self.n_p, self.p_action_rows = validate_p_inputs(
            p_space, p_actions, n)
        if self.n_p and rr != "device":
            raise ValueError(
                "P space on the non-hermitian fused family runs on the "
                "device tier — pass rr='device' (the host-driven parity "
                "solvers carry the host-loop P path)")
        if rr == "device" and inner != 1:
            # the single-dispatch loop has no frozen-shift enrichment
            # stage; silently ignoring a requested inner would mislead
            # tuning (review round 4)
            raise ValueError("inner enrichment is a host-RR option; "
                             "rr='device' refreshes shifts every iteration")
        self.matvec = matvec
        self.n = n
        self.nroots = nroots
        self.m_max = m_max if m_max is not None else (
            max(4 * nroots, 2 * nroots + 2) + self.n_p)
        if self.m_max < 2 * nroots + self.n_p:
            raise ValueError("m_max must be >= 2*nroots + n_p")
        if max_iter < 1:
            # the loop body must run at least once or solve() has no
            # x_out to return (None slicing -> opaque TypeError)
            raise ValueError("max_iter must be >= 1")
        self.dtype = dtype
        self.sharding = sharding
        self.tol = convergence_threshold
        self.max_iter = max_iter
        self.operand = operand
        self.diag = jnp.asarray(np.asarray(diagonals), dtype=dtype)
        self.inner = max(1, int(inner))
        self.rr = rr
        self.rr_steps = max(1, int(rr_steps))
        # auto-escalation (VERDICT r4 #4): the device driver raises the
        # ACTIVE step count to 2 when the tracked window carries genuine
        # complex pairs and convergence is still far from tol — no user
        # knob needed on pair-heavy spectra. rr_steps_active reports what
        # the last solve ended on.
        self.rr_steps_active = self.rr_steps
        self.chunk_iters = max(1, int(chunk_iters))
        self._null_thresh = null_thresh
        self._chunks = {}
        self._device_loops = {}
        self._reset = make_nonsym_reset(matvec, nroots, self.m_max)
        self.iterations = 0
        self.matvecs = 0
        # (iteration, max_residual) pairs — per eig cycle in host mode,
        # per chunk in device mode (the while_loop exposes no finer
        # granularity without extra carry)
        self.history = []

    @classmethod
    def from_dense(cls, matrix, nroots: int, tier: str = "precise", **kwargs):
        """One-call construction from a dense (possibly non-symmetric)
        matrix. Tiers (no packed-triangle storage here — that trick needs
        symmetry):

        - ``"precise"`` — f32 storage, Precision.HIGHEST matmuls (6-pass
          bf16 on the MXU; ~610 us for an 8192^2 16-row action);
        - ``"fast"`` — bf16 single-pass MXU matmul (~355 us), residual
          floor ~2e-4 like the symmetric fast tier;
        - ``"int8"`` — one-plane quantized couplings + exact f32 diagonal
          (dense_int8.py: two-sided equilibration), a QUARTER of the f32
          bytes; floor in the bf16 class;
        - ``"int8_precise"`` — two-plane split (~2^-14 coupling error,
          split-bf16 class at half its streamed bytes) — converges
          tol 1e-5 solves.
        """
        tiers = ("precise", "fast", "int8", "int8_precise")
        if tier not in tiers:
            raise ValueError(f"tier must be one of {tiers}, got {tier!r}")
        matrix = np.asarray(matrix, dtype=np.float64)
        n = matrix.shape[0]
        if matrix.shape != (n, n):
            raise ValueError("operator must be square")
        dtype = kwargs.pop("dtype", None)
        if dtype is None:
            dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
                     else jnp.float32)
        matvec, operand = _dense_tier_action(matrix, tier, dtype)
        solver = cls(matvec, np.diag(matrix), n, nroots, dtype=dtype,
                     operand=operand, **kwargs)
        return solver

    def _chunk_fn(self, inner: int):
        fn = self._chunks.get(inner)
        if fn is None:
            fn = make_nonsym_chunk(self.matvec, self.nroots, self.m_max,
                                   self._null_thresh, inner=inner)
            self._chunks[inner] = fn
        return fn

    def _put_block(self, x):
        x = jnp.asarray(np.asarray(x), dtype=self.dtype)
        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            x = jax.device_put(x, adapt_sharding(self.sharding, 2))
        return x

    def solve(self, v0, checkpoint_path: Optional[str] = None,
              checkpoint_every: int = 1):
        """Returns ``(evals_complex, x real-form rows, errors, iterations)``.

        ``checkpoint_path`` (device tier only) persists a resumable
        NonSymDeviceState every ``checkpoint_every`` chunks; continue an
        interrupted solve with :meth:`resume`.

        Normally all three lead arrays have ``nroots`` entries; if a
        conjugate pair straddles the window boundary at convergence the
        returned set shrinks by one instead of splitting the pair (the
        reference never tracks half a pair either).

        Returned errors are recomputed AFTER the final host-eig rotation
        (which can mix the device loop's per-row residuals, amplifying a
        per-root error by up to ~sqrt(nroots)); when that recheck misses
        ``convergence_threshold`` the device tier automatically tightens
        its in-loop tolerance by the measured ratio and keeps iterating
        (bounded retries), so reported errors <= tol whenever the budget
        and the f32 floor allow it."""
        if self.rr == "device":
            return self._solve_device_rr(v0, checkpoint_path,
                                         checkpoint_every)
        if checkpoint_path is not None:
            raise ValueError("mid-solve checkpointing is a device-tier "
                             "feature — pass rr='device'")
        v, w, mask, k, h = self._reset(self._put_block(v0), self.operand)
        self.matvecs += self.nroots
        self.history = []
        evals = np.zeros((self.nroots,), dtype=np.complex128)
        x_out = None
        r_eff = self.nroots
        errors = np.full((self.nroots,), np.inf)
        k_host = self.nroots  # k tracked on host: every sync is a tunnel RTT
        errs_dev = None
        # Best-snapshot guard: non-symmetric eig is NOT variational — once
        # residuals sit at the f32 floor, the preconditioned expansion
        # appends pure-noise rows, and noise entries in H can move the eig
        # solutions ANYWHERE (measured: flat at 2.07e-5 for two cycles,
        # then 0.69 after the next restart collapsed onto contaminated
        # Ritz vectors). The symmetric families are immune (variational
        # Rayleigh-Ritz: noise rows only add spurious high roots). Track
        # the best state and return it if iteration past the floor turns
        # catastrophic instead of handing the user the explosion.
        best = None  # (max_err, evals, x, errors, r_eff)
        spikes = 0   # consecutive 10x-best cycles (a single spike can be a
                     # benign post-restart transient — require persistence)
        for _ in range(self.max_iter):
            # ONE batched fetch per outer cycle (h + mask + previous
            # chunk's errors) — separate np.asarray calls each cost a
            # ~28 ms tunnel round-trip. The errors fetched here belong to
            # the PREVIOUS cycle's Ritz data, which is exactly the
            # quantity the convergence test is defined on.
            if errs_dev is None:
                h_host, mask_host = jax.device_get((h, mask))
            else:
                h_host, mask_host, errs_h = jax.device_get((h, mask, errs_dev))
                errors = np.asarray(errs_h, dtype=np.float64)[:r_eff]
                self.history.append((self.iterations, float(errors.max())))
                if best is None or errors.max() < best[0]:
                    best = (errors.max(), evals, x_out, errors, r_eff)
                if np.all(errors <= self.tol):
                    break
                if errors.max() > 10.0 * best[0] + 1e-300:
                    # floor-noise contamination of the non-variational eig:
                    # stop and return the best state seen — but only after
                    # TWO consecutive spike cycles (one can be a benign
                    # transient right after a restart)
                    spikes += 1
                    if spikes >= 2:
                        break
                else:
                    spikes = 0
            h_host = np.asarray(h_host, dtype=np.float64)
            act = np.where(np.asarray(mask_host) > 0.5)[0]
            hm = h_host[np.ix_(act, act)]
            evals, coeff_act, lam, shifts = ritz_nonsym(hm, self.nroots)
            r_eff = coeff_act.shape[0]
            if r_eff == 0:
                raise ValueError(
                    "the lowest subspace root is a complex conjugate pair "
                    f"and nroots={self.nroots} cannot hold both members — "
                    "increase nroots (a pair needs two slots)")
            coeff = np.zeros((self.nroots, self.m_max))
            coeff[:r_eff, act] = coeff_act
            lam_full = np.zeros((self.nroots, self.nroots))
            lam_full[:r_eff, :r_eff] = lam
            shifts_full = np.zeros((self.nroots,))
            shifts_full[:r_eff] = shifts
            room = (self.m_max - k_host) // self.nroots
            # keep at least one residual-driven append before the next
            # restart: letting enrichment fill the basis in one chunk makes
            # every cycle collapse-and-refill with stale-shift directions
            # only (measured stall at m_max=3r with inner=2)
            inner_now = max(1, min(self.inner, room - 1 if room > 1 else 1))
            v, w, mask, k, h, x, errs_dev = self._chunk_fn(inner_now)(
                v, w, mask, k, h,
                jnp.asarray(coeff, self.dtype),
                jnp.asarray(lam_full, self.dtype),
                jnp.asarray(shifts_full, self.dtype),
                self.operand, self.diag,
            )
            self.iterations += inner_now
            self.matvecs += inner_now * self.nroots
            k_host += inner_now * self.nroots
            x_out = x
            if k_host + self.nroots > self.m_max:
                # collapse onto the Ritz block (one extra dispatch)
                v, w, mask, k, h = self._reset(x, self.operand)
                self.matvecs += self.nroots
                k_host = self.nroots
        else:
            # max_iter exhausted: the final chunk's errors were never
            # fetched — report the freshest state, not the stale one
            if errs_dev is not None:
                errors = np.asarray(jax.device_get(errs_dev),
                                    dtype=np.float64)[:r_eff]
        if best is not None and best[0] < errors.max():
            _, evals, x_out, errors, r_eff = best
        from ._finite import check_finite

        check_finite(errors, "FusedNonSymDavidson")
        return evals[:r_eff], x_out[:r_eff], errors, self.iterations

    def _solve_device_rr(self, v0, checkpoint_path=None,
                         checkpoint_every: int = 1):
        """Single-dispatch path (rr="device"): chunks of ``chunk_iters``
        whole Davidson iterations per round-trip through
        ``make_nonsym_device_loop``; between chunks the host fetches ONLY
        (errors, it, best_err, restarts) — one device_get — for the
        convergence/divergence decision. The final (r, r) G is
        diagonalised ONCE by host LAPACK (ritz_nonsym) to recover complex
        pairs and rotate the real invariant-subspace rows into pair form.
        """
        r = self.nroots
        run_init, _ = self._loops()
        tol = jnp.asarray(self.tol, self.dtype)
        it_end = min(self.chunk_iters, self.max_iter)
        # ONE dispatch carries init + the whole loop (usually the entire
        # solve: chunk_iters >= typical iteration counts)
        if self.n_p:
            _check_live_p_guess(self.p_dense, v0, r, self.n_p,
                                "FusedNonSymDavidson")
            p_dev = self._put_block(self.p_dense)
            wp_dev = (self._put_block(self.p_action_rows)
                      if self.p_action_rows is not None
                      else jnp.zeros_like(p_dev))
            state = run_init(self._put_block(v0), self.operand, self.diag,
                             tol, jnp.asarray(it_end, jnp.int32),
                             p_dev, wp_dev)
            if self.p_action_rows is None:
                self.matvecs += self.n_p
        else:
            state = run_init(self._put_block(v0), self.operand, self.diag,
                             tol, jnp.asarray(it_end, jnp.int32))
        self.matvecs += r
        return self._drive_device_chunks(state, 0, checkpoint_path,
                                         checkpoint_every)

    def _loops(self, steps: Optional[int] = None):
        """(run_init, run_cont) compiled for ``steps`` RR refinement passes
        (default: the constructor's rr_steps). Cached per steps so the
        in-flight auto-escalation (see _drive_device_chunks) pays one
        compile the first time a spectrum needs it."""
        steps = self.rr_steps if steps is None else int(steps)
        loop = self._device_loops.get(steps)
        if loop is None:
            loop = make_nonsym_device_loop(
                self.matvec, self.nroots, self.m_max, self._null_thresh,
                steps, n_p=self.n_p,
                p_actions=self.p_action_rows is not None)
            self._device_loops[steps] = loop
        return loop

    def resume(self, checkpoint_path: str, keep_checkpointing: bool = True,
               checkpoint_every: int = 1):
        """Continue an interrupted device-tier solve from a checkpoint
        written by ``solve(..., checkpoint_path=...)``. By default the
        resumed run KEEPS writing to the same path (a second interruption
        must not lose post-resume progress); the saved matvec count is
        restored so statistics stay honest."""
        from ..utils.checkpoint import load_named_state

        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            shard = adapt_sharding(self.sharding, 2)
        else:
            shard = None
        st, meta = load_named_state(
            checkpoint_path, NonSymDeviceState, sharding=shard,
            dtype=self.dtype, shard_fields=("v", "w", "bx"))
        # loud config validation: a checkpoint from a different capacity/
        # problem shape would otherwise die in an opaque jit shape error —
        # or worse, silently solve the wrong system
        if tuple(st.v.shape) != (self.m_max, self.n):
            raise ValueError(
                f"checkpoint stacks are {tuple(st.v.shape)} but this solver "
                f"is configured (m_max={self.m_max}, n={self.n}) — resume "
                "with the same capacity and dimension")
        if st.C.shape[0] != self.nroots:
            raise ValueError(
                f"checkpoint tracks {st.C.shape[0]} roots, solver wants "
                f"{self.nroots}")
        if "n_p" in meta and meta["n_p"] != self.n_p:
            # byte-identical shapes: an n_p mismatch would silently
            # reinterpret frozen P slots as ordinary basis rows
            raise ValueError(
                f"checkpoint was written with n_p={meta['n_p']} but this "
                f"solver has n_p={self.n_p}")
        self.matvecs = int(meta.get("matvecs", self.matvecs))
        _, run_cont = self._loops()
        it_host = int(meta.get("iterations", int(np.asarray(st.it))))
        tol = jnp.asarray(self.tol, self.dtype)
        it_end = min(it_host + self.chunk_iters, self.max_iter)
        state = run_cont(
            st.v, st.w, st.mask, jnp.asarray(np.asarray(st.k), jnp.int32),
            st.h, st.C, self.operand, self.diag, tol,
            jnp.asarray(it_host, jnp.int32), jnp.asarray(it_end, jnp.int32),
            st.best_err, st.bx, st.bG, st.bR)
        return self._drive_device_chunks(
            state, it_host,
            checkpoint_path if keep_checkpointing else None,
            checkpoint_every, history_seed=meta.get("history"))

    def _drive_device_chunks(self, state, it_host, checkpoint_path,
                             checkpoint_every, history_seed=None):
        r = self.nroots
        steps_active = self.rr_steps
        self.rr_steps_active = steps_active
        _, run_cont = self._loops(steps_active)
        tol_dev = float(self.tol)
        tol = jnp.asarray(tol_dev, self.dtype)
        spikes = 0
        chunks_done = 0
        rechecks = 0
        # a resumed solve re-seeds the pre-interruption history (persisted
        # in the checkpoint meta) so the record reads as one uninterrupted
        # run, matching the restored iteration/matvec counters
        self.history = [tuple(h) for h in history_seed] if history_seed else []
        bG_h = None
        while True:
            (v, w, mask, k, h, C, _x, errs_dev, it_dev,
             best_err, bx, bG, bR, restarts_dev) = state
            # ONE batched small fetch per chunk (bG + residual Gram ride
            # along so the final rotation needs no O(N) round-trip)
            errs_h, it_h, be_h, rs_h, bG_h, bR_h = jax.device_get(
                (errs_dev, it_dev, best_err, restarts_dev, bG, bR))
            n_iters = int(it_h) - it_host
            it_host = int(it_h)
            self.iterations = it_host
            self.matvecs += n_iters * r + int(rs_h) * r
            errors = np.asarray(errs_h, dtype=np.float64)
            self.history.append((it_host, float(errors.max())))
            chunks_done += 1
            if checkpoint_path is not None and (
                    chunks_done % max(1, checkpoint_every) == 0):
                from ..utils.checkpoint import save_fused_state

                save_fused_state(
                    NonSymDeviceState(v, w, mask, k, h, C, best_err, bx,
                                      bG, bR, jnp.asarray(it_host,
                                                          jnp.int32)),
                    checkpoint_path, iterations=it_host,
                    matvecs=self.matvecs, tol=float(self.tol),
                    nroots=self.nroots, n_p=self.n_p,
                    history=[[int(i), float(e)]
                             for i, e in self.history[-200:]])
            if np.all(errors <= tol_dev) or it_host >= self.max_iter:
                # host LAPACK eig of the tiny (r, r) G (already fetched
                # with the chunk); per-root errors from the rotated
                # residual GRAM — the O(N) best snapshot never crosses the
                # tunnel (an (r, N) fetch at tunnel rates dominated the
                # whole solve wall before this).
                # TRANSPOSE is load-bearing (inside _extract_lowest_block):
                # rotated rows y = z X satisfy y A^T = z G X + z R, so z
                # must be a LEFT eigenvector of G (z G = lam z);
                # ritz_nonsym(h) returns rows with coeff h^T = lam coeff,
                # hence G^T. Feeding G instead leaves a (z G - lam z) X
                # term the Gram-based errors cannot see — true residual
                # 5e-4 at reported 1e-10 on a 12-iteration solve.
                evals, coeff, r_eff = _extract_lowest_block(bG_h, r)
                errors_rot = _rotated_errors(coeff, bR_h)[:r_eff]
                # the in-loop test sees per-row residual norms in the C
                # basis; the final rotation mixes rows, amplifying
                # per-root errors by up to ~sqrt(r). When the rotated
                # errors miss the USER tolerance even though the loop
                # converged, tighten the device tolerance by the measured
                # ratio and keep iterating (bounded rechecks; an f32
                # floor below tol/ratio still ends via max_iter/spike).
                if (errors_rot.size and np.max(errors_rot) > self.tol
                        and it_host < self.max_iter and spikes < 2
                        and rechecks < 2):
                    rechecks += 1
                    tol_dev = max(
                        tol_dev * float(self.tol) / float(np.max(errors_rot)),
                        1e-3 * float(self.tol))
                    tol = jnp.asarray(tol_dev, self.dtype)
                    it_end = min(it_host + self.chunk_iters, self.max_iter)
                    state = run_cont(
                        v, w, mask, k, h, C, self.operand, self.diag, tol,
                        jnp.asarray(it_host, jnp.int32),
                        jnp.asarray(it_end, jnp.int32), best_err, bx, bG, bR)
                    continue
                break
            # contamination guard across chunks (same persistence rule as
            # the chunked family, at chunk granularity)
            if errors.max() > 10.0 * float(be_h):
                spikes += 1
                if spikes >= 2:
                    # spike exit: rotate whatever the best snapshot holds
                    evals, coeff, r_eff = _extract_lowest_block(bG_h, r)
                    errors_rot = _rotated_errors(coeff, bR_h)[:r_eff]
                    break
            else:
                spikes = 0
            # AUTO-ESCALATION (VERDICT r4 #4): per-root RQI with one
            # refinement pass tracks a complex-conjugate pair slowly (the
            # real 2D invariant subspace rotates under a single shifted
            # solve; measured 360 vs 137 iterations on a 6-pair stress
            # spectrum). When the tracked window's G carries genuine
            # pairs and the solve is still far from tol, raise the active
            # refinement passes to 2 — one cached compile, no extra
            # matvecs per iteration, and real-spectrum solves (golden
            # tables) never trigger it.
            if steps_active < 2 and errors.size and (
                    errors.max() > 30.0 * float(self.tol)):
                wG = np.linalg.eigvals(np.asarray(bG_h, dtype=np.float64))
                spread = float(wG.real.max() - wG.real.min()) + 1e-12
                if np.any(np.abs(wG.imag) > 1e-2 * spread):
                    steps_active = 2
                    self.rr_steps_active = 2
                    _, run_cont = self._loops(steps_active)
            it_end = min(it_host + self.chunk_iters, self.max_iter)
            state = run_cont(
                v, w, mask, k, h, C, self.operand, self.diag, tol,
                jnp.asarray(it_host, jnp.int32), jnp.asarray(it_end, jnp.int32),
                best_err, bx, bG, bR)
        errors = errors_rot
        coeff_full = np.zeros((r, r))
        coeff_full[:r_eff] = coeff
        # fetch-free async dispatch: x_out stays a device array
        x_out = _rotate_x(bx, jnp.asarray(coeff_full, self.dtype))
        from ._finite import check_finite

        check_finite(errors, "FusedNonSymDavidson")
        return evals[:r_eff], x_out[:r_eff], errors, self.iterations


def _make_lineq_iterate(matvec, nrhs, m_max, null_thresh, refine_passes):
    """One Petrov-Galerkin Davidson iteration for the lineq device tier
    (projected LU solve + iterative refinement -> Ritz block -> relative
    residuals -> best-snapshot -> preconditioned append -> incremental
    H/beta), no restart — shared by the single-dispatch loop and the
    batched sweep solve."""
    append = _make_append(matvec, nrhs, m_max, null_thresh)

    def proj_solve(hm, beta):
        # LU once, refinement passes reuse it
        lu, piv = jax.scipy.linalg.lu_factor(hm)
        cm = jax.scipy.linalg.lu_solve((lu, piv), beta)
        for _ in range(refine_passes):
            resid = beta - jnp.matmul(hm, cm, precision=_PREC)
            cm = cm + jax.scipy.linalg.lu_solve((lu, piv), resid)
        return cm

    def iterate(v, w, mask, k, h, beta, best_err, bx, berrs,
                operand, diag, b, b_norm):
        mm = mask[:, None] * mask[None, :]
        scale = jnp.max(jnp.abs(h)) + 1.0
        hm = h * mm + jnp.diag((1.0 - mask) * 10.0 * scale)
        bm = beta * mask[:, None]
        cm = proj_solve(hm, bm)                      # (m_max, nrhs)
        coeff = cm.T                                  # (nrhs, m_max)
        vm = v * mask[:, None]
        wm = w * mask[:, None]
        x = jnp.matmul(coeff, vm, precision=_PREC)
        ax = jnp.matmul(coeff, wm, precision=_PREC)
        rblk = ax - b
        errs = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", rblk, rblk, precision=_PREC))) / b_norm
        maxe = jnp.max(errs)
        better = maxe < best_err
        best_err = jnp.where(better, maxe, best_err)
        bx = jnp.where(better, x, bx)
        berrs = jnp.where(better, errs, berrs)
        d = diag if diag.ndim == 2 else diag[None, :]
        denom = d + 1e-15 * jnp.max(jnp.abs(d)) + 1e-300
        t = rblk / denom
        k0 = k
        v, w, mask, k, _t_app, _w_rows = append(v, w, mask, k, t, operand)
        h, new_v = _incremental_update(h, v, w, mask, k0, nrhs)
        beta = jax.lax.dynamic_update_slice(
            beta, jnp.matmul(new_v, b.T, precision=_PREC),
            (k0, jnp.zeros((), k0.dtype)))
        return v, w, mask, k, h, beta, x, errs, best_err, bx, berrs

    return iterate


def _make_lineq_collapse(matvec, nrhs, m_max, n_p: int = 0):
    """Restart for the lineq device tier: collapse onto the solution
    block, re-anchor the action with a matvec, recompute the RHS
    projection. With ``n_p > 0`` the frozen P slots survive untouched
    (no coordinate bookkeeping needed here — the projected solve
    recomputes the coefficients from scratch every iteration)."""

    def collapse(x, k, operand, b, v, w):
        if n_p:
            rv, rw, rmask, rh, _t = _reset_core_p(
                matvec, nrhs, m_max, x, operand, v[:n_p], w[:n_p])
            rbeta = jnp.matmul(rv * rmask[:, None], b.T, precision=_PREC)
            return (rv, rw, rmask, jnp.asarray(n_p + nrhs, k.dtype), rh,
                    rbeta)
        rv, rw, rmask, rh = _reset_core(matvec, nrhs, m_max, x, operand)
        rbeta = jnp.matmul(rv * rmask[:, None], b.T, precision=_PREC)
        return rv, rw, rmask, jnp.asarray(nrhs, k.dtype), rh, rbeta

    return collapse


def make_nonsym_lineq_device_loop(matvec: Callable, nrhs: int, m_max: int,
                                  null_thresh: float = 1e-10,
                                  refine_passes: int = 2,
                                  n_p: int = 0, p_actions: bool = False):
    """Single-dispatch non-symmetric A X = B: the whole Petrov-Galerkin
    Davidson loop as ONE jitted ``while_loop`` with NO host stage at all.

    Unlike the eigen twin (which needs inverse-iteration tracking because
    ``eig`` has no TPU lowering), the projected (m, m) SOLVE lowers fine —
    the only hazard is f32 solve accuracy, handled by ``refine_passes``
    rounds of iterative refinement (error e -> e^2 per pass; the same rule
    that fixed FusedLinearEquations' TPU stall, fused_linear.py:68-75).
    Dead stack slots get a large diagonal and zero RHS, so their
    coefficients vanish. In-loop lax.cond restarts collapse onto the
    current solution block and recompute the RHS projection. Best-snapshot
    (x, per-RHS errors) carried under jnp.where.
    Reference semantics twin: LinearEquationsDavidson.h at
    hermiticity=false."""
    iterate = _make_lineq_iterate(matvec, nrhs, m_max, null_thresh,
                                  refine_passes)
    collapse = _make_lineq_collapse(matvec, nrhs, m_max, n_p)

    def _loop(v, w, mask, k, h, beta, tol, it0, it_end, best_err, bx, berrs,
              operand, diag, b, b_norm):
        def cond(state):
            (_v, _w, _mask, _k, _h, _beta, _x, errs, it,
             _be, _bx, _berrs, _rs) = state
            return (it < it_end) & (jnp.max(errs) > tol)

        def body(state):
            (v, w, mask, k, h, beta, x, errs, it,
             best_err, bx, berrs, restarts) = state
            (v, w, mask, k, h, beta, x, errs,
             best_err, bx, berrs) = iterate(
                v, w, mask, k, h, beta, best_err, bx, berrs,
                operand, diag, b, b_norm)

            def restart(args):
                v, w, mask, k, h, beta, restarts = args
                rv, rw, rmask, rk, rh, rbeta = collapse(x, k, operand, b,
                                                        v, w)
                return (rv, rw, rmask, rk, rh, rbeta, restarts + 1)

            def keep(args):
                return args

            v, w, mask, k, h, beta, restarts = jax.lax.cond(
                k + nrhs > m_max, restart, keep,
                (v, w, mask, k, h, beta, restarts))
            return (v, w, mask, k, h, beta, x, errs, it + 1,
                    best_err, bx, berrs, restarts)

        x0 = jnp.zeros((nrhs, v.shape[1]), v.dtype)
        init = (v, w, mask, k, h, beta, x0,
                jnp.full((nrhs,), jnp.inf, v.dtype), it0, best_err, bx, berrs,
                jnp.zeros((), jnp.int32))
        return jax.lax.while_loop(cond, body, init)

    def run_init(x0, operand, diag, b, b_norm, tol, it_end):
        v, w, mask, h = _reset_core(matvec, nrhs, m_max, x0, operand)
        k = jnp.asarray(nrhs, jnp.int32)
        beta = jnp.matmul(v * mask[:, None], b.T, precision=_PREC)
        best_err = jnp.asarray(jnp.inf, x0.dtype)
        z = jnp.zeros((nrhs, x0.shape[1]), x0.dtype)
        binf = jnp.full((nrhs,), jnp.inf, x0.dtype)
        return _loop(v, w, mask, k, h, beta, tol,
                     jnp.zeros((), jnp.int32), it_end, best_err, z, binf,
                     operand, diag, b, b_norm)

    def run_init_p(x0, operand, diag, b, b_norm, tol, it_end, p, wp):
        """P-space init: whiten + freeze P into slots [0, n_p) (exact
        user action rows map through the same linear whitening), GS the
        guess block against it; the in-loop projected solve spans every
        masked slot so P needs no further logic."""
        pv, pw = _whiten_p(p, wp, p_actions, matvec, operand, n_p)
        v, w, mask, h, _t = _reset_core_p(matvec, nrhs, m_max, x0, operand,
                                          pv, pw)
        k = jnp.asarray(n_p + nrhs, jnp.int32)
        beta = jnp.matmul(v * mask[:, None], b.T, precision=_PREC)
        best_err = jnp.asarray(jnp.inf, x0.dtype)
        z = jnp.zeros((nrhs, x0.shape[1]), x0.dtype)
        binf = jnp.full((nrhs,), jnp.inf, x0.dtype)
        return _loop(v, w, mask, k, h, beta, tol,
                     jnp.zeros((), jnp.int32), it_end, best_err, z, binf,
                     operand, diag, b, b_norm)

    def run_cont(v, w, mask, k, h, beta, operand, diag, b, b_norm, tol,
                 it0, it_end, best_err, bx, berrs):
        return _loop(v, w, mask, k, h, beta, tol, it0, it_end,
                     best_err, bx, berrs, operand, diag, b, b_norm)

    return jax.jit(run_init_p if n_p else run_init), jax.jit(run_cont)


def make_nonsym_lineq_sweep_solve(matvec: Callable, nrhs: int, m_max: int,
                                  null_thresh: float = 1e-10,
                                  refine_passes: int = 2):
    """Whole non-symmetric A X = B solve with restarts hoisted to sweep
    boundaries (vmap-friendly; see make_nonsym_sweep_solve for the
    rationale). Returns ``(init, solve)`` unjitted vmap-ready callables."""
    iterate = _make_lineq_iterate(matvec, nrhs, m_max, null_thresh,
                                  refine_passes)
    collapse = _make_lineq_collapse(matvec, nrhs, m_max)
    fill_steps = max(1, (m_max - nrhs) // nrhs)

    def init(x0, operand, b):
        v, w, mask, h = _reset_core(matvec, nrhs, m_max, x0, operand)
        k = jnp.asarray(nrhs, jnp.int32)
        beta = jnp.matmul(v * mask[:, None], b.T, precision=_PREC)
        return v, w, mask, k, h, beta

    def solve(v, w, mask, k, h, beta, operand, diag, b, b_norm,
              tol_, max_iter_):
        x0 = jnp.zeros((nrhs, v.shape[1]), v.dtype)
        state0 = (v, w, mask, k, h, beta, x0,
                  jnp.full((nrhs,), jnp.inf, v.dtype),
                  jnp.asarray(jnp.inf, v.dtype), x0,
                  jnp.full((nrhs,), jnp.inf, v.dtype))

        def cond(carry):
            s, it = carry
            return (it < max_iter_) & (jnp.max(s[7]) > tol_)

        def body(carry):
            s, it = carry
            (v, w, mask, k, h, beta, x, errs, best_err, bx, berrs) = s

            def restart(args):
                v, w, mask, k, h, beta = args
                return collapse(x, k, operand, b, v, w)

            def keep(args):
                return args

            v, w, mask, k, h, beta = jax.lax.cond(
                k + fill_steps * nrhs > m_max, restart, keep,
                (v, w, mask, k, h, beta))

            def step(_i, s2):
                (v, w, mask, k, h, beta, _x, _e, best_err, bx, berrs) = s2
                return iterate(v, w, mask, k, h, beta, best_err, bx, berrs,
                               operand, diag, b, b_norm)

            s = jax.lax.fori_loop(
                0, fill_steps, step,
                (v, w, mask, k, h, beta, x, errs, best_err, bx, berrs))
            return s, it + fill_steps

        final, iters = jax.lax.while_loop(
            cond, body, (state0, jnp.asarray(0, jnp.int32)))
        (_v, _w, _mask, _k, _h, _beta, x, errs, best_err, bx, berrs) = final
        return x, errs, best_err, bx, berrs, iters

    return init, solve


def make_batched_nonsym_lineq_solve(matvec: Callable, nrhs: int, m_max: int,
                                    null_thresh: float = 1e-10,
                                    refine_passes: int = 2,
                                    operand_axes=0):
    """Many independent non-symmetric A_k X_k = B_k systems in ONE
    dispatch. ``operand_axes`` is a vmap in_axes prefix for the operand
    tree — the key use is SHIFTED systems sharing one operator without
    B-fold storage: ``operand = (A, sigmas)``, ``operand_axes = (None, 0)``
    with ``matvec(x, (op, s)) = x @ op.T + s * x`` solves
    ``(A + sigma_k I) x_k = b_k`` for every shift at once (non-symmetric
    response equations; the SPD pairing is FusedBlockCG's per-RHS shifted
    diagonals). Unlike the eigen twin there is NO host finalize — the
    returned ``bx`` is the solution, ``berrs`` the per-RHS errors. Usage:

        binit, bsolve = make_batched_nonsym_lineq_solve(mv, nrhs, m_max,
                                                        operand_axes=(None, 0))
        state = binit(x0_b, operand, b_b)
        x, errs, best_err, bx, berrs, iters = bsolve(
            *state, operand, diag_b, b_b, b_norm_b, tol, max_iter)
    """
    init, solve = make_nonsym_lineq_sweep_solve(matvec, nrhs, m_max,
                                                null_thresh, refine_passes)
    batched_init = jax.jit(jax.vmap(init, in_axes=(0, operand_axes, 0)))
    batched_solve = jax.jit(jax.vmap(
        solve,
        in_axes=(0, 0, 0, 0, 0, 0, operand_axes, 0, 0, 0, None, None)))
    return batched_init, batched_solve


def make_nonsym_lineq_chunk(matvec: Callable, nrhs: int, m_max: int,
                            null_thresh: float = 1e-10, inner: int = 1):
    """Linear-equations twin of make_nonsym_chunk: one dispatch holds the
    reconstruction, residual, preconditioned expansion, GS/whitening,
    append, and the INCREMENTAL projected matrix + RHS projection. The
    projected solve itself happens on the host in f64 (np.linalg) — which
    also sidesteps the TPU f32-eigh accuracy stall the symmetric family
    needed two refinement passes for (fused_linear.py:68-75)."""
    append = _make_append(matvec, nrhs, m_max, null_thresh)

    @jax.jit
    def chunk(v, w, mask, k, h, beta, coeff, operand, diag, b, b_norm):
        vm = v * mask[:, None]
        wm = w * mask[:, None]
        x = jnp.matmul(coeff, vm, precision=_PREC)
        ax = jnp.matmul(coeff, wm, precision=_PREC)
        r = ax - b
        errors = jnp.sqrt(jnp.abs(
            jnp.einsum("in,in->i", r, r, precision=_PREC))) / b_norm
        d = diag if diag.ndim == 2 else diag[None, :]
        denom = d + 1e-15 * jnp.max(jnp.abs(d)) + 1e-300

        k0 = k
        t = r / denom
        v, w, mask, k, t_app, w_rows = append(v, w, mask, k, t, operand)
        for _ in range(inner - 1):
            # Krylov enrichment: precondition the appended block's image
            # (one matvec already paid by the append)
            t = w_rows / denom
            v, w, mask, k, t_app, w_rows = append(v, w, mask, k, t, operand)
        h, new_v = _incremental_update(h, v, w, mask, k0, inner * nrhs)
        beta = jax.lax.dynamic_update_slice(
            beta, jnp.matmul(new_v, b.T, precision=_PREC),
            (k0, jnp.zeros((), k0.dtype)))
        return v, w, mask, k, h, beta, x, errors

    return chunk


def make_nonsym_lineq_reset(matvec: Callable, nrhs: int, m_max: int):
    @jax.jit
    def reset(x, operand, b):
        v, w, mask, h = _reset_core(matvec, nrhs, m_max, x, operand)
        beta = jnp.matmul(v * mask[:, None], b.T, precision=_PREC)
        return v, w, mask, jnp.asarray(nrhs, jnp.int32), h, beta

    return reset


class FusedNonSymLinearEquations:
    """Chunked-dispatch multi-RHS A X = B for NON-symmetric A.

    Petrov-Galerkin projection on the Davidson basis: the (m, m) projected
    system solves on the host in f64 between device chunks (one chunk per
    block append, same dispatch economics as FusedNonSymDavidson).
    Reference twin: LinearEquationsDavidson.h at hermiticity=false; the
    symmetric production family (fused_linear.py) keeps its one-dispatch
    while_loop.

    Errors are RELATIVE residuals |A x_i - b_i| / |b_i| like
    FusedLinearEquations.
    """

    def __init__(
        self,
        matvec: Callable,
        diagonals,
        n: int,
        nrhs: int,
        m_max: Optional[int] = None,
        dtype=None,
        sharding=None,
        convergence_threshold: float = 1e-8,
        max_iter: int = 200,
        operand=None,
        null_thresh: float = 1e-10,
        inner: int = 1,
        rr: str = "host",
        refine_passes: int = 2,
        chunk_iters: int = 64,
        p_space=None,
        p_actions=None,
    ):
        if dtype is None:
            dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
                     else jnp.float32)
        if rr not in ("host", "device"):
            raise ValueError(f"rr must be 'host' or 'device', got {rr!r}")
        if rr == "device" and inner != 1:
            raise ValueError("inner enrichment is a host-RR option; "
                             "rr='device' refreshes the projected solve "
                             "every iteration")
        from .fused_davidson import validate_p_inputs

        self.p_dense, self.n_p, self.p_action_rows = validate_p_inputs(
            p_space, p_actions, n)
        if self.n_p and rr != "device":
            raise ValueError(
                "P space on the non-hermitian fused family runs on the "
                "device tier — pass rr='device' (the host-driven parity "
                "solvers carry the host-loop P path)")
        self.matvec = matvec
        self.n = n
        self.nrhs = nrhs
        self.m_max = m_max if m_max is not None else (
            max(4 * nrhs, min(n, 24)) + self.n_p)
        if self.m_max < 2 * nrhs + self.n_p:
            raise ValueError("m_max must be >= 2*nrhs + n_p")
        if max_iter < 1:
            raise ValueError("max_iter must be >= 1")
        self.dtype = dtype
        self.sharding = sharding
        self.tol = convergence_threshold
        self.max_iter = max_iter
        self.operand = operand
        self.diag = jnp.asarray(np.asarray(diagonals), dtype=dtype)
        self.inner = max(1, int(inner))
        self.rr = rr
        self.refine_passes = max(0, int(refine_passes))
        self.chunk_iters = max(1, int(chunk_iters))
        self._null_thresh = null_thresh
        self._chunks = {}
        self._device_loop = None
        self._reset = make_nonsym_lineq_reset(matvec, nrhs, self.m_max)
        self.iterations = 0
        self.matvecs = 0

    @classmethod
    def from_dense(cls, matrix, nrhs: int, tier: str = "precise", **kwargs):
        """One-call construction from a dense (possibly non-symmetric)
        matrix — same tiers as FusedNonSymDavidson.from_dense
        ("precise"/"fast"/"int8"/"int8_precise"; the int8 tiers quantize
        only the couplings, the Jacobi preconditioner sees the exact
        diagonal)."""
        tiers = ("precise", "fast", "int8", "int8_precise")
        if tier not in tiers:
            raise ValueError(f"tier must be one of {tiers}, got {tier!r}")
        matrix = np.asarray(matrix, dtype=np.float64)
        n = matrix.shape[0]
        if matrix.shape != (n, n):
            raise ValueError("operator must be square")
        dtype = kwargs.pop("dtype", None)
        if dtype is None:
            dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
                     else jnp.float32)
        matvec, operand = _dense_tier_action(matrix, tier, dtype)
        return cls(matvec, np.diag(matrix), n, nrhs, dtype=dtype,
                   operand=operand, **kwargs)

    def _chunk_fn(self, inner: int):
        fn = self._chunks.get(inner)
        if fn is None:
            fn = make_nonsym_lineq_chunk(self.matvec, self.nrhs, self.m_max,
                                         self._null_thresh, inner=inner)
            self._chunks[inner] = fn
        return fn

    def _put_block(self, x):
        x = jnp.asarray(np.asarray(x), dtype=self.dtype)
        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            x = jax.device_put(x, adapt_sharding(self.sharding, 2))
        return x

    def solve(self, b, x0=None, checkpoint_path: Optional[str] = None,
              checkpoint_every: int = 1):
        """Returns ``(x (nrhs, N), errors (nrhs,), iterations)``.

        ``checkpoint_path`` (device tier only) persists a resumable
        LineqDeviceState every ``checkpoint_every`` chunks; continue an
        interrupted solve with :meth:`resume` (pass the SAME ``b``)."""
        # ONE fetch if b is on device
        b_host, b_dev, b_norm = self._prep_b(b)
        if x0 is None:
            d = np.asarray(self.diag, dtype=np.float64)
            # diag may be (N,) shared or (nrhs, N) per-RHS shifted; both
            # broadcast against the (nrhs, N) RHS block
            d2 = d if d.ndim == 2 else d[None, :]
            x0 = b_host / np.where(np.abs(d2) > 1e-12, d2, 1.0)
        if self.rr == "device":
            return self._solve_device(x0, b_dev, b_norm, checkpoint_path,
                                      checkpoint_every)
        if checkpoint_path is not None:
            raise ValueError("mid-solve checkpointing is a device-tier "
                             "feature — pass rr='device'")
        v, w, mask, k, h, beta = self._reset(self._put_block(x0),
                                             self.operand, b_dev)
        self.matvecs += self.nrhs
        x_out = None
        errors = np.full((self.nrhs,), np.inf)
        k_host = self.nrhs
        errs_dev = None
        best = None
        spikes = 0
        for _ in range(self.max_iter):
            if errs_dev is None:
                h_host, beta_host, mask_host = jax.device_get((h, beta, mask))
            else:
                h_host, beta_host, mask_host, errs_h = jax.device_get(
                    (h, beta, mask, errs_dev))
                errors = np.asarray(errs_h, dtype=np.float64)
                if best is None or errors.max() < best[0]:
                    best = (errors.max(), x_out, errors)
                if np.all(errors <= self.tol):
                    break
                if errors.max() > 10.0 * best[0] + 1e-300:
                    # same 2-consecutive-cycle persistence rule as the
                    # eigen family (single spikes can be restart transients)
                    spikes += 1
                    if spikes >= 2:
                        break
                else:
                    spikes = 0
            act = np.where(np.asarray(mask_host) > 0.5)[0]
            hm = np.asarray(h_host, np.float64)[np.ix_(act, act)]
            bm = np.asarray(beta_host, np.float64)[act]
            # host f64 projected solve (exact: no TPU-eigh refinement dance)
            try:
                cm = np.linalg.solve(hm, bm)
            except np.linalg.LinAlgError:
                cm = np.linalg.lstsq(hm, bm, rcond=None)[0]
            coeff = np.zeros((self.nrhs, self.m_max))
            coeff[:, act] = cm.T
            room = (self.m_max - k_host) // self.nrhs
            # same rule as the eigen family: keep one residual-driven
            # append before the next restart
            inner_now = max(1, min(self.inner, room - 1 if room > 1 else 1))
            v, w, mask, k, h, beta, x, errs_dev = self._chunk_fn(inner_now)(
                v, w, mask, k, h, beta,
                jnp.asarray(coeff, self.dtype),
                self.operand, self.diag, b_dev, b_norm,
            )
            self.iterations += inner_now
            self.matvecs += inner_now * self.nrhs
            k_host += inner_now * self.nrhs
            x_out = x
            if k_host + self.nrhs > self.m_max:
                v, w, mask, k, h, beta = self._reset(x, self.operand, b_dev)
                self.matvecs += self.nrhs
                k_host = self.nrhs
        else:
            if errs_dev is not None:
                errors = np.asarray(jax.device_get(errs_dev), dtype=np.float64)
        if best is not None and best[0] < errors.max():
            _, x_out, errors = best
        from ._finite import check_finite

        check_finite(errors, "FusedNonSymLinearEquations")
        return x_out, errors, self.iterations

    def _loops(self):
        if self._device_loop is None:
            self._device_loop = make_nonsym_lineq_device_loop(
                self.matvec, self.nrhs, self.m_max, self._null_thresh,
                self.refine_passes, n_p=self.n_p,
                p_actions=self.p_action_rows is not None)
        return self._device_loop

    def _prep_b(self, b):
        b_host = np.atleast_2d(np.asarray(b))
        b_dev = self._put_block(b_host)
        b_norm_host = np.linalg.norm(b_host, axis=1)
        b_norm = jnp.asarray(np.where(b_norm_host > 0, b_norm_host, 1.0),
                             self.dtype)
        # fingerprint for checkpoint/resume validation: resuming with a
        # DIFFERENT b would silently mix old-slot beta projections with
        # new-slot ones (stall or wrong answer, not an error)
        self._b_fp = [float(x) for x in b_norm_host] + [
            float(b_host.sum(axis=1)[i]) for i in range(b_host.shape[0])]
        return b_host, b_dev, b_norm

    def resume(self, checkpoint_path: str, b, keep_checkpointing: bool = True,
               checkpoint_every: int = 1):
        """Continue an interrupted device-tier solve; ``b`` must be the
        same RHS block the original solve used. Keeps writing checkpoints
        to the same path by default; restores the matvec count."""
        from ..utils.checkpoint import load_named_state

        _b_host, b_dev, b_norm = self._prep_b(b)
        if self.sharding is not None:
            from ..array.vector_ops import adapt_sharding

            shard = adapt_sharding(self.sharding, 2)
        else:
            shard = None
        st, meta = load_named_state(
            checkpoint_path, LineqDeviceState, sharding=shard,
            dtype=self.dtype, shard_fields=("v", "w", "bx"))
        if tuple(st.v.shape) != (self.m_max, self.n):
            raise ValueError(
                f"checkpoint stacks are {tuple(st.v.shape)} but this solver "
                f"is configured (m_max={self.m_max}, n={self.n}) — resume "
                "with the same capacity and dimension")
        if st.bx.shape[0] != self.nrhs:
            raise ValueError(
                f"checkpoint tracks {st.bx.shape[0]} RHS, solver wants "
                f"{self.nrhs}")
        if "n_p" in meta and meta["n_p"] != self.n_p:
            raise ValueError(
                f"checkpoint was written with n_p={meta['n_p']} but this "
                f"solver has n_p={self.n_p}")
        fp_saved = meta.get("b_fp")
        if fp_saved is not None:
            fp_now = np.asarray(self._b_fp, dtype=np.float64)
            fp_saved = np.asarray(fp_saved, dtype=np.float64)
            scale = np.maximum(np.abs(fp_saved), 1.0)
            if (fp_saved.shape != fp_now.shape
                    or np.max(np.abs(fp_saved - fp_now) / scale) > 1e-6):
                raise ValueError(
                    "resume called with a different RHS block than the "
                    "checkpointed solve: the stored beta projections belong "
                    "to the original b and mixing them with a new b stalls "
                    "or corrupts the solve — pass the same b")
        self.matvecs = int(meta.get("matvecs", self.matvecs))
        _, run_cont = self._loops()
        it_host = int(meta.get("iterations", int(np.asarray(st.it))))
        tol = jnp.asarray(self.tol, self.dtype)
        it_end = min(it_host + self.chunk_iters, self.max_iter)
        state = run_cont(
            st.v, st.w, st.mask, jnp.asarray(np.asarray(st.k), jnp.int32),
            st.h, st.beta, self.operand, self.diag, b_dev, b_norm, tol,
            jnp.asarray(it_host, jnp.int32), jnp.asarray(it_end, jnp.int32),
            st.best_err, st.bx, st.berrs)
        return self._drive_lineq_chunks(
            state, it_host, b_dev, b_norm,
            checkpoint_path if keep_checkpointing else None,
            checkpoint_every)

    def _solve_device(self, x0, b_dev, b_norm, checkpoint_path=None,
                      checkpoint_every: int = 1):
        """Single-dispatch path (rr="device"): the whole Petrov-Galerkin
        loop in one while_loop via make_nonsym_lineq_device_loop — no host
        stage at all; between chunks (and at the end) the host fetches
        only small scalars/vectors. Returns the best-snapshot solution as
        a fetch-free device array."""
        nrhs = self.nrhs
        run_init, run_cont = self._loops()
        tol = jnp.asarray(self.tol, self.dtype)
        it_end = min(self.chunk_iters, self.max_iter)
        if self.n_p:
            _check_live_p_guess(self.p_dense, x0, self.nrhs, self.n_p,
                                "FusedNonSymLinearEquations")
            p_dev = self._put_block(self.p_dense)
            wp_dev = (self._put_block(self.p_action_rows)
                      if self.p_action_rows is not None
                      else jnp.zeros_like(p_dev))
            state = run_init(self._put_block(x0), self.operand, self.diag,
                             b_dev, b_norm, tol,
                             jnp.asarray(it_end, jnp.int32), p_dev, wp_dev)
            if self.p_action_rows is None:
                self.matvecs += self.n_p
        else:
            state = run_init(self._put_block(x0), self.operand, self.diag,
                             b_dev, b_norm, tol,
                             jnp.asarray(it_end, jnp.int32))
        self.matvecs += nrhs
        return self._drive_lineq_chunks(state, 0, b_dev, b_norm,
                                        checkpoint_path, checkpoint_every)

    def _drive_lineq_chunks(self, state, it_host, b_dev, b_norm,
                            checkpoint_path, checkpoint_every):
        nrhs = self.nrhs
        _, run_cont = self._loops()
        tol = jnp.asarray(self.tol, self.dtype)
        spikes = 0
        chunks_done = 0
        berrs_h = None
        while True:
            (v, w, mask, k, h, beta, _x, errs_dev, it_dev,
             best_err, bx, berrs, restarts_dev) = state
            errs_h, it_h, be_h, rs_h, berrs_h = jax.device_get(
                (errs_dev, it_dev, best_err, restarts_dev, berrs))
            n_iters = int(it_h) - it_host
            it_host = int(it_h)
            self.iterations = it_host
            self.matvecs += n_iters * nrhs + int(rs_h) * nrhs
            errors = np.asarray(errs_h, dtype=np.float64)
            chunks_done += 1
            if checkpoint_path is not None and (
                    chunks_done % max(1, checkpoint_every) == 0):
                from ..utils.checkpoint import save_fused_state

                save_fused_state(
                    LineqDeviceState(v, w, mask, k, h, beta, best_err, bx,
                                     berrs, jnp.asarray(it_host, jnp.int32)),
                    checkpoint_path, iterations=it_host,
                    matvecs=self.matvecs, tol=float(self.tol),
                    nrhs=self.nrhs, n_p=self.n_p,
                    b_fp=getattr(self, "_b_fp", None))
            if np.all(errors <= self.tol) or it_host >= self.max_iter:
                break
            if errors.max() > 10.0 * float(be_h):
                spikes += 1
                if spikes >= 2:
                    break
            else:
                spikes = 0
            it_end = min(it_host + self.chunk_iters, self.max_iter)
            state = run_cont(
                v, w, mask, k, h, beta, self.operand, self.diag, b_dev,
                b_norm, tol, jnp.asarray(it_host, jnp.int32),
                jnp.asarray(it_end, jnp.int32), best_err, bx, berrs)
        errors = np.asarray(berrs_h, dtype=np.float64)
        from ._finite import check_finite

        check_finite(errors, "FusedNonSymLinearEquations")
        return bx, errors, self.iterations
