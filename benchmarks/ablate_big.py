"""Per-component ablation of the n=32768 r=64 int8 flagship step
(VERDICT r4 #2: "where do the other 65% go?").

Methodology identical to the r16/m64 cost model in CLAUDE.md: every
component is timed as the MARGINAL seconds/trip between two fori_loop (or
while_loop) trip counts of ONE compiled dispatch — removes the tunnel RTT
and the dispatch constant. The loop carries a data dependence so XLA cannot
hoist the body; a per-repetition epsilon perturbs the payload so the axon
payload cache cannot serve identical dispatches; only host fetches sync.
All operands are jit ARGUMENTS (a closure-captured 537 MB int8 operator
ships in the remote-compile payload -> HTTP 413, CLAUDE.md gotcha).

Components:
  matvec        packed int8 one-plane action on the (r, N) block
  eigh64/128    the full-RR (r) and window-RR (2r) small eigensolves
  gs_sweep      one GS pass of (r, N) against the (m_max, N) stack
  recon         (r, m_max) @ (m_max, N) reconstruction pair
  win_gram      (2r, N) @ (N, 2r) window Gram
  step_window   the whole fused window step (pre-round-5 production config)
  step_ppcg     FusedPPCG step at the same size (round-5 production path)

Usage: python benchmarks/ablate_big.py [--quick]   (quick: n=16384)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=32768, r=64, m_max=192):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec
    from iterative_solver_tpu.solvers.fused_davidson import (
        FusedDavidson,
        make_davidson_solve,
    )
    from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

    R = {"n": n, "r": r, "m_max": m_max, "backend": jax.default_backend()}

    def emit():
        print(json.dumps(R), flush=True)

    t_build = time.time()
    rng = np.random.default_rng(0)
    d = np.concatenate(
        [np.linspace(-2.0, 3.0, r), np.linspace(6.0, 50.0, n - r)])
    a = (rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))).astype(np.float32)
    mat = a + a.T
    del a
    mat = mat.astype(np.float64)
    mat[np.arange(n), np.arange(n)] += d
    diag = np.diag(mat).copy()
    matvec, op, _ = make_int8_matvec(mat, b=1024)
    del mat
    R["build_s"] = round(time.time() - t_build, 1)
    emit()

    dtype = jnp.float32
    diag_dev = jnp.asarray(diag, dtype)

    def marginal(run, lo=8, hi=32, reps=4, fetch=np.asarray):
        fetch(run(lo, 0.0))
        fetch(run(hi, 0.0))
        walls = {}
        for k in (lo, hi):
            best = float("inf")
            for rep in range(reps):
                eps = 1e-6 * (rep + 1)
                t0 = time.perf_counter()
                out = run(k, eps)
                fetch(out)
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
        per = (walls[hi] - walls[lo]) / (hi - lo)
        return per, walls[lo]

    x0 = jnp.asarray(rng.standard_normal((r, n)) / np.sqrt(n), dtype)
    v0 = jnp.asarray(rng.standard_normal((m_max, n)) / np.sqrt(n), dtype)
    prec = jax.lax.Precision.HIGHEST

    # ---- matvec only ----
    @jax.jit
    def mv_loop(k, eps, x_, op_):
        def body(i, x):
            y = matvec(x, op_)
            return y / (jnp.max(jnp.abs(y)) + 1.0)
        return lax.fori_loop(0, k, body, x_ + eps)[:1, :8]

    per, _ = marginal(lambda k, e: mv_loop(k, e, x0, op))
    R["matvec_us"] = round(per * 1e6, 1)
    R["matvec_tf_equiv"] = round(2 * r * n * n / per / 1e12, 1)
    emit()

    # ---- small eigh ----
    for sz in (r, 2 * r):
        ar = jnp.asarray(rng.standard_normal((sz, sz)), dtype)
        ar = ar + ar.T + 10.0 * jnp.eye(sz, dtype=dtype)

        @jax.jit
        def eig_loop(k, eps, a_):
            sz_ = a_.shape[0]
            def body(i, s):
                w, v = jnp.linalg.eigh(
                    a_ + s * 1e-9 * jnp.eye(sz_, dtype=a_.dtype))
                return s + w[0] * 1e-6
            return lax.fori_loop(0, k, body, jnp.asarray(eps, a_.dtype))

        per, _ = marginal(lambda k, e, a_=ar: eig_loop(k, e, a_))
        R[f"eigh{sz}_us"] = round(per * 1e6, 1)
        emit()

    # ---- GS sweep against the stack ----
    @jax.jit
    def gs_loop(k, eps, x_, v_):
        def body(i, t):
            g = jnp.matmul(t, v_.T, precision=prec)
            t = t - jnp.matmul(g, v_, precision=prec)
            return t / (jnp.max(jnp.abs(t)) + 1.0)
        return lax.fori_loop(0, k, body, x_ + eps)[:1, :8]

    per, _ = marginal(lambda k, e: gs_loop(k, e, x0, v0))
    R["gs_sweep_us"] = round(per * 1e6, 1)
    emit()

    # ---- reconstruction pair ----
    c0 = jnp.asarray(rng.standard_normal((r, m_max)), dtype)

    @jax.jit
    def recon_loop(k, eps, c_, v_):
        def body(i, c):
            x = jnp.matmul(c, v_, precision=prec)
            c2 = jnp.matmul(x, v_.T, precision=prec)
            return c2 / (jnp.max(jnp.abs(c2)) + 1.0)
        return lax.fori_loop(0, k, body, c_ + eps)[:1, :8]

    per, _ = marginal(lambda k, e: recon_loop(k, e, c0, v0))
    R["recon_pair_us"] = round(per * 1e6, 1)
    emit()

    # ---- window gram ----
    y0 = jnp.asarray(rng.standard_normal((2 * r, n)) / np.sqrt(n), dtype)

    @jax.jit
    def gram_loop(k, eps, y_):
        def body(i, y):
            g = jnp.matmul(y, y.T, precision=prec)
            return y * (1.0 + 1e-9 * g[0, 0])
        return lax.fori_loop(0, k, body, y_ + eps)[:1, :8]

    per, _ = marginal(lambda k, e: gram_loop(k, e, y0))
    R["win_gram_us"] = round(per * 1e6, 1)
    emit()

    flops_iter = (2 * r * n * n + 2 * m_max * m_max * n
                  + 2 * 2 * r * n * m_max + 2 * 2 * 2 * r * m_max * n)

    # ---- full window step (pre-round-5 production) ----
    solver = FusedDavidson(
        matvec, diag, n, r, m_max=m_max, dtype=dtype,
        convergence_threshold=5e-3, max_iter=60, operand=op, rr="window")
    solve = make_davidson_solve(matvec, r, m_max, rr="window",
                                fuse_chain=solver.fuse_chain)
    guess = np.zeros((r, n))
    for row, i in enumerate(np.argsort(diag)[:r]):
        guess[row, i] = 1.0
    st = solver.init_state(guess)

    def win_run(k, eps):
        out, _ = solve(st, op, solver.diag, -1.0 - eps, k)
        return out.errors

    per, _ = marginal(win_run, lo=8, hi=32)
    R["step_window_us"] = round(per * 1e6, 1)
    R["step_window_gflops"] = round(flops_iter / per / 1e9, 1)
    emit()
    st = solver.init_state(guess)
    final, iters = solve(st, op, solver.diag, 5e-3, 60)
    R["window_iters"] = int(iters)
    R["window_maxerr"] = float(np.max(np.asarray(final.errors)))
    emit()

    # ---- PPCG at the same size ----
    for rr_every in (5, 8):
        ppcg = FusedPPCG(
            matvec, diag, n, r, rr_every=rr_every, dtype=dtype,
            convergence_threshold=5e-3, max_iter=400, operand=op)
        pst = ppcg.init_state(guess)

        def ppcg_run(k, eps):
            fin, _ = ppcg._solve(pst, op, ppcg.diag, -1.0 - eps, k)
            return fin.errors

        per, _ = marginal(ppcg_run, lo=8, hi=32)
        R[f"step_ppcg{rr_every}_us"] = round(per * 1e6, 1)
        R[f"step_ppcg{rr_every}_gflops"] = round(
            2 * r * n * n * (1 + 1.0 / rr_every) / per / 1e9, 1)
        emit()
        pst = ppcg.init_state(guess)
        fin, it = ppcg._solve(pst, op, ppcg.diag, 5e-3, 400)
        R[f"ppcg{rr_every}_iters"] = int(it)
        R[f"ppcg{rr_every}_maxerr"] = float(np.max(np.asarray(fin.errors)))
        emit()

    return R


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    main(n=16384 if quick else 32768)
