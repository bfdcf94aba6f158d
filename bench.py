"""Benchmark: fused Davidson eigensolver on a synthetic FCI-style Hamiltonian.

Runs on whatever backend the environment provides (the driver supplies one
real TPU chip). Measurements, one JSON line:

- sustained throughput (headline): the marginal cost per iteration between
  two fixed trip counts of the SAME compiled single-dispatch solve
  (lax.while_loop with tol<0) — GFLOP/s across matvec + Gram +
  reconstruction + orthogonalisation, net of the per-dispatch constant
  (tunnel RTT + launch), same methodology as the SpMV metric below.
- solution quality: converging runs; eigenvalue error is measured on the
  host in f64 from the returned vectors' Rayleigh quotients.

The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
to REFERENCE_GFLOPS_BLOCK recorded in round 1 on the driver-provided chip.
Round-1 history: the dispatch-inclusive 64-iteration measurement read
723/2300 GFLOP/s (r4/r16); the marginal method puts the same computation at
~2000/6400 because a ~30 ms dispatch constant no longer pollutes 64x~0.3 ms
of compute.

Two operator tiers, both through the packed-triangle symmetric Pallas
kernel (ops/kernels/symm_pallas.py — streams only the lower triangle, half
the dense HBM traffic):

- FAST tier (headline): bf16 tiles, single-pass MXU dots with f32 per-tile
  accumulation — the same arithmetic tier as the round-1 baseline's
  DEFAULT-precision dense matmul (which rounds to bf16 internally), at a
  quarter of its traffic. Residuals floor ~2e-4 like the baseline's.
  Combined with the window Rayleigh-Ritz (rr="window": 2r x 2r eigh
  instead of m_max x m_max — the small eigh dominates the non-matvec cost
  of a fused iteration).
- PRECISE tier: split double-bf16 tiles (same bytes/element as f32), three
  single-pass dots recovering ~2^-16 operator accuracy; the per-tile f32
  accumulator is an implicit split-K, flooring f64 residuals at ~3.5e-6 —
  ~50x tighter than the dense-XLA path the round-1 bench used. Eigenvalues
  from host-f64 Rayleigh quotients come out at ~2.5e-12.

FLOPs are counted at the mathematical cost (2 r N^2 per matvec) in every
tier — never at the multi-pass count.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

REFERENCE_GFLOPS = 2000.0        # round-1 4-root sustained (marginal method)
REFERENCE_GFLOPS_BLOCK = 6400.0  # round-1 16-root sustained (marginal method)

# lowest-4 eigenvalues of the deterministic benchmark matrix, precomputed
# with np.linalg.eigvalsh in f64 (saves minutes of host work per bench run)
REFERENCE_EIGENVALUES = [
    -2.0000867851589925, -1.8397575604176952, -1.6784299270313459, -1.5176359291753378,
]

N = 8192
NROOTS = 4          # quality/convergence config (matches the FCI test style)
NROOTS_BLOCK = 16   # throughput config: the matvec is bandwidth-bound and
                    # nearly flat in block rows up to ~32, so wide blocks are
                    # almost free on the MXU (measured m=4..32 ~equal wall)
M_MAX = 32
M_MAX_BLOCK = 64
THROUGHPUT_ITERS = 64


def main(big: bool = False):
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.fused_davidson import (
        FusedDavidson,
        make_davidson_solve,
    )

    # The tunneled TPU can disappear mid-session: backend init then either
    # raises UNAVAILABLE or HANGS indefinitely. Probe it in a subprocess
    # with a timeout so a round-end bench degrades to the CPU leg and still
    # records something instead of crashing or hanging forever.
    import subprocess
    import sys as _sys

    try:
        probe = subprocess.run(
            [_sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=120,
        )
        probe_backend = probe.stdout.strip().splitlines()[-1] if (
            probe.returncode == 0 and probe.stdout.strip()) else None
    except subprocess.TimeoutExpired:
        probe_backend = None
    if probe_backend is None:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    # degraded CPU mode: the full-size f64 leg takes >10 min on the host —
    # shrink so the artifact still records in minutes
    global N, THROUGHPUT_ITERS
    if backend == "cpu":
        N = 1024
        THROUGHPUT_ITERS = 8

    rng = np.random.default_rng(0)
    # gapped low block (the sought correlation states) + dense remainder
    dvals = np.concatenate([np.linspace(-2.0, 3.0, 32), np.linspace(6.0, 50.0, N - 32)])
    a = rng.standard_normal((N, N)) * (0.05 / np.sqrt(N))
    matrix = (a + a.T + np.diag(dvals)).astype(np.float64)
    diag = np.diag(matrix)
    ref_evals = (REFERENCE_EIGENVALUES if N == 8192
                 else np.linalg.eigvalsh(matrix)[:NROOTS].tolist())

    if backend == "tpu":
        from iterative_solver_tpu.ops.kernels.symm_pallas import (
            SymmetricBlocked,
            SymmetricBlockedSplit,
            symm_matmat_pallas,
            symm_matmat_split_pallas,
        )

        # tile sizes are measured optima (see from_dense_symmetric): the
        # single bf16 stack streams at the DMA roof with b=1024 (90 us vs
        # 103 at b=512 for the 8192^2 action); the split tier's TWO stacks
        # double the buffered VMEM and prefer b=512
        sym_fast = SymmetricBlocked.from_dense(matrix, b=1024, dtype=jnp.bfloat16)
        sym_prec = SymmetricBlockedSplit.from_dense(matrix, b=512)
        op_fast = (sym_fast.values, sym_fast.ii, sym_fast.jj)
        op_prec = (sym_prec.hi, sym_prec.lo, sym_prec.ii, sym_prec.jj)

        def matvec_fast(x, op):
            s = dataclasses.replace(sym_fast, values=op[0], ii=op[1], jj=op[2])
            return symm_matmat_pallas(x, s)

        def matvec_prec(x, op):
            s = dataclasses.replace(sym_prec, hi=op[0], lo=op[1], ii=op[2], jj=op[3])
            return symm_matmat_split_pallas(x, s)

        tol_fast, tol_prec = 2e-4, 1e-5
        rr_fast = "window"
    else:
        matj = jnp.asarray(matrix, dtype=dtype)

        def matvec_fast(x, op):
            return jnp.matmul(x, op.T, preferred_element_type=dtype)

        matvec_prec = matvec_fast
        op_fast = op_prec = matj
        tol_fast = tol_prec = 2e-4 if dtype == jnp.float32 else 1e-8
        rr_fast = "full"

    def guess(nroots):
        v0 = np.zeros((nroots, N))
        for row, i in enumerate(np.argsort(diag)[:nroots]):
            v0[row, i] = 1.0
        return v0

    def sustained(solve_fn, st, operand, dg, lo=THROUGHPUT_ITERS, hi=8 * THROUGHPUT_ITERS):
        """Marginal seconds/iteration between two trip counts of one compiled
        solve — removes the per-dispatch constant (same method as the SpMV
        metric). Returns (s_per_iter, wall_lo, dispatch_constant_s)."""
        out, got_lo = solve_fn(st, operand, dg, -1.0, lo)
        np.asarray(out.errors)  # compile + warmup; fetch closes the async loop
        out, got_hi = solve_fn(st, operand, dg, -1.0, hi)
        np.asarray(out.errors)
        got_lo, got_hi = int(got_lo), int(got_hi)
        walls = {}
        for k in (lo, hi):
            best = float("inf")
            for _ in range(5):  # best-of-5: tunnel + chip contention add
                                # run-to-run noise of up to ~30%
                t0 = time.perf_counter()
                out, _ = solve_fn(st, operand, dg, -1.0, k)
                np.asarray(out.errors)
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
        per_iter = (walls[hi] - walls[lo]) / (got_hi - got_lo)
        return per_iter, walls[lo], walls[lo] - got_lo * per_iter

    def f64_quality(x, nroots):
        x64 = np.asarray(x, dtype=np.float64)
        ref = np.asarray(ref_evals)
        ev_err = res = 0.0
        for i in range(nroots):
            xi = x64[i] / np.linalg.norm(x64[i])
            rq = xi @ matrix @ xi
            if i < len(ref):
                ev_err = max(ev_err, abs(rq - ref[i]))
            res = max(res, float(np.linalg.norm(matrix @ xi - rq * xi)))
        return ev_err, res

    flops_iter_blk = (
        2 * NROOTS_BLOCK * N * N
        + 2 * M_MAX_BLOCK * M_MAX_BLOCK * N
        + 2 * 2 * NROOTS_BLOCK * N * M_MAX_BLOCK
        + 2 * 2 * 2 * NROOTS_BLOCK * M_MAX_BLOCK * N
    )
    flops_iter_r4 = (
        2 * NROOTS * N * N
        + 2 * M_MAX * M_MAX * N
        + 2 * 2 * NROOTS * N * M_MAX
        + 2 * 2 * 2 * NROOTS * M_MAX * N
    )

    # ---- FAST tier, 16-root block: the headline sustained rate ----
    solver_blk = FusedDavidson(
        matvec_fast, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
        convergence_threshold=tol_fast, max_iter=60, operand=op_fast, rr=rr_fast,
    )
    # fuse_chain follows the solver's own auto policy (fused
    # precondition+GS+Gram chain where safe: TPU, fits VMEM — the r32/m128
    # stack compile-OOMed the 16 MB arena, so the guard rejects it)
    solve_blk = make_davidson_solve(matvec_fast, NROOTS_BLOCK, M_MAX_BLOCK, rr=rr_fast,
                                    fuse_chain=solver_blk.fuse_chain)
    st_blk = solver_blk.init_state(guess(NROOTS_BLOCK))
    per_iter_blk, wall_blk, _ = sustained(solve_blk, st_blk, op_fast, solver_blk.diag)
    gflops_blk = flops_iter_blk / per_iter_blk / 1e9
    # convergence proof for the SAME config (fast tier resolves ~2e-4)
    st_blk = solver_blk.init_state(guess(NROOTS_BLOCK))
    final_blk, iters_blk = solve_blk(st_blk, op_fast, solver_blk.diag, tol_fast, 60)
    _, res_fast = f64_quality(final_blk.x, NROOTS_BLOCK)
    conv_fast = bool(np.max(np.asarray(final_blk.errors)) <= tol_fast)

    # ---- FAST tier, 32-root block: peak arithmetic-intensity config ----
    # (same HBM traffic per iteration as r16 — the packed matvec is
    # DMA-bound — at twice the mathematical work per pass)
    r32, m32 = 32, 128
    if backend == "tpu":
        solver_32 = FusedDavidson(
            matvec_fast, diag, N, r32, m_max=m32, dtype=dtype,
            convergence_threshold=3e-4, max_iter=60, operand=op_fast, rr=rr_fast,
        )
        solve_32 = make_davidson_solve(matvec_fast, r32, m32, rr=rr_fast,
                                       fuse_chain=solver_32.fuse_chain)
        st_32 = solver_32.init_state(guess(r32))
        per_iter_32, _, _ = sustained(solve_32, st_32, op_fast, solver_32.diag)
        flops_iter_32 = (
            2 * r32 * N * N + 2 * m32 * m32 * N
            + 2 * 2 * r32 * N * m32 + 2 * 2 * 2 * r32 * m32 * N
        )
        gflops_32 = flops_iter_32 / per_iter_32 / 1e9
        st_32 = solver_32.init_state(guess(r32))
        final_32, iters_32 = solve_32(st_32, op_fast, solver_32.diag, 3e-4, 60)
        _, res_32 = f64_quality(final_32.x, r32)
        conv_32 = bool(np.max(np.asarray(final_32.errors)) <= 3e-4)
    else:
        gflops_32 = per_iter_32 = 0.0
        iters_32, res_32 = 0, 0.0
        conv_32 = False

    # ---- TURBO tier: int8 quantized operator (ops/kernels/symm_int8.py) ----
    # One int8 plane + exact diagonal: HALF the bf16 tier's streamed bytes
    # and double-rate MXU dots (the packed matvec drops 125 -> 36 us at
    # n=8192 m=16). Coupling quantization floors the residual ~4e-3 on this
    # spectrum, so the leg runs at its own (looser) tolerance — an honest
    # sustained-rate tier for throughput-first screening passes.
    if backend == "tpu":
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec

        tol_turbo = 5e-3
        matvec_i8, op_i8, _ = make_int8_matvec(matrix, b=1024)

        solver_i8 = FusedDavidson(
            matvec_i8, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_turbo, max_iter=60, operand=op_i8,
            rr=rr_fast,
        )
        solve_i8 = make_davidson_solve(matvec_i8, NROOTS_BLOCK, M_MAX_BLOCK,
                                       rr=rr_fast, fuse_chain=solver_i8.fuse_chain)
        st_i8 = solver_i8.init_state(guess(NROOTS_BLOCK))
        per_iter_i8, _, _ = sustained(solve_i8, st_i8, op_i8, solver_i8.diag)
        gflops_i8 = flops_iter_blk / per_iter_i8 / 1e9
        st_i8 = solver_i8.init_state(guess(NROOTS_BLOCK))
        final_i8, iters_i8 = solve_i8(st_i8, op_i8, solver_i8.diag, tol_turbo, 60)
        _, res_i8 = f64_quality(final_i8.x, NROOTS_BLOCK)
        conv_i8 = bool(np.max(np.asarray(final_i8.errors)) <= tol_turbo)
    else:
        gflops_i8 = per_iter_i8 = 0.0
        iters_i8, res_i8 = 0, 0.0
        conv_i8 = False
        tol_turbo = 0.0

    # ---- PRECISE tier, 16-root block: secondary sustained rate ----
    solve_pb = make_davidson_solve(matvec_prec, NROOTS_BLOCK, M_MAX_BLOCK)
    solver_pb = FusedDavidson(
        matvec_prec, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
        convergence_threshold=tol_prec, max_iter=60, operand=op_prec,
    )
    st_pb = solver_pb.init_state(guess(NROOTS_BLOCK))
    per_iter_prec, _, _ = sustained(solve_pb, st_pb, op_prec, solver_pb.diag)
    gflops_prec = flops_iter_blk / per_iter_prec / 1e9

    # ---- QUANTIZED-PRECISE tier: two int8 planes (split-bf16 class, half
    # its bytes — kernel 101 vs 203 us; converges the precise tol in ~3
    # iterations on this spectrum, f64 floor ~6e-6) ----
    if backend == "tpu":
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec

        matvec_i8p, op_i8p, _ = make_int8_matvec(matrix, b=512, two_plane=True)

        solver_i8p = FusedDavidson(
            matvec_i8p, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_prec, max_iter=60, operand=op_i8p,
        )
        solve_i8p = make_davidson_solve(matvec_i8p, NROOTS_BLOCK, M_MAX_BLOCK,
                                        fuse_chain=solver_i8p.fuse_chain)
        st_i8p = solver_i8p.init_state(guess(NROOTS_BLOCK))
        per_iter_i8p, _, _ = sustained(solve_i8p, st_i8p, op_i8p, solver_i8p.diag)
        gflops_i8p = flops_iter_blk / per_iter_i8p / 1e9
        st_i8p = solver_i8p.init_state(guess(NROOTS_BLOCK))
        final_i8p, iters_i8p = solve_i8p(st_i8p, op_i8p, solver_i8p.diag,
                                         tol_prec, 60)
        _, res_i8p = f64_quality(final_i8p.x, NROOTS_BLOCK)
        conv_i8p = bool(np.max(np.asarray(final_i8p.errors)) <= tol_prec)
    else:
        gflops_i8p = per_iter_i8p = 0.0
        iters_i8p, res_i8p = 0, 0.0
        conv_i8p = False

    # ---- FAST tier, 4-root sustained + dispatch constant ----
    solver_r4 = FusedDavidson(
        matvec_fast, diag, N, NROOTS, m_max=M_MAX, dtype=dtype,
        convergence_threshold=tol_fast, max_iter=60, operand=op_fast, rr=rr_fast,
    )
    solve_r4 = make_davidson_solve(matvec_fast, NROOTS, M_MAX, rr=rr_fast,
                                   fuse_chain=solver_r4.fuse_chain)
    st_r4 = solver_r4.init_state(guess(NROOTS))
    per_iter_r4, wall_r4, dispatch_const = sustained(
        solve_r4, st_r4, op_fast, solver_r4.diag
    )
    gflops_r4 = flops_iter_r4 / per_iter_r4 / 1e9

    # ---- PRECISE tier, 4-root convergence + quality ----
    solve_pq = make_davidson_solve(matvec_prec, NROOTS, M_MAX)
    solver_pq = FusedDavidson(
        matvec_prec, diag, N, NROOTS, m_max=M_MAX, dtype=dtype,
        convergence_threshold=tol_prec, max_iter=60, operand=op_prec,
    )
    st_pq = solver_pq.init_state(guess(NROOTS))
    out, _ = solve_pq(st_pq, op_prec, solver_pq.diag, -1.0, 1)
    np.asarray(out.errors)  # compile warmup: solve_wall_s measures the solve
    t0 = time.perf_counter()
    final, iters = solve_pq(st_pq, op_prec, solver_pq.diag, tol_prec, 60)
    np.asarray(final.errors)
    wall_solve = time.perf_counter() - t0
    iters = int(iters)
    ev_err, res_f64 = f64_quality(final.x, NROOTS)
    conv_prec = bool(np.max(np.asarray(final.errors)) <= tol_prec)

    # ---- PRECISE-1e8 leg: the reference's own convergence bar on TPU ----
    # (test_LinearEigensystem.cpp:196: convergence_threshold = 1.0e-8).
    # Split-tier fused solve to its f32 floor at r16, then mixed-precision
    # refinement (host-f64 RR + deflated-projected corrections through the
    # SAME device operator) to max f64 residual <= 1e-8.
    from iterative_solver_tpu.solvers.refine import EigenpairRefiner

    tol_1e8 = 1e-8
    st_p16 = solver_pb.init_state(guess(NROOTS_BLOCK))
    t0 = time.perf_counter()
    final_p16, iters_p16 = solve_pb(st_p16, op_prec, solver_pb.diag, tol_prec, 60)
    np.asarray(final_p16.errors)
    wall_p16 = time.perf_counter() - t0
    refiner = EigenpairRefiner(lambda xx: xx @ matrix.T, matvec_prec, op_prec,
                               diag, N, NROOTS_BLOCK, dtype=dtype)
    # warmup: compile the inner FusedBlockCG whole-solve OUTSIDE the timed
    # region (every other leg warms its dispatch before the clock starts)
    refiner.refine(np.asarray(final_p16.x, dtype=np.float64), tol=tol_1e8,
                   max_passes=1)
    t0 = time.perf_counter()
    ref_out = refiner.refine(np.asarray(final_p16.x, dtype=np.float64),
                             tol=tol_1e8)
    wall_refine = time.perf_counter() - t0

    # ---- PEAK config: n=16384, 64 roots, fast tier ----
    # the packed matvec is DMA-bound, so sustained GFLOP/s scales with the
    # block width at fixed traffic until the m-row dots saturate the MXU;
    # quadrupling N amortises the fixed eigh/small-op cost 4x further.
    # This is a CONVERGING configuration (window RR, 3e-4 tol in ~4 iters),
    # not a synthetic peak.
    if backend == "tpu":
        n16, r64, m192 = 16384, 64, 192
        rng16 = np.random.default_rng(0)
        d16 = np.concatenate(
            [np.linspace(-2.0, 3.0, 64), np.linspace(6.0, 50.0, n16 - 64)])
        a16 = (rng16.standard_normal((n16, n16)) * (0.05 / np.sqrt(n16))).astype(
            np.float32)
        mat16 = (a16 + a16.T).astype(np.float64) + np.diag(d16)
        del a16
        diag16 = np.diag(mat16).copy()
        sym16 = SymmetricBlocked.from_dense(mat16, b=1024, dtype=jnp.bfloat16)
        op16 = (sym16.values, sym16.ii, sym16.jj)

        def matvec16(x, op):
            s = dataclasses.replace(sym16, values=op[0], ii=op[1], jj=op[2])
            return symm_matmat_pallas(x, s)

        solver_16 = FusedDavidson(
            matvec16, diag16, n16, r64, m_max=m192, dtype=dtype,
            convergence_threshold=3e-4, max_iter=60, operand=op16, rr="window",
        )
        solve_16 = make_davidson_solve(matvec16, r64, m192, rr="window",
                                       fuse_chain=solver_16.fuse_chain)
        v16 = np.zeros((r64, n16))
        for row, i in enumerate(np.argsort(diag16)[:r64]):
            v16[row, i] = 1.0
        st_16 = solver_16.init_state(v16)
        per_iter_16, _, _ = sustained(solve_16, st_16, op16, solver_16.diag,
                                      lo=32, hi=160)
        flops_iter_16 = (
            2 * r64 * n16 * n16 + 2 * m192 * m192 * n16
            + 2 * 2 * r64 * n16 * m192 + 2 * 2 * 2 * r64 * m192 * n16
        )
        gflops_16 = flops_iter_16 / per_iter_16 / 1e9
        st_16 = solver_16.init_state(v16)
        final_16, iters_16 = solve_16(st_16, op16, solver_16.diag, 3e-4, 60)
        # f64 residual spot-check on the 4 lowest roots (full r64 RQ sweep
        # against the 2 GB matrix would dominate the bench wall)
        x16 = np.asarray(final_16.x[:4], dtype=np.float64)
        res_16 = 0.0
        for i in range(4):
            xi = x16[i] / np.linalg.norm(x16[i])
            rq = xi @ mat16 @ xi
            res_16 = max(res_16, float(np.linalg.norm(mat16 @ xi - rq * xi)))
        conv_16 = bool(np.max(np.asarray(final_16.errors)) <= 3e-4)

        # int8 variant of the peak config: same spectrum, quantized
        # couplings + exact diagonal at half the bf16 tile bytes
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec

        matvec16q, op16q, sym16q = make_int8_matvec(mat16, b=1024)

        solver_16q = FusedDavidson(
            matvec16q, diag16, n16, r64, m_max=m192, dtype=dtype,
            convergence_threshold=5e-3, max_iter=60, operand=op16q, rr="window",
        )
        solve_16q = make_davidson_solve(matvec16q, r64, m192, rr="window",
                                        fuse_chain=solver_16q.fuse_chain)
        st_16q = solver_16q.init_state(v16)
        per_iter_16q, _, _ = sustained(solve_16q, st_16q, op16q, solver_16q.diag,
                                       lo=32, hi=160)
        gflops_16q = flops_iter_16 / per_iter_16q / 1e9
        st_16q = solver_16q.init_state(v16)
        final_16q, iters_16q = solve_16q(st_16q, op16q, solver_16q.diag, 5e-3, 60)
        conv_16q = bool(np.max(np.asarray(final_16q.errors)) <= 5e-3)
        del mat16, sym16, op16, sym16q, op16q, matvec16q
    else:
        gflops_16 = per_iter_16 = 0.0
        iters_16, res_16 = 0, 0.0
        conv_16 = False
        gflops_16q = per_iter_16q = 0.0
        iters_16q = 0
        conv_16q = False

    # ---- BIG peak config (opt-in, --big): n=32768, 64 roots, fast tier ----
    # PERF.md's 50-TF claim made driver-reproducible. Off by default: the
    # host-side setup packs an 8.6 GB matrix (minutes of numpy wall).
    if big and backend == "tpu":
        n32, r64b, m192b = 32768, 64, 192
        rng32 = np.random.default_rng(0)
        d32 = np.concatenate(
            [np.linspace(-2.0, 3.0, 64), np.linspace(6.0, 50.0, n32 - 64)])
        a32 = (rng32.standard_normal((n32, n32)) * (0.05 / np.sqrt(n32))).astype(
            np.float32)
        mat32 = a32 + a32.T
        del a32
        mat32 = mat32.astype(np.float64)
        mat32[np.arange(n32), np.arange(n32)] += d32
        diag32 = np.diag(mat32).copy()
        sym32 = SymmetricBlocked.from_dense(mat32, b=1024, dtype=jnp.bfloat16)
        op32 = (sym32.values, sym32.ii, sym32.jj)

        def matvec32(x, op):
            s = dataclasses.replace(sym32, values=op[0], ii=op[1], jj=op[2])
            return symm_matmat_pallas(x, s)

        solver_n32 = FusedDavidson(
            matvec32, diag32, n32, r64b, m_max=m192b, dtype=dtype,
            convergence_threshold=3e-4, max_iter=60, operand=op32, rr="window",
        )
        solve_n32 = make_davidson_solve(matvec32, r64b, m192b, rr="window",
                                        fuse_chain=solver_n32.fuse_chain)
        v32 = np.zeros((r64b, n32))
        for row, i in enumerate(np.argsort(diag32)[:r64b]):
            v32[row, i] = 1.0
        st_n32 = solver_n32.init_state(v32)
        per_iter_n32, _, _ = sustained(solve_n32, st_n32, op32, solver_n32.diag,
                                       lo=16, hi=64)
        flops_iter_n32 = (
            2 * r64b * n32 * n32 + 2 * m192b * m192b * n32
            + 2 * 2 * r64b * n32 * m192b + 2 * 2 * 2 * r64b * m192b * n32
        )
        gflops_n32 = flops_iter_n32 / per_iter_n32 / 1e9
        st_n32 = solver_n32.init_state(v32)
        final_n32, iters_n32 = solve_n32(st_n32, op32, solver_n32.diag, 3e-4, 60)
        res_n32 = float(np.max(np.asarray(final_n32.errors)))
        conv_n32 = bool(res_n32 <= 3e-4)
        del sym32, op32

        # int8 variant of the big peak (quantized couplings, exact diag)
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec

        matvec32q, op32q, sym32q = make_int8_matvec(mat32, b=1024)
        del mat32

        solver_n32q = FusedDavidson(
            matvec32q, diag32, n32, r64b, m_max=m192b, dtype=dtype,
            convergence_threshold=5e-3, max_iter=60, operand=op32q, rr="window",
        )
        solve_n32q = make_davidson_solve(matvec32q, r64b, m192b, rr="window",
                                         fuse_chain=solver_n32q.fuse_chain)
        st_n32q = solver_n32q.init_state(v32)
        per_iter_n32q, _, _ = sustained(solve_n32q, st_n32q, op32q,
                                        solver_n32q.diag, lo=16, hi=64)
        gflops_n32q = flops_iter_n32 / per_iter_n32q / 1e9
        st_n32q = solver_n32q.init_state(v32)
        final_n32q, iters_n32q = solve_n32q(st_n32q, op32q, solver_n32q.diag,
                                            5e-3, 60)
        res_n32q = float(np.max(np.asarray(final_n32q.errors)))
        conv_n32q = bool(res_n32q <= 5e-3)
        del sym32q, op32q, matvec32q
    else:
        gflops_n32 = per_iter_n32 = 0.0
        iters_n32, res_n32, conv_n32 = 0, 0.0, False
        gflops_n32q = per_iter_n32q = 0.0
        iters_n32q, res_n32q, conv_n32q = 0, 0.0, False

    # ---- HARD-spectrum solve: PPCG vs window Davidson, wall to 1e-5 ----
    # weakly diagonally dominant operator (Jacobi preconditioning stalls the
    # window modes); precise split tier so the 1e-5 tolerance is reachable.
    # This is the wall-clock-to-solution metric production cares about.
    if backend == "tpu":
        from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

        nh, rh = 8192, 8
        rngh = np.random.default_rng(3)
        ah = rngh.standard_normal((nh, nh)) * (0.4 / np.sqrt(nh))
        math_ = ah + ah.T + np.diag(np.linspace(0.0, 6.0, nh))
        del ah
        diagh = np.diag(math_).copy()
        symh = SymmetricBlockedSplit.from_dense(math_, b=512)
        oph = (symh.hi, symh.lo, symh.ii, symh.jj)

        def matvec_h(x, op):
            s = dataclasses.replace(symh, hi=op[0], lo=op[1], ii=op[2], jj=op[3])
            return symm_matmat_split_pallas(x, s)

        vh = np.zeros((rh, nh))
        for row, i in enumerate(np.argsort(diagh)[:rh]):
            vh[row, i] = 1.0
        # 5e-5 sits above PPCG's f32 carried-quantity floor (~2.2e-5
        # measured on this operator) and below the window mode's stall
        # level (~1.1e-4 after 1500 iterations)
        tol_h, cap_h = 5e-5, 1500

        ppcg_h = FusedPPCG(matvec_h, diagh, nh, rh, rr_every=5, dtype=dtype,
                           convergence_threshold=tol_h, max_iter=cap_h,
                           operand=oph)
        st_h = ppcg_h.init_state(vh)
        out_h, _ = ppcg_h._solve(st_h, oph, ppcg_h.diag, -1.0, 1)
        np.asarray(out_h.errors)  # warmup/compile
        st_h = ppcg_h.init_state(vh)
        t0 = time.perf_counter()
        fin_h, it_ppcg_h = ppcg_h._solve(st_h, oph, ppcg_h.diag, tol_h, cap_h)
        np.asarray(fin_h.errors)
        wall_ppcg_h = time.perf_counter() - t0
        res_ppcg_h = float(np.max(np.asarray(fin_h.errors)))

        solver_wh = FusedDavidson(matvec_h, diagh, nh, rh, m_max=4 * rh,
                                  dtype=dtype, convergence_threshold=tol_h,
                                  max_iter=cap_h, operand=oph, rr="window")
        solve_wh = make_davidson_solve(matvec_h, rh, 4 * rh, rr="window",
                                       fuse_chain=solver_wh.fuse_chain)
        st_wh = solver_wh.init_state(vh)
        out_wh, _ = solve_wh(st_wh, oph, solver_wh.diag, -1.0, 1)
        np.asarray(out_wh.errors)
        st_wh = solver_wh.init_state(vh)
        t0 = time.perf_counter()
        fin_wh, it_win_h = solve_wh(st_wh, oph, solver_wh.diag, tol_h, cap_h)
        np.asarray(fin_wh.errors)
        wall_win_h = time.perf_counter() - t0
        res_win_h = float(np.max(np.asarray(fin_wh.errors)))
        del math_, symh, oph
    else:
        wall_ppcg_h = wall_win_h = 0.0
        it_ppcg_h = it_win_h = 0
        res_ppcg_h = res_win_h = 0.0

    # ---- sparse action throughput (BASELINE.md: Davidson SpMV nnz/s/chip) ----
    from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr
    from iterative_solver_tpu.ops.kernels.spmv_pallas import _bsr_matmat_xla

    bsr, _ = synthetic_fci_bsr(N, block=128, density=0.3, seed=1, dtype=dtype)
    n_rb = bsr.shape[0] // bsr.bm

    # dynamic trip count: one compiled program for both timing points
    @jax.jit
    def spmm_loop(x, values, col_idx, row_idx, k):
        def body(i, acc):
            return _bsr_matmat_xla(acc, values, col_idx, row_idx, bsr.bm, bsr.bn, n_rb) * 1e-2

        return jax.lax.fori_loop(0, k, body, x)

    def spmv_rate(rows):
        """nnz/s of the block action on a (rows, N) block. The action is
        value-traffic/overhead bound, so wall time is flat in rows — the
        production solvers apply it to NROOTS_BLOCK-row blocks."""
        xs = jnp.asarray(
            np.random.default_rng(2).standard_normal((rows, bsr.shape[0])), dtype=dtype
        )
        # marginal (two trip counts) removes the ~28 ms tunnel dispatch
        # overhead; trip counts large enough to dwarf RTT jitter
        np.asarray(spmm_loop(xs, bsr.values, bsr.col_idx, bsr.row_idx, 4)[0, :2])
        walls = {}
        trips = (64, 1024) if backend == "tpu" else (4, 32)
        for k in trips:
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = spmm_loop(xs, bsr.values, bsr.col_idx, bsr.row_idx, k)
                np.asarray(out[0, :2])
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
        wall = (walls[trips[1]] - walls[trips[0]]) / (trips[1] - trips[0])
        return bsr.nnz * rows / wall

    nnz_per_s = spmv_rate(NROOTS_BLOCK)
    nnz_per_s_r4 = spmv_rate(NROOTS)

    # quantized sparse tier: same action through int8 blocks (half the
    # value traffic, exact int32 accumulation) — bf16-class couplings
    from iterative_solver_tpu.ops.kernels.spmv_pallas import (
        BSRMatrixInt8,
        _bsr_matmat_int8_xla,
    )
    from iterative_solver_tpu.ops.kernels.symm_int8 import quantize_rows

    bsr_q = BSRMatrixInt8.from_bsr(bsr)

    @jax.jit
    def spmm_loop_int8(x, q, cq, rq, dg, col_idx, row_idx, k):
        def body(i, acc):
            xf = acc.astype(jnp.float32)
            qx, sx = quantize_rows(xf * cq[None, :])
            y = _bsr_matmat_int8_xla(qx, q, col_idx, row_idx,
                                     bsr.bm, bsr.bn, n_rb)
            y = y.astype(jnp.float32) * sx * rq[None, :] + xf * dg[None, :]
            return (y * 1e-2).astype(acc.dtype)

        return jax.lax.fori_loop(0, k, body, x)

    def spmv_rate_int8(rows):
        xs = jnp.asarray(
            np.random.default_rng(2).standard_normal((rows, bsr.shape[0])),
            dtype=dtype)
        dg = bsr_q.diagonal if bsr_q.diagonal is not None else jnp.zeros(
            bsr.shape[0], jnp.float32)
        args = (bsr_q.q, bsr_q.cq, bsr_q.rq, dg, bsr_q.col_idx, bsr_q.row_idx)
        np.asarray(spmm_loop_int8(xs, *args, 4)[0, :2])
        walls = {}
        trips = (64, 1024) if backend == "tpu" else (4, 32)
        for k in trips:
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = spmm_loop_int8(xs, *args, k)
                np.asarray(out[0, :2])
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
        wall = (walls[trips[1]] - walls[trips[0]]) / (trips[1] - trips[0])
        return bsr.nnz * rows / wall

    nnz_per_s_int8 = spmv_rate_int8(NROOTS_BLOCK)

    # Leg taxonomy (truth-in-benchmarking, VERDICT r1 #4): every solve leg
    # carries (tol, converged); throughput legs at loose tolerances are
    # sustained-rate measurements, and the hard_window leg is the INTENDED
    # stall contrast with PPCG — its converged flag is expected False.
    result = {
        "metric": f"fused_davidson_n{N}_r{NROOTS_BLOCK}_sustained",
        "value": round(gflops_blk, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops_blk / REFERENCE_GFLOPS_BLOCK, 3),
        "fast_tol": tol_fast,
        "fast_converged": conv_fast,
        "precise_tier_gflops": round(gflops_prec, 1),
        "turbo_int8_gflops": round(gflops_i8, 1),
        "turbo_int8_iter_time_ms": round(per_iter_i8 * 1e3, 3),
        "turbo_int8_solve_iterations": int(iters_i8),
        "turbo_int8_max_residual_f64": res_i8,
        "turbo_int8_tol": tol_turbo,
        "turbo_int8_converged": conv_i8,
        "int8_precise_gflops": round(gflops_i8p, 1),
        "int8_precise_iter_time_ms": round(per_iter_i8p * 1e3, 3),
        "int8_precise_solve_iterations": int(iters_i8p),
        "int8_precise_max_residual_f64": res_i8p,
        "int8_precise_tol": tol_prec,
        "int8_precise_converged": conv_i8p,
        "r32_gflops": round(gflops_32, 1),
        "r32_iter_time_ms": round(per_iter_32 * 1e3, 3),
        "r32_solve_iterations": int(iters_32),
        "r32_max_residual_f64": res_32,
        "r32_tol": 3e-4,
        "r32_converged": conv_32,
        "n16384_r64_gflops": round(gflops_16, 1),
        "n16384_r64_iter_time_ms": round(per_iter_16 * 1e3, 3),
        "n16384_r64_solve_iterations": int(iters_16),
        "n16384_r64_max_residual_f64": res_16,
        "n16384_r64_tol": 3e-4,
        "n16384_r64_converged": conv_16,
        "n16384_r64_int8_gflops": round(gflops_16q, 1),
        "n16384_r64_int8_iter_time_ms": round(per_iter_16q * 1e3, 3),
        "n16384_r64_int8_solve_iterations": int(iters_16q),
        "n16384_r64_int8_tol": 5e-3,
        "n16384_r64_int8_converged": conv_16q,
        "n32768_r64_gflops": round(gflops_n32, 1),
        "n32768_r64_iter_time_ms": round(per_iter_n32 * 1e3, 3),
        "n32768_r64_solve_iterations": int(iters_n32),
        "n32768_r64_max_residual": res_n32,
        "n32768_r64_tol": 3e-4,
        "n32768_r64_converged": conv_n32,
        "n32768_enabled": bool(big and backend == "tpu"),
        "n32768_r64_int8_gflops": round(gflops_n32q, 1),
        "n32768_r64_int8_iter_time_ms": round(per_iter_n32q * 1e3, 3),
        "n32768_r64_int8_solve_iterations": int(iters_n32q),
        "n32768_r64_int8_max_residual": res_n32q,
        "n32768_r64_int8_tol": 5e-3,
        "n32768_r64_int8_converged": conv_n32q,
        "hard_tol": 5e-5 if backend == "tpu" else 0.0,
        "hard_ppcg_wall_s": round(wall_ppcg_h, 4),
        "hard_ppcg_iterations": int(it_ppcg_h),
        "hard_ppcg_max_residual": res_ppcg_h,
        "hard_ppcg_converged": bool(backend == "tpu" and res_ppcg_h <= 5e-5),
        "hard_window_wall_s": round(wall_win_h, 4),
        "hard_window_iterations": int(it_win_h),
        "hard_window_max_residual": res_win_h,
        "hard_window_converged": bool(backend == "tpu" and res_win_h <= 5e-5),
        "r4_gflops": round(gflops_r4, 1),
        "r4_vs_r1": round(gflops_r4 / REFERENCE_GFLOPS, 3),
        "block_iter_time_ms": round(per_iter_blk * 1e3, 3),
        "precise_iter_time_ms": round(per_iter_prec * 1e3, 3),
        "iter_time_ms": round(per_iter_r4 * 1e3, 3),
        "dispatch_constant_ms": round(dispatch_const * 1e3, 1),
        "wall64_block_s": round(wall_blk, 4),
        "wall64_r4_s": round(wall_r4, 4),
        "fast_solve_iterations": int(iters_blk),
        "fast_max_residual_f64": res_fast,
        "solve_wall_s": round(wall_solve, 4),
        "solve_iterations": int(iters),
        "max_residual_f64": res_f64,
        "precise_tol": tol_prec,
        "precise_converged": conv_prec,
        "precise_1e8_tol": tol_1e8,
        "precise_1e8_max_residual_f64": float(ref_out.residual_norms.max()),
        "precise_1e8_converged": bool(ref_out.converged),
        "precise_1e8_passes": int(ref_out.passes),
        "precise_1e8_floor_before": float(ref_out.history[0]),
        "precise_1e8_wall_s": round(wall_p16 + wall_refine, 4),
        "precise_1e8_refine_wall_s": round(wall_refine, 4),
        "eigenvalue_error_vs_dense_f64": ev_err,
        "spmv_gnnz_per_s": round(nnz_per_s / 1e9, 2),
        "spmv_int8_gnnz_per_s": round(nnz_per_s_int8 / 1e9, 2),
        "spmv_rows": NROOTS_BLOCK,
        "spmv_r4_gnnz_per_s": round(nnz_per_s_r4 / 1e9, 2),
        "spmv_nnz": bsr.nnz,
        "backend": backend,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="add the n=32768 r64 peak leg (8.6 GB host setup)")
    main(big=ap.parse_args().big)
