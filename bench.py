"""Benchmark: fused Davidson eigensolver on a synthetic FCI-style Hamiltonian.

Runs on whatever backend the environment provides (the driver supplies one
real TPU chip). Measurements, one JSON line:

- sustained throughput (headline): the marginal cost per iteration between
  two fixed trip counts of the SAME compiled single-dispatch solve
  (lax.while_loop with tol<0) — GFLOP/s across matvec + Gram +
  reconstruction + orthogonalisation, net of the per-dispatch constant
  (tunnel RTT + launch), same methodology as the SpMV metric below.
- solution quality: a converging run; eigenvalue error is measured on the
  host in f64 from the returned vectors' Rayleigh quotients (the on-device
  f32 dot under-reports by ~1e-4 — the vectors themselves are ~1e-6).

The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
to REFERENCE_GFLOPS_BLOCK recorded in round 1 on the driver-provided chip.
Round-1 history: the dispatch-inclusive 64-iteration measurement read
723/2300 GFLOP/s (r4/r16); the marginal method puts the same computation at
~2000/6400 because a ~30 ms dispatch constant no longer pollutes 64x~0.3 ms
of compute. Both are recorded; the headline is the sustained rate.
"""

from __future__ import annotations

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


def main():
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.fused_davidson import (
        FusedDavidson,
        make_davidson_solve,
    )

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    rng = np.random.default_rng(0)
    # gapped low block (the sought correlation states) + dense remainder
    dvals = np.concatenate([np.linspace(-2.0, 3.0, 32), np.linspace(6.0, 50.0, N - 32)])
    a = rng.standard_normal((N, N)) * (0.05 / np.sqrt(N))
    matrix = (a + a.T + np.diag(dvals)).astype(np.float64)
    diag = np.diag(matrix)
    mat = jnp.asarray(matrix, dtype=dtype)

    def matvec(x, op):
        return jnp.matmul(x, op.T, preferred_element_type=dtype)

    tol = 2e-4 if dtype == jnp.float32 else 1e-8
    solver = FusedDavidson(
        matvec, diag, N, NROOTS, m_max=M_MAX, dtype=dtype,
        convergence_threshold=tol, max_iter=60, operand=mat,
    )
    v0 = np.zeros((NROOTS, N))
    for row, i in enumerate(np.argsort(diag)[:NROOTS]):
        v0[row, i] = 1.0

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
            for _ in range(3):  # best-of-3: the remote tunnel adds noisy latency
                t0 = time.perf_counter()
                out, _ = solve_fn(st, operand, dg, -1.0, k)
                np.asarray(out.errors)
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
        per_iter = (walls[hi] - walls[lo]) / (got_hi - got_lo)
        return per_iter, walls[lo], walls[lo] - got_lo * per_iter

    # ---- block throughput: 16-root fused run (the MXU-saturating config) ----
    solver_blk = FusedDavidson(
        matvec, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
        convergence_threshold=tol, max_iter=60, operand=mat,
    )
    v0_blk = np.zeros((NROOTS_BLOCK, N))
    for row, i in enumerate(np.argsort(diag)[:NROOTS_BLOCK]):
        v0_blk[row, i] = 1.0
    solve_blk = make_davidson_solve(matvec, NROOTS_BLOCK, M_MAX_BLOCK)
    st_blk = solver_blk.init_state(v0_blk)
    per_iter_blk, wall_blk, _ = sustained(solve_blk, st_blk, solver_blk.operand, solver_blk.diag)
    flops_blk = (
        2 * NROOTS_BLOCK * N * N
        + 2 * M_MAX_BLOCK * M_MAX_BLOCK * N
        + 2 * 2 * NROOTS_BLOCK * N * M_MAX_BLOCK
        + 2 * 2 * 2 * NROOTS_BLOCK * M_MAX_BLOCK * N
    )
    gflops_blk = flops_blk / per_iter_blk / 1e9

    # ---- 4-root sustained + dispatch constant ----
    solve_fn = make_davidson_solve(matvec, NROOTS, M_MAX)
    st = solver.init_state(v0)
    per_iter, wall_throughput, dispatch_const = sustained(
        solve_fn, st, solver.operand, solver.diag
    )
    flops_per_iter = (
        2 * NROOTS * N * N
        + 2 * M_MAX * M_MAX * N
        + 2 * 2 * NROOTS * N * M_MAX
        + 2 * 2 * 2 * NROOTS * M_MAX * N
    )
    gflops = flops_per_iter / per_iter / 1e9

    # ---- convergence + quality (same compiled program, real tolerance) ----
    st = solver.init_state(v0)
    t0 = time.perf_counter()
    final, iters = solve_fn(st, solver.operand, solver.diag, tol, 60)
    np.asarray(final.errors)
    wall_solve = time.perf_counter() - t0
    x, errors = final.x, np.asarray(final.errors)
    iters = int(iters)
    x64 = np.asarray(x, dtype=np.float64)
    ref = np.asarray(REFERENCE_EIGENVALUES)[:NROOTS]
    ev_err = 0.0
    res_f64 = 0.0
    for i in range(NROOTS):
        xi = x64[i] / np.linalg.norm(x64[i])
        rq = xi @ matrix @ xi
        ev_err = max(ev_err, abs(rq - ref[i]))
        res_f64 = max(res_f64, float(np.linalg.norm(matrix @ xi - rq * xi)))

    # ---- sparse action throughput (BASELINE.md: Davidson SpMV nnz/s/chip) ----
    from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr
    from iterative_solver_tpu.ops.kernels import bsr_matmat

    bsr, _ = synthetic_fci_bsr(8192, block=128, density=0.3, seed=1, dtype=dtype)
    xs = jnp.asarray(np.random.default_rng(2).standard_normal((NROOTS, bsr.shape[0])), dtype=dtype)

    from iterative_solver_tpu.ops.kernels.spmv_pallas import _bsr_matmat_xla

    n_rb = bsr.shape[0] // bsr.bm

    # dynamic trip count: one compiled program for both timing points
    @jax.jit
    def spmm_loop(x, values, col_idx, row_idx, k):
        def body(i, acc):
            return _bsr_matmat_xla(acc, values, col_idx, row_idx, bsr.bm, bsr.bn, n_rb) * 1e-2

        return jax.lax.fori_loop(0, k, body, x)

    # marginal (two trip counts) removes the ~28 ms tunnel dispatch overhead;
    # trip counts large enough that the marginal dwarfs RTT jitter
    np.asarray(spmm_loop(xs, bsr.values, bsr.col_idx, bsr.row_idx, 4)[0, :2])  # compile
    walls = {}
    for k in (64, 1024):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = spmm_loop(xs, bsr.values, bsr.col_idx, bsr.row_idx, k)
            np.asarray(out[0, :2])
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
    spmv_wall = (walls[1024] - walls[64]) / 960
    nnz_per_s = bsr.nnz * NROOTS / spmv_wall

    result = {
        "metric": f"fused_davidson_n{N}_r{NROOTS_BLOCK}_sustained",
        "value": round(gflops_blk, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops_blk / REFERENCE_GFLOPS_BLOCK, 3),
        "r4_gflops": round(gflops, 1),
        "r4_vs_r1": round(gflops / REFERENCE_GFLOPS, 3),
        "block_iter_time_ms": round(per_iter_blk * 1e3, 3),
        "iter_time_ms": round(per_iter * 1e3, 3),
        "dispatch_constant_ms": round(dispatch_const * 1e3, 1),
        "wall64_block_s": round(wall_blk, 4),
        "wall64_r4_s": round(wall_throughput, 4),
        "solve_wall_s": round(wall_solve, 4),
        "solve_iterations": int(iters),
        "max_residual_f64": res_f64,
        "eigenvalue_error_vs_dense_f64": ev_err,
        "spmv_gnnz_per_s": round(nnz_per_s / 1e9, 2),
        "spmv_nnz": bsr.nnz,
        "backend": backend,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
