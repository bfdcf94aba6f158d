"""Benchmark: fused Davidson eigensolver on a synthetic FCI-style Hamiltonian.

Runs on whatever backend the environment provides (the driver supplies one
real TPU chip). Two measurements, one JSON line:

- throughput: a fixed 64-iteration fused Davidson run in a single dispatch
  (lax.while_loop with tol<0) — sustained GFLOP/s across matvec + Gram +
  reconstruction + orthogonalisation. This is the improvable kernel metric.
- solution quality: a converging run; eigenvalue error is measured on the
  host in f64 from the returned vectors' Rayleigh quotients (the on-device
  f32 dot under-reports by ~1e-4 — the vectors themselves are ~1e-6).

The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
to REFERENCE_GFLOPS recorded in round 1 on one TPU v5e chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_GFLOPS = 700.0  # round-1 median 4-root sustained rate, 1x TPU v5e (+-15% tunnel variance)
REFERENCE_GFLOPS_BLOCK = 2300.0  # round-1 16-root (block) sustained rate

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

    # ---- block throughput: 16-root fused run (the MXU-saturating config) ----
    solver_blk = FusedDavidson(
        matvec, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
        convergence_threshold=tol, max_iter=60, operand=mat,
    )
    v0_blk = np.zeros((NROOTS_BLOCK, N))
    for row, i in enumerate(np.argsort(diag)[:NROOTS_BLOCK]):
        v0_blk[row, i] = 1.0
    solve_blk = make_davidson_solve(matvec, NROOTS_BLOCK, M_MAX_BLOCK)
    st = solver_blk.init_state(v0_blk)
    out_blk, _ = solve_blk(st, solver_blk.operand, solver_blk.diag, -1.0, THROUGHPUT_ITERS)
    jax.block_until_ready(out_blk.errors)
    wall_blk = float("inf")
    for _ in range(3):
        st = solver_blk.init_state(v0_blk)
        t0 = time.perf_counter()
        out_blk, iters_blk = solve_blk(st, solver_blk.operand, solver_blk.diag, -1.0, THROUGHPUT_ITERS)
        np.asarray(out_blk.errors)
        wall_blk = min(wall_blk, time.perf_counter() - t0)
    flops_blk = (
        2 * NROOTS_BLOCK * N * N
        + 2 * M_MAX_BLOCK * M_MAX_BLOCK * N
        + 2 * 2 * NROOTS_BLOCK * N * M_MAX_BLOCK
        + 2 * 2 * 2 * NROOTS_BLOCK * M_MAX_BLOCK * N
    )
    gflops_blk = flops_blk * int(iters_blk) / wall_blk / 1e9

    # ---- throughput: fixed-iteration single-dispatch run ----
    # tol/max_iter are runtime args: ONE compiled program serves both the
    # throughput run (tol<0) and the convergence run
    solve_fn = make_davidson_solve(matvec, NROOTS, M_MAX)
    st = solver.init_state(v0)
    out, it0 = solve_fn(st, solver.operand, solver.diag, -1.0, THROUGHPUT_ITERS)  # compile + warmup
    jax.block_until_ready(out.errors)
    wall_throughput = float("inf")
    for _ in range(3):  # best-of-3: the remote tunnel adds noisy latency
        st = solver.init_state(v0)
        t0 = time.perf_counter()
        out, iters_fixed = solve_fn(st, solver.operand, solver.diag, -1.0, THROUGHPUT_ITERS)
        np.asarray(out.errors)  # fetch a scalar-sized array: closes the async loop
        wall_throughput = min(wall_throughput, time.perf_counter() - t0)
    flops_per_iter = (
        2 * NROOTS * N * N
        + 2 * M_MAX * M_MAX * N
        + 2 * 2 * NROOTS * N * M_MAX
        + 2 * 2 * 2 * NROOTS * M_MAX * N
    )
    gflops = flops_per_iter * int(iters_fixed) / wall_throughput / 1e9

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
        "r4_vs_r1_median": round(gflops / REFERENCE_GFLOPS, 3),
        "block_iter_time_ms": round(wall_blk / int(iters_blk) * 1e3, 3),
        "throughput_wall_s": round(wall_throughput, 4),
        "iter_time_ms": round(wall_throughput / int(iters_fixed) * 1e3, 3),
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
