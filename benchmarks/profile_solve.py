"""Marginal per-iteration cost of the fused whole-solve drivers.

Distinguishes three costs the single-dispatch wall time conflates:
  - dispatch constant (tunnel RTT + launch),
  - lax.while_loop per-iteration overhead (cond sync, restart branch),
  - the raw step body cost (benchmarks/profile_step.py).

Method: run the SAME compiled solve at two fixed trip counts (tol < 0) and
divide the wall-clock difference by the iteration difference.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers import fused_davidson as fd

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nroots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    m_max = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    rng = np.random.default_rng(0)
    dvals = np.concatenate([np.linspace(-2.0, 3.0, 32), np.linspace(6.0, 50.0, n - 32)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    matrix = (a + a.T + np.diag(dvals)).astype(np.float64)
    diag = np.diag(matrix)
    mat = jnp.asarray(matrix, dtype=dtype)

    def matvec(x, op):
        return jnp.matmul(x, op.T, preferred_element_type=dtype)

    solver = fd.FusedDavidson(matvec, diag, n, nroots, m_max=m_max, dtype=dtype, operand=mat)
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(diag)[:nroots]):
        v0[row, i] = 1.0

    solve = fd.make_davidson_solve(matvec, nroots, m_max)

    def run(iters):
        st = solver.init_state(v0)
        out, got = solve(st, solver.operand, solver.diag, -1.0, iters)
        np.asarray(out.errors)
        return int(got)

    run(8)
    run(64)
    run(512)
    walls = {}
    for k in (64, 512):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run(k)
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
    per_iter = (walls[512] - walls[64]) / (512 - 64)
    const = walls[64] - 64 * per_iter
    print(f"while_loop solve: {per_iter * 1e6:.1f} us/iter marginal, "
          f"{const * 1e3:.1f} ms dispatch constant "
          f"(wall64={walls[64] * 1e3:.1f} ms wall512={walls[512] * 1e3:.1f} ms)")

    # chunked variant
    solve_c = fd.make_davidson_solve_chunked(matvec, nroots, m_max)
    st0 = solver.init_state(v0)

    def run_c(iters):
        out, got = solve_c(st0, solver.operand, solver.diag, -1.0, iters)
        np.asarray(out.errors)
        return int(got)

    run_c(8)
    got64 = run_c(63)
    got512 = run_c(511)
    walls_c = {}
    for k in (63, 511):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run_c(k)
            best = min(best, time.perf_counter() - t0)
        walls_c[k] = best
    per_iter_c = (walls_c[511] - walls_c[63]) / (got512 - got64)
    print(f"chunked solve:    {per_iter_c * 1e6:.1f} us/iter marginal "
          f"({got64}/{got512} iters at the two trip targets)")

    # init_state dispatch cost (fused single-dispatch init)
    solver.init_state(v0)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        st_ = solver.init_state(v0)
        jax.block_until_ready(st_.errors)
        best = min(best, time.perf_counter() - t0)
    print(f"init_state:       {best * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
