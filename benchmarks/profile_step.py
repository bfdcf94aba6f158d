"""Per-component timing of the fused Davidson step on the live backend.

Each component is timed as the MARGINAL cost between two fori_loop trip
counts inside one dispatch, which removes the ~28 ms tunnel RTT and any
per-dispatch constant work (same technique as bench.py's SpMV timing).

Usage: python benchmarks/profile_step.py [N] [NROOTS] [M_MAX]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal(fn, lo=8, hi=64, repeats=5):
    """Best-of marginal seconds per trip between two trip counts."""
    fn(lo)  # compile both trip-count branches share one jit (k is traced)
    fn(hi)
    walls = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(k)
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
    return (walls[hi] - walls[lo]) / (hi - lo)


def main():
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers import fused_davidson as fd

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nroots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    m_max = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    prec = jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(0)
    dvals = np.concatenate([np.linspace(-2.0, 3.0, 32), np.linspace(6.0, 50.0, n - 32)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    matrix = (a + a.T + np.diag(dvals)).astype(np.float64)
    diag = jnp.asarray(np.diag(matrix), dtype=dtype)
    mat = jnp.asarray(matrix, dtype=dtype)

    def matvec(x, op):
        return jnp.matmul(x, op.T, preferred_element_type=dtype)

    solver = fd.FusedDavidson(matvec, np.diag(matrix), n, nroots, m_max=m_max,
                              dtype=dtype, operand=mat)
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(matrix))[:nroots]):
        v0[row, i] = 1.0
    st = solver.init_state(v0)
    # half-filled basis: representative masses for the stack-wide ops
    step = fd.make_davidson_step(matvec, nroots, m_max)
    while int(st.k) + nroots <= m_max // 2:
        st = step(st, mat, diag)
    v, w, mask, k = st.v, st.w, st.mask, st.k
    x, r = st.x, st.r

    results = {}

    def timeit(name, body, *args):
        # each body maps its carry tuple to a same-shaped tuple, so the loop
        # has a genuine data dependence (XLA would DCE an unused body)
        @jax.jit
        def loop(k_trips, *a):
            return jax.lax.fori_loop(0, k_trips, lambda i, carry: body(*carry), a)

        def run(k_trips):
            out = loop(k_trips, *args)
            jax.block_until_ready(out)

        results[name] = marginal(run)
        print(f"{name:28s} {results[name] * 1e6:9.1f} us")

# the operator rides the loop carry: a closed-over operand would be baked
    # into the HLO as a constant and blow the remote-compile payload limit
    def full_step_body(vv, ww, mm, op, dg):
        s = fd.DavidsonState(vv, ww, mm, k, st.evals, x, r, st.errors)
        s2 = fd._step_body(matvec, nroots, m_max)(s, op, dg)
        return (s2.v, s2.w, s2.mask, op, dg)

    timeit("full step", full_step_body, v, w, mask, mat, diag)

    timeit("matvec (nroots x N)", lambda xx, op: (matvec(xx, op) * 1e-2, op), x, mat)

    def eigh_body(vv, ww, mm):
        evals, c = fd._masked_eigh(vv, ww, mm)
        return (vv + evals[0] * 0, ww, mm)

    timeit("gram+eigh", eigh_body, v, w, mask)

    def eigh_only_body(hh):
        evals, c = jnp.linalg.eigh(hh)
        return (hh + evals[0] * 1e-20,)

    h0 = jnp.matmul(v, w.T, precision=prec)
    h0 = 0.5 * (h0 + h0.T) + jnp.eye(m_max, dtype=dtype)
    timeit(f"eigh only ({m_max}x{m_max})", eigh_only_body, h0)

    def recon_body(vv, ww):
        c = jnp.eye(m_max, nroots, dtype=dtype).T
        xx = jnp.matmul(c, vv, precision=prec)
        ax = jnp.matmul(c, ww, precision=prec)
        return (vv + 1e-20 * jnp.sum(xx + ax), ww)

    timeit("reconstruction (2 matmuls)", recon_body, v, w)

    def gs_body(tt, vv, mm):
        t2 = tt
        for _ in range(2):
            proj = jnp.matmul(t2, vv.T, precision=prec) * mm[None, :]
            t2 = t2 - jnp.matmul(proj, vv, precision=prec)
        return (t2 * 1e-1, vv, mm)

    timeit("GS x2 (4 matmuls)", gs_body, r, v, mask)

    def whiten_body(tt):
        g = jnp.matmul(tt, tt.T, precision=prec)
        l = jnp.linalg.cholesky(g + jnp.eye(nroots, dtype=dtype))
        t2 = jax.scipy.linalg.solve_triangular(l, tt, lower=True)
        return (t2 * 1e-1 + tt * 0.9,)

    timeit("whiten (gram+chol+trsm)", whiten_body, r)

    def append_body(vv, tt):
        v2 = jax.lax.dynamic_update_slice(vv, tt, (k, jnp.zeros((), k.dtype)))
        return (v2, tt + 1e-20)

    timeit("dynamic_update_slice", append_body, v, r)

    total = sum(v_ for n_, v_ in results.items() if n_ != "full step")
    print(f"{'sum of parts':28s} {total * 1e6:9.1f} us (step measured "
          f"{results['full step'] * 1e6:.1f} us)")


if __name__ == "__main__":
    main()
