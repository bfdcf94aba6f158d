"""Fused expand-chain kernel (ops/kernels/chain_pallas.py) vs the XLA chain.

The kernel must reproduce the fused Davidson step's precondition + GS +
norms + Gram segment bit-for-bit-in-structure (same masking, same null
semantics), so these tests compare against a literal transcription of the
XLA path and then pin whole-solve equivalence with fuse_chain on/off.
CPU runs the kernel in interpret mode (auto-selected)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.ops.kernels.chain_pallas import (
    fits_vmem,
    fused_expand_chain,
)
from iterative_solver_tpu.solvers.fused_davidson import (
    FusedDavidson,
    make_davidson_init,
    make_davidson_solve,
)

_PREC = jax.lax.Precision.HIGHEST


def _xla_chain(t, v, mask, gs_passes=2):
    n0_2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
    for _ in range(gs_passes):
        proj = jnp.matmul(t, v.T, precision=_PREC) * mask[None, :]
        t = t - jnp.matmul(proj, v, precision=_PREC)
    n2 = jnp.einsum("in,in->i", t, t, precision=_PREC)
    g = jnp.matmul(t, t.T, precision=_PREC)
    return t, n0_2, n2, g


def _setup(nroots=4, m_max=12, n=256, seed=0):
    rng = np.random.default_rng(seed)
    v = np.linalg.qr(rng.standard_normal((n, m_max)))[0].T
    mask = np.zeros(m_max)
    mask[: m_max // 2] = 1.0
    v = v * mask[:, None]  # dead slots hold zeros like the real stack
    r = rng.standard_normal((nroots, n))
    diag = rng.standard_normal(n) + 5.0
    evals = np.linspace(-1.0, 0.0, nroots)
    return (jnp.asarray(r), jnp.asarray(v), jnp.asarray(mask),
            jnp.asarray(diag), jnp.asarray(evals))


def test_raw_mode_matches_xla_chain():
    r, v, mask, _, _ = _setup()
    t_k, n0_k, n2_k, g_k = fused_expand_chain(r, v, mask)
    t_x, n0_x, n2_x, g_x = _xla_chain(r, v, mask)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(n0_k), np.asarray(n0_x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(n2_k), np.asarray(n2_x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), atol=1e-12)


def test_jacobi_mode_matches_xla_chain():
    r, v, mask, diag, evals = _setup(seed=1)
    scale = jnp.max(jnp.abs(diag)) + jnp.max(jnp.abs(evals))
    t0 = r / (diag[None, :] - evals[:, None] + 1e-15 * scale + 1e-300)
    t_k, n0_k, n2_k, g_k = fused_expand_chain(r, v, mask, diag, evals)
    t_x, n0_x, n2_x, g_x = _xla_chain(t0, v, mask)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(n0_k), np.asarray(n0_x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(n2_k), np.asarray(n2_x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), atol=1e-12)


def test_null_direction_annihilated():
    """A direction already in the basis span must come out ~zero (the step's
    keep logic then drops it) — the GS semantics the null test relies on."""
    r, v, mask, _, _ = _setup(seed=2)
    r = r.at[1].set(3.7 * v[0])  # slot 0 is active
    t_k, n0_k, n2_k, _ = fused_expand_chain(r, v, mask)
    assert float(n2_k[1]) < 1e-20 * float(n0_k[1])
    assert float(jnp.max(jnp.abs(t_k[1]))) < 1e-10


def _dense_problem(n=96, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    m = a + a.T + np.diag(np.linspace(0.0, 10.0, n))
    return m


@pytest.mark.parametrize("rr", ["full", "window"])
def test_whole_solve_equivalent_with_and_without_fusion(rr):
    """make_davidson_solve(fuse_chain=True) lands on the same eigenvalues in
    a comparable iteration count (the whitening is algebraically identical,
    applied as L^{-1} diag(s) instead of a triangular solve on the block)."""
    m = _dense_problem()
    n = m.shape[0]
    nroots, m_max = 3, 12
    mj = jnp.asarray(m)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=_PREC)

    v0 = jnp.zeros((nroots, n), mj.dtype)
    for row, i in enumerate(np.argsort(np.diag(m))[:nroots]):
        v0 = v0.at[row, i].set(1.0)
    init = make_davidson_init(matvec, nroots, m_max)
    diag = jnp.diagonal(mj)

    results = {}
    for fuse in (False, True):
        solve = make_davidson_solve(matvec, nroots, m_max, rr=rr,
                                    fuse_chain=fuse)
        final, iters = solve(init(v0, mj), mj, diag, 1e-10, 120)
        results[fuse] = (np.asarray(final.evals), int(iters),
                         np.asarray(final.errors))

    ref = np.linalg.eigvalsh(m)[:nroots]
    for fuse, (evals, iters, errors) in results.items():
        np.testing.assert_allclose(evals, ref, atol=1e-9,
                                   err_msg=f"fuse_chain={fuse}")
        assert np.max(errors) <= 1e-10
    assert abs(results[True][1] - results[False][1]) <= 2


def test_fused_davidson_auto_policy_off_tpu():
    """Off-TPU the auto policy must leave the XLA chain in place."""
    m = _dense_problem(48)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=_PREC)

    solver = FusedDavidson(matvec, np.diag(m), 48, nroots=2, m_max=8,
                           operand=jnp.asarray(m))
    assert solver.fuse_chain is False
    # explicit opt-in still works (kernel runs interpreted on CPU)
    solver_f = FusedDavidson(matvec, np.diag(m), 48, nroots=2, m_max=8,
                             operand=jnp.asarray(m), fuse_chain=True)
    evals, x, errors, iters = solver_f.run(np.eye(2, 48))
    ref = np.linalg.eigvalsh(m)[:2]
    np.testing.assert_allclose(evals, ref, atol=1e-8)


def test_fits_vmem_guard():
    assert fits_vmem(16, 64, 8192)
    # r32/m128 measured 22.6 MB scoped VMEM vs the 16 MB arena (compile
    # OOM on the real chip) — the guard must reject it
    assert not fits_vmem(32, 128, 8192)
    assert not fits_vmem(16, 64, 10_000_000)


def test_fused_linear_equivalent_with_fusion():
    """FusedLinearEquations(fuse_chain=True) reproduces the unfused solve."""
    from iterative_solver_tpu.solvers.fused_linear import FusedLinearEquations

    n, nrhs = 80, 3
    rng = np.random.default_rng(7)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    m = a + a.T + np.diag(np.linspace(1.0, 9.0, n))
    b = rng.standard_normal((nrhs, n))
    mj = jnp.asarray(m)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=_PREC)

    sols = {}
    for fuse in (False, True):
        solver = FusedLinearEquations(
            matvec, np.diag(m), n, nrhs, m_max=12, operand=mj,
            convergence_threshold=1e-11, fuse_chain=fuse)
        x, errors, iters = solver.solve(b)
        assert np.max(errors) <= 1e-11, fuse
        sols[fuse] = np.asarray(x)
    ref = np.linalg.solve(m, b.T).T
    for fuse, x in sols.items():
        np.testing.assert_allclose(x, ref, atol=1e-8, err_msg=f"fuse={fuse}")


def test_whiten_parallel_rows_no_nan():
    """Two mutually parallel surviving rows (degenerate roots: each passes
    the per-row null test, Gram [[1,1],[1,1]]) must whiten to FINITE output
    in f32 — with the old 1e-30 jitter the f32 Cholesky NaN'd and the
    while_loop cond then read the NaN errors as converged."""
    from iterative_solver_tpu.ops.kernels.chain_pallas import whiten_after_chain

    n = 64
    rng = np.random.default_rng(0)
    row = rng.standard_normal(n).astype(np.float32)
    t = jnp.asarray(np.stack([row, row * (1.0 + 1e-7)]))  # near-parallel
    n2 = jnp.einsum("in,in->i", t, t)
    n0 = n2  # pretend GS removed nothing: both rows survive the null test
    out, keep = whiten_after_chain(t, n0, n2, 2, 1e-10)
    assert bool(jnp.all(keep))
    assert np.all(np.isfinite(np.asarray(out)))
    # the first row is properly normalised; the dependent one is bounded
    assert abs(float(jnp.linalg.norm(out[0])) - 1.0) < 1e-3
    assert float(jnp.max(jnp.abs(out))) < 1e4
