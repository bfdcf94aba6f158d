"""Seeded random-configuration sweeps across all solver families.

The reference's gtest suites sweep a handful of hand-picked configurations;
this fuzz layer samples the configuration space (dimension, roots, subspace
caps, RR modes, thresholds, operator character) under fixed seeds so any
bookkeeping edge (mask handling at odd sizes, restart boundaries, dropped
null directions, window degeneracies) that escapes the targeted tests still
gets exercised. Failures are reproducible from the printed seed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its


def _random_problem(rng, n, kind):
    a = rng.standard_normal((n, n)) * (0.1 / np.sqrt(n))
    if kind == "gapped":
        nlow = max(2, n // 16)
        diag = np.concatenate(
            [np.linspace(-2.0, 0.0, nlow), np.linspace(2.0, 30.0, n - nlow)]
        )
    elif kind == "gapless":
        diag = np.linspace(0.0, 10.0, n)
    else:  # clustered: near-degenerate low end
        diag = np.concatenate([np.full(4, 1.0) + rng.standard_normal(4) * 1e-3,
                               np.linspace(3.0, 25.0, n - 4)])
    return a + a.T + np.diag(diag)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_parity_eigensolver(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(24, 90))
    nroot = int(rng.integers(1, min(6, n // 4)))
    kind = ["gapped", "gapless", "clustered"][seed % 3]
    mat = _random_problem(rng, n, kind)
    opts = ""
    if rng.random() < 0.5:
        opts = f"max_size_qspace={int(rng.integers(3 * nroot, 6 * nroot + 2))}"
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_eigensystem(n, nroot, "Davidson", opts)
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(
        np.zeros((nroot, n)), problem=problem, generate_initial_guess=True
    )
    assert conv, f"seed={seed} n={n} nroot={nroot} kind={kind} opts={opts!r}"
    ref = np.linalg.eigvalsh(mat)[:nroot]
    np.testing.assert_allclose(
        np.sort(solver.eigenvalues()[:nroot]), ref, atol=2e-9,
        err_msg=f"seed={seed} n={n} nroot={nroot} kind={kind}",
    )
    assert solver.stats.r_creations <= (nroot + 1) * solver.stats.iterations


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_fused_davidson(seed):
    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(48, 200))
    nroots = int(rng.integers(1, 5))
    rr = ["full", "window", "window3", "anchored"][seed % 4]
    width = {"full": 1, "window": 2, "window3": 3, "anchored": 2}[rr]
    m_max = int(rng.integers(max(width, 4) * nroots, 8 * nroots + 1))
    kind = ["gapped", "gapless", "clustered"][seed % 3]
    mat = _random_problem(rng, n, kind)
    matj = jnp.asarray(mat)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    # odd seeds opt into the fused expand-chain kernel (interpret mode on
    # CPU) so its masking/null bookkeeping sees the same random edges
    fuse = bool(seed % 2)
    solver = FusedDavidson(
        matvec, np.diag(mat), n, nroots, m_max=m_max,
        convergence_threshold=1e-8, max_iter=600, operand=matj, rr=rr,
        fuse_chain=fuse,
    )
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    evals, x, errors, iters = solver.run_on_device(v0)
    msg = (f"seed={seed} n={n} r={nroots} m={m_max} rr={rr} kind={kind} "
           f"fuse={fuse} iters={iters}")
    assert np.max(errors) < 1e-8, msg
    ref = np.linalg.eigvalsh(mat)[:nroots]
    np.testing.assert_allclose(np.sort(np.asarray(evals)), ref, atol=1e-7, err_msg=msg)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_linear_equations(seed):
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(16, 60))
    nrhs = int(rng.integers(1, 4))
    a = rng.standard_normal((n, n)) * 0.1
    mat = a + a.T + np.diag(np.arange(4.0, n + 4.0))
    rhs = rng.standard_normal((nrhs, n))
    problem = its.models.MatrixProblem(mat)
    solver = its.create_linear_equations(n, nrhs, "Davidson")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-10
    solver.add_equations(rhs)
    conv, *_ = solver.solve(
        np.zeros((nrhs, n)), problem=problem, generate_initial_guess=True
    )
    assert conv, f"seed={seed} n={n} nrhs={nrhs}"
    x = np.asarray(solver.solution_params(list(range(nrhs))))
    ref = np.linalg.solve(mat, rhs.T).T
    np.testing.assert_allclose(x, ref, atol=1e-6, err_msg=f"seed={seed}")


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_packed_symmetric_kernels(seed):
    """Random sizes/blockings through every packed-kernel path (interpret)."""
    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlocked,
        SymmetricBlockedSplit,
        symm_matmat,
        symm_matmat_pallas,
        symm_matmat_split_pallas,
    )

    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(33, 200))
    b = int(rng.choice([16, 32, 64]))
    m = int(rng.integers(1, 6))
    a = rng.standard_normal((n, n))
    mat = (a + a.T) * rng.uniform(0.1, 10.0)
    x = rng.standard_normal((m, ((n + b - 1) // b) * b))
    x[:, n:] = 0.0
    ref = x[:, :n] @ mat
    sym = SymmetricBlocked.from_dense(mat, b=b)
    msg = f"seed={seed} n={n} b={b} m={m}"
    y = np.asarray(symm_matmat(jnp.asarray(x), sym))[:, :n]
    np.testing.assert_allclose(y, ref, atol=1e-10 * np.abs(mat).max() * n, err_msg=msg)
    yp = np.asarray(symm_matmat_pallas(jnp.asarray(x), sym, interpret=True))[:, :n]
    np.testing.assert_allclose(yp, y, atol=1e-11 * np.abs(mat).max() * n, err_msg=msg)
    syms = SymmetricBlockedSplit.from_dense(mat, b=b)
    ys = np.asarray(
        symm_matmat_split_pallas(jnp.asarray(x, jnp.float32), syms, interpret=True),
        dtype=np.float64,
    )[:, :n]
    scale = np.abs(ref).max() + 1e-30
    assert np.abs(ys - ref).max() / scale < 2e-4, msg


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_fused_nonsym(seed):
    """Random non-hermitian configurations through the chunked path:
    random strengths, odd sizes, both tiers, inner depths 1-2, eigenvalues
    checked against scipy dense eig (real-part order)."""
    import scipy.linalg

    from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(48, 200))
    nroot = int(rng.integers(1, 5))
    strength = float(rng.uniform(0.0, 0.35))
    nlow = max(nroot + 2, n // 16)
    diag = np.concatenate(
        [np.linspace(-2.0, 0.0, nlow), np.linspace(2.0, 30.0, n - nlow)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(diag)
    mat[np.tril_indices(n, -1)] *= 1.0 - strength
    inner = int(rng.integers(1, 3))
    solver = FusedNonSymDavidson.from_dense(
        mat, nroot, m_max=int(rng.integers(2 * nroot + 2, 6 * nroot + 4)),
        convergence_threshold=1e-9, max_iter=120, inner=inner)
    v0 = np.zeros((nroot, n))
    for row, i in enumerate(np.argsort(diag)[:nroot]):
        v0[row, i] = 1.0
    evals, x, errs, it = solver.solve(v0)
    assert np.all(errs <= 1e-8), (seed, errs, it)
    w = scipy.linalg.eigvals(mat)
    ref = np.sort(w.real)[:len(evals)]
    np.testing.assert_allclose(np.sort(evals.real), ref, atol=1e-7,
                               err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fused_nonsym_lineq(seed):
    """Random non-symmetric multi-RHS systems through the chunked path."""
    from iterative_solver_tpu.solvers.fused_nonsym import (
        FusedNonSymLinearEquations,
    )

    rng = np.random.default_rng(5000 + seed)
    n = int(rng.integers(64, 300))
    nrhs = int(rng.integers(1, 4))
    strength = float(rng.uniform(0.0, 0.4))
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(1.0, 15.0, n))
    mat[np.tril_indices(n, -1)] *= 1.0 - strength
    b = rng.standard_normal((nrhs, n))

    def mv(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    solver = FusedNonSymLinearEquations(
        mv, np.diag(mat), n, nrhs,
        m_max=int(rng.integers(2 * nrhs + 2, 5 * nrhs + 6)),
        convergence_threshold=1e-10, max_iter=150,
        inner=int(rng.integers(1, 3)), operand=jnp.asarray(mat))
    x, errs, it = solver.solve(b)
    assert np.all(errs <= 1e-10), (seed, errs, it)
    ref = np.linalg.solve(mat, b.T).T
    rel = np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref)
    assert rel <= 1e-8, (seed, rel)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_device_rr_nonsym(seed):
    """Random non-hermitian configurations through the SINGLE-DISPATCH
    device-RR path (round 4): random strengths/sizes/chunk lengths,
    eigenvalues against scipy dense eig — exercises the gated global
    selection step, in-loop restarts, and multi-chunk continuation."""
    import scipy.linalg

    from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

    rng = np.random.default_rng(6000 + seed)
    n = int(rng.integers(48, 200))
    nroot = int(rng.integers(1, 5))
    strength = float(rng.uniform(0.0, 0.35))
    nlow = max(nroot + 2, n // 16)
    diag = np.concatenate(
        [np.linspace(-2.0, 0.0, nlow), np.linspace(2.0, 30.0, n - nlow)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(diag)
    mat[np.tril_indices(n, -1)] *= 1.0 - strength
    solver = FusedNonSymDavidson.from_dense(
        mat, nroot, m_max=int(rng.integers(3 * nroot + 2, 6 * nroot + 4)),
        convergence_threshold=1e-9, max_iter=300, rr="device",
        rr_steps=int(rng.integers(1, 3)),
        chunk_iters=int(rng.integers(3, 80)))
    v0 = np.zeros((nroot, n))
    for row, i in enumerate(np.argsort(diag)[:nroot]):
        v0[row, i] = 1.0
    evals, x, errs, it = solver.solve(v0)
    assert np.all(errs <= 1e-8), (seed, errs, it)
    w = scipy.linalg.eigvals(mat)
    ref = np.sort(w.real)[:len(evals)]
    np.testing.assert_allclose(np.sort(evals.real), ref, atol=1e-7,
                               err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_device_lineq(seed):
    """Random non-symmetric systems through the single-dispatch lineq
    device loop (in-loop LU + refinement) at random refine depths."""
    from iterative_solver_tpu.solvers.fused_nonsym import (
        FusedNonSymLinearEquations,
    )

    rng = np.random.default_rng(7000 + seed)
    n = int(rng.integers(64, 300))
    nrhs = int(rng.integers(1, 4))
    strength = float(rng.uniform(0.0, 0.4))
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(1.0, 15.0, n))
    mat[np.tril_indices(n, -1)] *= 1.0 - strength
    b = rng.standard_normal((nrhs, n))

    def mv(x, op):
        return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

    solver = FusedNonSymLinearEquations(
        mv, np.diag(mat), n, nrhs,
        # floor 3*nrhs+2: m_max ~ 2*nrhs+2 is restart-every-append
        # Davidson, which stalls IDENTICALLY in host mode (seed 7001:
        # both modes 1.47e-2 at 200 iters with m_max=8, nrhs=3)
        m_max=int(rng.integers(3 * nrhs + 2, 6 * nrhs + 6)),
        convergence_threshold=1e-10, max_iter=200, rr="device",
        refine_passes=int(rng.integers(1, 4)),
        chunk_iters=int(rng.integers(4, 80)), operand=jnp.asarray(mat))
    x, errs, it = solver.solve(b)
    assert np.all(errs <= 1e-10), (seed, errs, it)
    ref = np.linalg.solve(mat, b.T).T
    rel = np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref)
    assert rel <= 1e-8, (seed, rel)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_nonsym_pspace(seed):
    """Random non-hermitian P-space configurations through the device-RR
    tier: random np/nroots/strength, P from the lowest diagonal slots,
    alternating device-computed and exact user action rows; eigenvalues
    against scipy dense eig."""
    import scipy.linalg

    from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

    rng = np.random.default_rng(8000 + seed)
    n = int(rng.integers(64, 200))
    nroot = int(rng.integers(1, 4))
    np_ = int(rng.integers(1, 7))
    strength = float(rng.uniform(0.0, 0.3))
    nlow = max(nroot + np_ + 2, n // 16)
    diag = np.concatenate(
        [np.linspace(-2.0, 0.0, nlow), np.linspace(2.0, 30.0, n - nlow)])
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(diag)
    mat[np.tril_indices(n, -1)] *= 1.0 - strength
    idx = np.argsort(diag)
    p_space = [{int(i): 1.0} for i in idx[:np_]]
    p_actions = mat.T[idx[:np_]] if seed % 2 else None
    solver = FusedNonSymDavidson.from_dense(
        mat, nroot, convergence_threshold=1e-9, max_iter=300, rr="device",
        m_max=int(rng.integers(3 * nroot + 2, 6 * nroot + 4)) + np_,
        p_space=p_space, p_actions=p_actions)
    # guesses DISJOINT from the P slots (live-direction guarantee)
    v0 = np.zeros((nroot, n))
    for row, i in enumerate(idx[np_:np_ + nroot]):
        v0[row, i] = 1.0
    evals, x, errs, it = solver.solve(v0)
    assert np.all(errs <= 1e-8), (seed, errs, it)
    w = scipy.linalg.eigvals(mat)
    ref = np.sort(w.real)[: len(evals)]
    np.testing.assert_allclose(np.sort(evals.real), ref, atol=1e-7,
                               err_msg=f"seed {seed}")
