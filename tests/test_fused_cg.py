"""Fused block conjugate gradient (solvers/fused_cg.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.fused_cg import FusedBlockCG

_PREC = jax.lax.Precision.HIGHEST


def _matvec(x, op):
    return jnp.matmul(x, op.T, precision=_PREC)


def _spd(n, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (scale / np.sqrt(n))
    return a + a.T + np.diag(np.linspace(1.0, 9.0, n))


@pytest.mark.parametrize("nrhs", [1, 3])
def test_matches_direct_solve(nrhs):
    n = 256
    mat = _spd(n, seed=1)
    b = np.random.default_rng(2).standard_normal((nrhs, n))
    solver = FusedBlockCG(_matvec, np.diag(mat), n, nrhs,
                          convergence_threshold=1e-12, max_iter=500,
                          operand=jnp.asarray(mat))
    x, errors, iters = solver.solve(b)
    assert np.max(errors) <= 1e-12
    ref = np.linalg.solve(mat, b.T).T
    np.testing.assert_allclose(x, ref, atol=1e-9)


def test_mixed_convergence_freezes_early_systems():
    """RHS converging at different iterations: a frozen (converged) system's
    iterate must be BITWISE unchanged by further iterations of the others
    (the alpha-freeze invariant PARITY.md advertises)."""
    from iterative_solver_tpu.solvers.fused_cg import make_cg_init, make_cg_solve

    n = 192
    mat = _spd(n, seed=3)
    mj = jnp.asarray(mat)
    diag = jnp.diagonal(mj)
    rng = np.random.default_rng(4)
    b = rng.standard_normal((3, n))
    ref = np.linalg.solve(mat, b.T).T
    bj = jnp.asarray(b)
    b_norm = jnp.sqrt(jnp.abs(jnp.einsum("in,in->i", bj, bj)))

    init = make_cg_init(_matvec)
    solve = make_cg_solve(_matvec)
    tol = 1e-10
    # warm-start system 0 at the exact solution: frozen from iteration 0
    x0 = np.zeros_like(b)
    x0[0] = ref[0]
    st0 = init(jnp.asarray(x0), bj, mj, diag, b_norm)
    assert float(st0.errors[0]) <= tol
    assert float(jnp.max(st0.errors[1:])) > tol
    fin, iters = solve(st0, mj, diag, b_norm, tol, 500)
    assert int(iters) > 0  # the others genuinely iterated
    # the frozen iterate did not move AT ALL while the others converged
    np.testing.assert_array_equal(np.asarray(fin.x[0]), x0[0])
    assert np.max(np.asarray(fin.errors)) <= tol
    x = np.asarray(fin.x)
    for i in range(3):
        assert np.max(np.abs(x[i] - ref[i])) <= 1e-8 * np.max(np.abs(ref[i]))


def test_warm_start_helps():
    n = 128
    mat = _spd(n, seed=5)
    b = np.random.default_rng(6).standard_normal((2, n))
    ref = np.linalg.solve(mat, b.T).T
    solver = FusedBlockCG(_matvec, np.diag(mat), n, 2,
                          convergence_threshold=1e-10, max_iter=500,
                          operand=jnp.asarray(mat))
    _, _, cold = solver.solve(b)
    x0 = ref + 1e-6 * np.random.default_rng(7).standard_normal((2, n))
    _, _, warm = solver.solve(b, x0=x0)
    assert warm < cold


def test_zero_rhs_is_immediate():
    n = 64
    mat = _spd(n, seed=8)
    solver = FusedBlockCG(_matvec, np.diag(mat), n, 2,
                          convergence_threshold=1e-10, operand=jnp.asarray(mat))
    x, errors, iters = solver.solve(np.zeros((2, n)))
    assert iters == 0
    np.testing.assert_allclose(x, 0.0)


def test_sharded_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iterative_solver_tpu.parallel import make_mesh

    n, nrhs = 256, 2
    mat = _spd(n, seed=9)
    b = np.random.default_rng(10).standard_normal((nrhs, n))
    single = FusedBlockCG(_matvec, np.diag(mat), n, nrhs,
                          convergence_threshold=1e-11, operand=jnp.asarray(mat))
    x1, e1, it1 = single.solve(b)

    mesh = make_mesh(jax.devices()[:8])
    sharding = NamedSharding(mesh, P(None, "data"))
    mshard = jax.device_put(jnp.asarray(mat), NamedSharding(mesh, P(None, "data")))
    sharded = FusedBlockCG(_matvec, np.diag(mat), n, nrhs,
                           convergence_threshold=1e-11, operand=mshard,
                           sharding=sharding)
    x8, e8, it8 = sharded.solve(b)
    np.testing.assert_allclose(x8, x1, atol=1e-9)
    assert it8 == it1


def test_packed_precise_tier_action():
    """Block CG through the split double-bf16 packed action (interpret on
    CPU) — the production pairing for large SPD response equations."""
    import dataclasses

    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlockedSplit,
        symm_matmat_split_pallas,
    )

    n, nrhs = 128, 2
    mat = _spd(n, seed=11)
    sym = SymmetricBlockedSplit.from_dense(mat, b=32)
    op = (sym.hi, sym.lo, sym.ii, sym.jj)

    def matvec(x, o):
        s = dataclasses.replace(sym, hi=o[0], lo=o[1], ii=o[2], jj=o[3])
        return symm_matmat_split_pallas(
            x.astype(jnp.float32), s, interpret=True).astype(x.dtype)

    b = np.random.default_rng(12).standard_normal((nrhs, n))
    solver = FusedBlockCG(matvec, np.diag(mat), n, nrhs,
                          convergence_threshold=5e-5, max_iter=400, operand=op)
    x, errors, iters = solver.solve(b)
    assert np.max(errors) <= 5e-5
    ref = np.linalg.solve(mat, b.T).T
    np.testing.assert_allclose(x, ref, atol=2e-4 * np.max(np.abs(ref)))


def test_batched_solves_match_sequential():
    """B independent SPD systems in one vmapped dispatch reproduce the
    per-system sequential solves (CG is branch-free, so plain vmap works —
    no chunked workaround needed)."""
    from iterative_solver_tpu.solvers.fused_cg import (
        make_batched_cg_solve,
        make_cg_init,
        make_cg_solve,
    )

    B, n, nrhs = 4, 96, 2
    mats = np.stack([_spd(n, seed=20 + i, scale=0.05 + 0.02 * i) for i in range(B)])
    bs = np.random.default_rng(30).standard_normal((B, nrhs, n))
    diags = np.stack([np.diag(m) for m in mats])
    b_norms = np.linalg.norm(bs, axis=2)

    binit, bsolve = make_batched_cg_solve(_matvec)
    st = binit(jnp.zeros_like(jnp.asarray(bs)), jnp.asarray(bs),
               jnp.asarray(mats), jnp.asarray(diags), jnp.asarray(b_norms))
    fin, iters = bsolve(st, jnp.asarray(mats), jnp.asarray(diags),
                        jnp.asarray(b_norms), 1e-11, 500)

    init = make_cg_init(_matvec)
    solve = make_cg_solve(_matvec)
    for i in range(B):
        sti = init(jnp.zeros((nrhs, n)), jnp.asarray(bs[i]), jnp.asarray(mats[i]),
                   jnp.asarray(diags[i]), jnp.asarray(b_norms[i]))
        fi, iti = solve(sti, jnp.asarray(mats[i]), jnp.asarray(diags[i]),
                        jnp.asarray(b_norms[i]), 1e-11, 500)
        ref = np.linalg.solve(mats[i], bs[i].T).T
        np.testing.assert_allclose(np.asarray(fin.x[i]), ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(fi.x), ref, atol=1e-8)
        assert np.max(np.asarray(fin.errors[i])) <= 1e-11
