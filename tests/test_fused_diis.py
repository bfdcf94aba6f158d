"""Fused single-dispatch DIIS (solvers/fused_diis.py).

Mirrors the parity suite's problems (test_NonLinearEquations.cpp quadratic +
trigonometric) through the production while_loop path, plus the ring-buffer
and sharding invariants specific to the fused redesign.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.fused_diis import FusedDIIS

_PREC = jax.lax.Precision.HIGHEST


def _trig_operand(n, seed=42):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(0.3 + 0.2 * rng.random(n))
    b = jnp.asarray(rng.standard_normal(n))
    return a, b


def _trig_residual(x, operand):
    a, b = operand
    return x + a * jnp.sin(x) - b


def _quad_operand(n, eps=0.05, seed=1):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * 0.1
    mat = jnp.asarray(a + a.T + np.diag(np.arange(2.0, n + 2.0)))
    b = jnp.asarray(rng.standard_normal(n))
    return mat, jnp.asarray(eps), b


def _quad_residual(x, operand):
    mat, eps, b = operand
    return jnp.matmul(mat, x, precision=_PREC) + eps * x**2 - b


@pytest.mark.parametrize("n", [5, 20, 100])
def test_trig_converges(n):
    operand = _trig_operand(n)
    solver = FusedDIIS(_trig_residual, n, operand=operand,
                       convergence_threshold=1e-10)
    x, err, iters = solver.run(np.zeros(n))
    assert err < 1e-10
    assert iters < 30
    res = np.asarray(_trig_residual(jnp.asarray(x), operand))
    assert np.linalg.norm(res) < 2e-10


@pytest.mark.parametrize("n", [8, 30])
def test_quadratic_with_jacobi(n):
    """Stiff diagonal (2..n+1): unpreconditioned fixed point diverges; the
    Jacobi diagonals contract makes DIIS converge like the parity solver."""
    operand = _quad_operand(n)
    diag = np.diagonal(np.asarray(operand[0]))
    solver = FusedDIIS(_quad_residual, n, operand=operand, diagonals=diag,
                       convergence_threshold=1e-10, max_size_qspace=8)
    x, err, iters = solver.run(np.zeros(n))
    assert err < 1e-10
    res = np.asarray(_quad_residual(jnp.asarray(x), operand))
    assert np.linalg.norm(res) < 2e-10


def test_matches_parity_solver_solution():
    """Same fixed point as the host-loop NonLinearEquationsDIIS."""
    import iterative_solver_tpu as its

    n = 20
    operand = _trig_operand(n)
    fused = FusedDIIS(_trig_residual, n, operand=operand,
                      convergence_threshold=1e-9)
    xf, err, _ = fused.run(np.zeros(n))

    problem = its.models.TrigNonlinearProblem(n)
    parity = its.create_nonlinear_equations(n, "DIIS")
    parity.verbosity = its.Verbosity.NONE
    parity.convergence_threshold = 1e-8
    converged, xp, _ = parity.solve(np.zeros((1, n)), problem=problem)
    assert converged
    np.testing.assert_allclose(xf, np.asarray(xp)[0], atol=1e-7)


def test_ring_wrap_converges():
    """History capacity smaller than the iteration count: age-based
    overwrite (the reference's deletion analogue) must keep converging."""
    n = 40
    operand = _trig_operand(n, seed=7)
    solver = FusedDIIS(_trig_residual, n, operand=operand,
                       max_size_qspace=3, convergence_threshold=1e-10,
                       max_iter=200)
    x, err, iters = solver.run(np.zeros(n))
    assert err < 1e-10
    assert iters > 3  # actually wrapped the ring


def test_parallel_residuals_extrapolate_exactly():
    """A linear residual r = a(x - b) under plain iteration produces EXACTLY
    parallel successive residuals — the overlap matrix is rank-1, and only
    the bordered (constrained) solve recovers the exact extrapolation.
    Plain fixed point at rate (1 - 1e-3) would need ~23000 iterations; the
    bordered DIIS must land in a handful."""
    n = 10
    b = jnp.asarray(np.linspace(0.5, 1.5, n))

    def residual(x, operand):
        return 1e-3 * (x - operand)

    solver = FusedDIIS(residual, n, operand=b, convergence_threshold=1e-12,
                       max_iter=50)
    x, err, iters = solver.run(np.zeros(n))
    assert np.all(np.isfinite(x))
    assert err < 1e-12
    assert iters <= 5
    np.testing.assert_allclose(x, np.asarray(b), atol=1e-9)


def test_converged_start_takes_zero_iterations():
    n = 12
    operand = _trig_operand(n, seed=3)
    ref = FusedDIIS(_trig_residual, n, operand=operand,
                    convergence_threshold=1e-11)
    x, err, _ = ref.run(np.zeros(n))
    x2, err2, iters2 = ref.run(x)
    assert iters2 == 0
    assert err2 < 1e-11


def test_float32_converges():
    n = 30
    a, b = _trig_operand(n, seed=5)
    operand = (a.astype(jnp.float32), b.astype(jnp.float32))
    solver = FusedDIIS(_trig_residual, n, operand=operand, dtype=jnp.float32,
                       convergence_threshold=2e-6, max_iter=100)
    x, err, iters = solver.run(np.zeros(n))
    assert err < 2e-6


def test_sharded_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iterative_solver_tpu.parallel import make_mesh

    n = 256
    operand = _quad_operand(n, seed=11)
    diag = np.diagonal(np.asarray(operand[0]))
    single = FusedDIIS(_quad_residual, n, operand=operand, diagonals=diag,
                       convergence_threshold=1e-10)
    x1, e1, it1 = single.run(np.zeros(n))

    mesh = make_mesh(jax.devices()[:8])
    sharding = NamedSharding(mesh, P(None, "data"))
    mshard = jax.device_put(operand[0], NamedSharding(mesh, P(None, "data")))
    sharded = FusedDIIS(_quad_residual, n,
                        operand=(mshard, operand[1], operand[2]),
                        diagonals=diag, sharding=sharding,
                        convergence_threshold=1e-10)
    x8, e8, it8 = sharded.run(np.zeros(n))
    np.testing.assert_allclose(x8, x1, atol=1e-9)
    assert it8 == it1


def test_rejects_tiny_history():
    with pytest.raises(ValueError):
        FusedDIIS(_trig_residual, 4, max_size_qspace=1)
