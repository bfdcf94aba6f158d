"""Non-finite detection + indefinite-diagonal regularisation (ADVICE r1).

The fused while_loop condition ``err > tol`` is False for NaN, so a diverged
solve used to exit looking converged.  The reference throws instead
(solve_DIIS overflow_error on NaN coefficients, helper-implementation.h:619-669);
these tests pin the restored raise-on-NaN contract and the sign-preserving
Jacobi regularisation for indefinite / near-zero diagonals.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers._finite import check_finite
from iterative_solver_tpu.solvers.fused_diis import FusedDIIS


def test_check_finite_raises_on_nan():
    with pytest.raises(FloatingPointError):
        check_finite(np.array([1e-3, np.nan]), "X")
    with pytest.raises(FloatingPointError):
        check_finite(float("inf"), "X")
    check_finite(np.array([0.0, 1.0]), "X")  # no raise


def test_fused_diis_raises_on_divergence():
    # residual g(x) = exp(x) - huge  explodes under the fixed-point update
    # x <- x - g(x): x grows, exp overflows to inf, err goes inf/nan.
    def residual(x, operand):
        return jnp.exp(x) - 2.0

    solver = FusedDIIS(residual, n=4, max_size_qspace=3,
                       convergence_threshold=1e-12, max_iter=60)
    x0 = np.full(4, 400.0)  # exp(400) overflows f64
    with pytest.raises(FloatingPointError):
        solver.run(x0)


def test_fused_diis_indefinite_diagonal_regularisation():
    # A diagonal entry at -1e-15*max|d| used to make 1/(d + 1e-15*max|d|)
    # blow up to ~1e300; the magnitude-clamped inverse stays bounded and
    # sign-preserving.
    d = np.array([2.0, -2.0, -2e-15, 0.0])
    solver = FusedDIIS(lambda x, o: x, n=4, diagonals=d)
    dinv = np.asarray(solver._dinv)
    assert np.all(np.isfinite(dinv))
    scale = 1e-15 * 2.0
    assert np.all(np.abs(dinv) <= 1.0 / scale * 1.0000001)
    assert dinv[0] > 0 and dinv[1] < 0
    assert dinv[1] == pytest.approx(-0.5)
    # zero entry gets the bounded positive clamp, not inf
    assert dinv[3] == pytest.approx(1.0 / scale, rel=1e-6)


def test_fused_diis_still_converges_with_diagonals():
    # sanity: the regularisation change must not perturb a well-conditioned
    # solve — quadratic residual with positive diagonals.
    rng = np.random.default_rng(5)
    d = rng.uniform(1.0, 3.0, size=16)

    def residual(x, operand):
        return operand * x + 0.01 * x**2 - 1.0

    solver = FusedDIIS(residual, n=16, max_size_qspace=6, operand=jnp.asarray(d),
                       diagonals=d, convergence_threshold=1e-10, max_iter=50)
    x, err, iters = solver.run(np.zeros(16))
    assert err <= 1e-10
    r = d * x + 0.01 * x**2 - 1.0
    assert np.linalg.norm(r) < 1e-9
