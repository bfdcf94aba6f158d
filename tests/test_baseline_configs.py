"""The five benchmark configurations named in BASELINE.json, as tests.

1. Single-root Davidson on he.hamiltonian (dense, diagonal preconditioner)
2. Multi-root (4) Davidson with P-space projection on bh.hamiltonian
3. LinearEquations with multiple RHS + augmented-Hessian shift on hf.hamiltonian
4. DIIS nonlinear equations + L-BFGS Optimize on a Rosenbrock-style problem
5. Distributed multi-root Davidson, row-sharded (synthetic FCI standing in
   for the stripped phenol.hamiltonian) — covered at scale in
   test_sharded_bsr.py::test_distributed_sparse_davidson; the variant here
   pins the parity solver on the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.parallel import block_sharding, make_mesh, matrix_row_sharding


def test_config1_he_single_root(hamiltonians):
    matrix = hamiltonians["he"]
    n = matrix.shape[0]
    solver = its.create_linear_eigensystem(n, 1, "Davidson")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((1, n)), problem=its.models.MatrixProblem(matrix),
                            generate_initial_guess=True)
    assert conv
    np.testing.assert_allclose(solver.eigenvalues()[0], np.linalg.eigvalsh(matrix)[0], atol=2e-9)


def test_config2_bh_multiroot_pspace(hamiltonians):
    matrix = hamiltonians["bh"]
    n = matrix.shape[0]
    solver = its.create_linear_eigensystem(n, 4, "Davidson", "max_p=8,max_size_qspace=12")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((4, n)), problem=its.models.MatrixProblem(matrix),
                            generate_initial_guess=True)
    assert conv
    assert solver.xspace.dimensions.nP == 8
    ref = np.sort(np.linalg.eigvalsh(matrix))[:4]
    np.testing.assert_allclose(solver.eigenvalues()[:4], ref, atol=2e-9)


@pytest.mark.parametrize("aughes", [0.0, 0.005])
def test_config3_hf_linear_equations(hamiltonians, aughes):
    matrix = hamiltonians["hf"]
    n = matrix.shape[0]
    # shift to make the operator positive definite so Ax=b is well-posed
    a = matrix + 110.0 * np.eye(n)
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal((2, n))
    solver = its.create_linear_equations(n, 2, "Davidson", f"augmented_hessian={aughes}")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-10 if aughes == 0.0 else 1e-4
    solver.add_equations(rhs)
    conv, *_ = solver.solve(np.zeros((2, n)), problem=its.models.MatrixProblem(a),
                            generate_initial_guess=True)
    assert conv
    x = np.asarray(solver.solution_params([0, 1]))
    if aughes == 0.0:
        np.testing.assert_allclose(x, np.linalg.solve(a, rhs.T).T, atol=1e-7)


class RosenbrockProblem(its.Problem):
    """Generalized Rosenbrock: sum 100(x_{i+1}-x_i^2)^2 + (1-x_i)^2."""

    def __init__(self, n):
        super().__init__()
        self.dimension = n

    def residual(self, parameters):
        x = parameters
        f = jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)
        grad = jax.grad(
            lambda z: jnp.sum(100.0 * (z[1:] - z[:-1] ** 2) ** 2 + (1.0 - z[:-1]) ** 2)
        )(x)
        return float(f), grad

    def precondition(self, residual, shift=None, diagonals=None):
        return residual / 200.0  # rough inverse curvature scale


def test_config4_bfgs_rosenbrock():
    n = 6
    problem = RosenbrockProblem(n)
    solver = its.create_optimize(n, "BFGS", "max_size_qspace=10")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-7
    solver.max_iter = 500
    x0 = np.full((1, n), 0.5)
    conv, x, _ = solver.solve(x0, problem=problem)
    assert conv
    np.testing.assert_allclose(np.asarray(x)[0], np.ones(n), atol=1e-5)
    assert solver.value < 1e-10


def test_config4_diis_nonlinear():
    """DIIS on the Rosenbrock gradient system (find the stationary point)."""
    n = 4

    class RosenGrad(its.Problem):
        def __init__(self):
            super().__init__()
            self.dimension = n

        def residual(self, parameters):
            g = jax.grad(
                lambda z: jnp.sum(100.0 * (z[1:] - z[:-1] ** 2) ** 2 + (1.0 - z[:-1]) ** 2)
            )(parameters)
            return 0.0, g / 200.0

        def precondition(self, residual, shift=None, diagonals=None):
            return residual

    solver = its.create_nonlinear_equations(n, "DIIS", "max_size_qspace=10")
    solver.verbosity = its.Verbosity.NONE
    # DIIS on this non-convex fixed-point map limit-cycles below ~1e-6 in the
    # scaled residual; converge to the achievable basin accuracy
    solver.convergence_threshold = 1e-5
    solver.max_iter = 300
    conv, x, _ = solver.solve(np.full((1, n), 0.9), problem=RosenGrad())
    assert conv
    np.testing.assert_allclose(np.asarray(x)[0], np.ones(n), atol=1e-3)


def test_config5_parity_solver_sharded_multiroot():
    mesh = make_mesh()
    n = 256
    from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_dense

    matrix = synthetic_fci_dense(n, seed=7)
    problem = its.models.MatrixProblem(matrix, sharding=matrix_row_sharding(mesh))
    solver = its.create_linear_eigensystem(n, 3, "Davidson", sharding=block_sharding(mesh))
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((3, n)), problem=problem, generate_initial_guess=True)
    assert conv
    ref = np.sort(np.linalg.eigvalsh(matrix))[:3]
    np.testing.assert_allclose(solver.eigenvalues()[:3], ref, atol=2e-9)


def test_cross_check_vs_arpack():
    """Independent validation: our Davidson vs scipy ARPACK on a larger
    synthetic sparse problem."""
    import scipy.sparse
    import scipy.sparse.linalg

    from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr
    from iterative_solver_tpu.ops.kernels import bsr_matmat

    bsr, dense = synthetic_fci_bsr(768, block=32, seed=9)

    class P(its.Problem):
        def __init__(self):
            super().__init__()
            self.dimension = bsr.shape[0]

        def action(self, parameters):
            return bsr_matmat(parameters, bsr)

        def diagonals(self):
            return bsr.diagonal

    n = bsr.shape[0]
    solver = its.create_linear_eigensystem(n, 3, "Davidson", "max_size_qspace=16")
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((3, n)), problem=P(), generate_initial_guess=True)
    assert conv
    sp = scipy.sparse.csr_matrix(dense)
    ref = np.sort(scipy.sparse.linalg.eigsh(sp, k=3, which="SA", tol=1e-12)[0])
    np.testing.assert_allclose(np.sort(solver.eigenvalues()[:3]), ref, atol=1e-8)
