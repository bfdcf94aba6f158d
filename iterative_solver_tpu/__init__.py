"""iterative_solver_tpu — a TPU-native subspace iterative-solver framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference C++/MPI library molpro/iterative-solver: Davidson linear
eigensolver, linear-equation solver (with augmented Hessian), DIIS nonlinear
equations, L-BFGS/steepest-descent optimisation, P/Q/D subspace machinery,
and a distributed vector layer built on jax.sharding meshes instead of MPI.

Quick start::

    import numpy as np, iterative_solver_tpu as its
    problem = its.models.MatrixProblem(matrix)
    solver = its.create_linear_eigensystem(n, nroots=4, options="max_size_qspace=10")
    converged, x, r = solver.solve(np.zeros((4, n)), problem=problem,
                                   generate_initial_guess=True)
    solver.eigenvalues()
"""

from . import config as config  # noqa: F401  (re-exported ambient options)

config.enable_compile_cache()

from . import models, options, utils
from .factory import (
    create_linear_eigensystem,
    create_linear_equations,
    create_nonlinear_equations,
    create_optimize,
)
from .problem import Problem
from .solvers.core import IterativeSolverTemplate, Verbosity
from .solvers.interpolate import Interpolate, Point
from .solvers.linear_eigensystem import LinearEigensystemDavidson, LinearEigensystemRSPT
from .solvers.linear_equations import LinearEquationsDavidson
from .solvers.nonlinear_diis import NonLinearEquationsDIIS
from .solvers.optimize import OptimizeBFGS, OptimizeSD
from .solvers.fused_davidson import FusedDavidson, make_batched_davidson_solve
from .solvers.fused_nonsym import (
    FusedNonSymDavidson,
    FusedNonSymLinearEquations,
    finalize_nonsym_batch,
    make_batched_nonsym_lineq_solve,
    make_batched_nonsym_solve,
)
from .solvers.fused_ppcg import FusedPPCG
from .solvers.fused_cg import FusedBlockCG
from .solvers.implicit_diff import (
    make_differentiable_eigenpairs,
    make_differentiable_eigenvalues,
)
from .solvers.fused_linear import FusedLinearEquations
from .solvers.fused_lbfgs import FusedLBFGS
from .solvers.fused_diis import FusedDIIS

__version__ = "0.1.0"

__all__ = [
    "Problem",
    "Verbosity",
    "IterativeSolverTemplate",
    "LinearEigensystemDavidson",
    "LinearEigensystemRSPT",
    "LinearEquationsDavidson",
    "NonLinearEquationsDIIS",
    "OptimizeBFGS",
    "OptimizeSD",
    "FusedDavidson",
    "make_batched_davidson_solve",
    "make_differentiable_eigenvalues",
    "make_differentiable_eigenpairs",
    "FusedLinearEquations",
    "FusedLBFGS",
    "FusedDIIS",
    "Interpolate",
    "Point",
    "FusedNonSymDavidson",
    "FusedNonSymLinearEquations",
    "finalize_nonsym_batch",
    "make_batched_nonsym_lineq_solve",
    "make_batched_nonsym_solve",
    "FusedPPCG",
    "FusedBlockCG",
    "create_linear_eigensystem",
    "create_linear_equations",
    "create_nonlinear_equations",
    "create_optimize",
    "models",
    "options",
    "utils",
]
