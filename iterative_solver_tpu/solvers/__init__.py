from .core import IterativeSolverTemplate, Verbosity
from .interpolate import Interpolate, Point
from .linear_eigensystem import LinearEigensystemDavidson, LinearEigensystemRSPT
from .linear_equations import LinearEquationsDavidson
from .nonlinear_diis import NonLinearEquationsDIIS
from .optimize import OptimizeBFGS, OptimizeSD
from .fused_davidson import FusedDavidson
from .fused_linear import FusedLinearEquations
from .fused_lbfgs import FusedLBFGS
from .fused_diis import FusedDIIS
from .fused_cg import FusedBlockCG
from .fused_nonsym import FusedNonSymDavidson, FusedNonSymLinearEquations
from .fused_ppcg import FusedPPCG
from .refine import EigenpairRefiner, RefineResult
from .banded import BandedEigensolver
from .chebyshev import (
    estimate_spectral_bounds,
    make_chebyshev_davidson,
    make_chebyshev_expand,
)

__all__ = [
    "IterativeSolverTemplate",
    "Verbosity",
    "Interpolate",
    "Point",
    "LinearEigensystemDavidson",
    "LinearEigensystemRSPT",
    "LinearEquationsDavidson",
    "NonLinearEquationsDIIS",
    "OptimizeBFGS",
    "OptimizeSD",
    "FusedDavidson",
    "FusedLinearEquations",
    "FusedLBFGS",
    "FusedDIIS",
    "FusedBlockCG",
    "FusedNonSymDavidson",
    "FusedNonSymLinearEquations",
    "FusedPPCG",
    "EigenpairRefiner",
    "RefineResult",
    "BandedEigensolver",
    "estimate_spectral_bounds",
    "make_chebyshev_davidson",
    "make_chebyshev_expand",
]
