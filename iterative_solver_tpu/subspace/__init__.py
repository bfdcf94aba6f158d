from .dimensions import Dimensions
from .xspace import XSpace
from .solvers import (
    SubspaceSolverLinEig,
    SubspaceSolverRSPT,
    SubspaceSolverDIIS,
    SubspaceSolverUnit,
)

__all__ = [
    "Dimensions",
    "XSpace",
    "SubspaceSolverLinEig",
    "SubspaceSolverRSPT",
    "SubspaceSolverDIIS",
    "SubspaceSolverUnit",
]
