from .matrix_problem import (
    ExampleProblem,
    MatrixProblem,
    QuadraticOptimizeProblem,
    RayleighQuotientProblem,
    TrigNonlinearProblem,
    load_hamiltonian,
)

__all__ = [
    "ExampleProblem",
    "MatrixProblem",
    "QuadraticOptimizeProblem",
    "RayleighQuotientProblem",
    "TrigNonlinearProblem",
    "load_hamiltonian",
]
