"""User-facing problem definition.

Functional JAX-flavoured mirror of the reference's Problem interface
(reference: src/molpro/linalg/itsolv/IterativeSolver.h:76-172 and
python/iterative_solver/problem.py):

- linear solvers call ``action`` (the matrix-vector product — the hot user
  kernel);
- nonlinear solvers call ``residual``;
- ``diagonals``/``precondition`` drive the Jacobi/Davidson update and the
  automatic P-space / initial-guess selection;
- ``pp_action_matrix``/``p_action`` expose the P-space model hamiltonian.

All vector arguments are ``(m, N)`` row-blocks (jax arrays, possibly sharded
over a device mesh); methods return new arrays rather than mutating.
"""

from __future__ import annotations

import sys
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class Problem:
    def __init__(self):
        self.dimension: Optional[int] = None

    # -- linear ---------------------------------------------------------
    def action(self, parameters: Array) -> Array:
        """Kernel-matrix action on a block of trial vectors: (m, N) -> (m, N)."""
        raise NotImplementedError

    # -- nonlinear ------------------------------------------------------
    def residual(self, parameters: Array) -> Tuple[float, Array]:
        """Residual vector (and objective value where defined) at ``parameters`` (N,)."""
        raise NotImplementedError

    # -- preconditioning ------------------------------------------------
    def diagonals(self) -> Optional[Array]:
        """Diagonal elements of the kernel, or None if unavailable."""
        return None

    def precondition(
        self,
        residual: Array,
        shift: Optional[np.ndarray] = None,
        diagonals: Optional[Array] = None,
    ) -> Array:
        """Predict the (negative of the) step from a residual block.

        Default: Jacobi update r_i / (d_i - shift_k + 1e-15), the reference's
        precondition_default (IterativeSolver.h:34-44).
        """
        if diagonals is None:
            diagonals = self.diagonals()
        if diagonals is None:
            raise NotImplementedError("precondition() needs diagonals or an override")
        if shift is None:
            shift = np.zeros(residual.shape[0])
        from .array import vector_ops as vops

        return vops.jacobi_precondition_block(
            residual, jnp.asarray(shift, dtype=residual.dtype), jnp.asarray(diagonals, dtype=residual.dtype)
        )

    # -- P space --------------------------------------------------------
    def pp_action_matrix(self, pvectors: Sequence[Dict[int, float]]) -> np.ndarray:
        """<p_i | A | p_j> for sparse P-space vectors."""
        return np.zeros((0, 0))

    def p_action(self, p_coefficients: np.ndarray, pvectors: Sequence[Dict[int, float]]) -> Array:
        """Action contribution of the P-space projection: (m, nP) coefficients -> (m, N)."""
        raise NotImplementedError("P-space unavailable: unimplemented p_action()")

    # -- testing / reporting --------------------------------------------
    def test_parameters(self, instance: int) -> Optional[Array]:
        """Provide trial parameters for self-testing; None ends the scan."""
        return None

    def report(self, iteration, verbosity, errors, value=None, eigenvalues=None) -> bool:
        if (iteration <= 0 and verbosity >= 1) or verbosity >= 2:
            errors = np.asarray(errors, dtype=float)
            if iteration > 0 and verbosity >= 2:
                print("Iteration", iteration, "log10(|residual|)=", np.log10(errors + sys.float_info.min))
            elif iteration == 0:
                print("Converged", "log10(|residual|)=", np.log10(errors + sys.float_info.min))
            else:
                print("Unconverged", "log10(|residual|)=", np.log10(errors + sys.float_info.min))
            if value is not None:
                print("Objective function value", value)
            if eigenvalues is not None:
                print("Eigenvalues", np.asarray(eigenvalues))
            return True
        return False
