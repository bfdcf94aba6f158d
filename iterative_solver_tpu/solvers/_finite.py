"""Non-finite detection for the fused solver families.

Every fused solver drives a ``lax.while_loop`` whose condition includes
``err > tol``; a NaN error makes that comparison False, so the loop exits
early *looking like* normal convergence.  The reference instead throws
(``solve_DIIS`` raises ``overflow_error`` on NaN coefficients,
helper-implementation.h:619-669).  This helper restores that contract at the
host boundary: each fused ``run``/``solve`` calls it on the fetched final
error(s) and raises ``FloatingPointError`` rather than silently returning
NaN-filled solutions.
"""

from __future__ import annotations

import numpy as np


def check_finite(errors, solver: str) -> None:
    """Raise FloatingPointError if any fetched error/metric is not finite."""
    arr = np.asarray(errors)
    if not np.all(np.isfinite(arr)):
        raise FloatingPointError(
            f"{solver}: solve diverged to non-finite residual norms "
            f"({arr!r}); the iteration exited on NaN, not convergence. "
            "Check the operator/preconditioner scaling or loosen the "
            "preconditioner regularisation."
        )
