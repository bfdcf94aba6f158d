"""Foreign-container integration: drive the solver with torch-resident data.

Mirrors the reference's examples/foreign-container/ (container.h +
solve-with-foreign-container.cpp): there, a user plugs their own vector
container into the C++ templates by supplying ArrayHandlers; the solver
then runs its whole Krylov machinery on the foreign type. The analogous
integration seam here is the Problem protocol: the solver owns only the
small (m, N) working blocks, and every heavy user-side operation — the
operator action, the diagonals, the preconditioner — can run in a foreign
numerics stack. This example keeps the operator and all Problem math in
torch CPU tensors; numpy arrays only cross the call boundary (zero-copy
via torch.from_numpy / Tensor.numpy, the Span-style view the reference's
DistrArraySpan wraps around caller buffers, DistrArraySpan.h:8-49).

Reference twins: examples/foreign-container/solve-with-foreign-container.cpp
(hf + bh files, 1 and 2 roots), container.h.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import torch  # noqa: E402  (the foreign numerics stack)

import iterative_solver_tpu as its  # noqa: E402

REFERENCE_EXAMPLES = "/root/reference/examples"


class TorchMatrixProblem(its.Problem):
    """A Problem whose state and math live entirely in torch tensors."""

    def __init__(self, matrix: torch.Tensor):
        super().__init__()
        self.matrix = matrix.to(torch.float64)
        self.dimension = matrix.shape[0]

    def action(self, parameters):
        # np.array (not asarray): jax hands out non-writable views, and
        # torch.from_numpy requires a writable buffer for zero-copy
        x = torch.from_numpy(np.array(parameters, dtype=np.float64))
        return (x @ self.matrix.T).numpy()

    def diagonals(self):
        return self.matrix.diagonal().numpy()

    def precondition(self, residual, shift=None, diagonals=None):
        r = torch.from_numpy(np.array(residual, dtype=np.float64))
        d = self.matrix.diagonal()
        if shift is None:
            shift = np.zeros(r.shape[0])
        for k, s in enumerate(np.asarray(shift, dtype=np.float64)):
            r[k] /= d - s + 1e-15
        return r.numpy()


def main():
    for name in ("hf", "bh"):
        path = os.path.join(REFERENCE_EXAMPLES, f"{name}.hamiltonian")
        matrix = torch.from_numpy(np.asarray(its.models.load_hamiltonian(path)))
        n = matrix.shape[0]
        dense = np.linalg.eigvalsh(matrix.numpy())
        for nroot in (1, 2):
            problem = TorchMatrixProblem(matrix)
            solver = its.create_linear_eigensystem(
                n, nroot, "Davidson", "max_size_qspace=10,convergence_threshold=1e-9"
            )
            solver.set_hermiticity(True)
            conv, x, r = solver.solve(
                np.zeros((nroot, n)), problem=problem, generate_initial_guess=True
            )
            evals = np.asarray(solver.eigenvalues())
            err = np.max(np.abs(evals - dense[:nroot]))
            print(f"{name} nroot={nroot}: converged={conv} eigenvalues={evals} "
                  f"err_vs_dense={err:.2e}")
            assert conv, f"{name}/{nroot} did not converge"
            assert err < 2e-9, f"{name}/{nroot} eigenvalue error {err}"
    print("foreign-container (torch) example OK")


if __name__ == "__main__":
    main()
