"""Checked-in golden iteration-count tables (VERDICT r2 next #8).

BASELINE.md target 1 asks for "identical iteration counts" against the
executed reference, but building the C++ reference needs network-fetched
Eigen/gtest (env-blocked). This is the committed stand-in: the f64 parity
Davidson's iteration counts over the reference sweep grid
(matrix x nroot x P-space size x working-vector cap, mirroring
test_LinearEigensystem.cpp:244-345) are recorded in
``tests/data/golden_iteration_counts.json`` and asserted EXACTLY — any
future change that shifts an iteration count fails here and must either
be fixed or consciously re-record the table.

Regenerate (after an intentional algorithmic change) with:

    python tests/test_golden_iterations.py --regen
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":  # script mode (--regen): no conftest ran
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import iterative_solver_tpu as its

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data",
                           "golden_iteration_counts.json")
REFERENCE_EXAMPLES = "/root/reference/examples"

# (matrix, nroot, np_, n_rows): the reference sweep axes; n_rows < nroot
# drives the batched solution-reconstruction path
GRID = [
    ("he", 1, 0, 1), ("he", 2, 0, 2), ("he", 2, 3, 2),
    ("bh", 1, 0, 1), ("bh", 2, 0, 2), ("bh", 3, 0, 3),
    ("bh", 2, 3, 2), ("bh", 3, 3, 3), ("bh", 3, 6, 3),
    ("bh", 2, 0, 1), ("bh", 3, 0, 2), ("bh", 4, 0, 2),
    ("hf", 1, 0, 1), ("hf", 2, 0, 2), ("hf", 3, 0, 3),
    ("hf", 2, 3, 2), ("hf", 3, 6, 3),
]


def _load(name):
    return its.models.load_hamiltonian(
        os.path.join(REFERENCE_EXAMPLES, f"{name}.hamiltonian"))


def run_case(matrix, nroot, np_, n_rows):
    """One deterministic parity solve; returns (iterations, converged).
    Mirrors tests/test_sweep_parity.py::_run_sweep_case exactly so the
    golden counts describe the same code path the sweep tests assert."""
    n = matrix.shape[0]
    problem = its.models.MatrixProblem(matrix)
    opts = f"max_size_qspace={max(6 * nroot, 12)}"
    if np_:
        opts += f",max_p={np_}"
    solver = its.create_linear_eigensystem(n, nroot, "Davidson", opts)
    solver.set_hermiticity(True)
    solver.verbosity = its.Verbosity.NONE
    if n_rows >= nroot:
        conv, _, _ = solver.solve(np.zeros((n_rows, n)), problem=problem,
                                  generate_initial_guess=True, max_iter=200)
    else:
        idx = np.argsort(np.diag(matrix))[:nroot]
        guess = np.zeros((n_rows, n))
        for j, i in enumerate(idx):
            guess[j % n_rows, i] = 1.0
        guess /= np.linalg.norm(guess, axis=1, keepdims=True)
        conv, _, _ = solver.solve(guess, problem=problem, max_iter=300)
    return int(solver.stats.iterations), bool(conv)


def case_key(name, nroot, np_, n_rows):
    return f"{name}_nroot{nroot}_np{np_}_nW{n_rows}"


def generate():
    table = {}
    for name, nroot, np_, n_rows in GRID:
        matrix = _load(name)
        iters, conv = run_case(matrix, nroot, np_, n_rows)
        assert conv, f"golden case {case_key(name, nroot, np_, n_rows)} did not converge"
        table[case_key(name, nroot, np_, n_rows)] = iters
    return table


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden table not generated")
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


@pytest.mark.parametrize("name,nroot,np_,n_rows", GRID,
                         ids=[case_key(*g) for g in GRID])
def test_iteration_count_matches_golden(golden, name, nroot, np_, n_rows):
    if not os.path.exists(os.path.join(REFERENCE_EXAMPLES, f"{name}.hamiltonian")):
        pytest.skip(f"{name}.hamiltonian not mounted")
    matrix = _load(name)
    iters, conv = run_case(matrix, nroot, np_, n_rows)
    key = case_key(name, nroot, np_, n_rows)
    assert conv, f"{key}: no longer converges"
    assert iters == golden[key], (
        f"{key}: iteration count shifted {golden[key]} -> {iters}; if the "
        "change is intentional, regenerate with "
        "`python tests/test_golden_iterations.py --regen`")


def test_grid_covers_every_golden_entry(golden):
    """The committed table and the asserted grid must not drift apart."""
    assert set(golden) == {case_key(*g) for g in GRID}


if __name__ == "__main__":
    if "--regen" in sys.argv:
        table = generate()
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(table, fh, indent=1, sort_keys=True)
        print(f"wrote {len(table)} golden iteration counts to {GOLDEN_PATH}")
    else:
        print(__doc__)
