"""Checked-in golden iteration-count tables (VERDICT r2 #8, widened r4).

BASELINE.md target 1 asks for "identical iteration counts" against the
executed reference, but building the C++ reference needs network-fetched
Eigen/gtest (env-blocked). This is the committed stand-in: deterministic
f64 iteration counts over the reference sweep grids are recorded in
``tests/data/golden_iteration_counts.json`` and asserted EXACTLY — any
future change that shifts an iteration count fails here and must either
be fixed or consciously re-record the table.

Families (VERDICT r3 #7 widened this beyond Davidson):

- Davidson eigensolver: matrix x nroot x P-space x working-vector cap
  (test_LinearEigensystem.cpp:244-345);
- LinearEquations: multi-RHS + augmented-Hessian on/off
  (test_LinearEquations.cpp);
- DIIS: quadratic + trigonometric nonlinear systems
  (test_NonLinearEquations.cpp);
- Optimize: BFGS/SD quadratic minimisation (test_Optimize.cpp);
- non-hermitian Davidson at skew strengths 0.1/0.2
  (LinearEigensystemDavidson.h:130-184, hermiticity=false);
- FUSED-tier P-space (round-4 feature): FusedDavidson with frozen P slots
  at np in {3, 6} across rr modes — behaviour-parity pin for the
  production path.

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


# ---------------------------------------------------------------------------
# Widened families (VERDICT r3 #7)
# ---------------------------------------------------------------------------

LINEQ_GRID = [(20, 1, 0.0), (20, 2, 0.0), (20, 3, 0.0),
              (15, 1, 0.001), (15, 1, 0.01)]
DIIS_GRID = [("quad", 3), ("quad", 8), ("quad", 30), ("trig", 5), ("trig", 20)]
OPT_GRID = [("BFGS", 2), ("BFGS", 5), ("BFGS", 20), ("SD", 5)]
NONSYM_GRID = [0.1, 0.2]
FUSEDP_GRID = [("bh", 2, 3, "window"), ("bh", 3, 6, "window"),
               ("bh", 2, 3, "full"), ("hf", 2, 3, "window"),
               ("hf", 3, 6, "full"), ("hf", 2, 6, "window3")]


def _lineq_system(n, nrhs, seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * 0.1
    mat = a + a.T + np.diag(np.arange(5.0, n + 5.0))
    return mat, rng.standard_normal((nrhs, n))


def run_lineq(n, nrhs, aughes):
    """test_LinearEquations.cpp semantics: multi-RHS + augmented-Hessian."""
    mat, rhs = _lineq_system(n, nrhs, seed=3 if aughes else 0)
    problem = its.models.MatrixProblem(mat)
    opts = f"augmented_hessian={aughes}" if aughes else ""
    solver = its.create_linear_equations(n, nrhs, "Davidson", opts)
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-10 if not aughes else 1e-4
    solver.add_equations(rhs)
    conv, *_ = solver.solve(np.zeros((nrhs, n)), problem=problem,
                            generate_initial_guess=True)
    return int(solver.stats.iterations), bool(conv)


class _QuadraticDIIS(its.Problem):
    """r = A x + eps x^2 - b (mirrors test_nonlinear_equations.py)."""

    def __init__(self, n, eps=0.05):
        import jax.numpy as jnp

        super().__init__()
        self.dimension = n
        rng = np.random.default_rng(1)
        a = rng.standard_normal((n, n)) * 0.1
        self.a = jnp.asarray(a + a.T + np.diag(np.arange(2.0, n + 2.0)))
        self.b = jnp.asarray(rng.standard_normal(n))
        self.eps = eps

    def residual(self, parameters):
        return 0.0, self.a @ parameters + self.eps * parameters**2 - self.b

    def diagonals(self):
        import jax.numpy as jnp

        return jnp.diagonal(self.a)


def run_diis(kind, n):
    problem = (_QuadraticDIIS(n) if kind == "quad"
               else its.models.TrigNonlinearProblem(n))
    solver = its.create_nonlinear_equations(n, "DIIS", "max_size_qspace=8")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-8
    conv, *_ = solver.solve(np.zeros((1, n)), problem=problem)
    return int(solver.stats.iterations), bool(conv)


def run_optimize(method, n):
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    hess = np.where(i == j, i + 1.0, 0.1 / (1.0 + abs(i - j)))
    problem = its.models.QuadraticOptimizeProblem(hess, np.ones(n))
    solver = its.create_optimize(n, method, "max_size_qspace=8")
    solver.verbosity = its.Verbosity.NONE
    solver.convergence_threshold = 1e-10
    conv, *_ = solver.solve(np.zeros((1, n)), problem=problem, max_iter=200)
    return int(solver.stats.iterations), bool(conv)


def run_nonsym(strength):
    """The reference's own nonhermitian construction
    (test_LinearEigensystem.cpp:41-51: lower triangle scaled by
    1-strength), parity Davidson at hermiticity=false — pins the
    non-variational path's behaviour."""
    n = 100
    m = np.ones((n, n))
    np.fill_diagonal(m, np.arange(n, dtype=np.float64))
    for i in range(n):
        m[i, :i] *= 1.0 - strength
    problem = its.models.MatrixProblem(m)
    solver = its.create_linear_eigensystem(n, 2, "Davidson")
    solver.set_hermiticity(False)
    solver.verbosity = its.Verbosity.NONE
    conv, *_ = solver.solve(np.zeros((2, n)), problem=problem,
                            generate_initial_guess=True)
    return int(solver.stats.iterations), bool(conv)


def run_fusedp(name, nroot, np_, rr):
    """FUSED-tier P-space golden counts (the round-4 production feature)."""
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

    matrix = _load(name)
    matrix = 0.5 * (matrix + matrix.T)
    n = matrix.shape[0]
    mat = jnp.asarray(matrix)

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision="highest")

    idx = np.argsort(np.diag(matrix))
    p_space = [{int(i): 1.0} for i in idx[:np_]]
    width = {"full": 2, "window": 2, "window3": 3}[rr]
    solver = FusedDavidson(
        matvec, np.diag(matrix), n, nroot,
        m_max=max(width * nroot, 4 * nroot) + np_, operand=mat, rr=rr,
        convergence_threshold=1e-9, max_iter=300, p_space=p_space)
    v0 = np.zeros((nroot, n))
    for row, i in enumerate(idx[:nroot]):
        v0[row, i] = 1.0
    _, _, errs, iters = solver.run_on_device(v0)
    return int(iters), bool(np.max(errs) <= 1e-9)


def run_nonsym_fused(strength, rr):
    """Fused non-hermitian tier on the reference construction, both RR
    modes — pins the round-4 device-RR (Rayleigh-shifted inverse
    iteration) convergence against the exact host-eig chunked path."""
    from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

    n = 100
    m = np.ones((n, n))
    np.fill_diagonal(m, np.arange(n, dtype=np.float64))
    for i in range(n):
        m[i, :i] *= 1.0 - strength
    solver = FusedNonSymDavidson.from_dense(
        m, 2, convergence_threshold=1e-9, max_iter=200, rr=rr, m_max=12)
    v0 = np.zeros((2, n))
    for row, i in enumerate(np.argsort(np.diag(m))[:2]):
        v0[row, i] = 1.0
    _, _, errs, iters = solver.solve(v0)
    return int(iters), bool(np.max(errs) <= 1e-9)


def run_nonsym_lineq_fused(strength, rr):
    """Fused non-symmetric linear equations, host-f64 vs in-loop
    LU+refinement projected solve."""
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.fused_nonsym import (
        FusedNonSymLinearEquations,
    )

    n, nrhs = 100, 2
    rng = np.random.default_rng(11)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    m = a + a.T + np.diag(np.linspace(1.0, 20.0, n))
    m[np.tril_indices(n, -1)] *= 1.0 - strength
    b = rng.standard_normal((nrhs, n))
    solver = FusedNonSymLinearEquations(
        lambda x, op: jnp.matmul(x, op.T, precision="highest"),
        np.diag(m), n, nrhs, m_max=12, convergence_threshold=1e-10,
        max_iter=200, operand=jnp.asarray(m), rr=rr)
    _, errs, iters = solver.solve(b)
    return int(iters), bool(np.max(errs) <= 1e-10)


DEVRR_GRID = [(0.1, "host"), (0.1, "device"), (0.2, "host"), (0.2, "device")]
NONSYM_P_GRID = [(3,), (6,)]


def run_nonsym_fused_pspace(np_):
    """P-space on the device-RR nonsym tier: hf skewed 0.9, frozen P at
    the np_ lowest diagonal slots (measured 20 -> 12 -> 9 iterations at
    np 0/3/6)."""
    from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

    m = _load("hf")
    m = 0.5 * (m + m.T)
    n = m.shape[0]
    mns = m.copy()
    mns[np.tril_indices(n, -1)] *= 0.9
    idx = np.argsort(np.diag(mns))
    v0 = np.zeros((2, n))
    for r_, i in enumerate(idx[:2]):
        v0[r_, i] = 1.0
    solver = FusedNonSymDavidson.from_dense(
        mns, 2, convergence_threshold=1e-8, max_iter=100, rr="device",
        m_max=8 + np_, p_space=[{int(i): 1.0} for i in idx[:np_]])
    _, _, errs, iters = solver.solve(v0)
    return int(iters), bool(np.max(errs) <= 1e-8)


DEVRR_LINEQ_GRID = [(0.1, "host"), (0.1, "device"),
                    (0.3, "host"), (0.3, "device")]

FAMILIES = {
    "lineq": (LINEQ_GRID,
              lambda n, nrhs, ah: run_lineq(n, nrhs, ah),
              lambda n, nrhs, ah: f"lineq_n{n}_rhs{nrhs}_ah{ah}"),
    "diis": (DIIS_GRID,
             lambda kind, n: run_diis(kind, n),
             lambda kind, n: f"diis_{kind}_n{n}"),
    "optimize": (OPT_GRID,
                 lambda meth, n: run_optimize(meth, n),
                 lambda meth, n: f"opt_{meth}_n{n}"),
    "nonsym": ([(s,) for s in NONSYM_GRID],
               lambda s: run_nonsym(s),
               lambda s: f"nonsym_ref_s{s}"),
    "fusedp": (FUSEDP_GRID,
               lambda nm, r, p, rr: run_fusedp(nm, r, p, rr),
               lambda nm, r, p, rr: f"fusedp_{nm}_nroot{r}_np{p}_{rr}"),
    "nonsym_fused": (DEVRR_GRID,
                     lambda s, rr: run_nonsym_fused(s, rr),
                     lambda s, rr: f"nonsym_fused_s{s}_{rr}"),
    "nonsym_lineq_fused": (DEVRR_LINEQ_GRID,
                           lambda s, rr: run_nonsym_lineq_fused(s, rr),
                           lambda s, rr: f"nonsym_lineq_fused_s{s}_{rr}"),
    "nonsym_fused_pspace": (NONSYM_P_GRID,
                            lambda p: run_nonsym_fused_pspace(p),
                            lambda p: f"nonsym_fused_pspace_hf_np{p}"),
}


def all_family_cases():
    out = []
    for fam, (grid, runner, keyfn) in FAMILIES.items():
        for case in grid:
            out.append((keyfn(*case), runner, case))
    return out


def generate():
    table = {}
    for name, nroot, np_, n_rows in GRID:
        matrix = _load(name)
        iters, conv = run_case(matrix, nroot, np_, n_rows)
        assert conv, f"golden case {case_key(name, nroot, np_, n_rows)} did not converge"
        table[case_key(name, nroot, np_, n_rows)] = iters
    for key, runner, case in all_family_cases():
        iters, conv = runner(*case)
        assert conv, f"golden case {key} did not converge"
        table[key] = iters
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


@pytest.mark.parametrize("key,runner,case",
                         all_family_cases(),
                         ids=[k for k, _, _ in all_family_cases()])
def test_family_iteration_count_matches_golden(golden, key, runner, case):
    if key not in golden:
        pytest.skip("table predates this family — regenerate")
    iters, conv = runner(*case)
    assert conv, f"{key}: no longer converges"
    assert iters == golden[key], (
        f"{key}: iteration count shifted {golden[key]} -> {iters}; if the "
        "change is intentional, regenerate with "
        "`python tests/test_golden_iterations.py --regen`")


def test_grid_covers_every_golden_entry(golden):
    """The committed table and the asserted grid must not drift apart."""
    expected = {case_key(*g) for g in GRID}
    expected |= {k for k, _, _ in all_family_cases()}
    assert set(golden) == expected
    assert len(golden) >= 30  # VERDICT r3 #7 coverage bar


if __name__ == "__main__":
    if "--regen" in sys.argv:
        table = generate()
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(table, fh, indent=1, sort_keys=True)
        print(f"wrote {len(table)} golden iteration counts to {GOLDEN_PATH}")
    else:
        print(__doc__)
