"""Quantized screening + refinement: the int8 production pipeline.

Large-scale eigenproblem runs often screen MANY states cheaply before
polishing the interesting ones. The int8 operator tiers
(ops/kernels/symm_int8.py) make the screening pass nearly free on TPU —
one quantized plane streams at HALF the bf16 tier's bytes (36 vs 125 us
for an 8192^2 action) — and the exact-diagonal path keeps the quantization
error proportional to the COUPLING magnitudes, so diagonally dominant
operators (FCI hamiltonians) screen accurately:

1. `tier="int8"`   FusedDavidson to the quantization floor (~1e-3): ranks
   the states, nails the eigenvalues to ~1e-5 on gapped spectra;
2. `tier="int8_precise"` (two planes, the split-bf16 accuracy class at
   half its traffic) re-converges the kept roots to ~1e-5 residuals;
3. `EigenpairRefiner` (host-f64 Rayleigh-Ritz + deflated-projected
   corrections through the same device operator) closes the reference's
   1e-8 bar (test_LinearEigensystem.cpp:196).

Run: python examples/quantized_screening.py [--n 2048] [--nroots 8] [--tpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024,
                    help="must be a multiple of 256 (tile size)")
    ap.add_argument("--nroots", type=int, default=6)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default self-pins CPU)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson
    from iterative_solver_tpu.solvers.refine import EigenpairRefiner

    n, nroots = args.n, args.nroots
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    dvals = np.concatenate([np.linspace(-2.0, 1.0, 24),
                            np.linspace(3.0, 40.0, n - 24)])
    matrix = a + a.T + np.diag(dvals)
    diag = np.diag(matrix)
    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(diag)[:nroots]):
        v0[row, i] = 1.0

    # 1. screening pass: one int8 plane, tolerance at the quantization floor
    t0 = time.perf_counter()
    screen = FusedDavidson.from_dense_symmetric(
        matrix, nroots, tier="int8", b=256,
        convergence_threshold=5e-3, max_iter=100)
    evals_s, x_s, err_s, it_s = screen.run_on_device(v0)
    print(f"screen  (int8):        {it_s:3d} iters, max residual "
          f"{err_s.max():.1e}, {time.perf_counter()-t0:.2f}s")

    # 2. re-converge the kept roots on the two-plane tier
    t0 = time.perf_counter()
    polish = FusedDavidson.from_dense_symmetric(
        matrix, nroots, tier="int8_precise", b=256,
        convergence_threshold=1e-5, max_iter=100)
    evals_p, x_p, err_p, it_p = polish.run_on_device(screen.unpad(x_s))
    print(f"polish  (int8_precise):{it_p:3d} iters, max residual "
          f"{err_p.max():.1e}, {time.perf_counter()-t0:.2f}s")

    # 3. refine to the reference's 1e-8 bar with f64 outer iterations
    t0 = time.perf_counter()
    refiner = EigenpairRefiner(lambda x: x @ matrix.T, polish.matvec,
                               polish.operand, diag, polish.n, nroots)
    out = refiner.refine(polish.unpad(np.asarray(x_p, dtype=np.float64)),
                         tol=1e-8)
    print(f"refine  (f64 outer):   {out.passes:3d} passes, max residual "
          f"{out.residual_norms.max():.1e}, {time.perf_counter()-t0:.2f}s")

    ref = np.linalg.eigvalsh(matrix)[:nroots]
    ev_err = np.abs(np.sort(out.eigenvalues) - ref).max()
    print(f"eigenvalue error vs dense f64: {ev_err:.1e}")
    assert out.converged and out.residual_norms.max() <= 1e-8
    assert ev_err < 1e-9
    print("OK")


if __name__ == "__main__":
    main()
