"""Mixed-precision eigenpair refinement to the reference's 1e-8 bar.

The device tier is emulated on CPU by forcing the correction solves through
an f32-cast operator (the same carrier/representation error structure as
the TPU tiers); the refinement loop must break the f32 residual floor and
reach f64-level residuals. Reference bar: convergence_threshold = 1e-8,
test_LinearEigensystem.cpp:196,303-341.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.refine import EigenpairRefiner

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_gapped(n, nroots, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (noise / np.sqrt(n))
    d = np.concatenate(
        [np.linspace(-2.0, 0.5, nroots), np.linspace(2.0, 30.0, n - nroots)])
    return a + a.T + np.diag(d)


def f32_matvec_factory(matrix):
    op = jnp.asarray(matrix, dtype=jnp.float32)

    def matvec(v, op_):
        return jnp.matmul(v.astype(jnp.float32), op_.T,
                          precision=jax.lax.Precision.HIGHEST)

    return matvec, op


class TestRefiner:
    def test_reaches_1e10_from_f32_floor(self):
        n, r = 384, 6
        m = make_gapped(n, r)
        ref = np.linalg.eigvalsh(m)[:r]
        refv = np.linalg.eigh(m)[1][:, :r].T
        # start from an f32-floor-quality block: exact + 1e-4 perturbation
        rng = np.random.default_rng(1)
        x0 = refv + 1e-4 * rng.standard_normal((r, n))
        matvec, op = f32_matvec_factory(m)
        refiner = EigenpairRefiner(
            lambda x: x @ m.T, matvec, op, np.diag(m), n, r,
            dtype=jnp.float32, inner_tol=1e-3)
        out = refiner.refine(x0, tol=1e-10, max_passes=5)
        assert out.converged, out.history
        assert out.residual_norms.max() <= 1e-10
        np.testing.assert_allclose(out.eigenvalues, ref, atol=1e-12)
        # each executed pass must have gained >= ~2 digits (the e->e^2 law
        # degrades gracefully to the inner-solve accuracy factor)
        for a, b in zip(out.history, out.history[1:]):
            assert b < 5e-2 * a

    def test_end_to_end_after_f32_davidson(self):
        # the production flow: fused f32 Davidson to its floor, then refine
        from iterative_solver_tpu.solvers.fused_davidson import FusedDavidson

        n, r = 256, 4
        m = make_gapped(n, r, seed=3)
        ref = np.linalg.eigvalsh(m)[:r]
        matvec, op = f32_matvec_factory(m)
        solver = FusedDavidson(
            matvec, np.diag(m), n, r, m_max=4 * r, dtype=jnp.float32,
            operand=op, convergence_threshold=5e-4, max_iter=100)
        v0 = np.zeros((r, n))
        for row, i in enumerate(np.argsort(np.diag(m))[:r]):
            v0[row, i] = 1.0
        evals, x, errors, iters = solver.run_on_device(v0)
        x64 = np.asarray(x, dtype=np.float64)
        # f32 carrier floor: f64 residual stuck far above the bar
        r0 = np.linalg.norm(x64 @ m.T - (x64 @ m.T @ x64.T).diagonal()[:, None] * x64)
        refiner = EigenpairRefiner(
            lambda xx: xx @ m.T, matvec, op, np.diag(m), n, r,
            dtype=jnp.float32)
        out = refiner.refine(x64, tol=1e-8, max_passes=4)
        assert out.converged, out.history
        assert out.residual_norms.max() <= 1e-8
        assert out.history[0] > 1e-6  # the floor it started from was real
        np.testing.assert_allclose(out.eigenvalues, ref, atol=1e-11)

    def test_wrapped_operator_is_spd_and_deflates(self):
        from iterative_solver_tpu.solvers.refine import make_deflated_matvec

        n, r = 96, 3
        m = make_gapped(n, r, seed=5)
        lam_all, vecs = np.linalg.eigh(m)
        x = vecs[:, :r].T
        matvec, op = f32_matvec_factory(m)
        cw = 7.0
        wrapped = make_deflated_matvec(matvec, cw)
        packed = (op, jnp.asarray(x, jnp.float32), jnp.asarray(lam_all[:r], jnp.float32))
        # on the deflated block the operator acts as cw * I (row-wise)
        out = np.asarray(wrapped(jnp.asarray(x, jnp.float32), packed))
        np.testing.assert_allclose(out, cw * x, atol=1e-4)
        # on the complement it is P(A - lam_i)P: positive definite row-wise
        rng = np.random.default_rng(2)
        v = rng.standard_normal((r, n)).astype(np.float32)
        v -= (v @ x.T) @ x
        mv = np.asarray(wrapped(jnp.asarray(v), packed))
        quad = np.einsum("in,in->i", v, mv)
        gaps = lam_all[r] - lam_all[:r]
        assert np.all(quad > 0.25 * gaps * np.einsum("in,in->i", v, v))

    def test_stall_detection_reports_not_converged(self):
        # an impossible bar (below the f64 floor) must terminate with
        # converged=False rather than loop forever
        n, r = 128, 2
        m = make_gapped(n, r, seed=7)
        matvec, op = f32_matvec_factory(m)
        refv = np.linalg.eigh(m)[1][:, :r].T
        refiner = EigenpairRefiner(
            lambda x: x @ m.T, matvec, op, np.diag(m), n, r,
            dtype=jnp.float32)
        out = refiner.refine(refv + 1e-5, tol=1e-300, max_passes=3)
        assert not out.converged
        assert out.passes <= 3


@pytest.mark.skipif(not os.environ.get("ITSOLV_TPU_TESTS"),
                    reason="real-TPU test: set ITSOLV_TPU_TESTS=1 (needs the axon tunnel)")
def test_refine_reaches_1e8_on_tpu():
    """The VERDICT #1 acceptance: split-tier Davidson + refinement reaches
    max f64 residual <= 1e-8 on the real chip (also benched as
    precise_1e8_* in bench.py)."""
    script = os.path.join(REPO, "examples", "refine_to_1e8.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin pick the TPU
    out = subprocess.run([sys.executable, script, "--n", "2048", "--nroots", "8",
                          "--tpu"],
                         capture_output=True, text=True, timeout=1200, env=env,
                         cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "REFINED max_residual_f64" in out.stdout
    resid = float(out.stdout.split("REFINED max_residual_f64")[1].split()[1])
    assert resid <= 1e-8
