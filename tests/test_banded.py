"""Band-by-band deflated eigensolver over the offload tier (VERDICT r1 #6).

Many lowest roots, one HBM-sized band at a time; locked bands deflate the
next solve either exactly on device or via streamed re-orthogonalisation
against the offload store (the beyond-HBM configuration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.solvers.banded import (
    BandedEigensolver,
    make_deflated_davidson_matvec,
)


def make_matrix(n, nlow=16, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.02 / np.sqrt(n))
    d = np.concatenate([np.linspace(-3.0, 0.0, nlow), np.linspace(2.0, 20.0, n - nlow)])
    return a + a.T + np.diag(d)


def dense_matvec(x, op):
    return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("deflate", ["device", "streamed"])
def test_banded_matches_dense(deflate):
    n, nroots, band = 256, 12, 4
    m = make_matrix(n)
    ref = np.linalg.eigvalsh(m)[:nroots]
    solver = BandedEigensolver(
        dense_matvec, np.diag(m), n, band=band, m_max=16,
        convergence_threshold=1e-9, max_iter=300,
        operand=jnp.asarray(m), deflate=deflate, store_block_rows=3)
    vals, vecs, errs = solver.solve(nroots)
    np.testing.assert_allclose(vals, ref, atol=1e-7)
    # residuals in f64 against the real operator (not the deflated one)
    for i in range(nroots):
        xi = vecs[i] / np.linalg.norm(vecs[i])
        res = np.linalg.norm(m @ xi - vals[i] * xi)
        assert res < 1e-6, f"root {i}: residual {res}"
    # bands are mutually orthonormal
    g = vecs @ vecs.T
    np.testing.assert_allclose(g, np.eye(nroots), atol=1e-8)
    if deflate == "streamed":
        assert solver.n_locked == nroots


def make_clustered_matrix(n, seed=11):
    """Spectrum with tight low-end CLUSTERS (pairs split by ~1e-3) whose
    members straddle band boundaries — the configuration where streamed
    soft-locking without windowed hard deflation converged the last row
    of a band into the WRONG cluster (eigenvalue off by 3.7 at n=512,
    docs/PERF.md round-3 'windowed hard deflation')."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    clusters = []
    for c in range(6):  # six pairs: -3.0/-2.999, -2.4/-2.399, ...
        base = -3.0 + 0.6 * c
        clusters += [base, base + 1e-3]
    d = np.concatenate([np.asarray(clusters),
                        np.linspace(2.0, 20.0, n - len(clusters))])
    return a + a.T + np.diag(d)


def test_streamed_clustered_spectrum_n512():
    """Regression for the windowed-hard-deflation fix at the scale it
    failed: n=512, clustered pairs, band=3 so every band boundary falls
    INSIDE a cluster. Without the device-resident deflation window the
    last active row of each band seeds from a purged direction and locks
    onto the wrong cluster member."""
    n, nroots, band = 512, 8, 3
    m = make_clustered_matrix(n)
    ref = np.linalg.eigvalsh(m)[:nroots]
    solver = BandedEigensolver(
        dense_matvec, np.diag(m), n, band=band, m_max=16,
        convergence_threshold=1e-9, max_iter=400,
        operand=jnp.asarray(m), deflate="streamed", store_block_rows=3)
    vals, vecs, errs = solver.solve(nroots)
    # the historical failure was eigenvalue error ~3.7 (wrong cluster);
    # assert f64-class agreement with the dense spectrum
    np.testing.assert_allclose(vals, ref, atol=1e-7)
    for i in range(nroots):
        xi = vecs[i] / np.linalg.norm(vecs[i])
        res = np.linalg.norm(m @ xi - vals[i] * xi)
        # individual vectors inside a 1e-3-split pair are ill-conditioned
        # (residual ~ splitting x mixing angle); 1e-4 still sits 4.5
        # orders below the wrong-cluster failure this test pins
        assert res < 1e-4, f"root {i}: residual {res}"
    g = vecs @ vecs.T
    np.testing.assert_allclose(g, np.eye(nroots), atol=1e-8)
    assert solver.n_locked == nroots


def test_deflated_matvec_moves_locked_roots():
    n = 64
    m = make_matrix(n, nlow=4, seed=3)
    w, v = np.linalg.eigh(m)
    xl = v[:, :2].T  # lock the two lowest
    sigma = 50.0
    wrapped = make_deflated_davidson_matvec(dense_matvec, sigma)
    packed = (jnp.asarray(m), jnp.asarray(xl))
    # apply to the locked vectors: they now sit at sigma
    out = np.asarray(wrapped(jnp.asarray(xl), packed))
    np.testing.assert_allclose(out, sigma * xl, atol=1e-10)
    # lowest eigenvalue of A' equals the THIRD of A
    probe = np.eye(n)
    ap = np.asarray(wrapped(jnp.asarray(probe), packed)).T
    wp = np.linalg.eigvalsh(0.5 * (ap + ap.T))
    np.testing.assert_allclose(wp[0], w[2], atol=1e-10)


def test_empty_locked_block_is_noop():
    n = 32
    m = make_matrix(n, nlow=4, seed=5)
    wrapped = make_deflated_davidson_matvec(dense_matvec, 99.0)
    v = np.random.default_rng(0).standard_normal((3, n))
    out = np.asarray(wrapped(jnp.asarray(v), (jnp.asarray(m), jnp.zeros((0, n)))))
    np.testing.assert_allclose(out, v @ m.T, atol=1e-12)
