"""Phenol-scale composition pieces, verified at CPU-testable size.

The opt-in bench leg (benchmarks/phenol_scale.py, bench --phenol) runs at
n=2^20 / ~1e9 nnz on the chip; these tests pin the same generator, the
exact host-f64 action, and the device int8 action against a dense
reconstruction at a size the CPU suite can afford.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from benchmarks.phenol_scale import (
    host_f64_action,
    leg_phenol_scale,
    make_device_int8_matvec,
    synthetic_int8_bsr_direct,
)


def dense_from_int8_bsr(bsr_q, diag, s):
    n = bsr_q.shape[0]
    m = np.zeros((n, n))
    q = np.asarray(bsr_q.q, dtype=np.float64)
    rows = np.asarray(bsr_q.row_idx)
    cols = np.asarray(bsr_q.col_idx)
    bm, bn = bsr_q.bm, bsr_q.bn
    for k in range(rows.size):
        m[rows[k] * bm:(rows[k] + 1) * bm,
          cols[k] * bn:(cols[k] + 1) * bn] += q[k] * (s / 127.0)
    m[np.arange(n), np.arange(n)] += diag
    return m


@pytest.fixture(scope="module")
def small_problem():
    n = 1024
    bsr_q, diag, s = synthetic_int8_bsr_direct(n, block=128, n_low=16, seed=3)
    dense = dense_from_int8_bsr(bsr_q, diag, s)
    return n, bsr_q, diag, s, dense


class TestGenerator:
    def test_operator_is_symmetric(self, small_problem):
        n, bsr_q, diag, s, dense = small_problem
        np.testing.assert_allclose(dense, dense.T, atol=0)

    def test_spectrum_structure(self, small_problem):
        n, bsr_q, diag, s, dense = small_problem
        w = np.linalg.eigvalsh(dense)
        # gapped low block survives the couplings (dominant diagonal)
        assert w[0] > -3.0 and w[15] < 4.0
        assert w[16] > 4.0

    def test_host_action_matches_dense(self, small_problem):
        n, bsr_q, diag, s, dense = small_problem
        action = host_f64_action(bsr_q, diag, s)
        x = np.random.default_rng(0).standard_normal((4, n))
        np.testing.assert_allclose(action(x), x @ dense.T, atol=1e-10)

    def test_device_action_within_activation_quantization(self, small_problem):
        n, bsr_q, diag, s, dense = small_problem
        matvec = make_device_int8_matvec(bsr_q.bm, bsr_q.bn, n // bsr_q.bm)
        operand = (jnp.asarray(bsr_q.q), jnp.asarray(bsr_q.rq),
                   jnp.asarray(bsr_q.cq), jnp.asarray(bsr_q.diagonal),
                   jnp.asarray(bsr_q.col_idx), jnp.asarray(bsr_q.row_idx))
        x = np.random.default_rng(1).standard_normal((4, n))
        got = np.asarray(matvec(jnp.asarray(x, jnp.float32), operand),
                         dtype=np.float64)
        want = x @ dense.T
        # stored couplings are exact int8; the only loss is ACTIVATION
        # quantization (~|x|_max * s * sqrt(row nnz) / 254) + f32 rounding
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 2e-4 * max(scale, 1.0)


class TestCompositionSmall:
    def test_full_leg_composes_to_1e8(self, small_problem):
        """The complete screen->refine composition reaches the 1e-8 bar on
        CPU at n=1024 (the bench runs the same code at n=2^20 on TPU)."""
        R = {}
        leg_phenol_scale(R, n=1024, nroots=4, band=2)
        assert R["phenol_converged"], R
        assert R["phenol_max_residual_f64"] <= 1e-8
        # eigenvalues: refiner output not returned; check residual + count
        assert R["phenol_roots"] == 4
