"""XSpace/BasisStore unit tests (mirror testQSpace.cpp / testMatrix.cpp style):
the incrementally maintained H/S matrices must equal a from-scratch recompute."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu.array.basis_store import BasisStore
from iterative_solver_tpu.subspace.xspace import XSpace


def dev(a):
    return jnp.asarray(np.asarray(a, dtype=np.float64))


class TestBasisStore:
    def test_slot_lifecycle(self):
        store = BasisStore(4, 8)
        s0 = store.append(np.arange(8.0))
        s1 = store.append(np.ones(8))
        np.testing.assert_allclose(np.asarray(store.get(s0)), np.arange(8.0))
        store.release(s0)
        s2 = store.append(2 * np.ones(8))
        assert s2 == s0  # slot reused
        np.testing.assert_allclose(np.asarray(store.get(s1)), np.ones(8))

    def test_grow(self):
        store = BasisStore(2, 4)
        slots = [store.append(np.full(4, float(i))) for i in range(5)]
        assert store.capacity >= 5
        for i, s in enumerate(slots):
            np.testing.assert_allclose(np.asarray(store.get(s)), np.full(4, float(i)))

    def test_gram_and_combine(self):
        rng = np.random.default_rng(0)
        store = BasisStore(6, 10)
        vecs = rng.standard_normal((3, 10))
        slots = [store.append(v) for v in vecs]
        x = rng.standard_normal((2, 10))
        g = store.gram(dev(x), slots)
        np.testing.assert_allclose(g, x @ vecs.T, atol=1e-12)
        coeff = rng.standard_normal((2, 3))
        combo = np.asarray(store.combine(coeff, slots))
        np.testing.assert_allclose(combo, coeff @ vecs, atol=1e-12)


class TestXSpace:
    def brute_force_matrices(self, params_list, actions_list, hermitian=False, aoa=False):
        p = np.stack(params_list)
        a = np.stack(actions_list)
        s = p @ p.T
        h = a @ a.T if aoa else p @ a.T
        return s, h

    @pytest.mark.parametrize("hermitian", [False, True])
    def test_update_qspace_matches_brute_force(self, hermitian):
        rng = np.random.default_rng(1)
        n = 16
        xs = XSpace(n, capacity=8)
        xs.hermitian = hermitian
        m = rng.standard_normal((n, n))
        m = m + m.T
        all_p, all_a = [], []
        for step in (2, 1, 2):
            p = rng.standard_normal((step, n))
            a = p @ m if hermitian else rng.standard_normal((step, n))
            xs.update_qspace(dev(p), dev(a))
            # Q is newest-first
            all_p = [pi for pi in p] + all_p
            all_a = [ai for ai in a] + all_a
        s_ref, h_ref = self.brute_force_matrices(all_p, all_a)
        np.testing.assert_allclose(xs.s, s_ref, atol=1e-12)
        np.testing.assert_allclose(xs.h, h_ref, atol=1e-12)

    def test_eraseq_keeps_matrices_consistent(self):
        rng = np.random.default_rng(2)
        n = 12
        xs = XSpace(n, capacity=8)
        p = rng.standard_normal((4, n))
        a = rng.standard_normal((4, n))
        xs.update_qspace(dev(p), dev(a))
        # q order is newest-first: q[i] = p[.. reversed blocks ..]; single block
        # of 4 prepended at once keeps block order
        xs.eraseq(1)
        keep = [0, 2, 3]
        s_ref = p[keep] @ p[keep].T
        np.testing.assert_allclose(xs.s, s_ref, atol=1e-12)
        assert xs.dimensions.nQ == 3

    def test_update_dspace(self):
        rng = np.random.default_rng(3)
        n = 10
        xs = XSpace(n, capacity=8)
        p = rng.standard_normal((3, n))
        a = rng.standard_normal((3, n))
        xs.update_qspace(dev(p), dev(a))
        dp = rng.standard_normal((2, n))
        da = rng.standard_normal((2, n))
        xs.update_dspace(dev(dp), dev(da))
        dims = xs.dimensions
        assert (dims.nQ, dims.nD) == (3, 2)
        # D block of S
        np.testing.assert_allclose(xs.s[3:, 3:], dp @ dp.T, atol=1e-12)
        # H cross blocks: H[q, d] = <q_param, d_action>
        np.testing.assert_allclose(xs.h[:3, 3:], p @ da.T, atol=1e-12)
        np.testing.assert_allclose(xs.h[3:, :3], dp @ a.T, atol=1e-12)
        np.testing.assert_allclose(xs.h[3:, 3:], dp @ da.T, atol=1e-12)
        # replace D again with fewer vectors
        xs.update_dspace(dev(dp[:1]), dev(da[:1]))
        assert xs.dimensions.nD == 1
        np.testing.assert_allclose(xs.s[3:, 3:], dp[:1] @ dp[:1].T, atol=1e-12)

    def test_rhs_projection(self):
        rng = np.random.default_rng(4)
        n = 10
        xs = XSpace(n, capacity=8)
        rhs = rng.standard_normal((2, n))
        xs.add_rhs_equations(dev(rhs))
        p = rng.standard_normal((2, n))
        a = rng.standard_normal((2, n))
        xs.update_qspace(dev(p), dev(a))
        np.testing.assert_allclose(xs.rhs, p @ rhs.T, atol=1e-12)
        assert xs.dimensions.nRHS == 2


class TestPspace:
    def test_update_pspace(self):
        rng = np.random.default_rng(5)
        n = 10
        xs = XSpace(n, capacity=8)
        xs.hermitian = True
        pvecs = [{0: 1.0}, {3: 1.0}]
        pp = np.array([[2.0, 0.1], [0.1, 3.0]])
        xs.update_pspace(pvecs, pp)
        assert xs.dimensions.nP == 2
        np.testing.assert_allclose(xs.s, np.eye(2), atol=1e-14)
        np.testing.assert_allclose(xs.h, pp, atol=1e-14)
