"""DistrArray parity tests mirroring the reference's test/array serial +
parallel suites (testDistrArray*.cpp): RMA-style access, local linalg,
collective dot, selections — on the 8-device virtual mesh."""

import numpy as np
import pytest

from iterative_solver_tpu.array.distr_array import DistrArray
from iterative_solver_tpu.array.distribution import spread_remainder
from iterative_solver_tpu.parallel import make_mesh


@pytest.fixture(params=["single", "mesh"])
def make_array(request):
    mesh = make_mesh() if request.param == "mesh" else None

    def _make(n, data=None):
        return DistrArray(n, mesh=mesh, data=data)

    return _make


class TestDistribution:
    def test_spread_remainder(self):
        d = spread_remainder(10, 3)
        assert d.chunk_borders == [0, 4, 7, 10]
        assert d.range(0) == (0, 4)
        assert d.cover(5) == 1
        assert d.cover(3, 8) == (0, 2)

    def test_compatible(self):
        assert spread_remainder(10, 3).compatible(spread_remainder(10, 3))
        assert not spread_remainder(10, 3).compatible(spread_remainder(10, 2))


class TestDistrArray:
    def test_fill_get_put(self, make_array):
        a = make_array(24)
        a.fill(2.0)
        np.testing.assert_allclose(a.gather_all(), 2.0)
        a.put(3, np.arange(4.0))
        np.testing.assert_allclose(a.get(3, 7), np.arange(4.0))
        a.acc(3, np.ones(4))
        np.testing.assert_allclose(a.get(3, 7), np.arange(4.0) + 1)

    def test_gather_scatter(self, make_array):
        a = make_array(16, data=np.arange(16.0))
        np.testing.assert_allclose(a.gather([1, 5, 9]), [1.0, 5.0, 9.0])
        a.scatter([0, 2], [10.0, 20.0])
        assert a.at(0) == 10.0 and a.at(2) == 20.0
        a.scatter_acc([0], [1.0])
        assert a.at(0) == 11.0

    def test_local_linalg(self, make_array):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(32)
        y = rng.standard_normal(32)
        a = make_array(32, x)
        b = make_array(32, y)
        a.axpy(0.5, b)
        np.testing.assert_allclose(a.gather_all(), x + 0.5 * y, atol=1e-14)
        a.scal(2.0)
        np.testing.assert_allclose(a.gather_all(), 2 * (x + 0.5 * y), atol=1e-14)
        b.times(a)
        np.testing.assert_allclose(b.gather_all(), y * 2 * (x + 0.5 * y), atol=1e-13)

    def test_divide(self, make_array):
        a = make_array(8, np.arange(1.0, 9.0))
        b = make_array(8, np.full(8, 2.0))
        out = make_array(8)
        out.divide(a, b, shift=1.0)
        np.testing.assert_allclose(out.gather_all(), np.arange(1.0, 9.0) / 3.0)

    def test_dot_collective(self, make_array):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(40)
        y = rng.standard_normal(40)
        a = make_array(40, x)
        b = make_array(40, y)
        np.testing.assert_allclose(a.dot(b), x @ y, atol=1e-12)
        np.testing.assert_allclose(a.norm(), np.linalg.norm(x), atol=1e-12)

    def test_selections(self, make_array):
        data = np.array([3.0, -7.0, 1.0, 5.0, -2.0, 0.5])
        a = make_array(6, data)
        assert [i for i, _ in a.max_n(2)] == [3, 0]
        assert [i for i, _ in a.min_n(2)] == [1, 4]
        assert [i for i, _ in a.max_abs_n(1)] == [1]
        assert a.min_loc_n(1) == [1]
        sel = a.select(2, max_select=False)
        assert set(sel.keys()) == {1, 4}

    def test_select_max_dot(self, make_array):
        x = np.array([1.0, 2.0, 0.1, 3.0])
        y = np.array([1.0, 1.0, 100.0, 0.1])
        a = make_array(4, x)
        b = make_array(4, y)
        out = a.select_max_dot(2, b)
        assert set(out.keys()) == {2, 1}  # |0.1*100|=10, |2*1|=2

    def test_local_buffer_ranges(self):
        mesh = make_mesh()
        a = DistrArray(20, mesh=mesh, data=np.arange(20.0))
        d = a.distribution()
        assert d.size == 8
        recon = np.concatenate([a.local_buffer(r) for r in range(8)])
        np.testing.assert_allclose(recon, np.arange(20.0))
