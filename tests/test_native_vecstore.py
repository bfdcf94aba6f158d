"""Native vecstore tests: C++ streamed file store vs numpy (the parallel
array-suite analogue of test/array/testGemm.cpp for the disk tier)."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from iterative_solver_tpu.native import VecStore


@pytest.fixture()
def store():
    vs = VecStore(capacity=16, row_len=300)
    yield vs
    vs.close()


class TestVecStore:
    def test_put_get_roundtrip(self, store):
        rng = np.random.default_rng(0)
        rows = {}
        for _ in range(5):
            v = rng.standard_normal(300)
            slot = store.append(v)
            rows[slot] = v
        for slot, v in rows.items():
            np.testing.assert_allclose(store.get(slot), v, atol=0)

    def test_unwritten_rows_read_zero(self, store):
        np.testing.assert_allclose(store.get(7), np.zeros(300))

    def test_gemm_inner_streams(self, store):
        rng = np.random.default_rng(1)
        basis = rng.standard_normal((10, 300))
        slots = [store.append(b) for b in basis]
        x = rng.standard_normal((3, 300))
        out = store.gram(x, slots)
        np.testing.assert_allclose(out, x @ basis.T, atol=1e-12)

    def test_gemm_outer_streams(self, store):
        rng = np.random.default_rng(2)
        basis = rng.standard_normal((6, 300))
        slots = [store.append(b) for b in basis]
        coeff = rng.standard_normal((2, 6))
        out = store.combine(coeff, slots)
        np.testing.assert_allclose(out, coeff @ basis, atol=1e-12)

    def test_axpy_scal_dot(self, store):
        rng = np.random.default_rng(3)
        a = rng.standard_normal(300)
        b = rng.standard_normal(300)
        sa = store.append(a)
        sb = store.append(b)
        store.axpy(sa, 0.5, b)
        np.testing.assert_allclose(store.get(sa), a + 0.5 * b, atol=1e-14)
        store.scale(sb, 2.0)
        np.testing.assert_allclose(store.get(sb), 2 * b, atol=1e-14)
        np.testing.assert_allclose(store.dot(sa, sb), (a + 0.5 * b) @ (2 * b), atol=1e-10)

    def test_slot_reuse(self, store):
        v1 = np.ones(300)
        s = store.append(v1)
        store.release(s)
        s2 = store.append(2 * v1)
        assert s2 == s
        np.testing.assert_allclose(store.get(s2), 2 * v1)

    def test_large_streaming(self):
        # bigger than the two page buffers: verifies the prefetch pipeline
        vs = VecStore(capacity=64, row_len=10000)
        try:
            rng = np.random.default_rng(4)
            basis = rng.standard_normal((40, 10000))
            slots = [vs.append(b) for b in basis]
            x = rng.standard_normal((5, 10000))
            np.testing.assert_allclose(vs.gram(x, slots), x @ basis.T, rtol=1e-10, atol=1e-10)
            coeff = rng.standard_normal((5, 40))
            np.testing.assert_allclose(vs.combine(coeff, slots), coeff @ basis, rtol=1e-10, atol=1e-10)
        finally:
            vs.close()

    def test_named_file_persistence(self, tmp_path):
        path = str(tmp_path / "store.bin")
        vs = VecStore(capacity=4, row_len=50, path=path)
        v = np.arange(50.0)
        vs.put(2, v)
        vs.close()
        vs2 = VecStore(capacity=4, row_len=50, path=path)
        np.testing.assert_allclose(vs2.get(2), v)
        vs2.close()
