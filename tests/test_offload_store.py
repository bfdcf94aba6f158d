"""Host/disk-offloaded Q-store: the full Davidson solve must produce the
same results with the basis history streamed through the native file store
as with the device-HBM stacks (the reference's DistrArrayFile-as-Qvector
configuration)."""

import jax.numpy as jnp
import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.array.basis_store import BasisStore
from iterative_solver_tpu.array.offload_store import OffloadBasisStore


class TestOffloadStoreUnit:
    def test_interface_matches_device_store(self):
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((5, 64))
        x = jnp.asarray(rng.standard_normal((3, 64)))
        dev = BasisStore(8, 64)
        off = OffloadBasisStore(8, 64)
        slots_d = [dev.append(v) for v in vecs]
        slots_o = [off.append(v) for v in vecs]
        assert slots_d == slots_o
        np.testing.assert_allclose(
            dev.gram_block(x)[:, slots_d], off.gram_block(x)[:, slots_o], atol=1e-12
        )
        coeff = rng.standard_normal((2, 5))
        np.testing.assert_allclose(
            np.asarray(dev.combine(coeff, slots_d)),
            np.asarray(off.combine(coeff, slots_o)),
            atol=1e-12,
        )
        inv = rng.random(5) + 0.5
        np.testing.assert_allclose(
            np.asarray(dev.mgs_sweep(x, slots_d, inv)),
            np.asarray(off.mgs_sweep(x, slots_o, inv)),
            atol=1e-10,
        )
        off.close()

    def test_release_zeroes_slot(self):
        off = OffloadBasisStore(4, 16)
        s = off.append(np.ones(16))
        off.release(s)
        x = jnp.asarray(np.ones((1, 16)))
        g = off.gram_block(x)
        assert abs(g[0, s]) < 1e-14
        off.close()


def test_davidson_with_offloaded_qstore(hamiltonians):
    """End-to-end: identical eigenvalues through the offloaded history."""
    matrix = hamiltonians["bh"]
    n = matrix.shape[0]
    problem = its.models.MatrixProblem(matrix)

    def run(store_factory):
        solver = its.LinearEigensystemDavidson(n, 2, offload=store_factory is not None)
        solver.set_hermiticity(True)
        solver.verbosity = its.Verbosity.NONE
        conv, *_ = solver.solve(np.zeros((2, n)), problem=problem, generate_initial_guess=True)
        return solver, conv

    dev_solver, conv_dev = run(None)
    off_solver, conv_off = run(OffloadBasisStore)
    assert conv_dev and conv_off
    np.testing.assert_allclose(
        off_solver.eigenvalues()[:2], dev_solver.eigenvalues()[:2], atol=1e-10
    )
    ref = np.sort(np.linalg.eigvalsh(matrix))[:2]
    np.testing.assert_allclose(off_solver.eigenvalues()[:2], ref, atol=2e-9)
    # iteration counts should agree (same arithmetic, different storage tier)
    assert off_solver.stats.iterations == dev_solver.stats.iterations


class TestStreamedOffloadStore:
    """Device-streamed Q-tier (BufferManager analogue, VERDICT r1 #2):
    block numerics must match the host-f64 store bit-for-tolerance while
    streaming fixed-size row blocks through the accelerator."""

    def _stores(self, capacity, n, block_rows=3):
        from iterative_solver_tpu.array.offload_store import StreamedOffloadStore

        return OffloadBasisStore(capacity, n), StreamedOffloadStore(
            capacity, n, block_rows=block_rows)

    def test_streamed_matches_host_store(self):
        rng = np.random.default_rng(1)
        host, streamed = self._stores(16, 96, block_rows=3)  # 10 rows -> 4 blocks
        vecs = rng.standard_normal((10, 96))
        sh = [host.append(v) for v in vecs]
        ss = [streamed.append(v) for v in vecs]
        x = jnp.asarray(rng.standard_normal((4, 96)))
        np.testing.assert_allclose(streamed.gram(x, ss), host.gram(x, sh), atol=1e-12)
        np.testing.assert_allclose(streamed.gram_block(x), host.gram_block(x), atol=1e-12)
        coeff = rng.standard_normal((3, 10))
        np.testing.assert_allclose(
            np.asarray(streamed.combine(coeff, ss)),
            np.asarray(host.combine(coeff, sh)), atol=1e-12)
        # serial (no-prefetch) pipeline: same numbers, used to demonstrate
        # the overlap gain in the perf harness
        np.testing.assert_allclose(
            streamed.gram(x, ss, prefetch=False), host.gram(x, sh), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(streamed.combine(coeff, ss, prefetch=False)),
            np.asarray(host.combine(coeff, sh)), atol=1e-12)
        host.close(); streamed.close()

    def test_blocked_gs_matches_mgs_on_orthonormal_history(self):
        # the solvers keep Q orthonormal; block-classical GS == row MGS there
        rng = np.random.default_rng(2)
        n, k = 128, 9
        q, _ = np.linalg.qr(rng.standard_normal((n, k)))
        rows = q.T
        host, streamed = self._stores(16, n, block_rows=4)
        sh = [host.append(v) for v in rows]
        ss = [streamed.append(v) for v in rows]
        r = jnp.asarray(rng.standard_normal((3, n)))
        inv = np.ones(k)
        out_h = np.asarray(host.mgs_sweep(r, sh, inv))
        out_s = np.asarray(streamed.mgs_sweep(r, ss, inv))
        np.testing.assert_allclose(out_s, out_h, atol=1e-11)
        # result is orthogonal to the whole history
        assert np.abs(out_s @ rows.T).max() < 1e-10
        host.close(); streamed.close()

    def test_release_mask_and_regrow(self):
        from iterative_solver_tpu.array.offload_store import StreamedOffloadStore

        st = StreamedOffloadStore(4, 32, block_rows=2)
        s0 = st.append(np.ones(32))
        s1 = st.append(2 * np.ones(32))
        st.release(s0)
        x = jnp.asarray(np.ones((1, 32)))
        g = st.gram_block(x)
        assert abs(g[0, s0]) < 1e-14 and abs(g[0, s1] - 64.0) < 1e-10
        # grow with a hole in the validity mask keeps live data
        for i in range(6):
            st.append(np.full(32, float(i + 3)))
        g2 = st.gram_block(jnp.asarray(np.ones((1, 32))))
        assert abs(g2[0, s1] - 64.0) < 1e-10
        st.close()


def test_davidson_with_streamed_qstore(hamiltonians):
    # end-to-end: the parity Davidson solving through the STREAMED store
    # (offload="streamed", small blocks to force multi-block pipelines)
    # must hit the same acceptance band as the HBM-stack configuration
    from iterative_solver_tpu.array.offload_store import StreamedOffloadStore

    m = hamiltonians["bh"]
    n, nroots = m.shape[0], 2
    problem = its.models.MatrixProblem(m)
    solver = its.LinearEigensystemDavidson(
        n, nroots,
        offload=lambda capacity, nn, dtype, sharding, name="params":
            StreamedOffloadStore(capacity, nn, dtype=dtype, sharding=sharding,
                                 name=name, block_rows=3))
    solver.set_hermiticity(True)
    conv, x, r = solver.solve(np.zeros((nroots, n)), problem=problem,
                              generate_initial_guess=True)
    ref = np.linalg.eigvalsh(m)[:nroots]
    np.testing.assert_allclose(np.asarray(solver.eigenvalues()), ref, atol=1e-8)
    # and the string spelling wires the class
    s2 = its.LinearEigensystemDavidson(n, nroots, offload="streamed")
    assert isinstance(s2.xspace.store_v, StreamedOffloadStore)
