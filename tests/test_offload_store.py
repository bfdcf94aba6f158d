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
