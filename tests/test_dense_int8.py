"""Quantized DENSE operator tiers for the non-symmetric families
(ops/kernels/dense_int8.py): two-sided equilibration + exact diagonal,
one-plane and two-plane split. The packed int8 tiers (symm_int8) need
symmetry; these do not.

Floors scale with the coupling magnitude: the solver residual floor
EQUALS the action noise (one-plane ~ gr gc/254, two-plane ~ activation
split error 2^-16-class x ||A||) — asserted below.
"""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from iterative_solver_tpu.ops.kernels.dense_int8 import (
    DenseInt8,
    DenseInt8Split,
    dense_int8_matvec,
    dense_int8_matvec_split,
)
from iterative_solver_tpu.solvers.fused_nonsym import (
    FusedNonSymDavidson,
    FusedNonSymLinearEquations,
)


def make_op(n=400, strength=0.15, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    m = a + a.T + np.diag(np.linspace(1.0, 20.0, n))
    m[np.tril_indices(n, -1)] *= 1.0 - strength
    return m


class TestQuantizedAction:
    def test_one_plane_action_error_class(self):
        m = make_op()
        rng = np.random.default_rng(1)
        x = rng.standard_normal((6, m.shape[0]))
        ref = x @ m.T
        y = np.asarray(dense_int8_matvec(
            jnp.asarray(x, jnp.float32), DenseInt8.from_dense(m).tree()),
            np.float64)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 3e-4, rel          # bf16 class
        assert rel > 1e-7               # honestly lossy

    def test_two_plane_action_error_class(self):
        m = make_op()
        rng = np.random.default_rng(1)
        x = rng.standard_normal((6, m.shape[0]))
        ref = x @ m.T
        y = np.asarray(dense_int8_matvec_split(
            jnp.asarray(x, jnp.float32), DenseInt8Split.from_dense(m).tree()),
            np.float64)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 5e-6, rel          # split-bf16 class

    def test_exact_diagonal_preserved(self):
        """Diagonal entries bypass quantization entirely: a diagonal
        operator acts exactly (up to f32)."""
        d = np.linspace(-3.0, 25.0, 64)
        m = np.diag(d)
        x = np.eye(64)
        y = np.asarray(dense_int8_matvec(
            jnp.asarray(x, jnp.float32), DenseInt8.from_dense(m).tree()),
            np.float64)
        np.testing.assert_allclose(y, np.diag(d), atol=1e-5)

    def test_rejects_oversized_operator(self):
        # int32 headroom caps one-plane at ~1.3e5 columns; the guard fires
        # at from_dense time (building a real >130k dense matrix is not a
        # unit-test job, so exercise the shared validator both tiers call)
        from iterative_solver_tpu.ops.kernels.symm_int8 import (
            _check_acc_headroom,
        )

        with pytest.raises(ValueError, match="headroom"):
            _check_acc_headroom(200000, 200000, 1, "DenseInt8")
        with pytest.raises(ValueError, match="headroom"):
            _check_acc_headroom(100000, 100000, 2, "DenseInt8Split")


class TestQuantizedSolves:
    def test_int8_precise_eigen_converges_at_floor(self):
        m = make_op()
        r = 4
        ref = np.sort(scipy.linalg.eigvals(m).real)[:r]
        v0 = np.zeros((r, m.shape[0]))
        for i, j in enumerate(np.argsort(np.diag(m))[:r]):
            v0[i, j] = 1.0
        for rrm in ("host", "device"):
            s = FusedNonSymDavidson.from_dense(
                m, r, tier="int8_precise", dtype=jnp.float32,
                convergence_threshold=5e-5, max_iter=120, rr=rrm)
            ev, x, errs, it = s.solve(v0)
            assert errs.max() <= 5e-5, (rrm, errs)
            assert it < 60, (rrm, it)
            assert np.max(np.abs(np.sort(np.asarray(ev).real)
                                 - ref[: len(ev)])) < 1e-4, rrm

    def test_int8_one_plane_floor_is_action_noise(self):
        m = make_op()
        r = 4
        v0 = np.zeros((r, m.shape[0]))
        for i, j in enumerate(np.argsort(np.diag(m))[:r]):
            v0[i, j] = 1.0
        s = FusedNonSymDavidson.from_dense(
            m, r, tier="int8", dtype=jnp.float32,
            convergence_threshold=1e-8, max_iter=40, rr="device")
        ev, x, errs, it = s.solve(v0)
        # floors at the one-plane action noise, far above tol but sane
        assert 1e-6 < errs.max() < 1e-3, errs
        ref = np.sort(scipy.linalg.eigvals(m).real)[:r]
        assert np.max(np.abs(np.sort(np.asarray(ev).real)
                             - ref[: len(ev)])) < 5e-3

    def test_int8_precise_lineq(self):
        m = make_op(seed=3)
        rng = np.random.default_rng(4)
        b = rng.standard_normal((3, m.shape[0]))
        s = FusedNonSymLinearEquations.from_dense(
            m, 3, tier="int8_precise", dtype=jnp.float32,
            convergence_threshold=1e-5, max_iter=120, rr="device")
        x, errs, it = s.solve(b)
        assert np.max(errs) <= 1e-5, errs
        refx = np.linalg.solve(m, b.T).T
        rel = (np.linalg.norm(np.asarray(x, np.float64) - refx)
               / np.linalg.norm(refx))
        assert rel < 5e-5, rel

    def test_bad_tier_raises(self):
        with pytest.raises(ValueError, match="tier must be"):
            FusedNonSymDavidson.from_dense(np.eye(8), 2, tier="wat")
        with pytest.raises(ValueError, match="tier must be"):
            FusedNonSymLinearEquations.from_dense(np.eye(8), 2, tier="wat")


def test_sharded_int8_device_rr_solve():
    """The int8 tiers shard through GSPMD with no dedicated kernel: q
    row-sharded via .shard(), matvec pure jnp, device-RR solve over an
    8-device mesh matches dense eig."""
    import jax
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(jax.devices()), ("data",))
    m = make_op(n=512, seed=9)
    r = 3
    op = DenseInt8Split.from_dense(m)
    sol = FusedNonSymDavidson(
        lambda x, t: dense_int8_matvec_split(x, t), np.diag(m), m.shape[0],
        r, m_max=12, sharding=NamedSharding(mesh, P(None, "data")),
        operand=op.shard(mesh), convergence_threshold=5e-5, max_iter=100,
        rr="device", dtype=jnp.float32)
    v0 = np.zeros((r, m.shape[0]))
    for i, j in enumerate(np.argsort(np.diag(m))[:r]):
        v0[i, j] = 1.0
    ev, x, errs, it = sol.solve(v0)
    assert errs.max() <= 5e-5, errs
    ref = np.sort(scipy.linalg.eigvals(m).real)[:r]
    assert np.max(np.abs(np.sort(np.asarray(ev).real)
                         - ref[: len(ev)])) < 1e-4


def test_batched_nonsym_with_int8_trees():
    """The quantized tiers compose with the batched factory: int8 operand
    trees stacked on a leading batch axis vmap through the sweep solve
    (the matvec is pure jnp) — three systems converge to their own dense
    spectra at the two-plane floor."""
    from iterative_solver_tpu.solvers.fused_nonsym import (
        finalize_nonsym_batch,
        make_batched_nonsym_solve,
    )

    B, n, r = 3, 200, 2
    rng = np.random.default_rng(0)
    ops, diags, v0s, refs = [], [], [], []
    for b in range(B):
        a = rng.standard_normal((n, n)) * (0.04 / np.sqrt(n))
        m = a + a.T + np.diag(np.linspace(1.0 + 0.3 * b, 18.0, n))
        m[np.tril_indices(n, -1)] *= 0.9
        ops.append(DenseInt8Split.from_dense(m))
        diags.append(np.diag(m).copy())
        v0 = np.zeros((r, n))
        for i, j in enumerate(np.argsort(np.diag(m))[:r]):
            v0[i, j] = 1.0
        v0s.append(v0)
        refs.append(np.sort(scipy.linalg.eigvals(m).real)[:r])
    tree_b = tuple(jnp.stack([op.tree()[i] for op in ops])
                   for i in range(5))
    v0_b = jnp.asarray(np.stack(v0s), jnp.float32)
    diag_b = jnp.asarray(np.stack(diags), jnp.float32)
    binit, bsolve = make_batched_nonsym_solve(
        lambda x, t: dense_int8_matvec_split(x, t), r, 10)
    state = binit(v0_b, tree_b)
    out = bsolve(*state, tree_b, diag_b, 5e-4, 100)
    evals, x_rot, errors = finalize_nonsym_batch(out[3], out[4], out[5])
    for b in range(B):
        assert np.max(errors[b]) <= 5e-4, (b, errors[b])
        ev = np.sort(np.asarray(evals[b]).real)
        assert np.max(np.abs(ev - refs[b][: len(ev)])) <= 1e-3, b
