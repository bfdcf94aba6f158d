"""Worker process for the multi-host (multi-process) SPMD test.

Launched by test_multihost.py as N separate Python processes, each owning 4
virtual CPU devices, joined into one global mesh through
``jax.distributed.initialize`` (Gloo collectives between processes — the
functional stand-in for ICI/DCN). This is the runtime shape of the
reference's ``mpiexec -n N`` deployments (SURVEY.md §2.5): every process
holds the replicated operator, the vector axis is sharded over the GLOBAL
device mesh, and every Gram/dot reduction becomes a cross-process psum
inserted by GSPMD inside the one-dispatch fused solve.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints ``RESULT <iters> <eig_err> <max_resid>`` on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from iterative_solver_tpu.solvers.fused_davidson import (
        make_davidson_init,
        make_davidson_solve,
    )

    from iterative_solver_tpu.parallel import make_mesh

    assert len(jax.devices()) == 4 * nproc, "global mesh must span all processes"
    mesh = make_mesh(jax.devices())  # canonical 1-D ("data",) mesh

    n, nroots, m_max = 512, 4, 16
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)) * (0.05 / np.sqrt(n))
    mat = a + a.T + np.diag(np.linspace(0.0, 10.0, n))

    shard_cols = NamedSharding(mesh, P(None, "data"))
    mj = jax.device_put(jnp.asarray(mat), shard_cols)
    diag = jax.device_put(jnp.diagonal(jnp.asarray(mat)), NamedSharding(mesh, P("data")))

    prec = jax.lax.Precision.HIGHEST

    def matvec(x, op):
        return jnp.matmul(x, op.T, precision=prec)

    v0 = np.zeros((nroots, n))
    for row, i in enumerate(np.argsort(np.diag(mat))[:nroots]):
        v0[row, i] = 1.0
    v0j = jax.device_put(jnp.asarray(v0), shard_cols)

    init = make_davidson_init(matvec, nroots, m_max)
    solve = make_davidson_solve(matvec, nroots, m_max)
    final, iters = solve(init(v0j, mj), mj, diag, 1e-10, 200)
    evals = np.sort(np.asarray(jax.device_get(final.evals)))
    errors = np.asarray(jax.device_get(final.errors))
    ref = np.linalg.eigvalsh(mat)[:nroots]
    err = float(np.max(np.abs(evals - ref)))
    assert err < 1e-9, err
    assert float(errors.max()) <= 1e-10

    # phase 2: the production packed-triangle sharded action — tile pairs
    # interleaved over the CROSS-PROCESS mesh, all-gather halo +
    # psum_scatter reduction now riding the inter-process fabric
    from iterative_solver_tpu.ops.kernels.symm_pallas import SymmetricBlocked
    from iterative_solver_tpu.parallel.sharded_symm import ShardedSymmetric

    sym = SymmetricBlocked.from_dense(mat, b=32)
    ssym = ShardedSymmetric.from_symmetric(sym, mesh)
    smatvec, sop = ssym.matvec_fn()
    x = np.random.default_rng(1).standard_normal((3, n))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, ssym.axis)))
    y_sharded = jax.jit(smatvec)(xs, sop)
    # the output stays sharded ACROSS PROCESSES (each process holds only its
    # addressable shards) — re-replicate it to compare against the dense ref
    from jax.experimental import multihost_utils

    y = np.asarray(multihost_utils.process_allgather(y_sharded, tiled=True))
    packed_err = float(np.max(np.abs(y - x @ mat)))
    assert packed_err < 1e-10, packed_err

    # phase 3: the quantized sharded sparse action — the int8 halo
    # exchange + (m,) pmax activation scale riding the inter-process
    # fabric, partial int32 sums exact across processes
    from iterative_solver_tpu.ops.kernels.spmv_pallas import (
        BSRMatrix,
        BSRMatrixInt8,
        bsr_matmat_int8,
    )
    from iterative_solver_tpu.parallel.sharded_bsr import ShardedBSRInt8

    bsr = BSRMatrix.from_dense(mat, bm=16, bn=16, tol=0.0)
    bsr_q = BSRMatrixInt8.from_bsr(bsr)
    sq = ShardedBSRInt8.from_int8(bsr_q, mesh)
    q_matvec, q_operand = sq.matvec_fn()
    xq = jax.device_put(jnp.asarray(x, jnp.float32),
                        NamedSharding(mesh, P(None, sq.axis)))
    yq_sharded = jax.jit(q_matvec)(xq, q_operand)
    yq = np.asarray(multihost_utils.process_allgather(yq_sharded, tiled=True),
                    dtype=np.float64)
    y_ref = np.asarray(bsr_matmat_int8(jnp.asarray(x, jnp.float32), bsr_q),
                       dtype=np.float64)
    int8_err = float(np.max(np.abs(yq - y_ref)))
    int8_scale = max(float(np.max(np.abs(y_ref))), 1.0)
    assert int8_err <= 1e-4 * int8_scale, (int8_err, int8_scale)

    # phase 4 (round 4): the single-dispatch device-RR non-hermitian
    # solve across processes — batched shifted solves, chol-whitening,
    # in-loop restarts and the gated global selection all riding the
    # inter-process fabric; every process must see the identical
    # replicated eigenvalues
    from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

    mat_ns = np.asarray(mat, dtype=np.float64).copy()
    mat_ns[np.tril_indices(mat_ns.shape[0], -1)] *= 0.9
    ns_op = jax.device_put(jnp.asarray(mat_ns, jnp.float32),
                           NamedSharding(mesh, P("data", None)))

    def ns_matvec(v, op):
        return jnp.matmul(v, op.T, precision=jax.lax.Precision.HIGHEST)

    ns = FusedNonSymDavidson(
        ns_matvec, np.diag(mat_ns), mat_ns.shape[0], 2, m_max=10,
        sharding=NamedSharding(mesh, P(None, "data")), operand=ns_op,
        convergence_threshold=5e-5, max_iter=60, rr="device",
        dtype=jnp.float32)
    v0ns = np.zeros((2, mat_ns.shape[0]))
    for row, i in enumerate(np.argsort(np.diag(mat_ns))[:2]):
        v0ns[row, i] = 1.0
    evns, _xns, errns, _itns = ns.solve(v0ns)
    assert np.all(errns <= 5e-5), errns
    ns_ev0 = float(np.sort(np.asarray(evns).real)[0])

    print(f"RESULT {int(iters)} {err:.3e} {errors.max():.3e} {packed_err:.3e} "
          f"{int8_err:.3e} {ns_ev0:.6e}",
          flush=True)


if __name__ == "__main__":
    main()
