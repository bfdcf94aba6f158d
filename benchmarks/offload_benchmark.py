"""Streamed offload tier (BufferManager analogue) measured on the device.

VERDICT r2 next #2: drive ``StreamedOffloadStore.gram/combine`` at a
history size far beyond the round-2 toy tests (>=256 rows at n>=65536),
comparing three configurations:

- ``prefetch=True``  — the production three-deep pipeline
  (disk read k+2 || H2D copy k+1 || MXU matmul k);
- ``prefetch=False`` — the same blocks fully serialised (each stage waits);
- host ``OffloadBasisStore.gram`` — the reference-style host-CPU dgemm
  against the same stored rows (BufferManager.h:136-173 consumed by
  gemm.h:100-152).

The sandbox caveat this benchmark measures INSTEAD OF HIDING: the TPU is
reached through a network tunnel whose H2D bandwidth is ~20 MB/s (probed
and reported as ``h2d_MBps``), ~3 orders of magnitude below a co-located
host's PCIe/DMA. Through such a link the H2D stage dominates every other
stage, so the three-deep overlap can only hide the (fast) disk reads and
the (tiny) MXU time — the measured overlap factor quantifies exactly
that — and the host-CPU gram wins outright on wall clock. On co-located
hardware the same pipeline is disk-bound and the conclusion flips; the
pipeline structure, not this sandbox's link, is what the tier ships.

Also runs a ``BandedEigensolver(deflate="streamed")`` solve whose locked
history exceeds the configured device-resident budget (window + block
stream), proving the beyond-budget configuration end-to-end.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def h2d_probe(mb: int = 32) -> float:
    """MB/s of one host->device transfer, true-synced by a host fetch."""
    import jax

    a = np.zeros((mb * 1024 * 1024 // 4,), dtype=np.float32)
    jax.device_put(a[: 1024]).block_until_ready()  # warm the path
    t0 = time.perf_counter()
    d = jax.device_put(a)
    _ = np.asarray(d[:2])  # only a host fetch truly syncs the tunnel
    return mb / (time.perf_counter() - t0)


def run_offload_benchmark(n: int = 65536, rows: int = 256, block_rows: int = 64,
                          m: int = 16, repeats: int = 3) -> dict:
    """Returns a dict of walls + factors (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.array.offload_store import (
        OffloadBasisStore,
        StreamedOffloadStore,
    )

    dtype = (jnp.float32 if jax.default_backend() != "cpu"
             else (jnp.float64 if jax.config.read("jax_enable_x64")
                   else jnp.float32))
    rng = np.random.default_rng(0)
    history = rng.standard_normal((rows, n)).astype(np.float32)

    stream = StreamedOffloadStore(capacity=rows, n=n, dtype=dtype,
                                  block_rows=block_rows, name="bench")
    host = OffloadBasisStore(capacity=rows, n=n, name="bench_host")
    slots_s = [stream.append(history[i]) for i in range(rows)]
    slots_h = [host.append(history[i]) for i in range(rows)]

    x = rng.standard_normal((m, n)).astype(np.float32)
    xd = jnp.asarray(x, dtype=dtype)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    def overlap_factors(pre_fn, ser_fn):
        """>=3 interleaved (pipelined, serial) repetitions -> the per-rep
        overlap factors. A single-rep ratio of two multi-second walls whose
        denominator is a 20-30 MB/s tunnel is noise-dominated (VERDICT r3
        weak #4: builder windows saw 1.16/1.99/2.44; a driver window saw
        1.001) — interleaving puts tunnel drift on BOTH sides of each
        ratio, and min/med/max makes the spread part of the artifact."""
        pres, sers, facs = [], [], []
        last = (None, None)
        for _ in range(max(3, repeats)):
            w_p, g_p = timed(pre_fn)
            w_s, g_s = timed(ser_fn)
            pres.append(w_p)
            sers.append(w_s)
            facs.append(w_s / w_p)
            last = (g_p, g_s)
        return min(pres), min(sers), sorted(facs), last

    # warm compiles outside the clock
    np.asarray(stream.gram(xd, slots_s[: 2 * block_rows]))
    wall_pre, wall_ser, gfacs, (g_pre, g_ser) = overlap_factors(
        lambda: stream.gram(xd, slots_s, prefetch=True),
        lambda: stream.gram(xd, slots_s, prefetch=False),
    )
    wall_host = float("inf")
    g_host = None
    for _ in range(repeats):
        w, g_host = timed(lambda: host.gram(x, slots_h))
        wall_host = min(wall_host, w)

    # numerics agree across the three paths (f32 stream vs f64 host)
    scale = max(1.0, float(np.abs(g_host).max()))
    err = max(
        float(np.abs(np.asarray(g_pre) - g_host).max()),
        float(np.abs(np.asarray(g_ser) - g_host).max()),
    ) / scale

    coeff = rng.standard_normal((m, rows))
    stream.combine(coeff, slots_s)  # warm
    wall_cpre, wall_cser, cfacs, _ = overlap_factors(
        lambda: np.asarray(stream.combine(coeff, slots_s, prefetch=True)[:, :2]),
        lambda: np.asarray(stream.combine(coeff, slots_s, prefetch=False)[:, :2]),
    )

    def mmm(facs, prefix):
        return {
            f"{prefix}_min": round(facs[0], 3),
            f"{prefix}_med": round(facs[len(facs) // 2], 3),
            f"{prefix}_max": round(facs[-1], 3),
        }

    out = {
        "offload_n": n,
        "offload_rows": rows,
        "offload_block_rows": block_rows,
        "offload_stream_MB": round(rows * n * 4 / 1e6, 1),
        "offload_h2d_MBps": round(h2d_probe(), 1),
        "offload_gram_stream_s": round(wall_pre, 3),
        "offload_gram_serial_s": round(wall_ser, 3),
        "offload_gram_host_s": round(wall_host, 3),
        "offload_overlap_factor": round(gfacs[len(gfacs) // 2], 3),
        "offload_vs_host": round(wall_host / wall_pre, 3),
        "offload_combine_stream_s": round(wall_cpre, 3),
        "offload_combine_serial_s": round(wall_cser, 3),
        "offload_combine_overlap_factor": round(cfacs[len(cfacs) // 2], 3),
        "offload_gram_rel_err": err,
        **mmm(gfacs, "offload_overlap_factor"),
        **mmm(cfacs, "offload_combine_overlap_factor"),
    }
    stream.close() if hasattr(stream, "close") else None
    return out


def run_beyond_budget_banded(n: int = 32768, nroots: int = 16, band: int = 4,
                             tol: float = 1e-4) -> dict:
    """BandedEigensolver streamed solve whose locked history exceeds the
    device-resident budget: only the deflation window (band rows) + one
    stream block ever sit in HBM, while the locked history grows to
    ``nroots`` rows in the store."""
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.banded import BandedEigensolver

    rng = np.random.default_rng(1)
    # block-sparse couplings keep the host setup cheap at n=32768
    nlow = 2 * nroots
    d = np.concatenate([np.linspace(-3.0, 0.0, nlow),
                        np.linspace(2.0, 20.0, n - nlow)])
    ncol = 256  # dense low block + sparse tail keeps the action honest
    a = rng.standard_normal((ncol, n)).astype(np.float32) * (0.02 / np.sqrt(n))
    blk = a @ a.T

    dj = jnp.asarray(d, jnp.float32)
    aj = jnp.asarray(a)

    def matvec(x, op):
        aj_, dj_ = op
        # A = d + P a^T a P^T restricted: couple the first ncol coordinates
        xa = jnp.matmul(x[:, :ncol], jnp.matmul(aj_, aj_.T,
                                                precision=jax.lax.Precision.HIGHEST),
                        precision=jax.lax.Precision.HIGHEST)
        y = x * dj_[None, :]
        return y.at[:, :ncol].add(xa)

    diag = d.copy()
    diag[:ncol] += np.diag(blk)

    solver = BandedEigensolver(
        matvec, diag, n, band=band, m_max=4 * band, dtype=jnp.float32,
        convergence_threshold=tol, max_iter=400, operand=(aj, dj),
        deflate="streamed", store_block_rows=band,
    )
    t0 = time.perf_counter()
    vals, vecs, errs = solver.solve(nroots)
    wall = time.perf_counter() - t0

    # dense f64 reference on the coupled block (the rest is diagonal)
    dense_blk = blk.astype(np.float64) + np.diag(d[:ncol])
    ref_low = np.linalg.eigvalsh(dense_blk)
    ref = np.sort(np.concatenate([ref_low, d[ncol:]]))[:nroots]
    resident_mb = (band + 2 * band) * n * 4 / 1e6  # window + active band stacks
    history_mb = nroots * n * 4 / 1e6
    return {
        "banded_stream_n": n,
        "banded_stream_roots": nroots,
        "banded_stream_wall_s": round(wall, 2),
        "banded_stream_max_residual": float(np.max(errs)),
        "banded_stream_max_eval_err": float(np.max(np.abs(vals - ref))),
        "banded_stream_resident_MB": round(resident_mb, 2),
        "banded_stream_history_MB": round(history_mb, 2),
        "banded_stream_converged": bool(np.max(errs) <= 10 * tol),
    }


if __name__ == "__main__":
    import json

    out = run_offload_benchmark()
    out.update(run_beyond_budget_banded())
    print(json.dumps(out, indent=1))
