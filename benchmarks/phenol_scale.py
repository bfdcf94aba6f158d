"""Phenol-scale composition leg (VERDICT r2 next #4).

The reference's flagship large case (phenol.hamiltonian,
test_LinearEigensystem.cpp:352) is stripped from this mount
(.MISSING_LARGE_BLOBS), so this leg composes the round-2/3 stack at the
scale that case represents with a synthetic stand-in of the same
structural character: n >= 2^20, ~10^9 nnz of block-sparse couplings
over a dominant gapped diagonal.

The composition under test — every tier at once:

  int8 quantized BSR action (exact-diagonal split + equilibration,
  ops/kernels/spmv_pallas.BSRMatrixInt8)
    -> BandedEigensolver(deflate="streamed") — bands locked through the
       offload store, windowed hard deflation (solvers/banded.py)
    -> EigenpairRefiner — host-f64 Rayleigh-Ritz + deflated FusedBlockCG
       corrections THROUGH the same int8 device operator, to the
       reference's 1e-8 residual bar (solvers/refine.py)

Two scale-driven design choices (this host moves GB-scale numpy at only
tens of MB/s — measured):

- no dense intermediate anywhere (a dense n=2^20 matrix is 4 TB);
- the coupling planes are generated DIRECTLY as int8 under constant
  equilibration vectors, so the stored operator is exactly int8-valued
  and the multi-pass f64 quantization sweep (minutes per GB here) is
  skipped. The device tier stays honestly lossy — every action
  quantizes the ACTIVATIONS (quantize_rows) and runs f32 — so the
  banded stage floors near 1e-3 and the refiner climbs the remaining
  five orders against the exact f64 anchor, same as it would for a
  float-valued operator.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_int8_bsr_direct(n: int, block: int = 128,
                              pairs_per_row: int = 4, n_low: int = 64,
                              coupling: float = 0.05, seed: int = 0):
    """Direct int8 BSR generation: dominant gapped f64 diagonal + symmetric
    int8 coupling blocks whose density decays with block distance.

    Returns ``(bsr_q_host, diag_f64, s_scale)`` where ``bsr_q_host`` is a
    BSRMatrixInt8 with NUMPY fields (ship to device selectively) and the
    true operator is  A = diag + (s/127) * Q  on the stored topology."""
    from iterative_solver_tpu.ops.kernels.spmv_pallas import (
        BSRMatrixInt8,
        check_int8_accum_headroom,
    )

    rng = np.random.default_rng(seed)
    assert n % block == 0
    nb = n // block
    diag = np.concatenate(
        [np.linspace(-2.0, 3.0, n_low), np.linspace(6.0, 50.0, n - n_low)]
    ).astype(np.float64)

    # topology: per block-row, a few lower neighbours at geometric offsets
    # (coupling density decays with diagonal separation, like an FCI matrix)
    rb = np.repeat(np.arange(nb), pairs_per_row)
    d = rng.geometric(0.25, size=rb.size)
    cb = rb - d
    keep = cb >= 0
    pairs = np.unique(rb[keep] * nb + cb[keep])
    prb = (pairs // nb).astype(np.int32)
    pcb = (pairs % nb).astype(np.int32)
    npair = prb.size

    q_off = rng.integers(-127, 128, size=(npair, block, block), dtype=np.int8)
    q_diag = rng.integers(-127, 128, size=(nb, block, block), dtype=np.int8)
    # symmetric diagonal blocks with ZERO diagonal entries (the exact
    # diagonal is split out)
    q_diag = np.triu(q_diag, 1)
    q_diag = q_diag + q_diag.transpose(0, 2, 1)

    rows = np.concatenate([np.arange(nb, dtype=np.int32), prb, pcb])
    cols = np.concatenate([np.arange(nb, dtype=np.int32), pcb, prb])
    q_all = np.concatenate([q_diag, q_off, q_off.transpose(0, 2, 1)])
    order = np.argsort(rows, kind="stable")
    rows = rows[order]
    cols = cols[order]
    q_all = q_all[order]
    row_ptr = np.zeros(nb + 1, dtype=np.int32)
    np.cumsum(np.bincount(rows, minlength=nb), out=row_ptr[1:])

    s = coupling / np.sqrt(block)        # max |coupling| magnitude
    sqrt127 = float(np.sqrt(127.0))
    # dequant convention (BSRMatrixInt8): a_ij = rq_i q_ij cq_j with the
    # 1/sqrt(127) factors folded into rq/cq -> rq=cq=sqrt(s)/sqrt(127)
    # gives a_ij = q_ij * s / 127 in [-s, s]
    v = np.full(n, np.sqrt(s) / sqrt127, dtype=np.float32)
    # direct construction bypasses from_bsr — run its headroom guard here
    check_int8_accum_headroom(rows, block, context="phenol_scale")
    bsr_q = BSRMatrixInt8(
        q=q_all, rq=v, cq=v.copy(), col_idx=cols, row_idx=rows,
        row_ptr=row_ptr, shape=(n, n), bm=block, bn=block,
        diagonal=diag.astype(np.float32),
    )
    return bsr_q, diag, s


def host_f64_action(bsr_q, diag_f64: np.ndarray, s: float,
                    chunk: int = 4096):
    """Exact f64 action  y = x diag + (s/127) x Q^T  — the refiner's
    accuracy anchor. The int8 blocks convert to f64 ONCE (8 bytes/nnz
    resident; this host's conversion rate makes per-call conversion the
    dominant cost otherwise)."""
    rows = np.asarray(bsr_q.row_idx)
    cols = np.asarray(bsr_q.col_idx)
    nb = bsr_q.shape[0] // bsr_q.bm
    vals64 = np.asarray(bsr_q.q, dtype=np.float64)
    scale = s / 127.0

    def action(x: np.ndarray) -> np.ndarray:
        m = x.shape[0]
        xt = np.ascontiguousarray(
            x.reshape(m, nb, bsr_q.bn).transpose(1, 0, 2), dtype=np.float64)
        y = np.zeros((nb, m, bsr_q.bm))
        for st in range(0, rows.size, chunk):
            sl = slice(st, st + chunk)
            contrib = np.matmul(xt[cols[sl]], vals64[sl].transpose(0, 2, 1))
            np.add.at(y, rows[sl], contrib)
        out = y.transpose(1, 0, 2).reshape(m, nb * bsr_q.bm) * scale
        return out + x * diag_f64[None, :]

    return action


def make_device_int8_matvec(bm, bn, n_rb):
    """matvec(x, operand) with the operand as TRACED arrays (closure
    constants would ship in the remote-compile payload -> HTTP 413)."""
    import jax.numpy as jnp

    from iterative_solver_tpu.ops.kernels.spmv_pallas import _bsr_matmat_int8_xla
    from iterative_solver_tpu.ops.kernels.symm_int8 import quantize_rows

    def matvec(x, op):
        q, rq, cq, dg, col_idx, row_idx = op
        xf = x.astype(jnp.float32)
        qx, sx = quantize_rows(xf * cq[None, :])
        acc = _bsr_matmat_int8_xla(qx, q, col_idx, row_idx, bm, bn, n_rb)
        y = acc.astype(jnp.float32) * sx * rq[None, :] + xf * dg[None, :]
        return y.astype(x.dtype)

    return matvec


def leg_phenol_scale(R: dict, n: int = 1 << 20, nroots: int = 16,
                     band: int = 8, tol_band: float = 2e-3,
                     tol_final: float = 1e-8) -> None:
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.banded import BandedEigensolver
    from iterative_solver_tpu.solvers.refine import EigenpairRefiner

    t_setup = time.perf_counter()
    bsr_q, diag, s = synthetic_int8_bsr_direct(n)
    n_rb = n // bsr_q.bm
    operand = (
        jnp.asarray(bsr_q.q), jnp.asarray(bsr_q.rq), jnp.asarray(bsr_q.cq),
        jnp.asarray(bsr_q.diagonal), jnp.asarray(bsr_q.col_idx),
        jnp.asarray(bsr_q.row_idx),
    )
    matvec = make_device_int8_matvec(bsr_q.bm, bsr_q.bn, n_rb)
    wall_setup = time.perf_counter() - t_setup

    t_solve = time.perf_counter()
    solver = BandedEigensolver(
        matvec, diag, n, band=band, m_max=4 * band, dtype=jnp.float32,
        convergence_threshold=tol_band, max_iter=200, operand=operand,
        deflate="streamed", store_block_rows=band,
    )
    vals, vecs, errs = solver.solve(nroots)
    wall_solve = time.perf_counter() - t_solve

    t_refine = time.perf_counter()
    refiner = EigenpairRefiner(
        host_f64_action(bsr_q, diag, s), matvec, operand, diag, n, nroots,
        dtype=jnp.float32, cg_max_iter=600,
    )
    out = refiner.refine(np.asarray(vecs, dtype=np.float64), tol=tol_final,
                         max_passes=6)
    wall_refine = time.perf_counter() - t_refine

    R.update({
        "phenol_n": n,
        "phenol_nnz": int(bsr_q.q.shape[0] * bsr_q.bm * bsr_q.bn),
        "phenol_roots": nroots,
        "phenol_setup_wall_s": round(wall_setup, 1),
        "phenol_band_wall_s": round(wall_solve, 1),
        "phenol_band_max_residual_int8": float(np.max(errs)),
        "phenol_refine_wall_s": round(wall_refine, 1),
        "phenol_refine_passes": int(out.passes),
        "phenol_max_residual_f64": float(out.residual_norms.max()),
        "phenol_tol": tol_final,
        "phenol_converged": bool(out.converged),
        "phenol_wall_s": round(wall_setup + wall_solve + wall_refine, 1),
    })


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--nroots", type=int, default=16)
    args = ap.parse_args()
    R: dict = {}
    leg_phenol_scale(R, n=args.n, nroots=args.nroots)
    print(json.dumps(R, indent=1))
