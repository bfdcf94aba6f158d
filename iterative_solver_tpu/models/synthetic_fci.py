"""Deterministic synthetic FCI-style Hamiltonians.

The reference's large benchmark case (phenol.hamiltonian) is stripped from
this mount (.MISSING_LARGE_BLOBS), so scale testing uses a generator with
the same structural character: a dominant diagonal spanning a wide energy
range with a gapped low-lying block (the states Davidson hunts), and sparse
block-structured off-diagonal coupling that decays with diagonal separation
— the signature of a determinant-space Hamiltonian in a compact basis.
"""

from __future__ import annotations

import numpy as np


def synthetic_fci_dense(
    n: int,
    n_low: int = 32,
    coupling: float = 0.05,
    seed: int = 0,
) -> np.ndarray:
    """Dense synthetic FCI matrix (symmetric, f64)."""
    rng = np.random.default_rng(seed)
    n_low = min(n_low, n // 2)
    diag = np.concatenate(
        [np.linspace(-2.0, 3.0, n_low), np.linspace(6.0, 50.0, n - n_low)]
    )
    a = rng.standard_normal((n, n)) * (coupling / np.sqrt(n))
    # decay coupling with diagonal separation (FCI matrix elements vanish
    # between energetically remote determinants)
    sep = np.abs(diag[:, None] - diag[None, :])
    a = a * np.exp(-0.05 * sep)
    return a + a.T + np.diag(diag)


def synthetic_fci_bsr(
    n: int,
    block: int = 128,
    density: float = 0.15,
    n_low: int = 32,
    seed: int = 0,
    dtype=None,
):
    """Block-sparse synthetic FCI operator (BSRMatrix) + its dense equivalent.

    Block-sparsity mimics symmetry-blocked determinant classes: diagonal
    blocks always present, off-diagonal blocks kept with probability
    ``density`` decaying with block distance.
    """
    from ..ops.kernels.spmv_pallas import BSRMatrix

    rng = np.random.default_rng(seed)
    assert n % block == 0
    nb = n // block
    n_low = min(n_low, n // 2)
    diag = np.concatenate(
        [np.linspace(-2.0, 3.0, n_low), np.linspace(6.0, 50.0, n - n_low)]
    )
    dense = np.diag(diag)
    for rb in range(nb):
        for cb in range(rb + 1):
            keep = rb == cb or rng.random() < density * np.exp(-0.3 * (rb - cb))
            if keep:
                blk = rng.standard_normal((block, block)) * (0.05 / np.sqrt(block))
                if rb == cb:
                    blk = 0.5 * (blk + blk.T)
                    dense[rb * block:(rb + 1) * block, cb * block:(cb + 1) * block] += blk
                else:
                    dense[rb * block:(rb + 1) * block, cb * block:(cb + 1) * block] += blk
                    dense[cb * block:(cb + 1) * block, rb * block:(rb + 1) * block] += blk.T
    bsr = BSRMatrix.from_dense(dense, bm=block, bn=block, tol=0.0, dtype=dtype)
    return bsr, dense


def synthetic_packed_int8(n: int, b: int = 1024, seed: int = 0,
                          diag=None, coupling: float = 0.05,
                          chunk_tiles: int = 32):
    """Generate a packed one-plane int8 symmetric operator DIRECTLY — no
    dense f64 intermediate.

    The dense build of the n=32768 flagship operator costs ~10 minutes of
    host time (8.6 GB of GB-scale numpy at tens of MB/s, CLAUDE.md gotcha)
    — far over the driver's bench wall. This generator emits the exact
    ``SymmetricBlockedInt8`` layout (q tiles, uniform equilibration, exact
    diagonal) in seconds, the same honesty trade as the phenol leg's
    direct-int8 BSR (activation quantization keeps the device tier
    honestly lossy). The implied dense operator is

        A = diag(d) + E,   E[bi*b+u, bj*b+v] = gq^2 * q_pair(bi,bj)[u, v]

    with q drawn from a clipped discrete gaussian matching what
    ``from_dense`` produces for equilibrated iid couplings, and gq chosen
    so sd(E_ij) = coupling/sqrt(n) (the bench spectrum class). Pair tiles
    on the block diagonal are symmetrised with a zero diagonal, so E is
    exactly symmetric.

    Returns ``(sym, diag)`` where ``sym`` is a SymmetricBlockedInt8.
    """
    import jax.numpy as jnp

    from ..ops.kernels.symm_int8 import SymmetricBlockedInt8, _check_acc_headroom

    if n % b:
        raise ValueError("n must be a multiple of b for the direct generator")
    # same exact-int32 accumulation guard as from_dense: beyond ~133k
    # columns the one-plane kernel's worst-case dot wraps silently
    _check_acc_headroom(n, b, 1, "synthetic_packed_int8")
    nb = n // b
    iis, jjs = np.tril_indices(nb)
    npairs = iis.size
    rng = np.random.default_rng(seed)
    # sd(q) ~ 127/4.5: the range an equilibrated (g = sqrt(rowmax))
    # gaussian coupling matrix fills after round(127 * B)
    sd_q = 127.0 / 4.5
    q = np.empty((npairs, b, b), dtype=np.int8)
    for start in range(0, npairs, chunk_tiles):
        stop = min(start + chunk_tiles, npairs)
        blk = rng.standard_normal((stop - start, b, b)).astype(np.float32)
        blk *= sd_q
        np.rint(blk, out=blk)
        np.clip(blk, -127, 127, out=blk)
        q[start:stop] = blk.astype(np.int8)
    # symmetrise the block-diagonal pairs (zero diagonal: d is exact)
    for p in np.nonzero(iis == jjs)[0]:
        t = np.tril(q[p], -1)
        q[p] = t + t.T
    gq2 = coupling / (np.sqrt(float(n)) * sd_q)
    gq = np.full(n, np.sqrt(gq2), dtype=np.float32)
    if diag is None:
        diag = np.concatenate(
            [np.linspace(-2.0, 3.0, min(64, n)),
             np.linspace(6.0, 50.0, n - min(64, n))])
    diag = np.asarray(diag, dtype=np.float64)
    sym = SymmetricBlockedInt8(
        q=jnp.asarray(q),
        gq=jnp.asarray(gq),
        ii=jnp.asarray(iis.astype(np.int32)),
        jj=jnp.asarray(jjs.astype(np.int32)),
        shape=(n, n),
        b=b,
        diagonal=jnp.asarray(diag, dtype=jnp.float32),
    )
    return sym, diag


def implied_dense_int8(sym, diag) -> np.ndarray:
    """The exact dense operator a packed one-plane int8 structure implies:
    A = diag(d) + E with E[bi*b+u, bj*b+v] = gq_i gq_j q_pair(bi,bj)[u, v].
    The single source of the dequantization contract for validation
    (tests + dryrun check solves against this; keeping one copy means the
    kernel layout and its checkers cannot drift apart)."""
    n, b = sym.shape[0], sym.b
    q = np.asarray(sym.q, dtype=np.float64)
    gq = np.asarray(sym.gq, dtype=np.float64)
    ii = np.asarray(sym.ii)
    jj = np.asarray(sym.jj)
    a = np.diag(np.asarray(diag, dtype=np.float64))
    for p in range(q.shape[0]):
        bi, bj = int(ii[p]), int(jj[p])
        blk = (gq[bi * b:(bi + 1) * b, None]
               * gq[None, bj * b:(bj + 1) * b] * q[p])
        if bi == bj:
            a[bi * b:(bi + 1) * b, bi * b:(bi + 1) * b] += blk
        else:
            a[bi * b:(bi + 1) * b, bj * b:(bj + 1) * b] += blk
            a[bj * b:(bj + 1) * b, bi * b:(bi + 1) * b] += blk.T
    return a
