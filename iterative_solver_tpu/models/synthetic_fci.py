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
