"""Cheap symmetry probe for the fused solver families.

The fused production solvers (FusedDavidson / FusedPPCG /
FusedLinearEquations / FusedBlockCG) are symmetric-operator designs: their
Rayleigh-Ritz, CG and refinement algebra all assume <u, Av> == <Au, v>.
The reference supports non-hermitian problems end-to-end through its parity
path (LinearEigensystemDavidson.h:130-184, complex-pair rotation in
helper-implementation.h:318-417) — and so does this package's parity twin
(`solvers.linear_eigensystem`, hermitian=False).  Feeding a non-symmetric
operator to a fused solver used to produce silently wrong answers; this
probe makes it a loud, early error pointing at the right solver.

Mechanics: two random row-blocks U, V (the solver's compiled matvec shape,
so the probe re-uses the jit cache), one contraction each way, compared in
host f64 against a norm-based scale.  The 1e-2 relative tolerance passes
every legitimate tier (bf16 matvec asymmetry is O(sqrt(N)*eps_bf16) ~ 2e-3
worst case; packed-triangle kernels are exactly symmetric) while genuine
asymmetry is O(1).  Row-wise shifted operators (A - sigma_i on row i, the
FusedBlockCG response-equation form) remain term-by-term symmetric and
pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_symmetric_operator(
    matvec,
    operand,
    block_shape,
    dtype,
    solver: str,
    parity_hint: str,
    sharding=None,
    rel_tol: float = 1e-2,
) -> None:
    """Raise ValueError if matvec is measurably non-symmetric.

    ``block_shape`` must be the (rows, N) shape the solver itself compiles
    matvec for, so the two probe dispatches hit the same XLA cache entry.
    """
    rng = np.random.default_rng(0)
    u = rng.standard_normal(block_shape)
    v = rng.standard_normal(block_shape)
    ju = jnp.asarray(u, dtype=dtype)
    jv = jnp.asarray(v, dtype=dtype)
    if sharding is not None:
        ju = jax.device_put(ju, sharding)
        jv = jax.device_put(jv, sharding)
    wu = np.asarray(matvec(ju, operand), dtype=np.float64)
    wv = np.asarray(matvec(jv, operand), dtype=np.float64)
    uu = np.asarray(ju, dtype=np.float64)
    vv = np.asarray(jv, dtype=np.float64)
    s_uv = float(np.sum(uu * wv))  # <u, Av>
    s_vu = float(np.sum(vv * wu))  # <v, Au>
    scale = (
        np.linalg.norm(uu) * np.linalg.norm(wv)
        + np.linalg.norm(vv) * np.linalg.norm(wu)
    )
    if abs(s_uv - s_vu) > rel_tol * max(scale, 1e-300):
        raise ValueError(
            f"{solver} requires a symmetric (hermitian) operator: probe found "
            f"<u,Av>={s_uv:.6g} vs <Au,v>={s_vu:.6g} "
            f"(relative asymmetry {abs(s_uv - s_vu) / max(scale, 1e-300):.2e}). "
            f"The fused families are symmetric-only by design; for "
            f"non-hermitian problems use "
            f"solvers.fused_nonsym.FusedNonSymDavidson (chunked-dispatch "
            f"production path) or {parity_hint}, or pass "
            f"check_symmetric=False if the asymmetry is known rounding noise."
        )
