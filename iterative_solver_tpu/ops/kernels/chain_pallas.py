"""Fused expand chain: precondition + Gram-Schmidt + norms in ONE kernel.

The fused Davidson step's non-matvec cost is dominated not by arithmetic or
HBM traffic (the basis stack is ~2 MB vs the operator's ~64 MB) but by the
per-op dispatch floor: every small XLA op on this chip costs ~4-6 us, and
the expand chain

    t = r / (diag - lambda)          (Jacobi, IterativeSolver.h:34-44)
    n0 = row_norms2(t)
    2 x [ proj = (t v^T) * mask ; t -= proj v ]    (classical GS, 2 passes)
    n2 = row_norms2(t)
    g  = t t^T                       (whitening Gram)

is ~10 such ops. Inside one Pallas program the same ops cost 0.2-0.4 us
each (measured by ablation, CLAUDE.md cost model), so fusing the chain
into a single kernel removes most of the floor. Only the O(r^2) whitening
(Cholesky of g + triangular solve, genuinely better in XLA) and the basis
append stay outside.

Everything the kernel touches fits VMEM at production sizes (basis stack
m_max x N: 2 MB at m=64, N=8192 f32), so the kernel is grid-free: whole
arrays resident, straight-line code, one dispatch. ``fits_vmem`` guards
callers; the XLA chain in solvers/fused_davidson.py remains the fallback
for oversized or mesh-sharded states (this kernel is single-device).

This is the TPU replacement for the reference's propose_rspace
orthogonalisation sweep (propose_rspace.h:421-466 modified_gram_schmidt +
append_overlap_with_r) in the fused production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array
_PREC = jax.lax.Precision.HIGHEST

# VMEM budget for the grid-free kernel. The compiler's true scoped
# allocation is ~2.7x this formula's array footprint (double-buffered
# inputs + per-GS-pass temporaries): the r32/m128/n8192 config sums to
# 8.5 MB by the formula but was measured to demand 22.6 MB against the
# 16 MB arena (compile-time VMEM OOM). 6 MB formula budget keeps the
# largest admitted config (r16/m64/n8192, 4.3 MB -> ~11.5 MB actual)
# safely inside the arena.
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def fits_vmem(nroots: int, m_max: int, n: int, itemsize: int = 4) -> bool:
    """True when the grid-free chain kernel fits the VMEM arena."""
    return (m_max * n + 4 * nroots * n + 2 * n) * itemsize <= _VMEM_BUDGET_BYTES


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=a.dtype, precision=_PREC,
    )


def _chain_kernel_body(jacobi: bool, gs_passes: int):
    def kernel(r_ref, v_ref, mask_ref, diag_ref, evals_ref,
               t_ref, n0_ref, n2_ref, g_ref):
        mask_row = mask_ref[:, 0][None, :]                    # (1, m_max)
        if jacobi:
            diag = diag_ref[0, :][None, :]                    # (1, n)
            evals = evals_ref[:, 0][:, None]                  # (r, 1)
            scale = jnp.max(jnp.abs(diag)) + jnp.max(jnp.abs(evals))
            t = r_ref[...] / (diag - evals + 1e-15 * scale + 1e-300)
        else:
            t = r_ref[...]
        n0_ref[...] = jnp.sum(t * t, axis=1, keepdims=True)
        v = v_ref[...]
        for _ in range(gs_passes):
            proj = _dot(t, v, ((1,), (1,))) * mask_row        # (r, m_max)
            t = t - _dot(proj, v, ((1,), (0,)))
        n2_ref[...] = jnp.sum(t * t, axis=1, keepdims=True)
        g_ref[...] = _dot(t, t, ((1,), (1,)))
        t_ref[...] = t

    return kernel


@functools.lru_cache(maxsize=64)
def _chain_fn(nroots, m_max, n, dtype_name, jacobi, gs_passes, interpret):
    return jax.jit(functools.partial(
        _chain_impl, nroots=nroots, m_max=m_max, n=n, jacobi=jacobi,
        gs_passes=gs_passes, interpret=interpret,
    ))


def _chain_impl(r, v, mask, diag, evals, *, nroots, m_max, n, jacobi,
                gs_passes, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = r.dtype
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((nroots, n), dtype),       # t after GS
        jax.ShapeDtypeStruct((nroots, 1), dtype),       # pre-GS row norms^2
        jax.ShapeDtypeStruct((nroots, 1), dtype),       # post-GS row norms^2
        jax.ShapeDtypeStruct((nroots, nroots), dtype),  # unnormalised Gram
    )
    return pl.pallas_call(
        _chain_kernel_body(jacobi, gs_passes),
        out_shape=out_shapes,
        in_specs=[vmem] * 5,
        out_specs=(vmem,) * 4,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * gs_passes * 2 * nroots * m_max * n
            + 2 * nroots * nroots * n + 6 * nroots * n,
            bytes_accessed=(m_max * n + 2 * nroots * n + n) * dtype.itemsize,
            transcendentals=0,
        ),
    )(r, v, mask.reshape(m_max, 1), diag.reshape(1, n),
      evals.reshape(nroots, 1))


def whiten_after_chain(t: Array, n0_2: Array, n2: Array, nroots: int,
                       null_thresh: float, g: Array = None):
    """Null-drop + Cholesky whitening shared by the fused solver families.

    Given a post-Gram-Schmidt block ``t`` with its pre/post-GS squared row
    norms, drop rows annihilated relative to their own magnitude
    (scale-invariant null test, cf. propose_rspace's norm_thresh semantics)
    and whiten the survivors so the appended basis rows are orthonormal.
    Two algebraically identical application forms, kept separate so each
    call site's numerics (and the iteration-count drift locks pinning them)
    stay bit-for-bit:

    - ``g`` given (the fused chain kernel's UNnormalised Gram): rescale it
      to unit diagonal and apply L^{-1} diag(s) as ONE (r, r) @ (r, N)
      matmul;
    - ``g`` None: normalise rows, form the Gram, and run the triangular
      solve on the (r, N) block directly (the original XLA chain tail).

    Returns ``(t, keep)`` — the whitened block and the surviving-row mask
    (the step's slot-mask update needs it).
    """
    keep = n2 > null_thresh**2 * jnp.maximum(n0_2, 1e-300)
    s = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, n2, 1.0)), 0.0)
    fused = g is not None
    if fused:
        g = s[:, None] * g * s[None, :]
    else:
        t = t * s[:, None]
        g = jnp.matmul(t, t.T, precision=_PREC)
    g = jnp.where(keep[:, None] & keep[None, :], g, 0.0)
    # dead rows get a unit diagonal so the Cholesky stays defined; live
    # rows a dtype-aware jitter ABOVE the Gram roundoff — with 1e-30, two
    # mutually near-parallel surviving rows (degenerate roots: each passes
    # the per-row null test yet g12 ~ 1) give an indefinite f32 Gram, the
    # Cholesky NaNs, and the while_loop cond reads NaN errors as converged
    from ...array.vector_ops import chol_jitter

    g = g + jnp.where(keep, chol_jitter(g.dtype), 1.0) * jnp.eye(
        nroots, dtype=g.dtype)
    l = jnp.linalg.cholesky(g)
    if fused:
        ws = jax.scipy.linalg.solve_triangular(
            l, jnp.diag(s), lower=True) * keep[:, None]
        return jnp.matmul(ws, t, precision=_PREC), keep
    t = jax.scipy.linalg.solve_triangular(l, t, lower=True)
    return t * keep[:, None], keep


def fused_expand_chain(r: Array, v: Array, mask: Array,
                       diag: Array = None, evals: Array = None,
                       gs_passes: int = 2, interpret: bool = None):
    """Run the expand chain in one Pallas dispatch.

    With ``diag``/``evals`` given, ``r`` is the residual block and the
    kernel applies the Jacobi preconditioner first; otherwise ``r`` is
    already the new-direction block (custom ``expand`` hooks).

    Returns ``(t, n0_2, n2, g)``: the block after ``gs_passes`` classical
    Gram-Schmidt passes against the masked basis ``v``, its pre/post-GS
    squared row norms ``(nroots,)``, and the unnormalised Gram ``t t^T``.
    Whitening (null drop + Cholesky) stays with the caller — it needs the
    O(r^2) factorisation XLA already does well.
    """
    nroots, n = r.shape
    m_max = v.shape[0]
    jacobi = diag is not None
    if not jacobi:
        diag = jnp.zeros((n,), r.dtype)
        evals = jnp.zeros((nroots,), r.dtype)
    if interpret is None:
        # CPU (the f64 test tier) runs the kernel through the interpreter so
        # fuse_chain solver configs stay testable off-TPU
        interpret = jax.default_backend() != "tpu"
    fn = _chain_fn(nroots, m_max, n, str(r.dtype), jacobi, gs_passes,
                   interpret)
    t, n0_2, n2, g = fn(r, v, mask, diag, evals)
    return t, n0_2[:, 0], n2[:, 0], g
