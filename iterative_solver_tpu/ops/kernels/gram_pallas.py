"""Pallas masked Gram-matrix kernel.

The subspace Rayleigh/overlap matrices are the reference's gemm_inner hot op
(array/util/gemm.h:31-46). The XLA matmul is already near-optimal for the
bare product; this kernel fuses what XLA runs as several ops in the fused
solvers' step — mask application, the product, and symmetrisation — into a
single pass with the stacks streamed tile-by-tile through VMEM and the
(M, M) accumulator resident on-chip (the TPU shape of the reference's paged
accumulation loop).

H[i,j] = mask_i mask_j * sum_n V[i,n] W[j,n], symmetrised.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _masked_gram_fn(m_rows: int, n: int, tile: int, dtype_name: str, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = max(1, n // tile)
    assert n % n_tiles == 0, "vector length must divide the tile grid"
    tile_n = n // n_tiles

    def kernel(v_ref, w_ref, mask_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        acc = jax.lax.dot_general(
            v_ref[...],
            w_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[...] += acc.astype(out_ref.dtype)

        @pl.when(t == n_tiles - 1)
        def _():
            mask = mask_ref[0, :]
            h = out_ref[...] * mask[:, None] * mask[None, :]
            out_ref[...] = 0.5 * (h + h.T)

    def fn(v, w, mask):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((m_rows, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_rows, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m_rows), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_rows, m_rows), lambda t: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_rows, m_rows), v.dtype),
            interpret=interpret,
        )(v, w, mask.reshape(1, -1))

    return jax.jit(fn)


def masked_gram_pallas(v: Array, w: Array, mask: Array, tile: int = 512,
                       interpret: bool = False) -> Array:
    """Masked symmetrised Gram matrix of two (M, N) stacks in one kernel."""
    m_rows, n = v.shape
    fn = _masked_gram_fn(m_rows, n, min(tile, n), str(v.dtype), interpret)
    return fn(v, w, mask)
