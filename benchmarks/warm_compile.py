"""Out-of-process first-compile warmers for bench legs (VERDICT r3 #8).

``signal.alarm`` cannot interrupt a C-level hang: a bench leg wedged inside
a remote compile blocks the whole process until the driver kills it, and
the dead-tunnel breaker never fires. These warmers move each heavy leg's
FIRST (compiling) invocation into a subprocess the harness can always kill:

    python -m benchmarks.warm_compile <leg>

Each warmer reconstructs the leg's jitted program from SHAPES ONLY
(``jax.ShapeDtypeStruct`` + ``jax.eval_shape`` + AOT ``.lower().compile()``)
— no operator data is generated or shipped, so a warm costs interpreter
start + trace + compile and nothing else. The compile populates the
persistent compile cache, making the in-process leg's own compile a cheap
cache hit when the traced program matches; even on a cache miss the warm
has just PROVEN the tunnel compiles big programs right now, which is the
property the breaker needs (the observed axon failure mode is compiles
hanging entirely, PERF.md).

The phenol warmer is the exception: its composition (banded + refine)
depends on host data, so it runs the real pipeline at a tiny n — same
program families, hang-detection value intact, no cache value.
"""

from __future__ import annotations

import dataclasses
import sys


def _common():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def warm_davidson_packed_bf16(n: int, r: int, m: int, b: int = 1024) -> None:
    """Packed-triangle bf16 window solve — the headline / n16384 / n32768
    program family (bench.py leg_headline, leg_n16384, leg_big)."""
    jax, jnp = _common()
    from iterative_solver_tpu.ops.kernels.chain_pallas import fits_vmem
    from iterative_solver_tpu.ops.kernels.symm_pallas import (
        SymmetricBlocked,
        symm_matmat_pallas,
    )
    from iterative_solver_tpu.solvers.fused_davidson import (
        make_davidson_init,
        make_davidson_solve,
    )

    sds = jax.ShapeDtypeStruct
    nb = n // b
    npairs = nb * (nb + 1) // 2
    sym = SymmetricBlocked(values=None, ii=None, jj=None, shape=(n, n), b=b,
                           diagonal=None)

    def matvec(x, op):
        s = dataclasses.replace(sym, values=op[0], ii=op[1], jj=op[2])
        return symm_matmat_pallas(x, s)

    op = (sds((npairs, b, b), jnp.bfloat16),
          sds((npairs,), jnp.int32), sds((npairs,), jnp.int32))
    # mirror FusedDavidson.__init__'s auto fuse_chain policy (TPU, f32,
    # single device, fits VMEM)
    fuse = jax.default_backend() == "tpu" and fits_vmem(r, m, n)
    solve = make_davidson_solve(matvec, r, m, rr="window", fuse_chain=fuse)
    st = jax.eval_shape(make_davidson_init(matvec, r, m),
                        sds((r, n), jnp.float32), op)
    solve.lower(st, op, sds((n, ), jnp.float32), -1.0, 64).compile()


def warm_davidson_int8(n: int, r: int, m: int, b: int = 1024,
                       two_plane: bool = False, rr: str = "window",
                       anchor_every: int = 4) -> None:
    """Quantized packed solve — leg_turbo_int8 / leg_int8_precise /
    leg_n16384_int8 / leg_big's int8 variant."""
    jax, jnp = _common()
    from iterative_solver_tpu.ops.kernels.chain_pallas import fits_vmem
    from iterative_solver_tpu.ops.kernels.symm_int8 import (
        SymmetricBlockedInt8,
        SymmetricBlockedInt8Split,
        symm_matmat_int8_pallas,
        symm_matmat_int8_split_pallas,
    )
    from iterative_solver_tpu.solvers.fused_davidson import (
        make_davidson_init,
        make_davidson_solve,
    )

    sds = jax.ShapeDtypeStruct
    nb = n // b
    npairs = nb * (nb + 1) // 2
    qs = sds((npairs, b, b), jnp.int8)
    vec = sds((n,), jnp.float32)
    idx = sds((npairs,), jnp.int32)
    if two_plane:
        sym = SymmetricBlockedInt8Split(q1=None, q2=None, gq=None, ii=None,
                                        jj=None, shape=(n, n), b=b,
                                        diagonal=None)

        def matvec(x, op):
            s = dataclasses.replace(sym, q1=op[0], q2=op[1], gq=op[2],
                                    diagonal=op[3], ii=op[4], jj=op[5])
            return symm_matmat_int8_split_pallas(x, s)

        op = (qs, qs, vec, vec, idx, idx)
    else:
        sym = SymmetricBlockedInt8(q=None, gq=None, ii=None, jj=None,
                                   shape=(n, n), b=b, diagonal=None)

        def matvec(x, op):
            s = dataclasses.replace(sym, q=op[0], gq=op[1], diagonal=op[2],
                                    ii=op[3], jj=op[4])
            return symm_matmat_int8_pallas(x, s)

        op = (qs, vec, vec, idx, idx)
    fuse = jax.default_backend() == "tpu" and fits_vmem(r, m, n)
    solve = make_davidson_solve(matvec, r, m, rr=rr, anchor_every=anchor_every,
                                fuse_chain=fuse)
    st = jax.eval_shape(make_davidson_init(matvec, r, m),
                        sds((r, n), jnp.float32), op)
    solve.lower(st, op, vec, -1.0, 64).compile()


def warm_ppcg_int8(n: int, r: int, b: int = 1024, rr_every: int = 8) -> None:
    """PPCG solve over the one-plane int8 packed operator — the production
    r64 big-peak path (bench.py leg_n16384_int8 / leg_big: the window
    step's eigh(2r) dominates at r=64, see PERF.md ablation)."""
    jax, jnp = _common()
    from iterative_solver_tpu.ops.kernels.symm_int8 import (
        SymmetricBlockedInt8,
        symm_matmat_int8_pallas,
    )
    from iterative_solver_tpu.solvers.fused_ppcg import (
        make_ppcg_init,
        make_ppcg_solve,
    )

    sds = jax.ShapeDtypeStruct
    nb = n // b
    npairs = nb * (nb + 1) // 2
    qs = sds((npairs, b, b), jnp.int8)
    vec = sds((n,), jnp.float32)
    idx = sds((npairs,), jnp.int32)
    sym = SymmetricBlockedInt8(q=None, gq=None, ii=None, jj=None,
                               shape=(n, n), b=b, diagonal=None)

    def matvec(x, op):
        s = dataclasses.replace(sym, q=op[0], gq=op[1], diagonal=op[2],
                                ii=op[3], jj=op[4])
        return symm_matmat_int8_pallas(x, s)

    op = (qs, vec, vec, idx, idx)
    solve = make_ppcg_solve(matvec, r, rr_every)
    st = jax.eval_shape(make_ppcg_init(matvec, r), sds((r, n), jnp.float32),
                        op)
    solve.lower(st, op, vec, -1.0, 64).compile()


def warm_phenol_small(n: int = 1 << 16) -> None:
    """Tiny-n run of the real phenol composition (int8 BSR -> streamed
    banded -> refine): proves those program families compile through the
    tunnel right now. Shapes differ from the full leg, so this is a hang
    probe, not a cache fill."""
    R: dict = {}
    from benchmarks.phenol_scale import leg_phenol_scale

    leg_phenol_scale(R, n=n, nroots=4, tol_band=5e-3, tol_final=1e-6)
    assert R.get("phenol_n") == n


WARMERS = {
    "headline": lambda: warm_davidson_packed_bf16(8192, 16, 64),
    "turbo_int8": lambda: warm_davidson_int8(8192, 16, 64),
    "int8_precise": lambda: warm_davidson_int8(8192, 16, 64, two_plane=True,
                                               rr="anchored", anchor_every=2),
    "int8_precise_full": lambda: warm_davidson_int8(8192, 16, 64,
                                                    two_plane=True, rr="full"),
    "n16384": lambda: warm_davidson_packed_bf16(16384, 64, 192),
    "n16384_int8": lambda: warm_davidson_int8(16384, 64, 192),
    "n32768": lambda: warm_davidson_packed_bf16(32768, 64, 192),
    "n32768_int8": lambda: warm_davidson_int8(32768, 64, 192),
    "n16384_ppcg": lambda: warm_ppcg_int8(16384, 64),
    "n32768_ppcg": lambda: warm_ppcg_int8(32768, 64),
    "phenol": warm_phenol_small,
}


def main(argv) -> int:
    if len(argv) != 1 or argv[0] not in WARMERS:
        print(f"usage: python -m benchmarks.warm_compile "
              f"[{'|'.join(WARMERS)}]", file=sys.stderr)
        return 2
    WARMERS[argv[0]]()
    print(f"warm:{argv[0]}:ok")
    return 0


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main(sys.argv[1:]))
