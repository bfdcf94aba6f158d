"""Array-operation benchmark harness.

TPU-native equivalent of the reference's benchmark/ArrayBenchmark.h sweep:
times dot, gemm_inner (Gram), gemm_outer (reconstruction), axpy, copy-in/out,
fill and scal over vector lengths {500, 1e3, 1e4, 1e5, 1e6} for the device
BasisStore ("fast" tier) and the native file-backed VecStore ("slow" tier,
the DistrArrayFile analogue), printing GB/s and GFLOP/s per op.

Usage: python benchmarks/array_benchmark.py [--lengths 1000 100000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_op(fn, repeats_target_s: float = 0.1, max_repeats: int = 1000):
    fn()  # warmup / compile
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < repeats_target_s and reps < max_repeats:
        out = fn()
        reps += 1
    try:
        import jax

        jax.block_until_ready(out)
    except Exception:
        pass
    return (time.perf_counter() - t0) / max(reps, 1)


def bench_device(length: int, n_fast: int = 10, n_slow: int = 100):
    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.array import BasisStore, vector_ops as vops

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    itemsize = np.dtype("float32").itemsize if dtype == jnp.float32 else 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_fast, length)), dtype=dtype)
    store = BasisStore(n_slow, length, dtype=dtype)
    slots = [store.append(x[i % n_fast]) for i in range(n_slow)]
    results = {}
    t = time_op(lambda: vops.dots_rows(x, x))
    results["dot"] = (t, 2 * n_fast * length / t / 1e9)
    t = time_op(lambda: vops.gram(x, store.data))
    results["gemm_inner"] = (t, 2 * n_fast * n_slow * length / t / 1e9)
    coeff = np.asarray(rng.standard_normal((n_fast, n_slow)))
    t = time_op(lambda: store.combine(coeff, slots))
    results["gemm_outer"] = (t, 2 * n_fast * n_slow * length / t / 1e9)
    alphas = jnp.asarray(rng.standard_normal(n_fast), dtype=dtype)
    t = time_op(lambda: vops.axpy_rows(alphas, x, x))
    results["axpy"] = (t, 3 * n_fast * length * itemsize / t / 1e9)
    t = time_op(lambda: store.put(slots[0], x[0]))
    results["copy_in"] = (t, length * itemsize / t / 1e9)
    t = time_op(lambda: np.asarray(store.get(slots[0])))
    results["copy_out"] = (t, length * itemsize / t / 1e9)
    t = time_op(lambda: vops.scale_rows(alphas, x))
    results["scal"] = (t, 2 * n_fast * length * itemsize / t / 1e9)
    return results


def bench_native(length: int, n_fast: int = 10, n_slow: int = 100):
    from iterative_solver_tpu.native import VecStore

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_fast, length))
    store = VecStore(n_slow, length)
    slots = [store.append(x[i % n_fast]) for i in range(n_slow)]
    results = {}
    t = time_op(lambda: store.gram(x, slots))
    results["gemm_inner"] = (t, 2 * n_fast * n_slow * length / t / 1e9)
    coeff = rng.standard_normal((n_fast, n_slow))
    t = time_op(lambda: store.combine(coeff, slots))
    results["gemm_outer"] = (t, 2 * n_fast * n_slow * length / t / 1e9)
    t = time_op(lambda: store.put(slots[0], x[0]))
    results["copy_in"] = (t, length * 8 / t / 1e9)
    t = time_op(lambda: store.get(slots[0]))
    results["copy_out"] = (t, length * 8 / t / 1e9)
    t = time_op(lambda: store.dot(slots[0], slots[1]))
    results["dot"] = (t, 2 * length / t / 1e9)
    store.close()
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lengths", type=int, nargs="*", default=[500, 1000, 10_000, 100_000, 1_000_000])
    parser.add_argument("--tiers", nargs="*", default=["device", "native"])
    args = parser.parse_args()
    for length in args.lengths:
        for tier in args.tiers:
            bench = bench_device if tier == "device" else bench_native
            try:
                results = bench(length)
            except Exception as e:  # pragma: no cover
                print(f"[{tier} n={length}] failed: {e}")
                continue
            line = " ".join(
                f"{op}={t * 1e6:.0f}us({rate:.1f})" for op, (t, rate) in results.items()
            )
            print(f"[{tier} n={length}] {line}  (GB/s or GFLOP/s)")


if __name__ == "__main__":
    main()
