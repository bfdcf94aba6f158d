"""Benchmark: fused Davidson eigensolver on a synthetic FCI-style Hamiltonian.

Runs on whatever backend the environment provides (the driver supplies one
real TPU chip). Measurements, one JSON line per completed leg (the LAST
line is always the most complete record — the driver parses that).

UN-LOSABLE HARNESS (round-3, after BENCH_r02 recorded nothing at rc=124;
round-4 compact contract, after BENCH_r03 ran 16/16 legs yet parsed null):

- a trivial-compile CANARY runs first in a subprocess with a hard timeout:
  it must jit, execute and FETCH a kernel result through the tunnel. The
  known axon degradation mode is compiles hanging entirely (PERF.md), and
  ``jax.default_backend()`` alone does not detect it. On canary failure the
  bench degrades to a small CPU leg and still records a parseable line.
- stdout carries ONLY compact summary lines (<= ~1.4 KB, leading keys
  metric/value/vs_baseline always intact): the driver parses the LAST
  line out of a ~2000-char stdout tail, and round 3's full-record line
  (3.6 KB by leg 16) overflowed that window. The FULL record mirrors to
  ``BENCH_partial.json`` (git-tracked) after every leg.
- every leg runs under a ``signal.alarm`` budget; a hung or failing leg is
  recorded in ``legs_skipped`` and the bench moves on. CAVEAT: the alarm
  only fires between Python bytecodes — a leg blocked inside a C-level
  call (remote compile, tunnel fetch) cannot be interrupted. Two defences:
  the pre-leg emission bounds the loss to one leg when the driver kills a
  wedged process, and heavy legs run their FIRST (compiling) invocation
  out-of-process (``benchmarks/warm_compile.py``) under a hard subprocess
  timeout, so a compile hang is killable and feeds the breaker.
- two consecutive leg/warm timeouts mark the tunnel dead and skip the
  remaining TPU legs instead of burning the global budget
  (``BENCH_BUDGET_S``) one alarm at a time.
- the default ``BENCH_BUDGET_S`` is 850 s — the driver kills the process
  at ~1000 s (round 4's artifact died rc=124 mid-n32768 because the old
  2700 s default let the big legs auto-enable; the scoreboard line MUST
  land, so the default run fits the driver wall with margin). The
  phenol-scale composition and the n32768 peak only auto-enable when the
  remaining budget clears their measured cost under THIS budget —
  otherwise they are recorded as ``deadline_autodisabled`` skips and the
  run still emits ``status=complete``. Builder sessions opt in with
  ``--big``/``--phenol`` + ``BENCH_BUDGET_S>=3000``.

Methodology (unchanged from rounds 1-2):

- sustained throughput (headline): the marginal cost per iteration between
  two fixed trip counts of the SAME compiled single-dispatch solve
  (lax.while_loop with tol<0) — GFLOP/s across matvec + Gram +
  reconstruction + orthogonalisation, net of the per-dispatch constant
  (tunnel RTT + launch).
- only a host fetch (np.asarray) is a true sync through the tunnel;
  block_until_ready is not. Timing repetitions vary the trip count so the
  payload cache cannot serve a repeat.
- solution quality: converging runs; eigenvalue error is measured on the
  host in f64 from the returned vectors' Rayleigh quotients.
- FLOPs are counted at the mathematical cost (2 r N^2 per matvec) in every
  tier — never at the multi-pass count.

The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
to REFERENCE_GFLOPS_BLOCK recorded in round 1 on the driver-provided chip.

Operator tiers (see ops/kernels/symm_pallas.py, symm_int8.py):
- FAST (headline): packed-triangle bf16 tiles + window Rayleigh-Ritz.
- PRECISE: split double-bf16 (~2^-16 operator accuracy, f64 floor ~3.5e-6).
- TURBO int8: one quantized plane + exact diagonal (screening tier,
  residual floor ~4e-3 on this spectrum).
- INT8-PRECISE: two quantized planes — split-bf16 accuracy class at half
  its streamed bytes; the apples-to-apples quantized claim at tol 1e-5.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REFERENCE_GFLOPS = 2000.0        # round-1 4-root sustained (marginal method)
REFERENCE_GFLOPS_BLOCK = 6400.0  # round-1 16-root sustained (marginal method)

# lowest-4 eigenvalues of the deterministic benchmark matrix, precomputed
# with np.linalg.eigvalsh in f64 (saves minutes of host work per bench run)
REFERENCE_EIGENVALUES = [
    -2.0000867851589925, -1.8397575604176952, -1.6784299270313459, -1.5176359291753378,
]

N = 8192
NROOTS = 4          # quality/convergence config (matches the FCI test style)
NROOTS_BLOCK = 16   # throughput config: the matvec is bandwidth-bound and
                    # nearly flat in block rows up to ~32, so wide blocks are
                    # almost free on the MXU (measured m=4..32 ~equal wall)
M_MAX = 32
M_MAX_BLOCK = 64
THROUGHPUT_ITERS = 64


# ---------------------------------------------------------------------------
# Harness: canary + leg runner (importable without jax; tests exercise it
# with stub legs — tests/test_bench_harness.py)
# ---------------------------------------------------------------------------

class _LegTimeout(Exception):
    pass


def tpu_canary(timeout_s: float = 240.0, retry_sleep_s: float = 15.0):
    """Compile, run AND FETCH a trivial kernel in a subprocess with a hard
    timeout. Returns the backend name on success, None on any failure —
    the only reliable probe of the axon tunnel's real health (PERF.md:
    dispatch walls are only meaningful when a trivial-compile canary
    confirms tunnel health; jax.default_backend() alone misses hung
    compiles)."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "f = jax.jit(lambda x: x * 2 + 1)\n"
        "val = float(np.asarray(f(jnp.ones((8, 128))))[0, 0])\n"
        "assert val == 3.0\n"
        "print(jax.default_backend())\n"
    )
    detail = ""
    for attempt in range(2):  # one retry: transient tunnel blips are real
        try:
            probe = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if probe.returncode == 0 and probe.stdout.strip():
                return probe.stdout.strip().splitlines()[-1], ""
            detail = (f"rc={probe.returncode} "
                      f"stderr={probe.stderr.strip()[-200:]}")
        except subprocess.TimeoutExpired:
            detail = f"timeout_{int(timeout_s)}s"
        if attempt == 0:
            time.sleep(retry_sleep_s)
    return None, detail


class LegRunner:
    """Run bench legs with per-leg SIGALRM budgets, a global deadline, and
    an emission after every leg.

    EMISSION CONTRACT (round 4 — BENCH_r02 AND r03 both reached the driver
    unparsed): the driver keeps only a ~2000-char stdout tail and parses
    the LAST line. Round 3's full-record line grew to 3.6 KB by leg 16 and
    its LEADING keys (metric/value/vs_baseline) fell outside the window.
    So stdout now carries ONLY a compact summary line (hard-capped at
    ``MAX_COMPACT_BYTES`` — core keys + one headline scalar per leg,
    trailing per-leg fields dropped first if ever over). The FULL record
    is mirrored to ``partial_path`` (tracked in git) after every leg.
    """

    # core keys always present in the compact line, in emission order
    COMPACT_CORE = ("metric", "value", "unit", "vs_baseline", "backend",
                    "canary", "status", "elapsed_s")
    # one-scalar-per-leg whitelist (ordered by importance: later entries
    # are dropped first if the line ever exceeds MAX_COMPACT_BYTES)
    COMPACT_LEG_FIELDS = (
        "block_iter_time_ms",
        "fast_converged",
        "fast_max_residual_f64",
        "turbo_int8_gflops",
        "int8_precise_gflops",
        "int8_precise_converged",
        "int8_precise_full_gflops",
        "precise_tier_gflops",
        "r32_gflops",
        "r4_gflops",
        "eigenvalue_error_vs_dense_f64",
        "precise_1e8_max_residual_f64",
        "n16384_r64_gflops",
        "n16384_r64_int8_gflops",
        "hard_ppcg_iterations",
        "hard_ppcg_converged",
        "hard_window_iterations",
        "spmv_gnnz_per_s",
        "spmv_int8_gnnz_per_s",
        "nonsym_vs_sym_factor",
        "nonsym_converged",
        "banded_stream_wall_s",
        "banded_stream_converged",
        "offload_overlap_factor_med",
        "offload_h2d_MBps",
        "n32768_r64_int8_gflops",
        "n32768_r64_int8_converged",
        "n32768_r64_gflops",
        "n32768_r64_converged",
        "phenol_n",
        "phenol_nnz",
        "phenol_wall_s",
        "phenol_max_residual_f64",
        "phenol_converged",
        "dispatch_constant_ms",
        "solve_iterations",
    )
    MAX_COMPACT_BYTES = 1400  # driver tail window is ~2000 chars

    def __init__(self, result: dict, budget_s: float | None = None,
                 partial_path: str | None = "BENCH_partial.json"):
        self.result = result
        self.t0 = time.time()
        self.budget = (budget_s if budget_s is not None
                       else float(os.environ.get("BENCH_BUDGET_S", "850")))
        self.partial_path = partial_path
        self.consecutive_timeouts = 0
        self.dead = False
        result.setdefault("legs_done", [])
        result.setdefault("legs_skipped", {})

    def compact(self) -> dict:
        """Compact summary: guaranteed to serialize under
        MAX_COMPACT_BYTES with the leading keys intact."""
        r = self.result
        out = {k: r[k] for k in self.COMPACT_CORE if k in r}
        out["legs_done"] = len(r.get("legs_done", []))
        sk = r.get("legs_skipped", {})
        if sk:
            out["legs_skipped"] = {k: str(v)[:48] for k, v in sk.items()}
        fields = [k for k in self.COMPACT_LEG_FIELDS if k in r]
        for k in fields:
            out[k] = r[k]
        while fields and len(json.dumps(out)) > self.MAX_COMPACT_BYTES:
            out.pop(fields.pop())
        # a mass-skip run (dead tunnel) can blow the cap through the
        # UNBOUNDED legs_skipped dict alone — degrade it to a count plus
        # the first few names before giving up on the guarantee (the full
        # dict always survives in BENCH_partial.json)
        if ("legs_skipped" in out
                and len(json.dumps(out)) > self.MAX_COMPACT_BYTES):
            names = sorted(sk)
            out["legs_skipped"] = {
                "n": len(names), "first": ",".join(names[:4])[:96]}
        return out

    def emit(self, status: str = "running") -> None:
        self.result["status"] = status
        self.result["elapsed_s"] = round(time.time() - self.t0, 1)
        print(json.dumps(self.compact()), flush=True)
        if self.partial_path:
            try:
                with open(self.partial_path, "w") as fh:
                    fh.write(json.dumps(self.result) + "\n")
            except OSError:
                pass

    def remaining(self) -> float:
        return self.budget - (time.time() - self.t0)

    def warm(self, name: str, warm_cmd, timeout_s: float) -> bool:
        """Run a leg's first (compiling) invocation OUT-OF-PROCESS with a
        hard timeout. SIGALRM cannot interrupt a C-level hang (a wedged
        remote compile blocks the whole bench until the driver kills it);
        a subprocess can always be killed, and the persistent compile
        cache makes the in-process re-compile cheap. A warm TIMEOUT is
        evidence of the uninterruptible-hang mode and counts toward the
        dead-tunnel breaker; a fast nonzero exit means the tunnel answers
        (no hang risk) so the leg still runs."""
        try:
            probe = subprocess.run(warm_cmd, capture_output=True, text=True,
                                   timeout=timeout_s)
        except subprocess.TimeoutExpired:
            self.result["legs_skipped"][name] = f"warm_timeout_{int(timeout_s)}s"
            self.consecutive_timeouts += 1
            if self.consecutive_timeouts >= 2:
                self.dead = True
            self.emit()
            return False
        if probe.returncode != 0:
            # record but do not skip: failing fast is not hanging
            self.result.setdefault("warm_failures", {})[name] = (
                f"rc={probe.returncode}:{probe.stderr.strip()[-120:]}")
        else:
            self.consecutive_timeouts = 0
        return True

    def run(self, name: str, fn, budget_s: float = 300.0,
            needs: tuple = (), warm_cmd=None,
            warm_timeout_s: float | None = None) -> bool:
        done = self.result["legs_done"]
        skipped = self.result["legs_skipped"]
        missing = [p for p in needs if p not in done]
        if missing:
            skipped[name] = f"prerequisite_skipped:{missing[0]}"
            self.emit()
            return False
        if self.dead:
            skipped[name] = "tunnel_dead"
            self.emit()
            return False
        if self.remaining() <= min(budget_s, 60.0):
            skipped[name] = "deadline"
            self.emit()
            return False
        if warm_cmd is not None:
            wt = warm_timeout_s if warm_timeout_s is not None else min(
                budget_s, 300.0)
            if not self.warm(name, warm_cmd, wt):
                return False
        budget = max(1, int(min(budget_s, max(self.remaining(), 60.0))))

        def _handler(signum, frame):
            raise _LegTimeout()

        old = signal.signal(signal.SIGALRM, _handler)
        signal.alarm(budget)
        try:
            fn()
            done.append(name)
            self.consecutive_timeouts = 0
            ok = True
        except _LegTimeout:
            skipped[name] = f"timeout_{budget}s"
            self.consecutive_timeouts += 1
            if self.consecutive_timeouts >= 2:
                self.dead = True
            ok = False
        except Exception as e:  # noqa: BLE001 — a leg must never kill the bench
            skipped[name] = f"error:{type(e).__name__}:{str(e)[:160]}"
            self.consecutive_timeouts = 0
            ok = False
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
        self.emit()
        return ok


# ---------------------------------------------------------------------------
# The bench proper
# ---------------------------------------------------------------------------

def main(big: bool = False, phenol: bool = False):
    backend_probe, canary_detail = tpu_canary()

    import jax
    import jax.numpy as jnp

    from iterative_solver_tpu.solvers.fused_davidson import (
        FusedDavidson,
        make_davidson_solve,
    )

    if backend_probe is None:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    dtype = jnp.float32 if backend != "cpu" else jnp.float64

    # degraded CPU mode: the full-size f64 leg takes >10 min on the host —
    # shrink so the artifact still records in minutes
    global N, THROUGHPUT_ITERS
    if backend == "cpu":
        N = 1024
        THROUGHPUT_ITERS = 8

    R = {
        "metric": f"fused_davidson_n{N}_r{NROOTS_BLOCK}_sustained",
        "value": 0.0,
        "unit": "GFLOP/s",
        "vs_baseline": 0.0,
        "backend": backend,
        "canary": backend_probe or f"failed:{canary_detail}",
    }
    runner = LegRunner(R)
    runner.emit()  # a parseable line exists before any leg can hang

    rng = np.random.default_rng(0)
    # gapped low block (the sought correlation states) + dense remainder
    dvals = np.concatenate([np.linspace(-2.0, 3.0, 32), np.linspace(6.0, 50.0, N - 32)])
    a = rng.standard_normal((N, N)) * (0.05 / np.sqrt(N))
    matrix = (a + a.T + np.diag(dvals)).astype(np.float64)
    del a
    diag = np.diag(matrix)
    ref_evals = (REFERENCE_EIGENVALUES if N == 8192
                 else np.linalg.eigvalsh(matrix)[:NROOTS].tolist())

    ctx: dict = {}

    if backend == "tpu":
        from iterative_solver_tpu.ops.kernels.symm_pallas import (
            SymmetricBlocked,
            SymmetricBlockedSplit,
            symm_matmat_pallas,
            symm_matmat_split_pallas,
        )

        # tile sizes are measured optima (see from_dense_symmetric): the
        # single bf16 stack streams at the DMA roof with b=1024 (90 us vs
        # 103 at b=512 for the 8192^2 action); the split tier's TWO stacks
        # double the buffered VMEM and prefer b=512
        sym_fast = SymmetricBlocked.from_dense(matrix, b=1024, dtype=jnp.bfloat16)
        sym_prec = SymmetricBlockedSplit.from_dense(matrix, b=512)
        op_fast = (sym_fast.values, sym_fast.ii, sym_fast.jj)
        op_prec = (sym_prec.hi, sym_prec.lo, sym_prec.ii, sym_prec.jj)

        def matvec_fast(x, op):
            s = dataclasses.replace(sym_fast, values=op[0], ii=op[1], jj=op[2])
            return symm_matmat_pallas(x, s)

        def matvec_prec(x, op):
            s = dataclasses.replace(sym_prec, hi=op[0], lo=op[1], ii=op[2], jj=op[3])
            return symm_matmat_split_pallas(x, s)

        tol_fast, tol_prec = 2e-4, 1e-5
        rr_fast = "window"
    else:
        matj = jnp.asarray(matrix, dtype=dtype)

        def matvec_fast(x, op):
            return jnp.matmul(x, op.T, preferred_element_type=dtype)

        matvec_prec = matvec_fast
        op_fast = op_prec = matj
        tol_fast = tol_prec = 2e-4 if dtype == jnp.float32 else 1e-8
        rr_fast = "full"

    def guess(nroots):
        v0 = np.zeros((nroots, N))
        for row, i in enumerate(np.argsort(diag)[:nroots]):
            v0[row, i] = 1.0
        return v0

    def sustained(solve_fn, st, operand, dg, lo=None, hi=None, tag=None):
        """Marginal seconds/iteration between two trip counts of one compiled
        solve — removes the per-dispatch constant (same method as the SpMV
        metric). Returns (s_per_iter, wall_lo, dispatch_constant_s).

        Noise hardening (measured failure modes of the axon tunnel):
        - the tolerance argument is perturbed per repetition so no two
          dispatches carry identical payloads — repeated IDENTICAL
          dispatches can be served from a payload cache, yielding walls
          below the DMA roof (and marginals near zero or negative);
        - an implausible marginal (negative, or a dispatch constant
          outside [0, 2 s] — degraded windows show fake multi-second
          constants) triggers up to 2 re-measurements; if it never comes
          back plausible the last value is kept and the leg lands in
          ``noisy_measurements`` so the artifact is honest about it."""
        lo = THROUGHPUT_ITERS if lo is None else lo
        hi = 8 * THROUGHPUT_ITERS if hi is None else hi
        out, got_lo = solve_fn(st, operand, dg, -1.0, lo)
        np.asarray(out.errors)  # compile + warmup; fetch closes the async loop
        out, got_hi = solve_fn(st, operand, dg, -1.0, hi)
        np.asarray(out.errors)
        got_lo, got_hi = int(got_lo), int(got_hi)
        for attempt in range(3):
            walls = {}
            for k in (lo, hi):
                best = float("inf")
                for rep in range(5):  # best-of-5: tunnel + chip contention
                                      # add run-to-run noise of up to ~30%
                    tol = -1.0 - 1e-6 * (attempt * 16 + rep + 1)
                    t0 = time.perf_counter()
                    out, _ = solve_fn(st, operand, dg, tol, k)
                    np.asarray(out.errors)
                    best = min(best, time.perf_counter() - t0)
                walls[k] = best
            per_iter = (walls[hi] - walls[lo]) / (got_hi - got_lo)
            const = walls[lo] - got_lo * per_iter
            if per_iter > 0 and 0.0 <= const <= 2.0:
                return per_iter, walls[lo], const
        if tag is not None:
            R.setdefault("noisy_measurements", []).append(tag)
        if per_iter <= 0:
            # never hand callers a non-positive marginal (negative GFLOP/s
            # or ZeroDivisionError in the artifact): fall back to the
            # dispatch-INCLUSIVE rate, a conservative positive lower bound
            per_iter = walls[hi] / max(got_hi, 1)
            const = 0.0
        return per_iter, walls[lo], const

    def f64_quality(x, nroots):
        x64 = np.asarray(x, dtype=np.float64)
        ref = np.asarray(ref_evals)
        ev_err = res = 0.0
        for i in range(nroots):
            xi = x64[i] / np.linalg.norm(x64[i])
            rq = xi @ matrix @ xi
            if i < len(ref):
                ev_err = max(ev_err, abs(rq - ref[i]))
            res = max(res, float(np.linalg.norm(matrix @ xi - rq * xi)))
        return ev_err, res

    flops_iter_blk = (
        2 * NROOTS_BLOCK * N * N
        + 2 * M_MAX_BLOCK * M_MAX_BLOCK * N
        + 2 * 2 * NROOTS_BLOCK * N * M_MAX_BLOCK
        + 2 * 2 * 2 * NROOTS_BLOCK * M_MAX_BLOCK * N
    )
    flops_iter_r4 = (
        2 * NROOTS * N * N
        + 2 * M_MAX * M_MAX * N
        + 2 * 2 * NROOTS * N * M_MAX
        + 2 * 2 * 2 * NROOTS * M_MAX * N
    )

    # ---- FAST tier, 16-root block: the headline sustained rate ----
    def leg_headline():
        solver_blk = FusedDavidson(
            matvec_fast, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_fast, max_iter=60, operand=op_fast, rr=rr_fast,
        )
        # fuse_chain follows the solver's own auto policy (fused
        # precondition+GS+Gram chain where safe: TPU, fits VMEM — the
        # r32/m128 stack compile-OOMed the 16 MB arena, so the guard
        # rejects it)
        solve_blk = make_davidson_solve(matvec_fast, NROOTS_BLOCK, M_MAX_BLOCK,
                                        rr=rr_fast, fuse_chain=solver_blk.fuse_chain)
        st_blk = solver_blk.init_state(guess(NROOTS_BLOCK))
        per_iter_blk, wall_blk, _ = sustained(solve_blk, st_blk, op_fast, solver_blk.diag, tag="headline")
        gflops_blk = flops_iter_blk / per_iter_blk / 1e9
        # convergence proof for the SAME config (fast tier resolves ~2e-4)
        st_blk = solver_blk.init_state(guess(NROOTS_BLOCK))
        final_blk, iters_blk = solve_blk(st_blk, op_fast, solver_blk.diag, tol_fast, 60)
        _, res_fast = f64_quality(final_blk.x, NROOTS_BLOCK)
        R.update({
            "value": round(gflops_blk, 1),
            "vs_baseline": round(gflops_blk / REFERENCE_GFLOPS_BLOCK, 3),
            "fast_tol": tol_fast,
            "fast_converged": bool(np.max(np.asarray(final_blk.errors)) <= tol_fast),
            "block_iter_time_ms": round(per_iter_blk * 1e3, 3),
            "wall64_block_s": round(wall_blk, 4),
            "fast_solve_iterations": int(iters_blk),
            "fast_max_residual_f64": res_fast,
        })

    # ---- TURBO tier: int8 quantized operator (ops/kernels/symm_int8.py) ----
    # One int8 plane + exact diagonal: HALF the bf16 tier's streamed bytes
    # and double-rate MXU dots (the packed matvec drops 125 -> 36 us at
    # n=8192 m=16). Coupling quantization floors the residual ~4e-3 on this
    # spectrum, so the leg runs at its own (looser) tolerance — an honest
    # sustained-rate tier for throughput-first SCREENING passes (the
    # same-accuracy quantized claim is the int8_precise leg).
    def leg_turbo_int8():
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec

        tol_turbo = 5e-3
        matvec_i8, op_i8, _ = make_int8_matvec(matrix, b=1024)
        solver_i8 = FusedDavidson(
            matvec_i8, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_turbo, max_iter=60, operand=op_i8,
            rr=rr_fast,
        )
        solve_i8 = make_davidson_solve(matvec_i8, NROOTS_BLOCK, M_MAX_BLOCK,
                                       rr=rr_fast, fuse_chain=solver_i8.fuse_chain)
        st_i8 = solver_i8.init_state(guess(NROOTS_BLOCK))
        per_iter_i8, _, _ = sustained(solve_i8, st_i8, op_i8, solver_i8.diag, tag="turbo_int8")
        st_i8 = solver_i8.init_state(guess(NROOTS_BLOCK))
        final_i8, iters_i8 = solve_i8(st_i8, op_i8, solver_i8.diag, tol_turbo, 60)
        _, res_i8 = f64_quality(final_i8.x, NROOTS_BLOCK)
        R.update({
            "turbo_int8_gflops": round(flops_iter_blk / per_iter_i8 / 1e9, 1),
            "turbo_int8_iter_time_ms": round(per_iter_i8 * 1e3, 3),
            "turbo_int8_solve_iterations": int(iters_i8),
            "turbo_int8_max_residual_f64": res_i8,
            "turbo_int8_tol": tol_turbo,
            "turbo_int8_converged": bool(
                np.max(np.asarray(final_i8.errors)) <= tol_turbo),
        })

    # ---- PRECISE tier, 16-root block: secondary sustained rate ----
    def leg_precise16():
        solve_pb = make_davidson_solve(matvec_prec, NROOTS_BLOCK, M_MAX_BLOCK)
        solver_pb = FusedDavidson(
            matvec_prec, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_prec, max_iter=60, operand=op_prec,
        )
        st_pb = solver_pb.init_state(guess(NROOTS_BLOCK))
        per_iter_prec, _, _ = sustained(solve_pb, st_pb, op_prec, solver_pb.diag, tag="precise16")
        ctx["solve_pb"], ctx["solver_pb"] = solve_pb, solver_pb
        R.update({
            "precise_tier_gflops": round(flops_iter_blk / per_iter_prec / 1e9, 1),
            "precise_iter_time_ms": round(per_iter_prec * 1e3, 3),
        })

    # ---- QUANTIZED-PRECISE tier: two int8 planes (split-bf16 accuracy
    # class at HALF its streamed bytes — the apples-to-apples quantized
    # comparison at the same 1e-5 tolerance as the precise tier).
    # PRIMARY config is ANCHORED-window RR (VERDICT r4 #7): the kernel win
    # (split matvec ~108 vs ~196 us) is diluted to noise under full-RR's
    # shared eigh(64)+small-op cost, while the PURE window cannot hold the
    # 1e-5 bar (measured f64-residual plateau 4.3e-5 at 120 iters on this
    # spectrum). rr="anchored" K=2 (full RR every 2nd step) converges in
    # the SAME 3 iterations to the same 6.2e-6 floor as full while paying
    # the eigh(64) half as often. Full-RR stays as the secondary field. --
    def leg_int8_precise():
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec

        matvec_i8p, op_i8p, _ = make_int8_matvec(matrix, b=1024, two_plane=True)
        solver_i8p = FusedDavidson(
            matvec_i8p, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_prec, max_iter=60, operand=op_i8p,
            rr="anchored", anchor_every=2,
        )
        solve_i8p = make_davidson_solve(matvec_i8p, NROOTS_BLOCK, M_MAX_BLOCK,
                                        rr="anchored", anchor_every=2,
                                        fuse_chain=solver_i8p.fuse_chain)
        # bare-kernel probe: the two-plane int8 matvec alone, via a tiny
        # fori_loop marginal. Session 5 observed the whole-step rate of
        # THIS leg swing 15.6 -> 4.1 TF across one night while the
        # one-plane turbo and split-bf16 legs held steady — recording the
        # kernel time attributes future swings (kernel vs small-op/eigh).
        import jax as _jax
        from jax import lax as _lax

        @_jax.jit
        def _mv_loop(k, eps, x_, op_):
            def body(i, x):
                y = matvec_i8p(x, op_)
                return y / (jnp.max(jnp.abs(y)) + 1.0)
            return _lax.fori_loop(0, k, body, x_ + eps)[:1, :8]

        xprobe = jnp.asarray(
            np.random.default_rng(1).standard_normal((NROOTS_BLOCK, N))
            / np.sqrt(N), dtype)
        np.asarray(_mv_loop(8, 0.0, xprobe, op_i8p))
        np.asarray(_mv_loop(32, 0.0, xprobe, op_i8p))
        mv_walls = {}
        for k in (8, 32):
            best = float("inf")
            for rep in range(4):
                t0 = time.perf_counter()
                np.asarray(_mv_loop(k, 1e-6 * (rep + 1), xprobe, op_i8p))
                best = min(best, time.perf_counter() - t0)
            mv_walls[k] = best
        R["int8_precise_matvec_us"] = round(
            (mv_walls[32] - mv_walls[8]) / 24 * 1e6, 1)
        st_i8p = solver_i8p.init_state(guess(NROOTS_BLOCK))
        per_iter_i8p, _, _ = sustained(solve_i8p, st_i8p, op_i8p, solver_i8p.diag, tag="int8_precise")
        st_i8p = solver_i8p.init_state(guess(NROOTS_BLOCK))
        final_i8p, iters_i8p = solve_i8p(st_i8p, op_i8p, solver_i8p.diag,
                                         tol_prec, 60)
        _, res_i8p = f64_quality(final_i8p.x, NROOTS_BLOCK)
        R.update({
            "int8_precise_gflops": round(flops_iter_blk / per_iter_i8p / 1e9, 1),
            "int8_precise_iter_time_ms": round(per_iter_i8p * 1e3, 3),
            "int8_precise_solve_iterations": int(iters_i8p),
            "int8_precise_max_residual_f64": res_i8p,
            "int8_precise_tol": tol_prec,
            "int8_precise_converged": bool(
                np.max(np.asarray(final_i8p.errors)) <= tol_prec),
        })
        # hand the operator to the SEPARATE full-RR secondary leg: running
        # the secondary inside this leg's SIGALRM let a slow unwarmed
        # compile discard the primary's done-status and feed the
        # dead-tunnel breaker after the primary metric had already landed
        # (round-5 review finding — observed as timeout_300s with valid
        # primary fields in the record)
        ctx["matvec_i8p"], ctx["op_i8p"] = matvec_i8p, op_i8p

    # ---- full-RR int8_precise variant: fewest iterations to the floor;
    # its step rate is diluted by the shared eigh(64) — recorded honestly
    # as a secondary field, in its own leg ----
    def leg_int8_precise_full():
        matvec_i8p, op_i8p = ctx["matvec_i8p"], ctx.pop("op_i8p")
        solver_full = FusedDavidson(
            matvec_i8p, diag, N, NROOTS_BLOCK, m_max=M_MAX_BLOCK, dtype=dtype,
            convergence_threshold=tol_prec, max_iter=60, operand=op_i8p,
        )
        solve_full = make_davidson_solve(matvec_i8p, NROOTS_BLOCK, M_MAX_BLOCK,
                                         fuse_chain=solver_full.fuse_chain)
        st_full = solver_full.init_state(guess(NROOTS_BLOCK))
        per_iter_full, _, _ = sustained(solve_full, st_full, op_i8p,
                                        solver_full.diag,
                                        tag="int8_precise_full")
        st_full = solver_full.init_state(guess(NROOTS_BLOCK))
        final_full, iters_full = solve_full(st_full, op_i8p, solver_full.diag,
                                            tol_prec, 60)
        R.update({
            "int8_precise_full_gflops": round(
                flops_iter_blk / per_iter_full / 1e9, 1),
            "int8_precise_full_solve_iterations": int(iters_full),
            "int8_precise_full_converged": bool(
                np.max(np.asarray(final_full.errors)) <= tol_prec),
        })

    # ---- FAST tier, 32-root block: peak arithmetic-intensity config ----
    # (same HBM traffic per iteration as r16 — the packed matvec is
    # DMA-bound — at twice the mathematical work per pass)
    def leg_r32():
        r32, m32 = 32, 128
        solver_32 = FusedDavidson(
            matvec_fast, diag, N, r32, m_max=m32, dtype=dtype,
            convergence_threshold=3e-4, max_iter=60, operand=op_fast, rr=rr_fast,
        )
        solve_32 = make_davidson_solve(matvec_fast, r32, m32, rr=rr_fast,
                                       fuse_chain=solver_32.fuse_chain)
        st_32 = solver_32.init_state(guess(r32))
        per_iter_32, _, _ = sustained(solve_32, st_32, op_fast, solver_32.diag, tag="r32")
        flops_iter_32 = (
            2 * r32 * N * N + 2 * m32 * m32 * N
            + 2 * 2 * r32 * N * m32 + 2 * 2 * 2 * r32 * m32 * N
        )
        st_32 = solver_32.init_state(guess(r32))
        final_32, iters_32 = solve_32(st_32, op_fast, solver_32.diag, 3e-4, 60)
        _, res_32 = f64_quality(final_32.x, r32)
        R.update({
            "r32_gflops": round(flops_iter_32 / per_iter_32 / 1e9, 1),
            "r32_iter_time_ms": round(per_iter_32 * 1e3, 3),
            "r32_solve_iterations": int(iters_32),
            "r32_max_residual_f64": res_32,
            "r32_tol": 3e-4,
            "r32_converged": bool(np.max(np.asarray(final_32.errors)) <= 3e-4),
        })

    # ---- FAST tier, 4-root sustained + dispatch constant ----
    def leg_r4():
        solver_r4 = FusedDavidson(
            matvec_fast, diag, N, NROOTS, m_max=M_MAX, dtype=dtype,
            convergence_threshold=tol_fast, max_iter=60, operand=op_fast, rr=rr_fast,
        )
        solve_r4 = make_davidson_solve(matvec_fast, NROOTS, M_MAX, rr=rr_fast,
                                       fuse_chain=solver_r4.fuse_chain)
        st_r4 = solver_r4.init_state(guess(NROOTS))
        per_iter_r4, wall_r4, dispatch_const = sustained(
            solve_r4, st_r4, op_fast, solver_r4.diag, tag="r4"
        )
        gflops_r4 = flops_iter_r4 / per_iter_r4 / 1e9
        R.update({
            "r4_gflops": round(gflops_r4, 1),
            "r4_vs_r1": round(gflops_r4 / REFERENCE_GFLOPS, 3),
            "iter_time_ms": round(per_iter_r4 * 1e3, 3),
            "dispatch_constant_ms": round(dispatch_const * 1e3, 1),
            "wall64_r4_s": round(wall_r4, 4),
        })

    # ---- PRECISE tier, 4-root convergence + quality ----
    def leg_precise_quality():
        solve_pq = make_davidson_solve(matvec_prec, NROOTS, M_MAX)
        solver_pq = FusedDavidson(
            matvec_prec, diag, N, NROOTS, m_max=M_MAX, dtype=dtype,
            convergence_threshold=tol_prec, max_iter=60, operand=op_prec,
        )
        st_pq = solver_pq.init_state(guess(NROOTS))
        out, _ = solve_pq(st_pq, op_prec, solver_pq.diag, -1.0, 1)
        np.asarray(out.errors)  # compile warmup: solve_wall_s measures the solve
        t0 = time.perf_counter()
        final, iters = solve_pq(st_pq, op_prec, solver_pq.diag, tol_prec, 60)
        np.asarray(final.errors)
        wall_solve = time.perf_counter() - t0
        ev_err, res_f64 = f64_quality(final.x, NROOTS)
        R.update({
            "solve_wall_s": round(wall_solve, 4),
            "solve_iterations": int(iters),
            "max_residual_f64": res_f64,
            "precise_tol": tol_prec,
            "precise_converged": bool(np.max(np.asarray(final.errors)) <= tol_prec),
            "eigenvalue_error_vs_dense_f64": ev_err,
        })

    # ---- PRECISE-1e8 leg: the reference's own convergence bar on TPU ----
    # (test_LinearEigensystem.cpp:196: convergence_threshold = 1.0e-8).
    # Split-tier fused solve to its f32 floor at r16, then mixed-precision
    # refinement (host-f64 RR + deflated-projected corrections through the
    # SAME device operator) to max f64 residual <= 1e-8.
    def leg_precise_1e8():
        from iterative_solver_tpu.solvers.refine import EigenpairRefiner

        solve_pb, solver_pb = ctx["solve_pb"], ctx["solver_pb"]
        tol_1e8 = 1e-8
        st_p16 = solver_pb.init_state(guess(NROOTS_BLOCK))
        t0 = time.perf_counter()
        final_p16, _ = solve_pb(st_p16, op_prec, solver_pb.diag, tol_prec, 60)
        np.asarray(final_p16.errors)
        wall_p16 = time.perf_counter() - t0
        refiner = EigenpairRefiner(lambda xx: xx @ matrix.T, matvec_prec, op_prec,
                                   diag, N, NROOTS_BLOCK, dtype=dtype)
        # warmup: compile the inner FusedBlockCG whole-solve OUTSIDE the
        # timed region (every other leg warms its dispatch before the clock)
        refiner.refine(np.asarray(final_p16.x, dtype=np.float64), tol=tol_1e8,
                       max_passes=1)
        t0 = time.perf_counter()
        ref_out = refiner.refine(np.asarray(final_p16.x, dtype=np.float64),
                                 tol=tol_1e8)
        wall_refine = time.perf_counter() - t0
        R.update({
            "precise_1e8_tol": tol_1e8,
            "precise_1e8_max_residual_f64": float(ref_out.residual_norms.max()),
            "precise_1e8_converged": bool(ref_out.converged),
            "precise_1e8_passes": int(ref_out.passes),
            "precise_1e8_floor_before": float(ref_out.history[0]),
            "precise_1e8_wall_s": round(wall_p16 + wall_refine, 4),
            "precise_1e8_refine_wall_s": round(wall_refine, 4),
        })

    # ---- PEAK config: n=16384, 64 roots, fast tier ----
    # the packed matvec is DMA-bound, so sustained GFLOP/s scales with the
    # block width at fixed traffic until the m-row dots saturate the MXU;
    # quadrupling N amortises the fixed eigh/small-op cost 4x further.
    # This is a CONVERGING configuration (window RR, 3e-4 tol in ~4 iters),
    # not a synthetic peak.
    def leg_n16384():
        from iterative_solver_tpu.ops.kernels.symm_pallas import (
            SymmetricBlocked,
            symm_matmat_pallas,
        )

        n16, r64, m192 = 16384, 64, 192
        rng16 = np.random.default_rng(0)
        d16 = np.concatenate(
            [np.linspace(-2.0, 3.0, 64), np.linspace(6.0, 50.0, n16 - 64)])
        a16 = (rng16.standard_normal((n16, n16)) * (0.05 / np.sqrt(n16))).astype(
            np.float32)
        mat16 = (a16 + a16.T).astype(np.float64) + np.diag(d16)
        del a16
        diag16 = np.diag(mat16).copy()
        sym16 = SymmetricBlocked.from_dense(mat16, b=1024, dtype=jnp.bfloat16)
        op16 = (sym16.values, sym16.ii, sym16.jj)

        def matvec16(x, op):
            s = dataclasses.replace(sym16, values=op[0], ii=op[1], jj=op[2])
            return symm_matmat_pallas(x, s)

        solver_16 = FusedDavidson(
            matvec16, diag16, n16, r64, m_max=m192, dtype=dtype,
            convergence_threshold=3e-4, max_iter=60, operand=op16, rr="window",
        )
        solve_16 = make_davidson_solve(matvec16, r64, m192, rr="window",
                                       fuse_chain=solver_16.fuse_chain)
        v16 = np.zeros((r64, n16))
        for row, i in enumerate(np.argsort(diag16)[:r64]):
            v16[row, i] = 1.0
        st_16 = solver_16.init_state(v16)
        per_iter_16, _, _ = sustained(solve_16, st_16, op16, solver_16.diag,
                                      lo=32, hi=160, tag="n16384")
        flops_iter_16 = (
            2 * r64 * n16 * n16 + 2 * m192 * m192 * n16
            + 2 * 2 * r64 * n16 * m192 + 2 * 2 * 2 * r64 * m192 * n16
        )
        st_16 = solver_16.init_state(v16)
        final_16, iters_16 = solve_16(st_16, op16, solver_16.diag, 3e-4, 60)
        # f64 residual spot-check on the 4 lowest roots (full r64 RQ sweep
        # against the 2 GB matrix would dominate the bench wall)
        x16 = np.asarray(final_16.x[:4], dtype=np.float64)
        res_16 = 0.0
        for i in range(4):
            xi = x16[i] / np.linalg.norm(x16[i])
            rq = xi @ mat16 @ xi
            res_16 = max(res_16, float(np.linalg.norm(mat16 @ xi - rq * xi)))
        R.update({
            "n16384_r64_gflops": round(flops_iter_16 / per_iter_16 / 1e9, 1),
            "n16384_r64_iter_time_ms": round(per_iter_16 * 1e3, 3),
            "n16384_r64_solve_iterations": int(iters_16),
            "n16384_r64_max_residual_f64": res_16,
            "n16384_r64_tol": 3e-4,
            "n16384_r64_converged": bool(
                np.max(np.asarray(final_16.errors)) <= 3e-4),
        })
        ctx["mat16"] = mat16
        ctx["diag16"] = diag16
        ctx["v16"] = v16
        ctx["flops_iter_16"] = flops_iter_16

    # int8 variant of the peak config: same spectrum, quantized couplings
    # + exact diagonal at half the bf16 tile bytes. PRODUCTION path is
    # PPCG (VERDICT r4 #2): at r=64 the window step's eigh(2r=128) costs
    # ~490 us against a ~260 us matvec (ablation table in PERF.md) — PPCG
    # replaces it with batched 3x3 RR + an eigh(64) every rr_every
    # iterations (measured 559 vs 782 us/iter at this size). The window
    # variant stays as a secondary field.
    def leg_n16384_int8():
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec
        from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

        n16, r64, m192 = 16384, 64, 192
        mat16, diag16, v16 = ctx.pop("mat16"), ctx["diag16"], ctx["v16"]
        matvec16q, op16q, _ = make_int8_matvec(mat16, b=1024)
        del mat16
        rr_every = 8
        ppcg16 = FusedPPCG(matvec16q, diag16, n16, r64, rr_every=rr_every,
                           dtype=dtype, convergence_threshold=5e-3,
                           max_iter=400, operand=op16q)
        pst16 = ppcg16.init_state(v16)
        per_iter_p16, _, _ = sustained(ppcg16._solve, pst16, op16q,
                                       ppcg16.diag, lo=32, hi=160,
                                       tag="n16384_int8")
        # honest FLOP accounting for PPCG: one matvec per iteration plus
        # the exact re-anchor matvec every rr_every (row ops negligible)
        flops_ppcg16 = 2 * r64 * n16 * n16 * (1.0 + 1.0 / rr_every)
        pst16 = ppcg16.init_state(v16)
        fin_p16, it_p16 = ppcg16._solve(pst16, op16q, ppcg16.diag, 5e-3, 400)
        R.update({
            "n16384_r64_int8_gflops": round(flops_ppcg16 / per_iter_p16 / 1e9, 1),
            "n16384_r64_int8_iter_time_ms": round(per_iter_p16 * 1e3, 3),
            "n16384_r64_int8_solve_iterations": int(it_p16),
            "n16384_r64_int8_tol": 5e-3,
            "n16384_r64_int8_converged": bool(
                np.max(np.asarray(fin_p16.errors)) <= 5e-3),
        })
        # the window-RR secondary runs as its OWN leg (a slow unwarmed
        # compile inside this leg's SIGALRM would discard the PPCG
        # metric's done-status and feed the dead-tunnel breaker)
        ctx["matvec16q"], ctx["op16q"] = matvec16q, op16q

    # ---- window-RR variant of the n16384 int8 peak (pre-round-5
    # primary), separate secondary leg ----
    def leg_n16384_int8_window():
        n16, r64, m192 = 16384, 64, 192
        matvec16q, op16q = ctx["matvec16q"], ctx.pop("op16q")
        diag16, v16 = ctx["diag16"], ctx["v16"]
        solver_16q = FusedDavidson(
            matvec16q, diag16, n16, r64, m_max=m192, dtype=dtype,
            convergence_threshold=5e-3, max_iter=60, operand=op16q,
            rr="window",
        )
        solve_16q = make_davidson_solve(matvec16q, r64, m192, rr="window",
                                        fuse_chain=solver_16q.fuse_chain)
        st_16q = solver_16q.init_state(v16)
        per_iter_16q, _, _ = sustained(solve_16q, st_16q, op16q,
                                       solver_16q.diag, lo=32, hi=160,
                                       tag="n16384_int8_window")
        st_16q = solver_16q.init_state(v16)
        final_16q, iters_16q = solve_16q(st_16q, op16q, solver_16q.diag,
                                         5e-3, 60)
        R.update({
            "n16384_r64_int8_window_gflops": round(
                ctx["flops_iter_16"] / per_iter_16q / 1e9, 1),
            "n16384_r64_int8_window_solve_iterations": int(iters_16q),
            "n16384_r64_int8_window_converged": bool(
                np.max(np.asarray(final_16q.errors)) <= 5e-3),
        })

    # ---- HARD-spectrum solve: PPCG vs window Davidson, wall to 1e-5 ----
    # weakly diagonally dominant operator (Jacobi preconditioning stalls the
    # window modes); precise split tier so the tolerance is reachable.
    # This is the wall-clock-to-solution metric production cares about.
    # The hard_window leg is the INTENDED stall contrast with PPCG — its
    # converged flag is expected False.
    def leg_hard_spectrum():
        from iterative_solver_tpu.ops.kernels.symm_pallas import (
            SymmetricBlockedSplit,
            symm_matmat_split_pallas,
        )
        from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

        nh, rh = 8192, 8
        rngh = np.random.default_rng(3)
        ah = rngh.standard_normal((nh, nh)) * (0.4 / np.sqrt(nh))
        math_ = ah + ah.T + np.diag(np.linspace(0.0, 6.0, nh))
        del ah
        diagh = np.diag(math_).copy()
        symh = SymmetricBlockedSplit.from_dense(math_, b=512)
        oph = (symh.hi, symh.lo, symh.ii, symh.jj)

        def matvec_h(x, op):
            s = dataclasses.replace(symh, hi=op[0], lo=op[1], ii=op[2], jj=op[3])
            return symm_matmat_split_pallas(x, s)

        vh = np.zeros((rh, nh))
        for row, i in enumerate(np.argsort(diagh)[:rh]):
            vh[row, i] = 1.0
        # 5e-5 sits above PPCG's f32 carried-quantity floor (~2.2e-5
        # measured on this operator) and below the window mode's stall
        # level (~1.1e-4 after 1500 iterations)
        tol_h, cap_h = 5e-5, 1500

        ppcg_h = FusedPPCG(matvec_h, diagh, nh, rh, rr_every=5, dtype=dtype,
                           convergence_threshold=tol_h, max_iter=cap_h,
                           operand=oph)
        st_h = ppcg_h.init_state(vh)
        out_h, _ = ppcg_h._solve(st_h, oph, ppcg_h.diag, -1.0, 1)
        np.asarray(out_h.errors)  # warmup/compile
        st_h = ppcg_h.init_state(vh)
        t0 = time.perf_counter()
        fin_h, it_ppcg_h = ppcg_h._solve(st_h, oph, ppcg_h.diag, tol_h, cap_h)
        np.asarray(fin_h.errors)
        wall_ppcg_h = time.perf_counter() - t0
        res_ppcg_h = float(np.max(np.asarray(fin_h.errors)))

        solver_wh = FusedDavidson(matvec_h, diagh, nh, rh, m_max=4 * rh,
                                  dtype=dtype, convergence_threshold=tol_h,
                                  max_iter=cap_h, operand=oph, rr="window")
        solve_wh = make_davidson_solve(matvec_h, rh, 4 * rh, rr="window",
                                       fuse_chain=solver_wh.fuse_chain)
        st_wh = solver_wh.init_state(vh)
        out_wh, _ = solve_wh(st_wh, oph, solver_wh.diag, -1.0, 1)
        np.asarray(out_wh.errors)
        st_wh = solver_wh.init_state(vh)
        t0 = time.perf_counter()
        fin_wh, it_win_h = solve_wh(st_wh, oph, solver_wh.diag, tol_h, cap_h)
        np.asarray(fin_wh.errors)
        wall_win_h = time.perf_counter() - t0
        res_win_h = float(np.max(np.asarray(fin_wh.errors)))
        R.update({
            "hard_tol": tol_h,
            "hard_ppcg_wall_s": round(wall_ppcg_h, 4),
            "hard_ppcg_iterations": int(it_ppcg_h),
            "hard_ppcg_max_residual": res_ppcg_h,
            "hard_ppcg_converged": bool(res_ppcg_h <= tol_h),
            "hard_window_wall_s": round(wall_win_h, 4),
            "hard_window_iterations": int(it_win_h),
            "hard_window_max_residual": res_win_h,
            "hard_window_converged": bool(res_win_h <= tol_h),
        })

    # ---- sparse action throughput (BASELINE.md: Davidson SpMV nnz/s) ----
    def leg_spmv():
        from iterative_solver_tpu.models.synthetic_fci import synthetic_fci_bsr
        from iterative_solver_tpu.ops.kernels.spmv_pallas import _bsr_matmat_xla

        bsr, _ = synthetic_fci_bsr(N, block=128, density=0.3, seed=1, dtype=dtype)
        n_rb = bsr.shape[0] // bsr.bm
        ctx["bsr"] = bsr

        # dynamic trip count: one compiled program for both timing points
        @jax.jit
        def spmm_loop(x, values, col_idx, row_idx, k):
            def body(i, acc):
                return _bsr_matmat_xla(acc, values, col_idx, row_idx,
                                       bsr.bm, bsr.bn, n_rb) * 1e-2

            return jax.lax.fori_loop(0, k, body, x)

        def spmv_rate(rows):
            """nnz/s of the block action on a (rows, N) block. The action is
            value-traffic/overhead bound, so wall time is flat in rows — the
            production solvers apply it to NROOTS_BLOCK-row blocks."""
            xs = jnp.asarray(
                np.random.default_rng(2).standard_normal((rows, bsr.shape[0])),
                dtype=dtype)
            # marginal (two trip counts) removes the ~28 ms tunnel dispatch
            # overhead; trip counts large enough to dwarf RTT jitter
            np.asarray(spmm_loop(xs, bsr.values, bsr.col_idx, bsr.row_idx, 4)[0, :2])
            walls = {}
            trips = (64, 1024) if backend == "tpu" else (4, 32)
            for k in trips:
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    out = spmm_loop(xs, bsr.values, bsr.col_idx, bsr.row_idx, k)
                    np.asarray(out[0, :2])
                    best = min(best, time.perf_counter() - t0)
                walls[k] = best
            wall = (walls[trips[1]] - walls[trips[0]]) / (trips[1] - trips[0])
            return bsr.nnz * rows / wall

        R.update({
            "spmv_gnnz_per_s": round(spmv_rate(NROOTS_BLOCK) / 1e9, 2),
            "spmv_rows": NROOTS_BLOCK,
            "spmv_r4_gnnz_per_s": round(spmv_rate(NROOTS) / 1e9, 2),
            "spmv_nnz": ctx["bsr"].nnz,
        })

    # quantized sparse tier: same action through int8 blocks (half the
    # value traffic, exact int32 accumulation) — bf16-class couplings
    def leg_spmv_int8():
        from iterative_solver_tpu.ops.kernels.spmv_pallas import (
            BSRMatrixInt8,
            _bsr_matmat_int8_xla,
        )
        from iterative_solver_tpu.ops.kernels.symm_int8 import quantize_rows

        bsr = ctx["bsr"]
        n_rb = bsr.shape[0] // bsr.bm
        bsr_q = BSRMatrixInt8.from_bsr(bsr)

        @jax.jit
        def spmm_loop_int8(x, q, cq, rq, dg, col_idx, row_idx, k):
            def body(i, acc):
                xf = acc.astype(jnp.float32)
                qx, sx = quantize_rows(xf * cq[None, :])
                y = _bsr_matmat_int8_xla(qx, q, col_idx, row_idx,
                                         bsr.bm, bsr.bn, n_rb)
                y = y.astype(jnp.float32) * sx * rq[None, :] + xf * dg[None, :]
                return (y * 1e-2).astype(acc.dtype)

            return jax.lax.fori_loop(0, k, body, x)

        xs = jnp.asarray(
            np.random.default_rng(2).standard_normal((NROOTS_BLOCK, bsr.shape[0])),
            dtype=dtype)
        dg = bsr_q.diagonal if bsr_q.diagonal is not None else jnp.zeros(
            bsr.shape[0], jnp.float32)
        args = (bsr_q.q, bsr_q.cq, bsr_q.rq, dg, bsr_q.col_idx, bsr_q.row_idx)
        np.asarray(spmm_loop_int8(xs, *args, 4)[0, :2])
        walls = {}
        trips = (64, 1024) if backend == "tpu" else (4, 32)
        for k in trips:
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = spmm_loop_int8(xs, *args, k)
                np.asarray(out[0, :2])
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
        wall = (walls[trips[1]] - walls[trips[0]]) / (trips[1] - trips[0])
        R["spmv_int8_gnnz_per_s"] = round(bsr.nnz * NROOTS_BLOCK / wall / 1e9, 2)

    # ---- NON-HERMITIAN chunked path vs fused symmetric control ----
    # (VERDICT r2 next #3: was ~100x via the parity host loop). Same
    # operator tier (dense XLA HIGHEST) and spectrum class for both
    # sides; the nonsym side pays one chunk dispatch + one host eig per
    # block append instead of one while_loop for the whole solve.
    def leg_nonsym():
        from iterative_solver_tpu.solvers.fused_nonsym import FusedNonSymDavidson

        nn, rn, mn = 8192, 16, 64
        rngn = np.random.default_rng(7)
        an = rngn.standard_normal((nn, nn)) * (0.05 / np.sqrt(nn))
        dn = np.concatenate([np.linspace(-2.0, 0.0, 32),
                             np.linspace(2.0, 20.0, nn - 32)])
        mat_n = an + an.T + np.diag(dn)
        mat_n[np.tril_indices(nn, -1)] *= 0.9  # reference's 0.1 strength
        diag_n = np.diag(mat_n).copy()

        def mv(x, op):
            return jnp.matmul(x, op.T, precision=jax.lax.Precision.HIGHEST)

        op_n = jnp.asarray(mat_n, dtype)
        vn = np.zeros((rn, nn))
        for row, i in enumerate(np.argsort(diag_n)[:rn]):
            vn[row, i] = 1.0
        tol_n = 2e-4
        # PRODUCTION path (round 4): rr="device" — single-dispatch loop,
        # simultaneous Rayleigh-shifted inverse iteration replaces the
        # per-append host eig (no TPU eig lowering needed); host LAPACK
        # runs once on the final (r, r) G. Measured: 44.7 ms vs the
        # chunked host-eig path's 136 ms in the same window.
        s_ns = FusedNonSymDavidson(mv, diag_n, nn, rn, m_max=mn, dtype=dtype,
                                   convergence_threshold=tol_n, max_iter=60,
                                   operand=op_n, rr="device")
        s_ns.solve(vn)  # warm compile
        best = float("inf")
        for _ in range(3):
            s_ns.iterations = 0
            t0 = time.perf_counter()
            _, _, errs_ns, it_ns = s_ns.solve(vn)
            best = min(best, time.perf_counter() - t0)
        # chunked host-eig mode (the round-3 path) for the secondary factor
        s_host = FusedNonSymDavidson(mv, diag_n, nn, rn, m_max=mn,
                                     dtype=dtype, convergence_threshold=tol_n,
                                     max_iter=60, operand=op_n)
        s_host.solve(vn)
        best_h = float("inf")
        for _ in range(3):
            s_host.iterations = 0
            t0 = time.perf_counter()
            _, _, errs_h, _ = s_host.solve(vn)
            best_h = min(best_h, time.perf_counter() - t0)
        # symmetric control: SAME tier/shape through the fused while_loop
        mat_s = 0.5 * (mat_n + mat_n.T)
        op_s = jnp.asarray(mat_s, dtype)
        s_sym = FusedDavidson(mv, np.diag(mat_s), nn, rn, m_max=mn,
                              dtype=dtype, convergence_threshold=tol_n,
                              max_iter=60, operand=op_s)
        s_sym.run_on_device(vn)  # warm
        best_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, errs_s, it_s = s_sym.run_on_device(vn)
            best_s = min(best_s, time.perf_counter() - t0)
        R.update({
            "nonsym_wall_s": round(best, 4),
            "nonsym_iterations": int(it_ns),
            "nonsym_max_residual": float(np.max(errs_ns)),
            "nonsym_tol": tol_n,
            "nonsym_converged": bool(np.max(errs_ns) <= tol_n),
            "nonsym_sym_control_wall_s": round(best_s, 4),
            "nonsym_vs_sym_factor": round(best / best_s, 2),
            "nonsym_host_wall_s": round(best_h, 4),
            "nonsym_host_vs_sym_factor": round(best_h / best_s, 2),
            "nonsym_host_converged": bool(np.max(errs_h) <= tol_n),
        })

        # dense int8 tier (round 4): two-plane quantized operator through
        # the SAME device-RR solve (quarter/half the f32/bf16 HBM
        # traffic) + marginal per-matvec walls for both planes
        from iterative_solver_tpu.ops.kernels.dense_int8 import (
            DenseInt8,
            DenseInt8Split,
            dense_int8_matvec,
            dense_int8_matvec_split,
        )

        op_q1 = DenseInt8.from_dense(mat_n)
        op_q2 = DenseInt8Split.from_dense(mat_n)
        s_q = FusedNonSymDavidson(
            lambda x, t: dense_int8_matvec_split(x, t), diag_n, nn, rn,
            m_max=mn, dtype=dtype, convergence_threshold=5e-4, max_iter=60,
            operand=op_q2.tree(), rr="device")
        s_q.solve(vn)
        best_q = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, errs_q, it_q = s_q.solve(vn)
            best_q = min(best_q, time.perf_counter() - t0)
        R.update({
            "nonsym_int8_wall_s": round(best_q, 4),
            "nonsym_int8_max_residual": float(np.max(errs_q)),
            "nonsym_int8_converged": bool(np.max(errs_q) <= 5e-4),
        })

        @jax.jit
        def mv_loop_q1(x, tree, k):
            def body(i, acc):
                return (dense_int8_matvec(acc, tree) * 1e-2).astype(acc.dtype)

            return jax.lax.fori_loop(0, k, body, x)

        @jax.jit
        def mv_loop_q2(x, tree, k):
            def body(i, acc):
                return (dense_int8_matvec_split(acc, tree) * 1e-2).astype(
                    acc.dtype)

            return jax.lax.fori_loop(0, k, body, x)

        xs_q = jnp.asarray(rngn.standard_normal((rn, nn)), dtype)
        for name, loop, tree in (("dense_int8_matvec_us", mv_loop_q1, op_q1.tree()),
                                 ("dense_int8split_matvec_us", mv_loop_q2, op_q2.tree())):
            np.asarray(loop(xs_q, tree, 4)[0, :2])
            walls = {}
            trips = (32, 256) if backend == "tpu" else (2, 8)
            for k in trips:
                b_ = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    out = loop(xs_q, tree, k)
                    np.asarray(out[0, :2])
                    b_ = min(b_, time.perf_counter() - t0)
                walls[k] = b_
            R[name] = round((walls[trips[1]] - walls[trips[0]])
                            / (trips[1] - trips[0]) * 1e6, 1)

    # ---- BIG peak config (opt-in, --big): n=32768, 64 roots ----
    # PERF.md's 50-TF claim made driver-reproducible. Off by default: the
    # host-side setup packs an 8.6 GB matrix (minutes of numpy wall).
    def leg_big():
        from iterative_solver_tpu.ops.kernels.symm_int8 import make_int8_matvec
        from iterative_solver_tpu.ops.kernels.symm_pallas import (
            SymmetricBlocked,
            symm_matmat_pallas,
        )

        n32, r64b, m192b = 32768, 64, 192
        rng32 = np.random.default_rng(0)
        d32 = np.concatenate(
            [np.linspace(-2.0, 3.0, 64), np.linspace(6.0, 50.0, n32 - 64)])
        a32 = (rng32.standard_normal((n32, n32)) * (0.05 / np.sqrt(n32))).astype(
            np.float32)
        mat32 = a32 + a32.T
        del a32
        mat32 = mat32.astype(np.float64)
        mat32[np.arange(n32), np.arange(n32)] += d32
        diag32 = np.diag(mat32).copy()
        sym32 = SymmetricBlocked.from_dense(mat32, b=1024, dtype=jnp.bfloat16)
        op32 = (sym32.values, sym32.ii, sym32.jj)

        def matvec32(x, op):
            s = dataclasses.replace(sym32, values=op[0], ii=op[1], jj=op[2])
            return symm_matmat_pallas(x, s)

        solver_n32 = FusedDavidson(
            matvec32, diag32, n32, r64b, m_max=m192b, dtype=dtype,
            convergence_threshold=3e-4, max_iter=60, operand=op32, rr="window",
        )
        solve_n32 = make_davidson_solve(matvec32, r64b, m192b, rr="window",
                                        fuse_chain=solver_n32.fuse_chain)
        v32 = np.zeros((r64b, n32))
        for row, i in enumerate(np.argsort(diag32)[:r64b]):
            v32[row, i] = 1.0
        st_n32 = solver_n32.init_state(v32)
        per_iter_n32, _, _ = sustained(solve_n32, st_n32, op32, solver_n32.diag,
                                       lo=16, hi=64, tag="n32768")
        flops_iter_n32 = (
            2 * r64b * n32 * n32 + 2 * m192b * m192b * n32
            + 2 * 2 * r64b * n32 * m192b + 2 * 2 * 2 * r64b * m192b * n32
        )
        st_n32 = solver_n32.init_state(v32)
        final_n32, iters_n32 = solve_n32(st_n32, op32, solver_n32.diag, 3e-4, 60)
        res_n32 = float(np.max(np.asarray(final_n32.errors)))
        del sym32, op32
        R.update({
            "n32768_r64_gflops": round(flops_iter_n32 / per_iter_n32 / 1e9, 1),
            "n32768_r64_iter_time_ms": round(per_iter_n32 * 1e3, 3),
            "n32768_r64_solve_iterations": int(iters_n32),
            "n32768_r64_max_residual": res_n32,
            "n32768_r64_tol": 3e-4,
            "n32768_r64_converged": bool(res_n32 <= 3e-4),
        })

        # int8 window-RR Davidson variant on the dense-derived quantized
        # operator — SECONDARY field only: the production int8 PPCG metric
        # (n32768_r64_int8_gflops) comes from the always-on direct leg
        # (leg_n32768_int8_direct), which needs no dense build.
        matvec32q, op32q, _ = make_int8_matvec(mat32, b=1024)
        del mat32
        solver_n32q = FusedDavidson(
            matvec32q, diag32, n32, r64b, m_max=m192b, dtype=dtype,
            convergence_threshold=5e-3, max_iter=60, operand=op32q, rr="window",
        )
        solve_n32q = make_davidson_solve(matvec32q, r64b, m192b, rr="window",
                                         fuse_chain=solver_n32q.fuse_chain)
        st_n32q = solver_n32q.init_state(v32)
        per_iter_n32q, _, _ = sustained(solve_n32q, st_n32q, op32q,
                                        solver_n32q.diag, lo=16, hi=64,
                                        tag="n32768_int8_window")
        st_n32q = solver_n32q.init_state(v32)
        final_n32q, iters_n32q = solve_n32q(st_n32q, op32q, solver_n32q.diag,
                                            5e-3, 60)
        R.update({
            "n32768_r64_int8_window_gflops": round(
                flops_iter_n32 / per_iter_n32q / 1e9, 1),
            "n32768_r64_int8_window_solve_iterations": int(iters_n32q),
            "n32768_r64_int8_window_converged": bool(
                np.max(np.asarray(final_n32q.errors)) <= 5e-3),
        })

    # ---- n32768 r64 int8 FLAGSHIP, direct-generated (VERDICT r4 #2):
    # the packed one-plane operator is emitted straight to int8 tiles
    # (models/synthetic_fci.synthetic_packed_int8 — the dense f64 build
    # costs ~10 min of host time and can never fit the driver wall), and
    # the solver is PPCG: at r=64 the window step's eigh(128) costs more
    # than the matvec (PERF.md ablation); PPCG replaces it with batched
    # 3x3 RR + an eigh(64) every rr_every iterations. ----
    def leg_n32768_int8_direct():
        from iterative_solver_tpu.models.synthetic_fci import (
            synthetic_packed_int8,
        )
        from iterative_solver_tpu.ops.kernels.symm_int8 import (
            symm_matmat_int8_pallas,
        )
        from iterative_solver_tpu.solvers.fused_ppcg import FusedPPCG

        n32, r64b = 32768, 64
        t0 = time.time()
        sym32, diag32d = synthetic_packed_int8(n32, b=1024, seed=0)
        R["n32768_direct_build_s"] = round(time.time() - t0, 1)
        op32q = (sym32.q, sym32.gq, sym32.diagonal, sym32.ii, sym32.jj)

        def matvec32q(x, t):
            s = dataclasses.replace(sym32, q=t[0], gq=t[1], diagonal=t[2],
                                    ii=t[3], jj=t[4])
            return symm_matmat_int8_pallas(x, s)

        rr_every_b = 8
        ppcg32 = FusedPPCG(matvec32q, diag32d, n32, r64b,
                           rr_every=rr_every_b, dtype=dtype,
                           convergence_threshold=5e-3, max_iter=400,
                           operand=op32q)
        v32d = np.zeros((r64b, n32))
        for row, i in enumerate(np.argsort(diag32d)[:r64b]):
            v32d[row, i] = 1.0
        pst32 = ppcg32.init_state(v32d)
        per_iter_p32, _, _ = sustained(ppcg32._solve, pst32, op32q,
                                       ppcg32.diag, lo=16, hi=64,
                                       tag="n32768_int8")
        flops_ppcg32 = 2 * r64b * n32 * n32 * (1.0 + 1.0 / rr_every_b)
        pst32 = ppcg32.init_state(v32d)
        fin_p32, it_p32 = ppcg32._solve(pst32, op32q, ppcg32.diag, 5e-3, 400)
        res_p32 = float(np.max(np.asarray(fin_p32.errors)))
        R.update({
            "n32768_r64_int8_gflops": round(
                flops_ppcg32 / per_iter_p32 / 1e9, 1),
            "n32768_r64_int8_iter_time_ms": round(per_iter_p32 * 1e3, 3),
            "n32768_r64_int8_solve_iterations": int(it_p32),
            "n32768_r64_int8_max_residual": res_p32,
            "n32768_r64_int8_tol": 5e-3,
            "n32768_r64_int8_converged": bool(res_p32 <= 5e-3),
        })

    def warm_cmd(leg):
        """First-compile subprocess command (benchmarks/warm_compile.py) —
        a C-level compile hang becomes a killable subprocess timeout that
        feeds the dead-tunnel breaker. TPU only (CPU compiles locally)."""
        if backend != "tpu":
            return None
        return [sys.executable, "-m", "benchmarks.warm_compile", leg]

    # ---- schedule: most important first, so a driver-side kill loses the
    # least valuable tail, never the headline. The judged triplet
    # (headline + int8 tiers + nonsym) runs before everything else so it
    # survives any deadline truncation (VERDICT r4 #1). ----
    runner.run("headline", leg_headline, budget_s=420,
               warm_cmd=warm_cmd("headline"))
    if backend == "tpu":
        runner.run("turbo_int8", leg_turbo_int8, budget_s=240,
                   warm_cmd=warm_cmd("turbo_int8"))
        runner.run("int8_precise", leg_int8_precise, budget_s=300,
                   warm_cmd=warm_cmd("int8_precise"))
        runner.run("nonsym", leg_nonsym, budget_s=420)
        # the flagship big-size metric, cheap enough for the default run
        # (direct int8 generation, no dense build)
        runner.run("n32768_int8", leg_n32768_int8_direct, budget_s=300,
                   warm_cmd=warm_cmd("n32768_ppcg"))
    runner.run("precise16", leg_precise16, budget_s=240)
    runner.run("r4", leg_r4, budget_s=180)
    runner.run("precise_quality", leg_precise_quality, budget_s=180)
    if backend == "tpu":
        runner.run("r32", leg_r32, budget_s=180)
    runner.run("precise_1e8", leg_precise_1e8, budget_s=240, needs=("precise16",))
    if backend == "tpu":
        runner.run("n16384", leg_n16384, budget_s=420,
                   warm_cmd=warm_cmd("n16384"))
        runner.run("n16384_int8", leg_n16384_int8, budget_s=240,
                   needs=("n16384",), warm_cmd=warm_cmd("n16384_ppcg"))
        runner.run("hard_spectrum", leg_hard_spectrum, budget_s=300)
    runner.run("spmv", leg_spmv, budget_s=240)
    runner.run("spmv_int8", leg_spmv_int8, budget_s=180, needs=("spmv",))
    if backend == "tpu":
        # streamed offload tier (VERDICT r2 next #2): pipelined vs serial vs
        # host gram at 256 x 65536, plus the tunnel H2D probe that explains
        # the vs_host outcome in this sandbox, and a beyond-device-budget
        # streamed banded solve (see benchmarks/offload_benchmark.py)
        def leg_offload():
            from benchmarks.offload_benchmark import run_offload_benchmark

            R.update(run_offload_benchmark())

        def leg_banded_stream():
            from benchmarks.offload_benchmark import run_beyond_budget_banded

            R.update(run_beyond_budget_banded())

        runner.run("offload", leg_offload, budget_s=240)
        runner.run("banded_stream", leg_banded_stream, budget_s=240)
        # secondary variants, isolated from their primaries' done-status
        runner.run("int8_precise_full", leg_int8_precise_full, budget_s=240,
                   needs=("int8_precise",),
                   warm_cmd=warm_cmd("int8_precise_full"))
        runner.run("n16384_int8_window", leg_n16384_int8_window,
                   budget_s=240, needs=("n16384_int8",),
                   warm_cmd=warm_cmd("n16384_int8"))

    # ---- big legs: only when the REMAINING budget clears their measured
    # cost (phenol ~730 s cold / ~200 s warm-cache; n32768 setup alone can
    # cost ~10 min on a slow-memory host). Under the default 850 s budget
    # these auto-DISABLE and are recorded as deadline skips — the round-4
    # driver artifact died rc=124 precisely because they auto-enabled
    # against a 2700 s internal budget while the driver killed at ~1000 s.
    # Builder sessions force them with --big/--phenol + BENCH_BUDGET_S. --
    if backend == "tpu" and not runner.dead and (
            phenol or runner.remaining() > 900):
        from benchmarks.phenol_scale import leg_phenol_scale

        n_phenol = 1 << 20 if (phenol or runner.remaining() > 1200) else 1 << 19
        runner.run("phenol_scale", lambda: leg_phenol_scale(R, n=n_phenol),
                   budget_s=1200, warm_cmd=warm_cmd("phenol"),
                   warm_timeout_s=300)
    elif backend == "tpu":
        runner.result["legs_skipped"]["phenol_scale"] = "deadline_autodisabled"
    run_big = backend == "tpu" and not runner.dead and (
        big or runner.remaining() > 1100)
    R["n32768_enabled"] = bool(run_big)
    if run_big:
        runner.run("n32768", leg_big, budget_s=1500,
                   warm_cmd=warm_cmd("n32768"))
    elif backend == "tpu":
        runner.result["legs_skipped"]["n32768"] = "deadline_autodisabled"
    runner.emit(status="complete")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="add the n=32768 r64 peak leg (8.6 GB host setup)")
    ap.add_argument("--phenol", action="store_true",
                    help="add the phenol-scale composition leg (n>=2^20 "
                         "int8 BSR + streamed tier + refine to 1e-8); "
                         "raise BENCH_BUDGET_S to >=3000 — the leg alone "
                         "measured 732 s on the tunneled chip")
    args = ap.parse_args()
    main(big=args.big, phenol=args.phenol)
