"""Ambient global configuration.

The TPU-era version of the reference's molpro::Options("ITERATIVE-SOLVER")
ambient knobs (reference: itsolv/options.h:9-21 — GEMM_BUFFERS,
GEMM_PAGESIZE, PROFILER_DEPTH/OUTPUT/...). Values come from, in priority
order: programmatic `set_option`, environment variables prefixed
``ITERATIVE_SOLVER_``, then the defaults below.

Knobs:
- ``BSR_BLOCK``      default block size for sparse operators (128 = MXU tile)
- ``GEMM_BUFFERS``   prefetch depth of the native vecstore pipeline (2)
- ``PROFILER_DEPTH`` max region nesting recorded by utils.Profiler (0 = off)
- ``PROFILER_OUTPUT`` file to dump the profile tree to at solver teardown
- ``COMPILE_CACHE``  persistent XLA compilation cache directory ("" = off,
  "auto" = ~/.cache/iterative_solver_tpu/xla). The fused solvers compile
  while_loop+eigh graphs that cost tens of seconds through a remote-compile
  TPU tunnel (measured 76 s -> 3 s on the second process with the cache).
"""

from __future__ import annotations

import os
from typing import Any, Dict

_DEFAULTS: Dict[str, Any] = {
    "BSR_BLOCK": 128,
    "GEMM_BUFFERS": 2,
    "PROFILER_DEPTH": 0,
    "PROFILER_OUTPUT": "",
    "PROFILER_DOTGRAPH": "",
    "PROFILER_THRESHOLD": 0.01,
    "COMPILE_CACHE": "auto",
}

_overrides: Dict[str, Any] = {}


def get_option(key: str, default: Any = None):
    key = key.upper()
    if key in _overrides:
        return _overrides[key]
    env = os.environ.get(f"ITERATIVE_SOLVER_{key}")
    if env is not None:
        base = _DEFAULTS.get(key, default)
        if isinstance(base, int):
            return int(env)
        if isinstance(base, float):
            return float(env)
        return env
    return _DEFAULTS.get(key, default)


def set_option(key: str, value: Any) -> None:
    _overrides[key.upper()] = value


def clear_options() -> None:
    _overrides.clear()


_cache_enabled = False


def enable_compile_cache() -> None:
    """Point jax at the persistent compilation cache (idempotent).

    Called at package import. The first compile of a fused-solver graph
    through a remote TPU tunnel costs tens of seconds; with the persistent
    cache, later processes replay it in ~3 s."""
    global _cache_enabled
    if _cache_enabled:
        return
    target = get_option("COMPILE_CACHE")
    if not target:
        return
    if target == "auto":
        target = os.path.join(
            os.path.expanduser("~"), ".cache", "iterative_solver_tpu", "xla"
        )
    try:
        import jax

        os.makedirs(target, exist_ok=True)
        # respect an explicit user/jax-level setting
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", target)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:  # cache is an optimisation, never a hard dependency
        pass


def _host_fingerprint() -> str:
    """Short hash of this host's CPU model + feature flags."""
    import hashlib

    text = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags")):
                    text = text + line
                    if "flags" in line:
                        break
    except OSError:
        import platform

        text = platform.processor() or platform.machine()
    return hashlib.sha1(text.encode()).hexdigest()[:12]


def disable_compile_cache() -> None:
    """Turn the persistent compile cache off for this process.

    Used by the driver dryrun (__graft_entry__) on CPU: XLA:CPU AOT
    reloads emit cpu_aot_loader SIGILL-risk errors even for same-host
    entries (the serialized target features include LLVM tuning flags
    like +prefer-no-scatter that the host-feature check never matches),
    and CPU compiles are local and cheap — the cache only pays for
    itself through the remote TPU tunnel."""
    global _cache_enabled
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
        _cache_enabled = False
    except Exception:
        pass


def use_host_local_cache_for_cpu() -> None:
    """Re-point the persistent compile cache at a host-fingerprinted subdir.

    Call AFTER forcing ``jax_platforms=cpu`` (tests' conftest, the driver
    dryrun). XLA:CPU cache entries are AOT machine code: replaying one
    compiled on a host with different CPU features risks SIGILL
    (cpu_aot_loader warnings all over MULTICHIP_r02). TPU entries are
    target-TPU executables and stay in the shared directory — this only
    partitions the CPU-forced processes' cache per host."""
    try:
        import jax

        base = jax.config.jax_compilation_cache_dir
        if not base:
            return
        tag = f"cpu-{_host_fingerprint()}"
        if os.path.basename(base) == tag:
            return
        target = os.path.join(base, tag)
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
    except Exception:
        pass
