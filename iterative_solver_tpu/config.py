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
"""

from __future__ import annotations

import os
from typing import Any, Dict

_DEFAULTS: Dict[str, Any] = {
    "BSR_BLOCK": 128,
    "GEMM_BUFFERS": 2,
    "PROFILER_DEPTH": 0,
    "PROFILER_OUTPUT": "",
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
