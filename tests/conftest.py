"""Test configuration: CPU backend with 8 virtual devices + float64.

The multi-device tests replace the reference's ``mpiexec -n 2`` gtest runs
(SURVEY.md §4) with a virtual CPU mesh; numerical-parity tests need f64 like
the reference's LAPACK path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# sitecustomize imports jax before this file runs, so env vars alone are too
# late: force the platform + precision through the live config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# partition the persistent compile cache per host for CPU-forced runs —
# XLA:CPU entries are AOT machine code and replaying a foreign host's
# entries risks SIGILL (VERDICT r2 weak #5)
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iterative_solver_tpu import config as _islv_config  # noqa: E402

_islv_config.use_host_local_cache_for_cpu()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def hamiltonians():
    from iterative_solver_tpu.models import load_hamiltonian

    out = {}
    for name in ("he", "bh", "hf"):
        path = os.path.join(REFERENCE_EXAMPLES, f"{name}.hamiltonian")
        if os.path.exists(path):
            out[name] = load_hamiltonian(path)
    return out
