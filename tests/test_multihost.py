"""Multi-process SPMD: the fused solve over a mesh spanning TWO processes.

The single-process 8-device tests (test_fused_davidson, test_sharded_*)
validate the sharding math; this suite validates the multi-HOST runtime
shape — ``jax.distributed.initialize`` joining separate processes into one
global mesh, cross-process collectives carrying every Gram reduction — the
analogue of the reference's ``mpiexec -n 2`` CI leg (.gitlab-ci.yml:46,
SURVEY.md §4). CPU processes talk over Gloo where real deployments use
ICI/DCN; the program (GSPMD-partitioned fused while_loop) is identical.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_fused_solve():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:  # a hung coordinator must not leak the sibling
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(lines[-1])
    # SPMD: every process computes the identical replicated answer
    assert results[0] == results[1], results
