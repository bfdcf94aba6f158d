"""End-to-end test of the embedded C shared library: builds the .so with
cffi, compiles the C example with gcc, runs it in a subprocess, and checks
the Davidson result — the analogue of the reference's Fortran-twin gtest
cross-checks through the C ABI."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("gcc") is None, reason="gcc unavailable")
def test_c_program_through_embedded_library(tmp_path):
    import sysconfig

    build_dir = str(tmp_path / "build_c")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # build the embedded library (writes include/ next to build dir's parent)
    out = subprocess.run(
        [sys.executable, "-m", "iterative_solver_tpu.bindings.build_embedded", build_dir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    so_dir = build_dir
    include_dir = str(tmp_path / "include")
    exe = str(tmp_path / "test_c_abi")
    src = os.path.join(REPO, "examples", "c", "linear_eigensystem_c.c")
    compile_out = subprocess.run(
        ["gcc", "-O2", src, "-I", include_dir, "-L", so_dir,
         "-literative_solver_tpu_c", "-o", exe],
        capture_output=True, text=True, timeout=120,
    )
    assert compile_out.returncode == 0, compile_out.stderr
    pylib = sysconfig.get_config_var("LIBDIR") or ""
    env["LD_LIBRARY_PATH"] = so_dir + ":" + pylib
    run = subprocess.run([exe], env=env, capture_output=True, text=True, timeout=240)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "C ABI OK" in run.stdout

    # P-space with the C action callback (the Fortran-trampoline parity path)
    src_p = os.path.join(REPO, "examples", "c", "pspace_c.c")
    exe_p = str(tmp_path / "test_pspace_c")
    compile_p = subprocess.run(
        ["gcc", "-O2", src_p, "-I", include_dir, "-L", so_dir,
         "-literative_solver_tpu_c", "-o", exe_p],
        capture_output=True, text=True, timeout=120,
    )
    assert compile_p.returncode == 0, compile_p.stderr
    run_p = subprocess.run([exe_p], env=env, capture_output=True, text=True, timeout=240)
    assert run_p.returncode == 0, run_p.stdout + run_p.stderr
    assert "P-space C ABI OK" in run_p.stdout

    # linear equations, multi-RHS (IterativeSolverLinearEquationsInitialize)
    src_l = os.path.join(REPO, "examples", "c", "linear_equations_c.c")
    exe_l = str(tmp_path / "test_lineq_c")
    compile_l = subprocess.run(
        ["gcc", "-O2", src_l, "-I", include_dir, "-L", so_dir,
         "-literative_solver_tpu_c", "-o", exe_l],
        capture_output=True, text=True, timeout=120,
    )
    assert compile_l.returncode == 0, compile_l.stderr
    run_l = subprocess.run([exe_l], env=env, capture_output=True, text=True, timeout=240)
    assert run_l.returncode == 0, run_l.stdout + run_l.stderr
    assert "OK" in run_l.stdout

    # L-BFGS through the AddValue nonlinear leg of the ABI
    src_o = os.path.join(REPO, "examples", "c", "optimize_c.c")
    exe_o = str(tmp_path / "test_opt_c")
    compile_o = subprocess.run(
        ["gcc", "-O2", src_o, "-I", include_dir, "-L", so_dir,
         "-literative_solver_tpu_c", "-o", exe_o],
        capture_output=True, text=True, timeout=120,
    )
    assert compile_o.returncode == 0, compile_o.stderr
    run_o = subprocess.run([exe_o], env=env, capture_output=True, text=True, timeout=240)
    assert run_o.returncode == 0, run_o.stdout + run_o.stderr
    assert "Optimize C ABI OK" in run_o.stdout

    # DIIS through the nonlinear-equations leg
    src_d = os.path.join(REPO, "examples", "c", "diis_c.c")
    exe_d = str(tmp_path / "test_diis_c")
    compile_d = subprocess.run(
        ["gcc", "-O2", src_d, "-I", include_dir, "-L", so_dir,
         "-literative_solver_tpu_c", "-o", exe_d],
        capture_output=True, text=True, timeout=120,
    )
    assert compile_d.returncode == 0, compile_d.stderr
    run_d = subprocess.run([exe_d], env=env, capture_output=True, text=True, timeout=240)
    assert run_d.returncode == 0, run_d.stdout + run_d.stderr
    assert "DIIS C ABI OK" in run_d.stdout
