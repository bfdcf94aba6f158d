"""Small parity utilities: gram_schmidt transformation matrix, ambient config,
fused handler ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterative_solver_tpu import config
from iterative_solver_tpu.array import vector_ops as vops
from iterative_solver_tpu.ops import dense


class TestGramSchmidtTransform:
    def test_orthogonalises(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal((5, 20))
        s = v @ v.T
        l = dense.gram_schmidt_transform(s)
        w = l @ v
        g = w @ w.T
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() < 1e-10
        assert np.allclose(np.diag(l), 1.0)

    def test_null_rows_skipped(self):
        v = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        s = v @ v.T
        l = dense.gram_schmidt_transform(s, norm_thresh=1e-14)
        w = l @ v
        assert np.linalg.norm(w[1]) < 1e-12  # duplicate row nulled
        assert abs(np.dot(w[2], w[0])) < 1e-12


class TestAmbientConfig:
    def test_defaults(self):
        assert config.get_option("BSR_BLOCK") == 128
        assert config.get_option("GEMM_BUFFERS") == 2

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("ITERATIVE_SOLVER_BSR_BLOCK", "64")
        assert config.get_option("BSR_BLOCK") == 64

    def test_programmatic_override(self):
        config.set_option("PROFILER_DEPTH", 3)
        try:
            assert config.get_option("PROFILER_DEPTH") == 3
        finally:
            config.clear_options()


class TestFusedOps:
    def test_fused_axpy(self):
        rng = np.random.default_rng(1)
        xs = rng.standard_normal((4, 30))
        y = rng.standard_normal(30)
        alphas = rng.standard_normal(4)
        out = np.asarray(vops.fused_axpy(jnp.asarray(alphas), jnp.asarray(xs), jnp.asarray(y)))
        np.testing.assert_allclose(out, y + alphas @ xs, atol=1e-12)

    def test_fused_dot(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(30)
        ys = rng.standard_normal((4, 30))
        out = np.asarray(vops.fused_dot(jnp.asarray(x), jnp.asarray(ys)))
        np.testing.assert_allclose(out, ys @ x, atol=1e-12)


class TestProfiler:
    def test_region_tree(self):
        from iterative_solver_tpu.utils import Profiler

        prof = Profiler()
        with prof.push("outer"):
            with prof.push("inner", flops=100):
                pass
            with prof.push("inner"):
                pass
        report = prof.report()
        assert "outer" in report and "inner" in report and "x2" in report

    def test_disabled(self):
        from iterative_solver_tpu.utils import Profiler

        prof = Profiler(max_depth=0)
        with prof.push("anything"):
            pass
        assert prof.report() == ""
