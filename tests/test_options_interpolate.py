"""Options parsing (test_Options.cpp/test_options_map.cpp) and Interpolate
(test_Interpolate.cpp) unit tests."""

import math

import numpy as np
import pytest

import iterative_solver_tpu as its
from iterative_solver_tpu.options import (
    LinearEigensystemDavidsonOptions,
    OptimizeBFGSOptions,
    parse_keyval_string,
)
from iterative_solver_tpu.solvers.interpolate import Interpolate, Point


class TestOptions:
    def test_parse_keyval(self):
        m = parse_keyval_string("a=1, B = two ,c=3.5")
        assert m == {"A": "1", "B": "two", "C": "3.5"}

    def test_case_insensitive(self):
        o = LinearEigensystemDavidsonOptions.from_string(
            "MAX_SIZE_QSPACE=6,norm_thresh=1e-9,Hermiticity=true,n_roots=3"
        )
        assert o.max_size_qspace == 6
        assert o.norm_thresh == 1e-9
        assert o.hermiticity is True
        assert o.n_roots == 3

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            parse_keyval_string("oops")

    def test_bfgs_options(self):
        o = OptimizeBFGSOptions.from_string("max_size_qspace=5,svd_thresh=1e-11")
        assert o.max_size_qspace == 5
        assert o.svd_thresh == 1e-11

    def test_factory_round_trip(self):
        s = its.create_linear_eigensystem(
            10, 2, "Davidson", "reset_D=8,max_size_qspace=7,convergence_threshold=1e-9"
        )
        assert s.dspace_resetter.nreset == 8
        assert s.max_size_qspace == 7
        assert s.convergence_threshold == 1e-9


class TestInterpolate:
    def test_cubic_reproduces_points(self):
        f = lambda x: 1 + x + 0.5 * x**2 - 0.1 * x**3
        g = lambda x: 1 + x - 0.3 * x**2
        p0 = Point(-1, f(-1), g(-1))
        p1 = Point(0.5, f(0.5), g(0.5))
        inter = Interpolate(p0, p1, "cubic")
        for p in (p0, p1):
            q = inter(p.x)
            assert abs(q.f - p.f) < 1e-12
            assert abs(q.f1 - p.f1) < 1e-12

    def test_cubic_minimize(self):
        # f(x) = (x-1)^2 has minimum at 1
        f = lambda x: (x - 1) ** 2
        g = lambda x: 2 * (x - 1)
        inter = Interpolate(Point(0, f(0), g(0)), Point(2, f(2), g(2)), "cubic")
        pmin = inter.minimize(-5, 5)
        assert abs(pmin.x - 1) < 1e-10
        assert abs(pmin.f) < 1e-12

    def test_interpolants_listing(self):
        assert Interpolate.interpolants() == ["cubic", "morse"]

    def test_morse(self):
        # sample an actual Morse-like curve: f = (1-exp(-a x))^2 shape
        a, k = 0.7, 2.0
        f = lambda x: (k / (2 * a * a)) * (1 - math.exp(-a * (x - 0.3))) ** 2 + 0.1
        g = lambda x: (k / a) * math.exp(-a * (x - 0.3)) * (1 - math.exp(-a * (x - 0.3)))
        inter = Interpolate(Point(-0.5, f(-0.5), g(-0.5)), Point(1.0, f(1.0), g(1.0)), "morse")
        pmin = inter.minimize(-2, 2, analytic=False)
        assert abs(pmin.x - 0.3) < 1e-5
        assert abs(pmin.f - 0.1) < 1e-6
