"""Tests for the shared polynomial utility (ops/polynomial.py).

Mirrors the reference's ``polynomial_test.cc`` strategy: roots of
constructed polynomials recovered to tolerance, minimization checked
against closed-form minima, and interpolation through value/gradient
samples reproducing the generating polynomial's minimizer.
"""

import numpy as np
import pytest

from ceres_tpu.ops.polynomial import (
    cubic_minimizer_from_samples,
    cubic_minimizer_two_points,
    minimize_interpolating_polynomial,
    minimize_polynomial,
    polynomial_roots,
    quadratic_minimizer,
)


def poly_from_roots(roots):
    c = np.array([1.0])
    for r in roots:
        c = np.convolve(c, [1.0, -r])
    return c


class TestPolynomialRoots:
    def test_constant_has_no_roots(self):
        assert polynomial_roots([3.0]).size == 0
        assert polynomial_roots([]).size == 0
        assert polynomial_roots([0.0, 0.0]).size == 0

    def test_linear(self):
        r = polynomial_roots([2.0, -4.0])
        np.testing.assert_allclose(r, [2.0])

    @pytest.mark.parametrize("roots", [
        [1.0, 2.0],
        [-3.0, 0.5, 7.0],
        [-1e4, 1e-3, 2.0, 5.0],
    ])
    def test_recovers_constructed_real_roots(self, roots):
        c = poly_from_roots(roots)
        got = polynomial_roots(c)
        np.testing.assert_allclose(got, np.sort(roots), rtol=1e-6,
                                   atol=1e-8)

    def test_triple_root_real_parts(self):
        # A triple root perturbs ~eps^(1/3) into the complex plane under
        # companion-matrix eigensolving; real_parts mode recovers it.
        c = poly_from_roots([1.0, 1.0, 1.0])
        got = polynomial_roots(c, real_parts=True)
        np.testing.assert_allclose(got, [1.0, 1.0, 1.0], atol=1e-4)

    def test_complex_pair_dropped(self):
        # (x^2 + 1)(x - 2): only the real root survives
        c = np.convolve([1.0, 0.0, 1.0], [1.0, -2.0])
        got = polynomial_roots(c)
        np.testing.assert_allclose(got, [2.0], rtol=1e-10)

    def test_real_parts_mode_keeps_all(self):
        # (x^2 - 2x + 5) has roots 1 +/- 2i -> real parts [1, 1]
        got = polynomial_roots([1.0, -2.0, 5.0], real_parts=True)
        np.testing.assert_allclose(got, [1.0, 1.0], rtol=1e-10)

    def test_leading_zeros_stripped(self):
        got = polynomial_roots([0.0, 0.0, 1.0, -3.0, 2.0])
        np.testing.assert_allclose(got, [1.0, 2.0], rtol=1e-8)


class TestMinimizePolynomial:
    def test_quadratic_interior(self):
        # (x-3)^2 + 1
        x, v = minimize_polynomial([1.0, -6.0, 10.0], 0.0, 10.0)
        assert abs(x - 3.0) < 1e-10
        assert abs(v - 1.0) < 1e-10

    def test_endpoint_when_monotone(self):
        # x on [2, 5] -> min at 2
        x, v = minimize_polynomial([1.0, 0.0], 2.0, 5.0)
        assert x == 2.0 and abs(v - 2.0) < 1e-12

    def test_quartic_two_wells(self):
        # (x^2-1)^2: wells at +-1, pick the one in range
        c = [1.0, 0.0, -2.0, 0.0, 1.0]
        x, v = minimize_polynomial(c, 0.0, 2.0)
        assert abs(x - 1.0) < 1e-8 and abs(v) < 1e-12
        x, v = minimize_polynomial(c, -2.0, 0.0)
        assert abs(x + 1.0) < 1e-8


class TestInterpolatingMinimizer:
    def test_cubic_through_value_gradient_samples(self):
        # generating cubic f(x) = x^3 - 3x (local min at x=1, f=-2)
        def f(x):
            return x ** 3 - 3 * x

        def g(x):
            return 3 * x ** 2 - 3

        samples = [(0.0, f(0.0), g(0.0)), (2.0, f(2.0), g(2.0))]
        x, v = minimize_interpolating_polynomial(samples, 0.0, 2.0)
        assert abs(x - 1.0) < 1e-8
        assert abs(v + 2.0) < 1e-8

    def test_values_only_quadratic(self):
        # three values of (x-2)^2
        samples = [(0.0, 4.0, None), (1.0, 1.0, None), (3.0, 1.0, None)]
        x, v = minimize_interpolating_polynomial(samples, 0.0, 3.0)
        assert abs(x - 2.0) < 1e-8 and abs(v) < 1e-8


class TestClosedFormMinimizers:
    def test_cubic_two_points_exact(self):
        # f(x) = x^3 - 3x on [0, 2]: min at 1
        def f(x):
            return x ** 3 - 3 * x

        def g(x):
            return 3 * x ** 2 - 3

        a = cubic_minimizer_two_points(0.0, f(0.0), g(0.0), 2.0, f(2.0), g(2.0))
        assert abs(a - 1.0) < 1e-10

    def test_cubic_two_points_degenerate_midpoint(self):
        a = cubic_minimizer_two_points(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        assert a == 1.0  # zero interval
        # no interior minimizer (monotone decreasing cubic) -> midpoint
        a = cubic_minimizer_two_points(0.0, 0.0, -1.0, 1.0, -1.0, -1.0)
        assert 0.0 <= a <= 1.0

    def test_cubic_from_samples_exact(self):
        # phi(x) = x^3 - 3x + 2: phi(0)=2, phi'(0)=-3; samples at 2, 3
        def f(x):
            return x ** 3 - 3 * x + 2

        a = cubic_minimizer_from_samples(2.0, -3.0, 2.0, f(2.0), 3.0, f(3.0))
        assert abs(a - 1.0) < 1e-8

    def test_cubic_from_samples_degenerate(self):
        assert cubic_minimizer_from_samples(0.0, -1.0, 1.0, np.nan, 1.0, 0.0) == 0.5
        assert cubic_minimizer_from_samples(0.0, -1.0, 0.0, 0.0, 0.0, 0.0) == 0.0

    def test_quadratic_exact(self):
        # phi(x) = (x-2)^2 = x^2 -4x +4: phi(0)=4, phi'(0)=-4, phi(1)=1
        a = quadratic_minimizer(4.0, -4.0, 1.0, 1.0)
        assert abs(a - 2.0) < 1e-12

    def test_quadratic_nonconvex_halves(self):
        # concave data -> fallback a1/2
        a = quadratic_minimizer(0.0, -1.0, 1.0, -2.0)
        assert a == 0.5
