"""analytic_cost (SizedCostFunction analog) and numeric_diff_gradient
(NumericDiffFirstOrderFunction analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.numeric_diff import numeric_diff_gradient


def test_analytic_cost_jacobian_used():
    """The hand-written Jacobian drives the solve, not autodiff: plant a
    deliberately consistent analytic rule and check jacfwd returns it."""

    def residual(x):
        return jnp.stack([x[0] ** 2, 3.0 * x[1]])

    def jacobian(x):
        return (
            jnp.array([[2.0 * x[0], 0.0], [0.0, 3.0]], dtype=x.dtype),
        )

    fn = ct.analytic_cost(residual, jacobian)
    x = jnp.array([1.5, -2.0])
    J = jax.jacfwd(fn)(x)
    np.testing.assert_allclose(
        np.asarray(J), [[3.0, 0.0], [0.0, 3.0]], rtol=1e-12
    )


def test_analytic_cost_wrong_jacobian_detected():
    """A deliberately wrong analytic Jacobian is what jacfwd reports —
    proof the custom rule overrides autodiff (and what the gradient
    checker would flag)."""

    def residual(x):
        return x * x

    def jacobian(x):
        return (jnp.diag(7.0 * jnp.ones_like(x)),)  # wrong: true is 2x

    fn = ct.analytic_cost(residual, jacobian)
    J = jax.jacfwd(fn)(jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(J), np.diag([7.0, 7.0]))


def test_analytic_cost_multi_block_and_null_slot():
    """Two parameter blocks plus constant data: None Jacobian slot means
    zero derivative (NULL jacobians[i] in the reference Evaluate)."""

    def residual(a, b, data):
        return a - 2.0 * b + data

    def jacobian(a, b, data):
        eye = jnp.eye(2, dtype=a.dtype)
        return (eye, -2.0 * eye, None)

    fn = ct.analytic_cost(residual, jacobian)
    a = jnp.array([1.0, 2.0])
    b = jnp.array([0.5, 0.5])
    d = jnp.array([0.1, 0.2])
    Ja = jax.jacfwd(fn, argnums=0)(a, b, d)
    Jb = jax.jacfwd(fn, argnums=1)(a, b, d)
    np.testing.assert_allclose(np.asarray(Ja), np.eye(2))
    np.testing.assert_allclose(np.asarray(Jb), -2.0 * np.eye(2))


def test_analytic_cost_arity_mismatch_raises():
    fn = ct.analytic_cost(
        lambda x, y: x + y, lambda x, y: (jnp.eye(1),)
    )
    with pytest.raises(ValueError, match="1 Jacobians for 2"):
        jax.jacfwd(fn)(jnp.ones(1), jnp.ones(1))


def test_analytic_cost_solve_matches_autodiff():
    """Full solve through the Problem API: analytic path equals autodiff
    path (helloworld_analytic_diff.cc scenario)."""

    def make(analytic):
        p = ct.Problem()
        xb = p.add_parameter_block(np.array([0.5, -0.3]))

        def residual(x):
            return jnp.stack([10.0 - x[0], 5.0 - x[0] * x[1]])

        if analytic:
            def jacobian(x):
                return (
                    jnp.array(
                        [[-1.0, 0.0], [-x[1], -x[0]]], dtype=x.dtype
                    ),
                )

            fn = ct.analytic_cost(residual, jacobian)
        else:
            fn = residual
        p.add_residual_block(fn, None, [xb])
        s = ct.solve(ct.SolverOptions(max_num_iterations=50), p)
        return s.final_cost, p.parameter_block_value(xb)

    c1, x1 = make(True)
    c2, x2 = make(False)
    assert c1 < 1e-10 and c2 < 1e-10
    np.testing.assert_allclose(x1, x2, atol=1e-8)


def test_numeric_diff_gradient_matches_analytic():
    def f(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    g = numeric_diff_gradient(f, method="CENTRAL")
    x = jnp.array([-1.2, 1.0])
    got = np.asarray(g(x))
    want = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_numeric_diff_gradient_problem_solve():
    def f(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    gp = ct.GradientProblem(
        f, num_parameters=2, gradient_fn=numeric_diff_gradient(f)
    )
    x = np.array([-1.2, 1.0])
    s = ct.solve_gradient_problem(
        ct.GradientProblemOptions(max_num_iterations=200), gp, x
    )
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-5)
    assert s.final_cost < 1e-9
