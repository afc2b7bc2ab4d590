"""Cost-function adapters, evaluation callback, user elimination order."""

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct
from ceres_tpu.cost_functions import (
    conditioned,
    fixed_arguments,
    normal_prior,
    scaled,
)
from ceres_tpu.models import bal


def test_normal_prior():
    A = np.array([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    b = np.array([1.0, -1.0])
    p = ct.Problem()
    xb = p.add_parameter_block(np.zeros(2))
    p.add_residual_block(normal_prior(A, b), None, [xb])
    s = ct.solve(ct.SolverOptions(max_num_iterations=20), p)
    np.testing.assert_allclose(p.parameter_block_value(xb), b, atol=1e-7)
    assert s.final_cost < 1e-14


def test_conditioned_cost_function():
    def base(x):
        return jnp.stack([x[0] - 1.0, x[0] - 3.0])

    fn = conditioned(
        base, [lambda r: 2.0 * r, lambda r: 0.5 * r]
    )
    out = np.asarray(fn(jnp.asarray([2.0])))
    np.testing.assert_allclose(out, [2.0, -0.5])


def test_scaled_and_fixed():
    def base(a, b):
        return a - b

    f = scaled(base, 3.0)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray([2.0]), jnp.asarray([0.5]))), [4.5]
    )
    g = fixed_arguments(base, {1: np.array([1.0])})
    np.testing.assert_allclose(np.asarray(g(jnp.asarray([2.0]))), [1.0])


def test_evaluation_callback_fires():
    calls = []

    class CB(ct.EvaluationCallback):
        def prepare_for_evaluation(self, new_point, jacobians):
            calls.append((new_point, jacobians))

    prob = bal.synthesize_bal(2, 20, 60, seed=4)
    p, _, _ = bal.build_problem(prob)
    opts = ct.SolverOptions(max_num_iterations=3, evaluation_callback=CB())
    ct.solve(opts, p)
    assert len(calls) >= 4  # iteration 0 jacobian + per-iteration evals
    assert any(j for _, j in calls)  # jacobian evaluations seen
    assert any(not j for _, j in calls)  # cost-only evaluations seen


def test_user_elimination_ordering():
    """linear_solver_ordering group 0 overrides the automatic e-blocks."""
    prob = bal.synthesize_bal(3, 30, 90, seed=8)
    p, cam_ids, pt_ids = bal.build_problem(prob)
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        max_num_iterations=10,
        linear_solver_ordering=[list(pt_ids), list(cam_ids)],
    )
    s = ct.solve(opts, p)
    # same minimum as automatic ordering
    p2, _, _ = bal.build_problem(prob)
    opts2 = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        max_num_iterations=10,
    )
    s2 = ct.solve(opts2, p2)
    np.testing.assert_allclose(s.final_cost, s2.final_cost, rtol=1e-8)
