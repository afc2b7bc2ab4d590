"""Bounds-constrained solve matrix.

The reference exercises box constraints through
``trust_region_minimizer.cc:290-379`` (projected line search) and
``problem_test.cc`` bound validation. This suite covers: active/inactive
bounds per coordinate, solutions at corners/edges, infeasible starts
(clamped at x0), one-sided bounds, bound validation errors, interaction
with robust losses and multiple blocks, and both trust-region
strategies. Solutions are read back with ``parameter_block_value``
(Problem copies user arrays at add time).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct

pytestmark = pytest.mark.tpu  # promoted to the real-device suite (r5, VERDICT #7)


def _solve(p, max_num_iterations=100, **kw):
    opts = ct.SolverOptions(**kw)
    opts.max_num_iterations = max_num_iterations
    return ct.solve(opts, p)


def _quad(target):
    """Residual pulling the block toward ``target``."""
    t = jnp.asarray(target)

    def r(x):
        return x - t

    return r


def test_inactive_bounds_match_unconstrained():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([5.0, -3.0]))
    p.add_residual_block(_quad([1.0, 2.0]), None, [pid])
    p.set_parameter_lower_bound(pid, 0, -100.0)
    p.set_parameter_upper_bound(pid, 0, 100.0)
    p.set_parameter_lower_bound(pid, 1, -100.0)
    s = _solve(p)
    np.testing.assert_allclose(p.parameter_block_value(pid), [1.0, 2.0], atol=1e-6)
    assert s.termination_type == ct.TerminationType.CONVERGENCE


def test_active_lower_bound_single_coordinate():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([5.0]))
    p.add_residual_block(_quad([0.0]), None, [pid])
    p.set_parameter_lower_bound(pid, 0, 2.0)
    _solve(p)
    np.testing.assert_allclose(p.parameter_block_value(pid), [2.0], atol=1e-6)


def test_active_upper_bound_single_coordinate():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([-5.0]))
    p.add_residual_block(_quad([10.0]), None, [pid])
    p.set_parameter_upper_bound(pid, 0, 3.0)
    _solve(p)
    np.testing.assert_allclose(p.parameter_block_value(pid), [3.0], atol=1e-6)


def test_corner_solution_two_active_bounds():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([0.0, 0.0]))
    p.add_residual_block(_quad([10.0, -10.0]), None, [pid])
    p.set_parameter_upper_bound(pid, 0, 1.0)
    p.set_parameter_lower_bound(pid, 1, -2.0)
    _solve(p)
    np.testing.assert_allclose(
        p.parameter_block_value(pid), [1.0, -2.0], atol=1e-6
    )


def test_mixed_active_inactive():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([0.0, 0.0, 0.0]))
    p.add_residual_block(_quad([5.0, 0.5, -5.0]), None, [pid])
    p.set_parameter_upper_bound(pid, 0, 1.0)  # active
    p.set_parameter_lower_bound(pid, 1, -1.0)  # inactive
    p.set_parameter_upper_bound(pid, 1, 1.0)  # inactive
    p.set_parameter_lower_bound(pid, 2, -1.0)  # active
    _solve(p)
    np.testing.assert_allclose(
        p.parameter_block_value(pid), [1.0, 0.5, -1.0], atol=1e-3
    )


def test_infeasible_start_is_rejected():
    """x0 outside the box: FAILURE, parameters untouched (the reference
    preprocessor rejects infeasible starts, solver.cc:140-160)."""
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([100.0]))
    p.add_residual_block(_quad([0.0]), None, [pid])
    p.set_parameter_upper_bound(pid, 0, 5.0)
    p.set_parameter_lower_bound(pid, 0, 1.0)
    s = _solve(p)
    assert s.termination_type == ct.TerminationType.FAILURE
    assert "infeasible" in s.message.lower()
    np.testing.assert_allclose(p.parameter_block_value(pid), [100.0])


def test_bounds_with_robust_loss():
    rng = np.random.default_rng(0)
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([0.0]))
    data = jnp.asarray(np.concatenate([rng.normal(4.0, 0.1, 50), [100.0]]))
    p.add_residual_block(
        lambda x, d: x - d, ct.HuberLoss(1.0), [pid], data=data
    )
    p.set_parameter_upper_bound(pid, 0, 3.0)
    _solve(p)
    np.testing.assert_allclose(p.parameter_block_value(pid), [3.0], atol=1e-5)


def test_bounds_on_one_block_of_many():
    p = ct.Problem()
    pa = p.add_parameter_block(np.array([0.0]))
    pb = p.add_parameter_block(np.array([0.0]))
    p.add_residual_block(_quad([10.0]), None, [pa])
    p.add_residual_block(_quad([10.0]), None, [pb])
    p.set_parameter_upper_bound(pa, 0, 2.0)
    _solve(p)
    np.testing.assert_allclose(p.parameter_block_value(pa), [2.0], atol=1e-6)
    np.testing.assert_allclose(p.parameter_block_value(pb), [10.0], atol=5e-3)


def test_nonlinear_rosenbrock_bounded_away_from_optimum():
    """Rosenbrock optimum (1,1) excluded by x <= 0.5: KKT point on the
    boundary face x = 0.5."""
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([-1.2, 1.0]))

    def rosen(z):
        return jnp.stack([10.0 * (z[1] - z[0] * z[0]), 1.0 - z[0]])

    p.add_residual_block(rosen, None, [pid])
    p.set_parameter_upper_bound(pid, 0, 0.5)
    _solve(p, max_num_iterations=300)
    v = p.parameter_block_value(pid)
    assert v[0] <= 0.5 + 1e-10
    np.testing.assert_allclose(v, [0.5, 0.25], atol=1e-2)


def test_bound_validation_rejects_crossed_bounds():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([0.0]))
    p.add_residual_block(_quad([0.0]), None, [pid])
    p.set_parameter_lower_bound(pid, 0, 2.0)
    p.set_parameter_upper_bound(pid, 0, -2.0)  # upper < lower
    s = _solve(p)
    assert s.termination_type == ct.TerminationType.FAILURE
    assert not s.is_solution_usable()


def test_bound_index_validation():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([0.0, 0.0]))
    with pytest.raises(Exception):
        p.set_parameter_lower_bound(pid, 5, 0.0)
    with pytest.raises(Exception):
        p.set_parameter_upper_bound(pid, -1, 0.0)


def test_bounds_with_dogleg_strategy():
    p = ct.Problem()
    pid = p.add_parameter_block(np.array([5.0]))
    p.add_residual_block(_quad([0.0]), None, [pid])
    p.set_parameter_lower_bound(pid, 0, 1.5)
    s = _solve(
        p,
        trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
    )
    np.testing.assert_allclose(p.parameter_block_value(pid), [1.5], atol=1e-6)
    assert s.is_solution_usable()


def test_iterates_stay_feasible_throughout():
    """Every accepted iterate respects the box (the reference guarantee:
    iterates are projected, trust_region_minimizer.cc:290)."""
    seen = []

    p = ct.Problem()
    pid = p.add_parameter_block(np.array([4.9]))
    p.add_residual_block(_quad([-100.0]), None, [pid])
    p.set_parameter_lower_bound(pid, 0, -1.0)
    opts = ct.SolverOptions()
    opts.max_num_iterations = 50
    opts.update_state_every_iteration = True

    def cb(itsum):
        seen.append(p.parameter_block_value(pid).copy())
        return ct.CallbackReturnType.SOLVER_CONTINUE

    opts.callbacks = [cb]
    ct.solve(opts, p)
    assert seen, "callback never ran"
    for v in seen:
        assert v[0] >= -1.0 - 1e-10
    np.testing.assert_allclose(p.parameter_block_value(pid), [-1.0], atol=1e-6)


def test_projected_armijo_reaches_constrained_optimum():
    """Bounds-active convergence quality: the projected Armijo line
    search (trust_region_minimizer.cc:290-379,590-635 analog) must push
    through the active-set stall where the projected LM direction is
    ascent, reaching the constrained optimum (0.5, 0.25) of Rosenbrock
    under x <= 0.5 — and do it in a modest iteration count (the halving
    search this replaced stalled at (0.5, 0.2707))."""
    import jax.numpy as jnp

    def rosen(v):
        return jnp.asarray([1.0 - v[0], 10.0 * (v[1] - v[0] ** 2)])

    p = ct.Problem()
    pid = p.add_parameter_block(np.array([-1.2, 1.0]))
    p.add_residual_block(rosen, None, [pid])
    p.set_parameter_upper_bound(pid, 0, 0.5)
    s = ct.solve(ct.SolverOptions(max_num_iterations=100), p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    v = p.parameter_block_value(pid)
    # The projected-LM active-set dynamics (shared with the reference:
    # accepts with rho < 0.5 shrink the radius, so steps along the
    # feasible manifold decay geometrically) bound the attainable
    # accuracy at default tolerances; 3e-3 here vs 2.7e-2 for the
    # halving search this replaced.
    np.testing.assert_allclose(v, [0.5, 0.25], atol=3e-3)
    # constrained optimum cost: 0.5 * (1 - 0.5)^2 = 0.125
    assert s.final_cost == pytest.approx(0.125, rel=1e-2)
    assert len(s.iterations) <= 60
