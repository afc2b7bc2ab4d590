"""Solver::Options validation matrix + degenerate-problem behavior.

Ports the reference's solver_test.cc (1254 LoC): the options
cross-validation table (solver.cc:99-503 via Options::IsValid,
solver_test.cc:50-57,378-1240) and the degenerate-problem semantics
(solver_test.cc:235-377,1243-1253).

Documented divergence from the reference (see SolverOptions.validate):
``use_mixed_precision_solves`` is valid with every linear solver here —
the refinement wrapper is generic f64 normal-equation refinement — where
the reference rejects DENSE_QR/CGNR/ITERATIVE_SCHUR for backend reasons.
Vendor-library availability rows (EIGEN/LAPACK/SUITE_SPARSE/...) have no
analog: there is exactly one backend (XLA) and it is always available.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import ceres_tpu as ct
from ceres_tpu.types import (
    LinearSolverType as LS,
    LineSearchDirectionType as LSD,
    LineSearchType as LT,
    MinimizerType,
    PreconditionerType as PC,
    TerminationType,
    TrustRegionStrategyType,
)


def _valid(**kw):
    o = ct.SolverOptions(**kw)
    return o.validate(10) is None


def _error(**kw):
    o = ct.SolverOptions(**kw)
    return o.validate(10)


# --- defaults (solver_test.cc:50-62) ---------------------------------------

def test_default_trust_region_options_are_valid():
    assert _valid(minimizer_type=MinimizerType.TRUST_REGION)


def test_default_line_search_options_are_valid():
    assert _valid(minimizer_type=MinimizerType.LINE_SEARCH)


# --- common options ---------------------------------------------------------

@pytest.mark.parametrize("field,bad", [
    ("max_num_iterations", -1),
    ("max_solver_time_in_seconds", -1.0),
    ("function_tolerance", -1e-3),
    ("gradient_tolerance", -1e-3),
    ("parameter_tolerance", -1e-3),
    ("num_threads", 0),
])
def test_common_bounds(field, bad):
    assert not _valid(**{field: bad})
    # zero tolerances ARE valid (solver.cc OPTION_GE(x, 0.0))
    if field.endswith("tolerance"):
        assert _valid(**{field: 0.0})


def test_check_gradients_requires_positive_precisions():
    assert not _valid(check_gradients=True,
                      gradient_check_relative_precision=0.0)
    assert not _valid(
        check_gradients=True,
        gradient_check_numeric_derivative_relative_step_size=0.0)
    assert _valid(check_gradients=True)


# --- trust region cross-constraints (solver.cc:405-452) ---------------------

def test_trust_region_radius_ordering():
    assert not _valid(initial_trust_region_radius=0.0)
    assert not _valid(min_trust_region_radius=0.0)
    assert not _valid(max_trust_region_radius=0.0)
    assert not _valid(min_trust_region_radius=2.0,
                      initial_trust_region_radius=1.0,
                      max_trust_region_radius=3.0)
    assert not _valid(initial_trust_region_radius=5.0,
                      max_trust_region_radius=4.0)
    assert not _valid(min_trust_region_radius=10.0,
                      max_trust_region_radius=5.0,
                      initial_trust_region_radius=7.0)


def test_lm_diagonal_and_step_limits():
    assert not _valid(min_lm_diagonal=-1.0)
    assert not _valid(max_lm_diagonal=-1.0)
    assert not _valid(min_lm_diagonal=2.0, max_lm_diagonal=1.0)
    assert not _valid(max_num_consecutive_invalid_steps=-1)
    assert not _valid(min_relative_decrease=-1e-3)
    assert _valid(min_relative_decrease=0.0)
    assert not _valid(eta=0.0)


def test_linear_solver_iteration_bounds():
    assert not _valid(min_linear_solver_iterations=-1)
    assert not _valid(max_linear_solver_iterations=-1)
    assert not _valid(min_linear_solver_iterations=10,
                      max_linear_solver_iterations=5)


def test_inner_iterations_and_nonmonotonic():
    assert not _valid(use_inner_iterations=True,
                      inner_iteration_tolerance=-1.0)
    assert not _valid(use_nonmonotonic_steps=True,
                      max_consecutive_nonmonotonic_steps=0)
    assert _valid(use_nonmonotonic_steps=True)


def test_dogleg_rejects_iterative_solvers():
    for lst in (LS.CGNR, LS.ITERATIVE_SCHUR):
        msg = _error(
            trust_region_strategy_type=TrustRegionStrategyType.DOGLEG,
            linear_solver_type=lst)
        assert msg is not None and "DOGLEG" in msg
    assert _valid(trust_region_strategy_type=TrustRegionStrategyType.DOGLEG,
                  linear_solver_type=LS.DENSE_QR)


def test_dump_requires_directory():
    assert not _valid(trust_region_minimizer_iterations_to_dump=[1, 2],
                      trust_region_problem_dump_directory="")
    assert _valid(trust_region_minimizer_iterations_to_dump=[1, 2],
                  trust_region_problem_dump_directory="/tmp")


# --- per-linear-solver rules (solver_test.cc:378-1240) ----------------------

def test_dense_solvers_accept_mixed_precision():
    # DENSE_NORMAL_CHOLESKY + mixed precision: valid in the reference and
    # here (solver_test.cc:378-404).
    assert _valid(linear_solver_type=LS.DENSE_NORMAL_CHOLESKY,
                  use_mixed_precision_solves=True)
    # DENSE_QR + mixed precision: the reference rejects
    # (solver_test.cc:405-430); here the generic f64 refinement supports
    # it (documented divergence).
    assert _valid(linear_solver_type=LS.DENSE_QR,
                  use_mixed_precision_solves=True)


def test_cgnr_preconditioner_matrix():
    # solver_test.cc:847-1093 CgnrOptions*.
    assert _valid(linear_solver_type=LS.CGNR, preconditioner_type=PC.IDENTITY)
    assert _valid(linear_solver_type=LS.CGNR, preconditioner_type=PC.JACOBI)
    for pt in (PC.SCHUR_JACOBI, PC.CLUSTER_JACOBI, PC.CLUSTER_TRIDIAGONAL,
               PC.SCHUR_POWER_SERIES_EXPANSION):
        assert not _valid(linear_solver_type=LS.CGNR, preconditioner_type=pt)
    # SUBSET needs a non-empty residual-block list (solver.cc:352-357).
    assert not _valid(linear_solver_type=LS.CGNR,
                      preconditioner_type=PC.SUBSET)
    assert _valid(linear_solver_type=LS.CGNR, preconditioner_type=PC.SUBSET,
                  residual_blocks_for_subset_preconditioner=[0, 1])


def test_cgnr_dynamic_sparsity_invalid():
    assert not _valid(linear_solver_type=LS.CGNR, dynamic_sparsity=True)


def test_iterative_schur_matrix():
    # solver_test.cc:1094-1240 IterativeSchurOptions*.
    for pt in (PC.IDENTITY, PC.JACOBI, PC.SCHUR_JACOBI, PC.CLUSTER_JACOBI,
               PC.CLUSTER_TRIDIAGONAL, PC.SCHUR_POWER_SERIES_EXPANSION):
        assert _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                      preconditioner_type=pt)
    assert not _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                      preconditioner_type=PC.SUBSET)
    # explicit Schur complement: SCHUR_JACOBI only.
    assert _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                  use_explicit_schur_complement=True,
                  preconditioner_type=PC.SCHUR_JACOBI)
    for pt in (PC.IDENTITY, PC.JACOBI, PC.CLUSTER_JACOBI,
               PC.CLUSTER_TRIDIAGONAL):
        assert not _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                          use_explicit_schur_complement=True,
                          preconditioner_type=pt)
    assert not _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                      use_explicit_schur_complement=True,
                      preconditioner_type=PC.SCHUR_JACOBI,
                      use_spse_initialization=True)
    # SPSE knobs (solver.cc:292-296).
    assert not _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                      use_spse_initialization=True,
                      max_num_spse_iterations=0)
    assert not _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                      preconditioner_type=PC.SCHUR_POWER_SERIES_EXPANSION,
                      spse_tolerance=-1.0)
    assert not _valid(linear_solver_type=LS.ITERATIVE_SCHUR,
                      dynamic_sparsity=True)


def test_schur_solvers_reject_dynamic_sparsity():
    for lst in (LS.DENSE_SCHUR, LS.SPARSE_SCHUR):
        assert not _valid(linear_solver_type=lst, dynamic_sparsity=True)
    assert _valid(linear_solver_type=LS.SPARSE_NORMAL_CHOLESKY,
                  dynamic_sparsity=True)


# --- line search option rules (solver.cc:454-503) ----------------------------

def test_line_search_bounds():
    LSOPTS = dict(minimizer_type=MinimizerType.LINE_SEARCH)
    assert not _valid(max_lbfgs_rank=0, **LSOPTS)
    assert not _valid(min_line_search_step_size=0.0, **LSOPTS)
    assert not _valid(max_line_search_step_contraction=0.0, **LSOPTS)
    assert not _valid(max_line_search_step_contraction=1.0, **LSOPTS)
    assert not _valid(max_line_search_step_contraction=0.7,
                      min_line_search_step_contraction=0.6, **LSOPTS)
    assert not _valid(min_line_search_step_contraction=1.5, **LSOPTS)
    assert not _valid(max_num_line_search_step_size_iterations=0, **LSOPTS)
    # ... but 0 is allowed under TRUST_REGION (solver.cc:463-464).
    assert _valid(max_num_line_search_step_size_iterations=0,
                  minimizer_type=MinimizerType.TRUST_REGION)
    assert not _valid(line_search_sufficient_function_decrease=0.0, **LSOPTS)
    assert not _valid(line_search_sufficient_function_decrease=0.95,
                      line_search_sufficient_curvature_decrease=0.9, **LSOPTS)
    assert not _valid(line_search_sufficient_curvature_decrease=1.0, **LSOPTS)
    assert not _valid(max_line_search_step_expansion=1.0, **LSOPTS)


def test_lbfgs_requires_wolfe():
    for d in (LSD.BFGS, LSD.LBFGS):
        assert not _valid(minimizer_type=MinimizerType.LINE_SEARCH,
                          line_search_direction_type=d,
                          line_search_type=LT.ARMIJO)
        assert _valid(minimizer_type=MinimizerType.LINE_SEARCH,
                      line_search_direction_type=d,
                      line_search_type=LT.WOLFE)
    assert _valid(minimizer_type=MinimizerType.LINE_SEARCH,
                  line_search_direction_type=LSD.STEEPEST_DESCENT,
                  line_search_type=LT.ARMIJO)


def test_invalid_options_fail_solve_with_message():
    p = ct.Problem()
    xid = p.add_parameter_block(np.array([1.0]))
    p.add_residual_block(lambda x: x - 5.0, None, [xid])
    s = ct.solve(ct.SolverOptions(eta=0.0), p)
    assert s.termination_type == TerminationType.FAILURE
    assert "Invalid options" in s.message


# --- degenerate problems (solver_test.cc:235-377) ----------------------------

@pytest.mark.parametrize("minimizer", [MinimizerType.TRUST_REGION,
                                       MinimizerType.LINE_SEARCH])
def test_problem_has_no_residuals(minimizer):
    """A problem with parameter blocks but zero residual blocks converges
    immediately (solver_test.cc:259-285)."""
    p = ct.Problem()
    p.add_parameter_block(np.array([1.0]))
    s = ct.solve(ct.SolverOptions(minimizer_type=minimizer), p)
    assert s.termination_type == TerminationType.CONVERGENCE


@pytest.mark.parametrize("minimizer", [MinimizerType.TRUST_REGION,
                                       MinimizerType.LINE_SEARCH])
def test_problem_is_constant(minimizer):
    """All-constant problem: initial == final == fixed cost
    (solver_test.cc:287-327)."""
    p = ct.Problem()
    xid = p.add_parameter_block(np.array([1.0]))
    p.add_residual_block(lambda x: x, None, [xid])
    p.set_parameter_block_constant(xid)
    s = ct.solve(ct.SolverOptions(minimizer_type=minimizer), p)
    assert s.termination_type == TerminationType.CONVERGENCE
    assert s.initial_cost == pytest.approx(0.5)
    assert s.final_cost == pytest.approx(0.5)


def test_fixed_cost_for_constant_problem():
    """solver_test.cc:329-344: residual [4, 5] on a constant block."""
    p = ct.Problem()
    xid = p.add_parameter_block(np.array([1.0]))
    p.add_residual_block(
        lambda x: jnp.asarray([4.0, 5.0]) + 0.0 * x[0], None, [xid])
    p.set_parameter_block_constant(xid)
    s = ct.solve(ct.SolverOptions(), p)
    assert s.is_solution_usable()
    assert s.fixed_cost == pytest.approx(41.0 / 2.0)
    assert s.initial_cost == pytest.approx(41.0 / 2.0)
    assert s.final_cost == pytest.approx(41.0 / 2.0)


def test_zero_sized_manifold_holds_block_constant():
    """SubsetManifold fixing every coordinate == constant block
    (solver_test.cc:358-377)."""
    p = ct.Problem()
    xid = p.add_parameter_block(np.array([0.0]))
    yid = p.add_parameter_block(
        np.array([1.0]), manifold=ct.manifold.SubsetManifold(1, [0]))
    p.add_residual_block(
        lambda x, y: jnp.concatenate([10.0 - x, 5.0 - y]), None, [xid, yid])
    s = ct.solve(ct.SolverOptions(function_tolerance=0.0,
                                  gradient_tolerance=0.0,
                                  parameter_tolerance=0.0), p)
    assert s.termination_type == TerminationType.CONVERGENCE
    assert p.parameter_block_value(xid)[0] == pytest.approx(10.0, abs=1e-7)
    assert p.parameter_block_value(yid)[0] == 1.0


def test_large_cost_problem_fails():
    """A cost that overflows double FAILs the solve
    (solver_test.cc:1243-1253)."""
    p = ct.Problem()
    xid = p.add_parameter_block(np.array([1.0]))
    big = 1e300
    p.add_residual_block(
        lambda x: jnp.asarray([big + big * x[0] ** 2]), None, [xid])
    s = ct.solve(ct.SolverOptions(), p)
    assert s.termination_type == TerminationType.FAILURE
