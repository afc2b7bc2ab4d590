"""OrderedGroups API (ordered_groups.h parity) and multi-group ordering
semantics in the Schur preprocessor and inner iterations."""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.ordered_groups import (
    OrderedGroups,
    normalize_ordering,
    validate_independent_set,
    validate_ordering_partition,
)


def test_ordered_groups_basic():
    og = OrderedGroups()
    og.add_element_to_group(10, 1)
    og.add_element_to_group(11, 1)
    og.add_element_to_group(12, 0)
    assert og.num_elements == 3
    assert og.num_groups == 2
    assert og.group(10) == 1
    assert og.group(99) == -1
    assert og.is_member(12) and not og.is_member(99)
    assert og.group_size(1) == 2
    assert og.min_non_zero_group() == 1
    assert og.as_group_list() == [[12], [10, 11]]
    # moving an element replaces its group (ordered_groups.h:66-75)
    og.add_element_to_group(10, 0)
    assert og.group(10) == 0
    assert og.remove_element(11) and not og.remove_element(11)


def test_ordered_groups_reverse():
    og = OrderedGroups()
    og.add_element_to_group(1, 0)
    og.add_element_to_group(2, 1)
    og.add_element_to_group(3, 3)
    og.reverse()
    assert og.group(1) == 3 and og.group(2) == 2 and og.group(3) == 0


def test_normalize_accepts_both_forms():
    og = OrderedGroups()
    og.add_element_to_group(5, 0)
    og.add_element_to_group(6, 1)
    assert normalize_ordering(og) == [[5], [6]]
    assert normalize_ordering([[5], [6]]) == [[5], [6]]
    assert normalize_ordering(None) is None


def _bal_problem():
    prob = bal.synthesize_bal(4, 60, 240, seed=2)
    return bal.build_problem(prob)


def test_multi_group_schur_ordering_honored():
    problem, cam_ids, pt_ids = _bal_problem()
    og = OrderedGroups()
    for p in pt_ids:
        og.add_element_to_group(int(p), 0)  # eliminate points first
    for c in cam_ids:
        og.add_element_to_group(int(c), 1)
    opts = bal.default_options(iterative=True)
    opts.linear_solver_ordering = og
    summary = ct.solve(opts, problem)
    assert summary.termination_type == ct.TerminationType.CONVERGENCE


def test_multi_group_ordering_partition_validated():
    problem, cam_ids, pt_ids = _bal_problem()
    program = problem.program()
    # missing blocks -> error
    with pytest.raises(ValueError, match="every active parameter block"):
        validate_ordering_partition(program, [[int(pt_ids[0])], [int(cam_ids[0])]])
    # duplicates -> error
    full = [[int(p) for p in pt_ids], [int(c) for c in cam_ids] + [int(pt_ids[0])]]
    with pytest.raises(ValueError, match="appears in ordering groups"):
        validate_ordering_partition(program, full)


def test_multi_group_solve_rejects_bad_partition():
    problem, cam_ids, pt_ids = _bal_problem()
    opts = bal.default_options(iterative=True)
    # two groups but cameras missing -> preprocessor error
    opts.linear_solver_ordering = [
        [int(p) for p in pt_ids],
        [int(cam_ids[0])],
    ]
    with pytest.raises(ValueError, match="every active parameter block"):
        ct.solve(opts, problem)


def test_inner_iteration_ordering_used_and_validated():
    problem, cam_ids, pt_ids = _bal_problem()
    program = problem.program()
    # cameras share residuals with points but not with each other; points
    # likewise form an independent set
    validate_independent_set(program, [int(c) for c in cam_ids])
    with pytest.raises(ValueError, match="independent"):
        # a camera and a point that share an observation
        prob2, cam2, pt2 = _bal_problem()
        prog2 = prob2.program()
        fam = prog2.families[0]
        ids = np.asarray(fam.block_ids)
        validate_independent_set(prog2, [int(ids[0, 0]), int(ids[0, 1])])

    from ceres_tpu.inner_iterations import CoordinateDescentMinimizer
    from ceres_tpu.evaluator import Evaluator

    opts = bal.default_options(iterative=True)
    opts.inner_iteration_ordering = [
        [int(c) for c in cam_ids],
        [int(p) for p in pt_ids],
    ]
    cd = CoordinateDescentMinimizer(program, opts, Evaluator(program))
    assert cd.sets == [
        [int(c) for c in cam_ids],
        [int(p) for p in pt_ids],
    ]
    x0 = program.initial_ambient()
    x1, cost1 = cd.minimize(x0)
    c0 = float(Evaluator(program).cost(x0))
    assert cost1 < c0  # CD pass over user groups decreases the cost
