"""Reduced program + fixed_cost (program.cc:291-415 CreateReducedProgram).

Residual blocks whose every parameter block is constant are dropped from
the jitted evaluation; their cost is folded into Program.fixed_cost and
surfaces in SolverSummary.fixed_cost / iteration costs, while
Problem.evaluate still covers them (problem_impl.cc evaluates the FULL
program).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct


def _r2(x, data):
    return x - data


def test_constant_only_block_dropped_and_costed():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([1.0, 2.0]))
    c = p.add_parameter_block(np.array([3.0, 4.0]), constant=True)

    p.add_residual_block(_r2, None, [a], data=jnp.asarray([0.0, 0.0]))
    # constant-only block: residual [3-1, 4-1] = [2, 3] -> cost 6.5
    p.add_residual_block(_r2, None, [c], data=jnp.asarray([1.0, 1.0]))

    prog = p.program()
    assert prog.fixed_cost == pytest.approx(0.5 * (2.0**2 + 3.0**2))
    # absent from the jitted evaluation:
    assert prog.num_residual_blocks_reduced() == 1
    assert prog.num_residual_blocks() == 2
    assert all(
        not np.isin(1, np.asarray(f.residual_ids)) or f.batch == 1
        for f in prog.families
    )
    total_active = sum(f.batch for f in prog.families)
    assert total_active == 1

    s = ct.solve(ct.SolverOptions(max_num_iterations=20), p)
    assert s.fixed_cost == pytest.approx(6.5)
    # a converges to data=0 -> active cost ~0; total = fixed_cost
    assert s.final_cost == pytest.approx(6.5, abs=1e-10)
    assert s.initial_cost == pytest.approx(6.5 + 0.5 * (1 + 4))


def test_fixed_cost_respects_loss():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([0.5]))
    c = p.add_parameter_block(np.array([10.0]), constant=True)
    p.add_residual_block(lambda x: x, None, [a])
    p.add_residual_block(
        lambda x: x, ct.loss.HuberLoss(1.0), [c]
    )
    prog = p.program()
    # Huber: rho(100) = 2*10 - 1 = 19 -> cost 9.5
    assert prog.fixed_cost == pytest.approx(9.5)


def test_mixed_family_rows_split():
    # One batched family where some rows touch only constant blocks.
    p = ct.Problem()
    blocks = [p.add_parameter_block(np.array([float(i)])) for i in range(4)]
    p.set_parameter_block_constant(blocks[2])
    p.set_parameter_block_constant(blocks[3])

    def resid(x, data):
        return x - data

    p.add_residual_blocks(
        resid,
        None,
        [np.asarray(blocks)],
        data=jnp.asarray([[0.0], [0.0], [1.0], [1.0]]),
    )
    prog = p.program()
    # rows 2,3: residuals (2-1)=1 and (3-1)=2 -> fixed cost 0.5*(1+4)=2.5
    assert prog.fixed_cost == pytest.approx(2.5)
    assert prog.num_residual_blocks_reduced() == 2
    assert prog.num_residual_blocks() == 4

    s = ct.solve(ct.SolverOptions(max_num_iterations=30), p)
    assert s.final_cost == pytest.approx(2.5, abs=1e-10)


def test_problem_evaluate_covers_fixed_blocks():
    p = ct.Problem()
    a = p.add_parameter_block(np.array([2.0]))
    c = p.add_parameter_block(np.array([5.0]), constant=True)
    p.add_residual_block(lambda x: x, None, [a])
    p.add_residual_block(lambda x: x, None, [c])

    out = p.evaluate(residuals=True, gradient=True, jacobian=True)
    assert out["cost"] == pytest.approx(0.5 * (4.0 + 25.0))
    r = np.sort(out["residuals"])
    np.testing.assert_allclose(r, [2.0, 5.0])
    # jacobian: 2 rows (active + fixed-zero), 1 tangent column
    assert out["jacobian"].shape == (2, 1)
    np.testing.assert_allclose(np.sort(out["jacobian"].ravel()), [0.0, 1.0])


def test_all_constant_problem():
    p = ct.Problem()
    c = p.add_parameter_block(np.array([3.0]), constant=True)
    p.add_residual_block(lambda x: x, None, [c])
    s = ct.solve(ct.SolverOptions(), p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost == pytest.approx(4.5)


def test_fused_solve_includes_fixed_cost():
    from ceres_tpu.fused_lm import fused_solve

    p = ct.Problem()
    a = p.add_parameter_block(np.array([1.0, 2.0]))
    c = p.add_parameter_block(np.array([3.0, 4.0]), constant=True)
    p.add_residual_block(_r2, None, [a], data=jnp.asarray([0.0, 0.0]))
    p.add_residual_block(_r2, None, [c], data=jnp.asarray([1.0, 1.0]))

    s = fused_solve(ct.SolverOptions(max_num_iterations=20), p)
    assert s.fixed_cost == pytest.approx(6.5)
    assert s.final_cost == pytest.approx(6.5, abs=1e-8)
